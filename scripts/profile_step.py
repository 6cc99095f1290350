"""Capture a jax.profiler trace of the fused-CE train step and print the
top device ops (via tensorboard_plugin_profile's converters)."""
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/polyphemus_jax"))
import jax.numpy as jnp
import numpy as np

from polyphemus_tpu.utils import tpu_jit
from polyphemus_tpu.config import ModelConfig, TrainConfig
from polyphemus_tpu.data.dataset import synthetic_batch
from polyphemus_tpu.models import VAE
from polyphemus_tpu.train.trainer import (create_train_state, make_optimizer,
                                          make_train_step)

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/poly_trace"

BATCH = int(os.environ.get("BATCH", "256"))
BARS = int(os.environ.get("BARS", "2"))  # 16 = the LMD16 shape
cfg = TrainConfig(batch_size=BATCH,
                  iters_to_accumulate=int(os.environ.get("ACCUM", "4")),
                  bf16=os.environ.get("BF16", "1") == "1",
                  model=ModelConfig(d=512,
                                    gnn_n_layers=int(
                                        os.environ.get("LAYERS", "8")),
                                    n_bars=BARS,
                                    resolution=8, dropout=0.0,
                                    batch_norm=True, use_pallas_gcl=True))
model = VAE(cfg.model)
toks, mask = synthetic_batch(np.random.default_rng(0), BATCH, BARS)
toks, mask = jnp.asarray(toks), jnp.asarray(mask)
state = create_train_state(model, cfg, jax.random.key(0), toks, mask)
step = tpu_jit(make_train_step(model, cfg, make_optimizer(cfg)))
s, l, _ = step(state, toks, mask, jax.random.key(1))
float(l["tot"])  # warm + sync

jax.profiler.start_trace(OUT)
for i in range(2):
    state, losses, _ = step(state, toks, mask, jax.random.key(i))
float(losses["tot"])
jax.profiler.stop_trace()
print("trace dirs:", glob.glob(OUT + "/**/*.xplane.pb", recursive=True))

try:
    from tensorboard_plugin_profile.convert import raw_to_tool_data as r2t

    xs = glob.glob(OUT + "/**/*.xplane.pb", recursive=True)
    data, _ = r2t.xspace_to_tool_data(xs, "framework_op_stats", {})
    out_path = os.path.join(OUT, "op_stats.csv")
    if isinstance(data, bytes):
        data = data.decode("utf-8", "replace")
    with open(out_path, "w") as f:
        f.write(data)
    print("wrote", out_path, len(data))
except Exception as e:
    print("convert failed:", repr(e))
