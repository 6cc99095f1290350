"""Round-4 probe: LMD16 bf16 train-step accumulation sweep, re-measured
after the bar-batched backward kernels + histogram-fused front (the old
a2-is-worse reading, 0.3444 vs 0.3273, predates both).

One variant per invocation (one fresh train-graph compile per sandbox
command): `python scripts/probes/train_probe13.py a2` (or a4/a8).
LMD16 shape: batch 64, d=512, L=8, 16 bars (examples/training_lmd16.json).
"""
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/polyphemus_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from polyphemus_tpu.utils import tpu_jit
from polyphemus_tpu.config import ModelConfig, TrainConfig
from polyphemus_tpu.data.dataset import synthetic_batch
from polyphemus_tpu.models import VAE
from polyphemus_tpu.train.trainer import (create_train_state, make_optimizer,
                                          make_train_step)

BATCH, N_BARS = 64, 16
tag = (sys.argv[1:] or ["a2"])[0]
with_metrics = not tag.endswith("nm")  # e.g. `a2nm`: metrics-free graph
accum = int(tag.lstrip("a").rstrip("nm") or "2")
toks, mask = synthetic_batch(np.random.default_rng(0), BATCH, N_BARS)
toks, mask = jnp.asarray(toks), jnp.asarray(mask)

cfg = TrainConfig(
    batch_size=BATCH, iters_to_accumulate=accum, bf16=True,
    model=ModelConfig(d=512, gnn_n_layers=8, n_bars=N_BARS, resolution=8,
                      dropout=0.0, batch_norm=True, use_pallas_gcl=True))
model = VAE(cfg.model)
state = create_train_state(model, cfg, jax.random.key(0), toks, mask)
step = tpu_jit(make_train_step(model, cfg, make_optimizer(cfg),
                               with_metrics=with_metrics))
s, l, _ = step(state, toks, mask, jax.random.key(1))
float(l["tot"])
times = []
for _ in range(3):
    t0 = time.perf_counter()
    N = 10
    for i in range(N):
        state, losses, _ = step(state, toks, mask, jax.random.key(i))
    float(losses["tot"])
    times.append((time.perf_counter() - t0) / N)
dt = float(np.median(times))
print(json.dumps({"what": f"lmd16_bf16_a{accum}"
                          + ("" if with_metrics else "_nm"),
                  "step_s": round(dt, 4),
                  "seq_s": round(BATCH / dt, 1),
                  "times": [round(t, 4) for t in times]}), flush=True)
