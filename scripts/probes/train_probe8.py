"""Round-2: time the slot-scanned (fused) CE train step vs the logits path.

Usage: python scripts/probes/train_probe8.py [layers ...]  (default: 8 1)
"""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/polyphemus_jax"))
import jax.numpy as jnp, numpy as np
from polyphemus_tpu.utils import tpu_jit
from polyphemus_tpu.config import ModelConfig, TrainConfig
from polyphemus_tpu.data.dataset import synthetic_batch
from polyphemus_tpu.models import VAE
from polyphemus_tpu.train.trainer import (create_train_state, make_optimizer,
                                          make_train_step)

layers_list = [int(a) for a in sys.argv[1:]] or [8, 1]
for layers in layers_list:
    cfg = TrainConfig(batch_size=256, iters_to_accumulate=4, fused_ce=True,
                      model=ModelConfig(d=512, gnn_n_layers=layers, n_bars=2,
                                        resolution=8, dropout=0.0,
                                        batch_norm=True, use_pallas_gcl=True))
    model = VAE(cfg.model)
    toks, mask = synthetic_batch(np.random.default_rng(0), 256, 2)
    toks, mask = jnp.asarray(toks), jnp.asarray(mask)
    state = create_train_state(model, cfg, jax.random.key(0), toks, mask)
    step = tpu_jit(make_train_step(model, cfg, make_optimizer(cfg)))
    s, l, _ = step(state, toks, mask, jax.random.key(1)); float(l["tot"])
    t0 = time.perf_counter()
    N = 8
    for i in range(N):
        state, losses, _ = step(state, toks, mask, jax.random.key(i))
    float(losses["tot"])
    dt = (time.perf_counter() - t0) / N
    print(json.dumps({"variant": f"fused_ce_L{layers}",
                      "step_s": round(dt, 4),
                      "seq_s": round(256 / dt, 1)}), flush=True)
