"""Round-3 probe: bf16 train-step decomposition after the aux-residual fix.

Variants (batch 256, Pallas GCL, fused CE, bf16):
  L8_a4   full step, accum 4 (round-2 headline config)
  L1_a4   gnn_n_layers=1 -> depth-independent cost
  L8_a1   accum 1 (one microbatch of 256)
  L8_a2   accum 2
  L8_nm   with_metrics=False
  L8_f32loss  fused_ce=False (logits path) for reference
"""
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
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

toks, mask = synthetic_batch(np.random.default_rng(0), 256, 2)
toks, mask = jnp.asarray(toks), jnp.asarray(mask)


def run(tag, layers=8, accum=4, metrics=True, fused_ce=True):
    cfg = TrainConfig(
        batch_size=256, iters_to_accumulate=accum, bf16=True,
        fused_ce=fused_ce,
        model=ModelConfig(d=512, gnn_n_layers=layers, n_bars=2, resolution=8,
                          dropout=0.0, batch_norm=True, use_pallas_gcl=True))
    model = VAE(cfg.model)
    state = create_train_state(model, cfg, jax.random.key(0), toks, mask)
    step = tpu_jit(make_train_step(model, cfg, make_optimizer(cfg),
                                   with_metrics=metrics))
    s, l, _ = step(state, toks, mask, jax.random.key(1))
    float(l["tot"])
    t0 = time.perf_counter()
    N = 8
    for i in range(N):
        state, losses, _ = step(state, toks, mask, jax.random.key(i))
    float(losses["tot"])
    dt = (time.perf_counter() - t0) / N
    print(json.dumps({"tag": tag, "step_s": round(dt, 4),
                      "seq_s": round(256 / dt, 1)}), flush=True)


which = sys.argv[1:] or ["L8_a4", "L1_a4", "L8_a1", "L8_a2", "L8_nm"]
for tag in which:
    if tag == "L8_a4":
        run(tag)
    elif tag == "L1_a4":
        run(tag, layers=1)
    elif tag == "L8_a1":
        run(tag, accum=1)
    elif tag == "L8_a2":
        run(tag, accum=2)
    elif tag == "L8_nm":
        run(tag, metrics=False)
    elif tag == "L8_f32loss":
        run(tag, fused_ce=False)
