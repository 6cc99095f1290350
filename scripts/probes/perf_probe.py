"""One-shot TPU perf probe: generation fp32 vs bf16, train step/s.

Run alone (single CPU core + single TPU): python scripts/probes/perf_probe.py
"""
import json
import os
import sys
import time

# repo root on sys.path WITHOUT touching PYTHONPATH (overriding PYTHONPATH
# drops /root/.axon_site and the TPU plugin never registers)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

os.environ.setdefault("POLY_COMPILE_CACHE",
                      os.path.expanduser("~/.cache/polyphemus_jax"))
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["POLY_COMPILE_CACHE"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from polyphemus_tpu.utils import tpu_jit
from polyphemus_tpu.config import ModelConfig, TrainConfig
from polyphemus_tpu.data.dataset import synthetic_batch
from polyphemus_tpu.generate import make_generator
from polyphemus_tpu.models import VAE
from polyphemus_tpu.train.trainer import (create_train_state, make_optimizer,
                                          make_train_step)

BATCH = 256
cfg = ModelConfig(d=512, gnn_n_layers=8, n_bars=2, resolution=8,
                  dropout=0.0, batch_norm=True)
model = VAE(cfg)

toks0 = jnp.zeros((1, 2, 4, 32, 16, 2), jnp.int32)
mask0 = jnp.zeros((1, 2, 4, 32), bool).at[:, :, 0, 0].set(True)
variables = tpu_jit(lambda: model.init(
    {"params": jax.random.key(0), "sample": jax.random.key(1)},
    toks0, mask0, deterministic=True))()

def timeit(fn, args, rounds=5):
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(rounds):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / rounds

results = {}

def emit(k, v):
    results[k] = v
    print(json.dumps({k: round(v, 4)}), flush=True)

z = jax.random.normal(jax.random.key(7), (BATCH, cfg.d))
gen32 = make_generator(model, variables)
dt = timeit(gen32, (z,))
emit("gen_fp32_seq_s", BATCH / dt)

gen16 = make_generator(model, variables, bf16=True)
dt = timeit(gen16, (z,))
emit("gen_bf16_seq_s", BATCH / dt)

# token agreement between fp32 and bf16 paths
m32, t32 = [np.asarray(x) for x in gen32(z)]
m16, t16 = [np.asarray(x) for x in gen16(z)]
emit("bf16_mask_agree", float((m32 == m16).mean()))
emit("bf16_token_agree", float(
    (t32[m32] == t16[m32]).mean()) if m32.any() else 1.0)

# train step throughput
# batch 256 without accumulation OOMs 16G HBM (measured 21.8G);
# 4 microbatches of 64 fit
tcfg = TrainConfig(batch_size=BATCH, model=cfg, iters_to_accumulate=4)
toks, mask = synthetic_batch(np.random.default_rng(0), BATCH, cfg.n_bars)
toks, mask = jnp.asarray(toks), jnp.asarray(mask)
state = create_train_state(model, tcfg, jax.random.key(0), toks, mask)
step = tpu_jit(make_train_step(model, tcfg, make_optimizer(tcfg)))
jax.block_until_ready(step(state, toks, mask, jax.random.key(1)))
t0 = time.perf_counter()
N = 5
for i in range(N):
    state, losses, accs = step(state, toks, mask, jax.random.key(i))
jax.block_until_ready(losses["tot"])
dt = (time.perf_counter() - t0) / N
emit("train_step_s", dt)
emit("train_seq_s", BATCH / dt)

print(json.dumps({k: round(v, 4) for k, v in results.items()}))
