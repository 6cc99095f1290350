"""LMD16 kernel-parameter sweep (VERDICT r1 item 10): is bars_per_block=4
(GCL) / 8 (chord tail) still right at 16 bars?

Usage: python scripts/lmd16_sweep.py [gcl_bb:tail_bb ...]
Default points: 4:8 8:8 16:8 8:16 16:16 2:8
"""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/polyphemus_jax"))
import jax.numpy as jnp
from polyphemus_tpu.config import ModelConfig
from polyphemus_tpu.generate import make_generator
from polyphemus_tpu.models import VAE

points = sys.argv[1:] or ["4:8", "8:8", "16:8", "8:16", "16:16", "2:8"]
N_BARS = int(os.environ.get("POLY_SWEEP_BARS", 16))
BATCH = int(os.environ.get("POLY_SWEEP_BATCH", 64))

variables = None
for pt in points:
    gcl_bb, tail_bb = (int(x) for x in pt.split(":"))
    cfg = ModelConfig(d=512, gnn_n_layers=8, n_bars=N_BARS, resolution=8,
                      dropout=0.0, batch_norm=True,
                      gcl_bars_per_block=gcl_bb,
                      tail_bars_per_block=tail_bb)
    model = VAE(cfg)
    if variables is None:
        toks0 = jnp.zeros((1, N_BARS, 4, 32, 16, 2), jnp.int32)
        mask0 = jnp.zeros((1, N_BARS, 4, 32), bool).at[:, :, 0, 0].set(True)
        variables = jax.jit(lambda m=model: m.init(
            {"params": jax.random.key(0), "sample": jax.random.key(1)},
            toks0, mask0, deterministic=True))()
    gen = make_generator(model, variables, pallas=True)
    z = jax.random.normal(jax.random.key(2), (BATCH, cfg.d))
    try:
        jax.block_until_ready(gen(z))
    except Exception as e:
        print(json.dumps({"point": pt, "error": str(e)[:160]}), flush=True)
        continue
    t0 = time.perf_counter()
    N = 5
    for _ in range(N):
        out = gen(z)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / N
    print(json.dumps({"point": pt, "ms_per_batch": round(dt * 1e3, 2),
                      "seq_s": round(BATCH / dt, 1)}), flush=True)
