"""Headline benchmark: batched LMD2 generation throughput on one TPU chip.

Measures the full z -> structure -> lattice -> content -> token-ids pipeline
(the reference's generate_music path, /root/reference/generate.py:21-37,
minus host MIDI rendering) on the flagship LMD2 config (d=512, 8 GNN layers,
2 bars, batch 256). North star (BASELINE.json): >= 100 sequences/sec/chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "seq/s", "vs_baseline": N}
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BASELINE_SEQ_PER_SEC = 100.0  # BASELINE.json north-star target
BATCH = int(os.environ.get("POLY_BENCH_BATCH", 256))
# 20 calls per timed pass: the tunnel's block_until_ready sync costs a
# fixed ~25 ms per PASS (CLAUDE.md timing methodology) — at 5 rounds that
# inflated every call by ~5 ms vs the profiler's dense 17.6 ms module
# timeline; at 20 it amortizes to ~1.2 ms/call. Still dispatch-inclusive
# (conservative vs the chained-scan device-compute number in bench_all).
ROUNDS = int(os.environ.get("POLY_BENCH_ROUNDS", 20))
D_MODEL = int(os.environ.get("POLY_BENCH_D", 512))
N_LAYERS = int(os.environ.get("POLY_BENCH_LAYERS", 8))
# fused Pallas GCL kernel on by default (set =0 for the plain XLA path)
USE_PALLAS = os.environ.get("POLY_BENCH_PALLAS", "1") == "1"
USE_BF16 = os.environ.get("POLY_BENCH_BF16", "0") == "1"


def _enable_compile_cache():
    import jax

    cache_dir = os.environ.get(
        "POLY_COMPILE_CACHE", os.path.expanduser("~/.cache/polyphemus_jax"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def main() -> None:
    _enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from polyphemus_tpu.config import ModelConfig
    from polyphemus_tpu.generate import make_generator
    from polyphemus_tpu.models import VAE
    from polyphemus_tpu.utils import wait_for_backend

    # A wedged TPU tunnel blocks the first device query indefinitely while it
    # drains a killed compile (~30 min observed); wait it out, don't hang.
    wait_for_backend(float(os.environ.get("POLY_BENCH_TUNNEL_WAIT_S", 2400)))

    cfg = ModelConfig(d=D_MODEL, gnn_n_layers=N_LAYERS, n_bars=2,
                      resolution=8, dropout=0.0, batch_norm=True)
    model = VAE(cfg)

    toks0 = jnp.zeros((1, cfg.n_bars, cfg.n_tracks, cfg.n_timesteps, 16, 2),
                      jnp.int32)
    mask0 = jnp.zeros((1, cfg.n_bars, cfg.n_tracks, cfg.n_timesteps),
                      bool).at[:, :, 0, 0].set(True)
    variables = jax.jit(
        lambda: model.init(
            {"params": jax.random.key(0), "sample": jax.random.key(1)},
            toks0, mask0, deterministic=True)
    )()

    use_pallas = USE_PALLAS and jax.default_backend() == "tpu"
    gen = make_generator(model, variables, bf16=USE_BF16, pallas=use_pallas)

    zs = [jax.random.normal(jax.random.key(100 + i), (BATCH, cfg.d))
          for i in range(ROUNDS)]
    jax.block_until_ready(gen(zs[0]))  # compile

    # median of 3 passes (a single pass on the tunnel is noisy; median,
    # not best-of — VERDICT r2 weak item 6)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for z in zs:
            out = gen(z)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))

    seq_per_sec = ROUNDS * BATCH / dt
    from polyphemus_tpu import flops as F

    gflops = F.generation_flops_per_seq(cfg) / 1e9
    print(json.dumps({
        "metric": "lmd2_batched_generation",
        "value": round(seq_per_sec, 2),
        "unit": "seq/s",
        "vs_baseline": round(seq_per_sec / BASELINE_SEQ_PER_SEC, 3),
        "gflops_per_seq": round(gflops, 2),
        "model_tflops": round(seq_per_sec * gflops / 1e3, 1),
        "mfu_pct": round(F.mfu(seq_per_sec,
                               F.generation_flops_per_seq(cfg)), 1),
    }))


if __name__ == "__main__":
    sys.exit(main())
