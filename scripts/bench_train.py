"""Training-step benchmark (fp32 + bf16), merged into bench_report.json.

Split out of bench_all.py because the two train graphs compile for several
minutes each through the tunnel and the sandbox caps commands at 10 min —
run this after bench_all (which covers the generation stages).

`python scripts/bench_train.py lmd16` benches the 16-bar flagship
training step instead (examples/training_lmd16.json shape: batch 64,
accumulate 4), writing train_lmd16_* keys. Dtype args select the runs:
no dtype arg = bf16 only for lmd16 (fp32+bf16 for lmd2); pass
`fp32`, `bf16`, or both explicitly to override.
"""
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("POLY_COMPILE_CACHE",
                      os.path.expanduser("~/.cache/polyphemus_jax"))
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["POLY_COMPILE_CACHE"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from polyphemus_tpu import flops as F
from polyphemus_tpu.config import ModelConfig, TrainConfig
from polyphemus_tpu.data.dataset import synthetic_batch
from polyphemus_tpu.models import VAE
from polyphemus_tpu.train.trainer import (create_train_state, make_optimizer,
                                          make_train_step)
from polyphemus_tpu.utils import wait_for_backend, tpu_jit

# a wedged TPU tunnel blocks the first device query indefinitely while it
# drains a killed compile (~30 min observed); wait it out, don't hang
wait_for_backend(float(os.environ.get("POLY_BENCH_TUNNEL_WAIT_S", 2400)))
PALLAS = jax.default_backend() == "tpu"
LMD16 = "lmd16" in sys.argv[1:]
N_BARS = 16 if LMD16 else 2
# LMD16 trains at the examples/training_lmd16.json shape: batch 64,
# accumulate 4 (microbatch 16 x 16 bars = 256 bars, ~11 G activations)
BATCH = 64 if LMD16 else 256
mcfg = ModelConfig(d=512, gnn_n_layers=8, n_bars=N_BARS, resolution=8,
                   dropout=0.0, batch_norm=True, use_pallas_gcl=PALLAS)
model = VAE(mcfg)
tcfg = TrainConfig(batch_size=BATCH, iters_to_accumulate=4, model=mcfg)
toks, mask = synthetic_batch(np.random.default_rng(0), BATCH, N_BARS)
toks, mask = jnp.asarray(toks), jnp.asarray(mask)
state0 = create_train_state(model, tcfg, jax.random.key(0), toks, mask)

report_path = "bench_report.json"
report = json.load(open(report_path)) if os.path.exists(report_path) else {}
flops_step = F.train_step_flops_per_seq(mcfg)
report["train_lmd16_gflops_per_seq" if LMD16
       else "train_gflops_per_seq"] = round(flops_step / 1e9, 2)


def run(tag, cfg):
    step = tpu_jit(make_train_step(model, cfg, make_optimizer(cfg)))
    state = state0
    s, l, _ = step(state, toks, mask, jax.random.key(1))
    float(l["tot"])  # sync (scalar readback; block_until_ready unreliable)
    times = []
    for _ in range(3):  # median of 3 passes (not best-of — VERDICT r2)
        t0 = time.perf_counter()
        # 10 steps/pass: the tunnel's scalar-readback sync costs a fixed
        # ~25 ms per PASS — at 5 steps it inflated every step by ~5 ms vs
        # the profiler's 158.6 ms device time (PERFORMANCE.md round 3)
        N = 10
        for i in range(N):
            state, losses, _ = step(state, toks, mask, jax.random.key(i))
        float(losses["tot"])
        times.append((time.perf_counter() - t0) / N)
    dt = float(np.median(times))
    prefix = "train_lmd16" if LMD16 else "train"
    suffix = "" if tag == "fp32" else "_bf16"
    report.setdefault("spread", {})[f"{prefix}_step_s{suffix}"] = round(
        (max(times) - min(times)) / dt, 3)
    report[f"{prefix}_step_s{suffix}"] = round(dt, 4)
    report[f"{prefix}_seq_s{suffix}"] = round(BATCH / dt, 1)
    report[f"{prefix}_mfu_pct{suffix}"] = round(
        F.mfu(BATCH / dt, flops_step), 1)
    print(json.dumps({k: v for k, v in report.items() if "train" in k}),
          flush=True)
    with open(report_path, "w") as f:
        json.dump(report, f, indent=2)


tags = [a for a in sys.argv[1:] if a in ("fp32", "bf16")] or (
    ["bf16"] if LMD16 else ["fp32", "bf16"])
for tag in tags:
    if tag == "fp32":
        # fp32 LMD16 cannot run the config's accumulate 4: its microbatch
        # (16 seqs x 16 bars = 256 bars) hits the same fp32-forward-kernel
        # scoped-VMEM OOM as LMD2 at accumulate 2 (PERFORMANCE.md round 3).
        # accumulate 8 gives the 128-bar microbatch the fp32 kernels are
        # proven on. NOTE: this graph's first compile exceeds the 10-min
        # sandbox command cap (the persistent cache stores only completed
        # module compiles, so a killed compile restarts from zero) — run
        # it somewhere without the cap, or stick to the bf16 default.
        cfg_t = (dataclasses.replace(tcfg, iters_to_accumulate=8)
                 if LMD16 else tcfg)
    else:
        # bf16 halves activation HBM, so microbatch 128 (accumulate 2)
        # fits and beats accumulate 4 by ~8% (scripts/probes/train_probe11.py:
        # a4 0.1676, a2 0.1537, a1 0.1597 — fixed per-microbatch costs
        # amortize over twice the rows). fp32 still needs accumulate 4.
        # LMD16 keeps accumulate 4: its microbatch is already 256 bars
        # and accumulate 2 measured WORSE (0.3444 vs 0.3273 s/step) —
        # same shape of diminishing returns as LMD2's accumulate 1.
        cfg_t = dataclasses.replace(
            tcfg, bf16=True,
            iters_to_accumulate=4 if LMD16 else 2)
    run(tag, cfg_t)
