"""Round-4 probe: fp32 accumulate-2 via the raised Mosaic VMEM budget.

The fp32 fwd kernel's scoped stack landed 20 KB over the default 16 MB
limit at a 256-bar microbatch (PERFORMANCE.md round 3), pinning fp32 at
accumulate-4. With POLY_VMEM_LIMIT_MB set, the kernels may exceed 16 MB
and bigger fp32 tiles become available too.

Usage: [MB=64] python scripts/probes/train_probe12.py [tags...]
Tags: a4 (baseline), a2 (raised limit), a2_bb8 (raised + fwd bb=8),
      bf16_a2 (bf16 baseline), bf16_a2_raised (bf16 + d8w8 tiles) ...
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
from polyphemus_tpu import utils
from polyphemus_tpu.config import ModelConfig, TrainConfig
from polyphemus_tpu.data.dataset import synthetic_batch
from polyphemus_tpu.models import VAE
from polyphemus_tpu.train.trainer import (create_train_state, make_optimizer,
                                          make_train_step)

MB = os.environ.get("MB", "64")
toks, mask = synthetic_batch(np.random.default_rng(0), 256, 2)
toks, mask = jnp.asarray(toks), jnp.asarray(mask)


def run(tag, accum, bf16, raise_mb=None, fwd_bb=None, bwd_d=None,
        bwd_w=None, with_metrics=True):
    for k in ("POLY_VMEM_LIMIT_MB", "POLY_GCL_FWD_BB",
              "POLY_GCL_BWD_BB_DATA", "POLY_GCL_BWD_BB_W"):
        os.environ.pop(k, None)
    if raise_mb:
        os.environ["POLY_VMEM_LIMIT_MB"] = str(raise_mb)
    if fwd_bb:
        os.environ["POLY_GCL_FWD_BB"] = str(fwd_bb)
    if bwd_d:
        os.environ["POLY_GCL_BWD_BB_DATA"] = str(bwd_d)
    if bwd_w:
        os.environ["POLY_GCL_BWD_BB_W"] = str(bwd_w)
    cfg = TrainConfig(
        batch_size=256, iters_to_accumulate=accum, bf16=bf16,
        model=ModelConfig(d=512, gnn_n_layers=8, n_bars=2, resolution=8,
                          dropout=0.0, batch_norm=True, use_pallas_gcl=True))
    model = VAE(cfg.model)
    state = create_train_state(model, cfg, jax.random.key(0), toks, mask)
    step = tpu_jit(make_train_step(model, cfg, make_optimizer(cfg),
                                   with_metrics=with_metrics))
    try:
        s, l, _ = step(state, toks, mask, jax.random.key(1))
        float(l["tot"])
        t0 = time.perf_counter()
        N = 10
        for i in range(N):
            state, losses, _ = step(state, toks, mask, jax.random.key(i))
        float(losses["tot"])
        dt = (time.perf_counter() - t0) / N
        print(json.dumps({"tag": tag, "step_s": round(dt, 4),
                          "seq_s": round(256 / dt, 1)}), flush=True)
    except Exception as e:
        print(json.dumps({"tag": tag, "error": repr(e)[:200]}), flush=True)


CASES = {
    "a4": dict(accum=4, bf16=False),
    # fp32 sweep winners: fwd stays bb4 (bb8 3.416 vs 3.252 ms), bwd d4w4
    # (4.605 vs baseline d2w2's 5.103 ms / 512 bars)
    "a2": dict(accum=2, bf16=False, raise_mb=MB, bwd_d=4, bwd_w=4),
    "a2d": dict(accum=2, bf16=False, raise_mb=MB),
    "a4r": dict(accum=4, bf16=False, raise_mb=MB, bwd_d=4, bwd_w=4),
    "a4r0": dict(accum=4, bf16=False, raise_mb=MB),
    "bf16_a2": dict(accum=2, bf16=True),
    # winners of the standalone raised-VMEM sweeps (vmem_probe.py):
    # fwd bb16 2.864 vs 2.989 ms, bwd d4w8 4.222 vs 4.47 ms / 512 bars
    "bf16_a2_raised": dict(accum=2, bf16=True, raise_mb=MB, fwd_bb=16,
                           bwd_d=4, bwd_w=8),
    # Round-5 (VERDICT r4 item 7): metrics-free graphs to fit the fp32 a2
    # first compile under the sandbox's 10-min command cap. a4_nm is the
    # like-for-like baseline (metrics cost ≠ 0 in-step).
    "a4_nm": dict(accum=4, bf16=False, with_metrics=False),
    "a2_nm": dict(accum=2, bf16=False, raise_mb=MB, bwd_d=4, bwd_w=4,
                  with_metrics=False),
    "a2_nm_def": dict(accum=2, bf16=False, raise_mb=MB,
                      with_metrics=False),
}

for tag in (sys.argv[1:] or ["a4", "a2"]):
    run(tag, **CASES[tag])
