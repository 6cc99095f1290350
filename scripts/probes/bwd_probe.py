"""Layer-level timing of the GCL backward kernels on the real TPU.

Compares: forward-only, two-kernel backward (round 2), fused backward
(round 3) at several bars_per_block, in bf16 and fp32, flagship shape
(d=512, batch 256 x 2 bars = 512 bars). Chained-scan timing inside one jit
(the only reliable method through the tunnel — PERFORMANCE.md methodology).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/polyphemus_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from polyphemus_tpu.utils import tpu_jit
from polyphemus_tpu.ops.kernels import gcl_pallas, gcl_pallas_bwd

T, S, D = 4, 32, 512
B, NB = 256, 2
ROUNDS = int(os.environ.get("ROUNDS", "20"))

rng = np.random.default_rng(0)
mask = rng.random((B, NB, T, S)) < 0.15
mask[..., 0, 0] = True
x0 = (rng.standard_normal((B, NB, T, S, D)).astype(np.float32)
      * mask[..., None])
g0 = rng.standard_normal((B, NB, T, S, D)).astype(np.float32)
gate = rng.standard_normal((S, D)).astype(np.float32)
rel_w = (rng.standard_normal((6, D, D)) * (D ** -0.5)).astype(np.float32)
root = (rng.standard_normal((D, D)) * (D ** -0.5)).astype(np.float32)
bias = (rng.standard_normal((D,)) * 0.1).astype(np.float32)
mj = jnp.asarray(mask)
aux = gcl_pallas.build_kernel_aux(mj)


def chain(fn, x, rounds):
    """Run fn rounds times chained (out feeds in), one jit, scalar out."""
    def body(carry, _):
        out = fn(carry)
        return out, ()
    out, _ = jax.lax.scan(body, x, None, length=rounds)
    return jnp.sum(out[..., 0, 0, :1].astype(jnp.float32))


def timeit(label, fn, x, dt):
    x = jnp.asarray(x, dt)
    f = tpu_jit(lambda a: chain(fn, a, ROUNDS))
    s = f(x)
    jax.block_until_ready(s)  # compile + warm
    t0 = time.perf_counter()
    s = f(x)
    float(s)
    ms = (time.perf_counter() - t0) / ROUNDS * 1e3
    print(json.dumps({"what": label, "dtype": str(np.dtype(dt)),
                      "ms_per_call": round(ms, 3)}), flush=True)
    return ms


for dt in (jnp.bfloat16, jnp.float32):
    wbig = gcl_pallas.pack_weights(jnp.asarray(rel_w, dt),
                                   jnp.asarray(root, dt), T, dt)
    gates = jnp.asarray(gate, dt)
    gj = jnp.asarray(g0, dt)
    bb_fwd = 8 if dt == jnp.bfloat16 else 4

    timeit("fwd", lambda a: gcl_pallas.gcl_apply_pallas(
        a, aux, gates, wbig, jnp.asarray(bias, dt),
        bars_per_block=bb_fwd), x0, dt)

    if dt == jnp.bfloat16:
        for bbd, bbw in ((4, 8), (8, 8), (8, 16), (2, 8)):
            def bwd_old(a, bbd=bbd, bbw=bbw):
                dx, dg, dw, db = gcl_pallas_bwd.gcl_backward_pallas(
                    a, aux, gates, wbig, gj.astype(a.dtype),
                    bars_per_block_data=bbd, bars_per_block_w=bbw)
                return dx
            try:
                timeit(f"bwd_two_kernel_d{bbd}_w{bbw}", bwd_old, x0, dt)
            except Exception as e:
                print(json.dumps({"what": f"bwd_two_kernel_d{bbd}_w{bbw}",
                                  "error": repr(e)[:160]}), flush=True)
        # the single-pass fused backward (VMEM-viable in bf16 only) — the
        # 5.1 ms vs 3.6 ms negative result cited in gcl_pallas.py and
        # PERFORMANCE.md comes from exactly this measurement
        for bbf in (2, 4):
            def bwd_fused(a, bbf=bbf):
                dx, dg, dw, db = gcl_pallas_bwd.gcl_backward_fused(
                    a, aux, gates, wbig, gj.astype(a.dtype),
                    bars_per_block=bbf)
                return dx
            try:
                timeit(f"bwd_fused_bb{bbf}", bwd_fused, x0, dt)
            except Exception as e:
                print(json.dumps({"what": f"bwd_fused_bb{bbf}",
                                  "error": repr(e)[:160]}), flush=True)
    else:
        def bwd_old(a):
            dx, dg, dw, db = gcl_pallas_bwd.gcl_backward_pallas(
                a, aux, gates, wbig, gj.astype(a.dtype),
                bars_per_block_data=2, bars_per_block_w=4)
            return dx

        timeit("bwd_two_kernel", bwd_old, x0, dt)
