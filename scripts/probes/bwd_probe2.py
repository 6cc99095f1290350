"""Round-4 backward-kernel probe: times kernel A (dx/dG/dbias) and kernel B
(dWbig) separately AND together, keeping every output alive (bwd_probe.py
returned only dx, so XLA DCE'd kernel B out of those timings entirely).

Chained-scan timing inside one jit, flagship shape (512 bars, d=512).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))
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
mj = jnp.asarray(mask)
aux = gcl_pallas.build_kernel_aux(mj)


def timeit(label, make_fn, x, dt):
    """make_fn(a) -> scalar-reducible pytree; chained via re-feeding x."""
    x = jnp.asarray(x, dt)

    def body(carry, _):
        out = make_fn(carry)
        # keep every output alive: fold a tiny function of each into carry
        extra = sum(jnp.sum(o[..., :1].astype(jnp.float32)) * 1e-20
                    for o in out[1:])
        return (out[0] + extra.astype(out[0].dtype)), ()

    def run(a):
        out, _ = jax.lax.scan(body, a, None, length=ROUNDS)
        return jnp.sum(out[..., 0, 0, :1].astype(jnp.float32))

    f = tpu_jit(run)
    try:
        s = f(x)
        jax.block_until_ready(s)
        t0 = time.perf_counter()
        s = f(x)
        float(s)
        ms = (time.perf_counter() - t0) / ROUNDS * 1e3
        print(json.dumps({"what": label, "dtype": str(np.dtype(dt)),
                          "ms_per_call": round(ms, 3)}), flush=True)
    except Exception as e:
        print(json.dumps({"what": label, "error": repr(e)[:140]}),
              flush=True)


CASES = os.environ.get("CASES", "full_d4w8,full_d4w4,wonly_w8,wonly_w4,"
                                "aonly_d4,full_d2w4_f32,full_d4w4_f32"
                       ).split(",")

for case in CASES:
    f32 = case.endswith("_f32")
    dt = jnp.float32 if f32 else jnp.bfloat16
    parts = case.replace("_f32", "").split("_")
    kind = parts[0]
    tiles = parts[1] if len(parts) > 1 else "d4w8"
    bbd = int(tiles[tiles.index("d") + 1]) if "d" in tiles else 4
    bbw = int(tiles[tiles.index("w") + 1]) if "w" in tiles else 8
    wbig = gcl_pallas.pack_weights(jnp.asarray(rel_w, dt),
                                   jnp.asarray(root, dt), T, dt)
    gates = jnp.asarray(gate, dt)
    gj = jnp.asarray(g0, dt)

    if kind == "full":
        def fn(a, bbd=bbd, bbw=bbw, gj=gj, gates=gates, wbig=wbig):
            dx, dg, dw, db = gcl_pallas_bwd.gcl_backward_pallas(
                a, aux, gates, wbig, gj.astype(a.dtype),
                bars_per_block_data=bbd, bars_per_block_w=bbw)
            return dx, dg, dw, db
    elif kind == "aonly":
        def fn(a, bbd=bbd, gj=gj, gates=gates, wbig=wbig):
            dx, dg, dw, db = gcl_pallas_bwd.gcl_backward_pallas(
                a, aux, gates, wbig, gj.astype(a.dtype),
                bars_per_block_data=bbd, bars_per_block_w=8)
            return dx, dg, db  # dw dead -> kernel B DCE'd
    else:  # wonly
        def fn(a, bbw=bbw, gj=gj, gates=gates, wbig=wbig):
            dx, dg, dw, db = gcl_pallas_bwd.gcl_backward_pallas(
                a, aux, gates, wbig, gj.astype(a.dtype),
                bars_per_block_data=4, bars_per_block_w=bbw)
            return a, dw  # only kernel B alive (a passthrough for chain)
    timeit(case, fn, x0, dt)
