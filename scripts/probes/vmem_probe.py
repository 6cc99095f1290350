"""Round-4 probe: does raising Mosaic's 16 MB scoped-VMEM budget
(POLY_VMEM_LIMIT_MB + xla_tpu_scoped_vmem_limit_kib on the enclosing jit)
unlock bigger bar tiles, and do they win?

Sweeps the forward kernel (gcl_apply_pallas) and the split backward
(gcl_backward_pallas) at tile sizes that OOM under the default budget:
fp32 forward bb>4, bf16 weight kernel w8, bf16 data kernel d8, and the
single-pass fused backward that previously had no double-buffer headroom.

Chained-scan timing inside one jit, flagship shape (512 bars, d=512).
CASES env selects cases; MB env sets the raised budget (default 64).
"""
import json
import re
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
from polyphemus_tpu import utils
from polyphemus_tpu.ops.kernels import gcl_pallas, gcl_pallas_bwd

T, S, D = 4, 32, 512
B, NB = 256, 2
ROUNDS = int(os.environ.get("ROUNDS", "20"))
MB = os.environ.get("MB", "64")

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
    x = jnp.asarray(x, dt)

    def body(carry, _):
        out = make_fn(carry)
        outs = out if isinstance(out, (tuple, list)) else (out,)
        extra = sum((jnp.sum(o[..., :1].astype(jnp.float32)) * 1e-20
                     for o in outs[1:]), jnp.float32(0.0))
        return (outs[0] + extra.astype(outs[0].dtype)), ()

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
                          "vmem_mb": os.environ.get("POLY_VMEM_LIMIT_MB"),
                          "ms_per_call": round(ms, 3)}), flush=True)
    except Exception as e:
        print(json.dumps({"what": label, "error": repr(e)[:200]}),
              flush=True)


CASES = os.environ.get(
    "CASES",
    "fwd_b4_f32,fwd_b8_f32:raise,fwd_b8,fwd_b16:raise").split(",")

for case in CASES:
    case, _, raised = case.partition(":")
    if raised:
        os.environ["POLY_VMEM_LIMIT_MB"] = MB
    else:
        os.environ.pop("POLY_VMEM_LIMIT_MB", None)
    f32 = case.endswith("_f32")
    dt = jnp.float32 if f32 else jnp.bfloat16
    parts = case.replace("_f32", "").split("_")
    kind, tiles = parts[0], (parts[1] if len(parts) > 1 else "")
    wbig = gcl_pallas.pack_weights(jnp.asarray(rel_w, dt),
                                   jnp.asarray(root, dt), T, dt)
    gates = jnp.asarray(gate, dt)
    gj = jnp.asarray(g0, dt)
    bias = jnp.zeros((D,), dt)

    if kind == "fwd":
        bb = int(tiles[1:])

        def fn(a, bb=bb, gates=gates, wbig=wbig, bias=bias):
            return gcl_pallas.gcl_apply_pallas(a, aux, gates, wbig, bias,
                                               bars_per_block=bb)
    elif kind == "full":  # split backward, tiles like d4w8 / d16w8
        m = re.fullmatch(r"d(\d+)w(\d+)", tiles)
        if m is None:
            raise SystemExit(f"bad full-case tile spec {tiles!r}: want dNwM")
        bbd, bbw = int(m.group(1)), int(m.group(2))

        def fn(a, bbd=bbd, bbw=bbw, gj=gj, gates=gates, wbig=wbig):
            return gcl_pallas_bwd.gcl_backward_pallas(
                a, aux, gates, wbig, gj.astype(a.dtype),
                bars_per_block_data=bbd, bars_per_block_w=bbw)
    else:  # fused single-pass backward, tiles like b4
        bb = int(tiles[1:])

        def fn(a, bb=bb, gj=gj, gates=gates, wbig=wbig):
            return gcl_pallas_bwd.gcl_backward_fused(
                a, aux, gates, wbig, gj.astype(a.dtype), bars_per_block=bb)
    timeit(case + (":raise" if raised else ""), fn, x0, dt)
