"""Validate + benchmark the fused Pallas GCL on real TPU vs the XLA path."""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/polyphemus_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from polyphemus_tpu.ops import lattice
from polyphemus_tpu.ops.kernels import gcl_pallas

T, S, D = 4, 32, 512
B, NB, LAYERS = 256, 2, 8
rng = np.random.default_rng(0)
mask = rng.random((B, NB, T, S)) < 0.15
mask[..., 0, 0] = True
x0 = (rng.standard_normal((B, NB, T, S, D)).astype(np.float32) * mask[..., None])
gate = rng.standard_normal((S, D)).astype(np.float32)
rel_w = (rng.standard_normal((LAYERS, 6, D, D)) * (D ** -0.5)).astype(np.float32)
root = (rng.standard_normal((LAYERS, D, D)) * (D ** -0.5)).astype(np.float32)
bias = (rng.standard_normal((LAYERS, D)) * 0.1).astype(np.float32)

mj = jnp.asarray(mask)

def run_xla(x, dtype):
    x = x.astype(dtype)
    nbr = lattice.build_neighbors(mj)
    g = jnp.asarray(gate, dtype)
    for i in range(LAYERS):
        x = lattice.gcl_apply(x, mj, nbr, g, jnp.asarray(rel_w[i], dtype),
                              jnp.asarray(root[i], dtype), jnp.asarray(bias[i], dtype))
        x = jax.nn.relu(x)
    return x

def run_pallas(x, dtype, bb):
    x = x.astype(dtype)
    aux = gcl_pallas.build_kernel_aux(mj)
    g = jnp.asarray(gate, dtype)
    for i in range(LAYERS):
        wbig = gcl_pallas.pack_weights(jnp.asarray(rel_w[i], dtype), jnp.asarray(root[i], dtype), T, dtype)
        x = gcl_pallas.gcl_apply_pallas(x, aux, g, wbig, jnp.asarray(bias[i], dtype),
                                        bars_per_block=bb, interpret=False)
        x = jax.nn.relu(x)
    return x

xj = jnp.asarray(x0)

def bench(f, *args, rounds=10):
    g = jax.jit(f, static_argnums=tuple(range(1, len(args) + 1)))
    jax.block_until_ready(g(xj, *args))
    t0 = time.perf_counter()
    for _ in range(rounds):
        out = g(xj, *args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / rounds, out

for dt_name, dt in [("bf16", jnp.bfloat16), ("f32", jnp.float32)]:
    t_x, out_x = bench(run_xla, dt)
    print(json.dumps({"path": "xla", "dtype": dt_name, "ms": round(t_x * 1e3, 2)}), flush=True)
    for bb in (4, 8):
        try:
            t_p, out_p = bench(run_pallas, dt, bb)
            err = float(jnp.max(jnp.abs(out_p.astype(jnp.float32) - out_x.astype(jnp.float32))))
            scale = float(jnp.max(jnp.abs(out_x.astype(jnp.float32))))
            print(json.dumps({"path": "pallas", "dtype": dt_name, "bb": bb,
                              "ms": round(t_p * 1e3, 2), "rel_err": round(err / max(scale, 1e-9), 5)}), flush=True)
        except Exception as e:
            print(json.dumps({"path": "pallas", "dtype": dt_name, "bb": bb,
                              "error": str(e)[-300:]}), flush=True)
