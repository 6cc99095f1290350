"""Round-5 micro-probe: is the LMD16 metrics/CE slowdown caused by the
leading-dim shape? The per-bar-normalized profile diff shows the SAME
slot-scan ops (log_softmax -> one-hot nll + argmax compare + masked sums)
costing ~7x more per position at (16,16,4,32,V) [LMD16 microbatch] than
at (128,2,4,32,V) [LMD2 microbatch], with identical element counts.

Runs the slot body's depth-independent tail at three equivalent shapes
(chained scan timing, forward + backward like the train step).
"""
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

V = 131
SHAPES = [(128, 2, 4, 32), (16, 16, 4, 32), (256, 4, 32), (32768,)]


def run(lead):
    f32 = jnp.float32
    x = jax.random.normal(jax.random.key(0), lead + (512,), jnp.bfloat16)
    w = jax.random.normal(jax.random.key(1), (512, V), jnp.bfloat16)
    pt = jax.random.randint(jax.random.key(2), lead, 0, V)
    act = jnp.ones(lead, bool)

    import functools

    @functools.partial(jax.jit, static_argnums=0)
    def chained(n):
        def b(carry, _):
            def loss_fn(xx):
                logits = xx @ w
                lp = jax.nn.log_softmax(logits.astype(f32), axis=-1)
                nll = -jnp.sum(lp * jax.nn.one_hot(pt, V, dtype=f32),
                               axis=-1)
                wgt = act & (pt != 0)
                cp = (jnp.argmax(lp, axis=-1) == pt) & wgt
                return (jnp.sum(nll * wgt.astype(f32))
                        + jnp.sum(cp.astype(f32)))

            l, g = jax.value_and_grad(loss_fn)(x)
            return carry + l + g.astype(f32).sum(), None

        acc, _ = jax.lax.scan(b, jnp.zeros((), f32), None, length=n)
        return acc

    N = 20
    float(chained(N))  # compile + warm
    t0 = time.perf_counter()
    float(chained(N))
    dt = (time.perf_counter() - t0) / N
    print(json.dumps({"lead": list(lead), "ms": round(dt * 1e3, 3)}),
          flush=True)


for lead in SHAPES:
    run(lead)
