"""Round-2: fwd/bwd split + bf16 on the fused-CE training path.

Variants (argv): fwd grad bf16
  fwd  — forward loss only, batch 256, no accumulation (no grad, no Adam);
  grad — value_and_grad, batch 256 single microbatch (no Adam update);
  bf16 — full train step, bf16 compute policy, accumulate 4.
"""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/polyphemus_jax"))
import jax.numpy as jnp, numpy as np
from polyphemus_tpu.utils import tpu_jit
from polyphemus_tpu.config import ModelConfig, TrainConfig
from polyphemus_tpu.data.dataset import synthetic_batch
from polyphemus_tpu.models import VAE
from polyphemus_tpu.train.trainer import (_forward_loss, create_train_state,
                                          make_optimizer, make_train_step)

mcfg = ModelConfig(d=512, gnn_n_layers=8, n_bars=2, resolution=8,
                   dropout=0.0, batch_norm=True, use_pallas_gcl=True)
cfg = TrainConfig(batch_size=256, iters_to_accumulate=4, fused_ce=True,
                  model=mcfg)
model = VAE(mcfg)
toks, mask = synthetic_batch(np.random.default_rng(0), 256, 2)
toks, mask = jnp.asarray(toks), jnp.asarray(mask)
state = create_train_state(model, cfg, jax.random.key(0), toks, mask)


def chain_time(tag, scalar_fn, n=8):
    """Time n data-chained evaluations inside ONE jit (pure device compute;
    the tunnel backend's block_until_ready does not reliably sync, so the
    chain + one scalar readback is the only trustworthy method — see
    PERFORMANCE.md timing-methodology table)."""
    key = jax.random.key(1)

    def chained(m):
        def body(c, i):
            r = jax.random.fold_in(key, i + (c * 0).astype(jnp.int32))
            return scalar_fn(r) + c * 0, None

        out, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(m))
        return out

    f1 = tpu_jit(lambda: chained(1))
    fn_ = tpu_jit(lambda: chained(n))
    float(f1()); float(fn_())  # compile both
    t0 = time.perf_counter(); float(f1()); t1 = time.perf_counter()
    float(fn_()); t2 = time.perf_counter()
    per = ((t2 - t1) - (t1 - t0)) / (n - 1)
    print(json.dumps({"variant": tag, "time_s": round(per, 4)}), flush=True)


def v_fwd():
    def scalar(r):
        return _forward_loss(model, cfg, state.params, state.batch_stats,
                             toks, mask, r, jnp.zeros(()), True,
                             with_metrics=False)[0]

    chain_time("fwd256", scalar)


def v_grad():
    def scalar(r):
        g = jax.grad(lambda p: _forward_loss(
            model, cfg, p, state.batch_stats, toks, mask, r, jnp.zeros(()),
            True, with_metrics=False)[0])(state.params)
        leaves = jax.tree_util.tree_leaves(g)
        return sum(jnp.sum(l[..., :1]) for l in leaves).astype(jnp.float32)

    chain_time("grad256", scalar)


def v_bf16():
    import dataclasses
    cfg_bf = dataclasses.replace(cfg, bf16=True)
    step = tpu_jit(make_train_step(model, cfg_bf, make_optimizer(cfg_bf)))
    st = state
    st, l, _ = step(st, toks, mask, jax.random.key(1)); float(l["tot"])
    t0 = time.perf_counter()
    N = 8
    for i in range(N):
        st, losses, _ = step(st, toks, mask, jax.random.key(i))
    float(losses["tot"])
    dt = (time.perf_counter() - t0) / N
    print(json.dumps({"variant": "bf16_step", "step_s": round(dt, 4),
                      "seq_s": round(256 / dt, 1)}), flush=True)


def v_evalfwd():
    def scalar(r):
        return _forward_loss(model, cfg, state.params, state.batch_stats,
                             toks, mask, r, jnp.zeros(()), False,
                             with_metrics=False)[0]

    chain_time("evalfwd256", scalar)


V = {"fwd": v_fwd, "grad": v_grad, "bf16": v_bf16, "evalfwd": v_evalfwd}
for k in (sys.argv[1:] or ["fwd", "grad", "bf16"]):
    V[k]()
