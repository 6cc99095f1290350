"""Gradients through the fused GCL (pallas fwd / XLA bwd) match the XLA path."""
import pytest
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from polyphemus_tpu.config import ModelConfig, TrainConfig
from polyphemus_tpu.data.dataset import synthetic_batch
from polyphemus_tpu.models import VAE
from polyphemus_tpu.ops import lattice
from polyphemus_tpu.ops.kernels import gcl_pallas
from polyphemus_tpu.train.trainer import (create_train_state, make_optimizer,
                                          make_train_step)

T, S, D = 4, 32, 16


def test_gcl_fused_grads_match():
    rng = np.random.default_rng(0)
    mask = rng.random((2, 2, T, S)) < 0.2
    mask[..., 0, 0] = True
    x = (rng.standard_normal((2, 2, T, S, D)).astype(np.float32)
         * mask[..., None])
    gate = rng.standard_normal((S, D)).astype(np.float32)
    rel_w = (rng.standard_normal((6, D, D)) * 0.2).astype(np.float32)
    root = (rng.standard_normal((D, D)) * 0.2).astype(np.float32)
    bias = (rng.standard_normal((D,)) * 0.2).astype(np.float32)
    mj = jnp.asarray(mask)
    aux = gcl_pallas.build_kernel_aux(mj)

    def loss_fused(x_, gt_, w_, r_, b_):
        return jnp.sum(jnp.sin(
            gcl_pallas.gcl_fused(x_, gt_, w_, r_, b_, aux, mj)))

    def loss_xla(x_, gt_, w_, r_, b_):
        nbr = lattice.build_neighbors(mj)
        return jnp.sum(jnp.sin(
            lattice.gcl_apply(x_, mj, nbr, gt_, w_, r_, b_)))

    args = tuple(jnp.asarray(a) for a in (x, gate, rel_w, root, bias))
    g1 = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(*args)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2, 3, 4))(*args)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)


def test_gcl_backward_fused_matches_split():
    """The single-pass fused backward (kept as a recorded negative perf
    result, PERFORMANCE.md) must stay numerically identical to the
    production two-kernel split so the decision record cannot rot."""
    from polyphemus_tpu.ops.kernels import gcl_pallas_bwd

    rng = np.random.default_rng(3)
    mask = rng.random((2, 2, T, S)) < 0.2
    mask[..., 0, 0] = True
    x = jnp.asarray(rng.standard_normal((2, 2, T, S, D)).astype(np.float32)
                    * mask[..., None])
    g = jnp.asarray(rng.standard_normal(x.shape).astype(np.float32))
    gate = jnp.asarray(rng.standard_normal((S, D)).astype(np.float32))
    rel_w = jnp.asarray((rng.standard_normal((6, D, D)) * 0.2)
                        .astype(np.float32))
    root = jnp.asarray((rng.standard_normal((D, D)) * 0.2)
                       .astype(np.float32))
    aux = gcl_pallas.build_kernel_aux(jnp.asarray(mask))
    wbig = gcl_pallas.pack_weights(rel_w, root, T, dtype=x.dtype)

    fused = gcl_pallas_bwd.gcl_backward_fused(x, aux, gate, wbig, g)
    split = gcl_pallas_bwd.gcl_backward_pallas(x, aux, gate, wbig, g)
    for name, a, b in zip(("dx", "dgate", "dwbig", "dbias"), fused, split):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=5e-5, err_msg=name)


@pytest.mark.slow
def test_train_step_with_pallas_gcl():
    cfg = TrainConfig(
        batch_size=4,
        model=ModelConfig(d=32, gnn_n_layers=2, n_bars=2, resolution=8,
                          dropout=0.0, batch_norm=True, use_pallas_gcl=True))
    model = VAE(cfg.model)
    toks, mask = synthetic_batch(np.random.default_rng(1), 4, 2)
    toks, mask = jnp.asarray(toks), jnp.asarray(mask)
    state = create_train_state(model, cfg, jax.random.key(0), toks, mask)
    step = jax.jit(make_train_step(model, cfg, make_optimizer(cfg)))
    state, losses, accs = step(state, toks, mask, jax.random.key(1))
    assert np.isfinite(float(losses["tot"]))

    # same step without pallas: losses close
    cfg2 = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, use_pallas_gcl=False))
    model2 = VAE(cfg2.model)
    state2 = create_train_state(model2, cfg2, jax.random.key(0), toks, mask)
    step2 = jax.jit(make_train_step(model2, cfg2, make_optimizer(cfg2)))
    _, losses2, _ = step2(state2, toks, mask, jax.random.key(1))
    np.testing.assert_allclose(float(losses["tot"]), float(losses2["tot"]),
                               rtol=1e-4)
