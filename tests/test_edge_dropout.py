"""Exact per-edge message dropout (reference model.py:44,133).

The dense implementation (ops/lattice.relational_messages with
edge_dropout_p) must equal a literal sparse per-edge oracle edge-for-edge
when both use the same Bernoulli draws. The test replays the
implementation's documented mask-draw contract (split rng into
p/n/onset/next/self; bernoulli over the dense mask shapes) and feeds those
masks to the oracle.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from polyphemus_tpu.ops import lattice
from polyphemus_tpu.ops.kernels import gcl_pallas  # noqa: F401 (parity env)

from . import oracle

T, S, D = 4, 32, 12
P = 0.1


def _draw_masks(rng, lead, keep):
    """Replay relational_messages' mask-draw contract."""
    k_p, k_n, k_on, k_nx, k_self = jax.random.split(rng, 5)
    return {
        "p": np.asarray(jax.random.bernoulli(k_p, keep, lead + (T, S, D))),
        "n": np.asarray(jax.random.bernoulli(k_n, keep, lead + (T, S, D))),
        "on": np.asarray(
            jax.random.bernoulli(k_on, keep, lead + (T, T, S, D))),
        "nx": np.asarray(
            jax.random.bernoulli(k_nx, keep, lead + (T, T, S, D))),
        "self": np.asarray(
            jax.random.bernoulli(k_self, keep, lead + (T, S, D))),
    }


@pytest.mark.parametrize("density,seed", [(0.25, 0), (0.6, 1), (0.05, 2)])
def test_edge_dropout_matches_sparse_oracle(density, seed):
    rng = np.random.default_rng(seed)
    lead = (2, 2)
    mask = rng.random(lead + (T, S)) < density
    mask[..., 0, 0] = True  # non-empty bars
    x = (rng.standard_normal(lead + (T, S, D)).astype(np.float32)
         * mask[..., None])
    gate = rng.standard_normal((S, D)).astype(np.float32)
    rel_w = (rng.standard_normal((6, D, D)) * 0.3).astype(np.float32)
    root = (rng.standard_normal((D, D)) * 0.3).astype(np.float32)
    bias = (rng.standard_normal((D,)) * 0.3).astype(np.float32)

    mj = jnp.asarray(mask)
    nbr = lattice.build_neighbors(mj)
    drng = jax.random.key(seed + 100)
    out = np.asarray(lattice.gcl_apply(
        jnp.asarray(x), mj, nbr, jnp.asarray(gate), jnp.asarray(rel_w),
        jnp.asarray(root), jnp.asarray(bias),
        message_dropout=P, dropout_rng=drng, message_dropout_mode="edge"))

    keep_masks = _draw_masks(drng, lead, 1.0 - P)
    for b in np.ndindex(lead):
        bar = mask[b]
        x_nodes = oracle.lattice_to_nodes(bar, x[b])
        km = {k: v[b] for k, v in keep_masks.items()}
        ref = oracle.gcl_forward_edge_dropout(
            bar, x_nodes.astype(np.float64), gate.astype(np.float64),
            rel_w.astype(np.float64), root.astype(np.float64),
            bias.astype(np.float64), km, P)
        got = oracle.lattice_to_nodes(bar, out[b])
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_single_node_self_edge_dropout():
    mask = np.zeros((1, 1, T, S), bool)
    mask[0, 0, 2, 5] = True  # one active cell -> fake self edge
    rng = np.random.default_rng(3)
    x = (rng.standard_normal((1, 1, T, S, D)).astype(np.float32)
         * mask[..., None])
    gate = rng.standard_normal((S, D)).astype(np.float32)
    rel_w = (rng.standard_normal((6, D, D)) * 0.3).astype(np.float32)
    root = np.eye(D, dtype=np.float32)
    bias = np.zeros((D,), np.float32)

    mj = jnp.asarray(mask)
    nbr = lattice.build_neighbors(mj)
    drng = jax.random.key(7)
    out = np.asarray(lattice.gcl_apply(
        jnp.asarray(x), mj, nbr, jnp.asarray(gate), jnp.asarray(rel_w),
        jnp.asarray(root), jnp.asarray(bias),
        message_dropout=P, dropout_rng=drng, message_dropout_mode="edge"))
    keep_masks = _draw_masks(drng, (1, 1), 1.0 - P)
    bar = mask[0, 0]
    ref = oracle.gcl_forward_edge_dropout(
        bar, oracle.lattice_to_nodes(bar, x[0, 0]).astype(np.float64),
        gate.astype(np.float64), rel_w.astype(np.float64),
        root.astype(np.float64), bias.astype(np.float64),
        {k: v[0, 0] for k, v in keep_masks.items()}, P)
    np.testing.assert_allclose(oracle.lattice_to_nodes(bar, out[0, 0]), ref,
                               rtol=2e-4, atol=2e-4)


def test_edge_dropout_unbiased():
    """Mean over draws approaches the undropped aggregate (unbiasedness)."""
    rng = np.random.default_rng(4)
    mask = rng.random((1, 1, T, S)) < 0.4
    mask[..., 0, 0] = True
    x = (rng.standard_normal((1, 1, T, S, D)).astype(np.float32)
         * mask[..., None])
    gate = np.abs(rng.standard_normal((S, D))).astype(np.float32)
    rel_w = (rng.standard_normal((6, D, D)) * 0.2).astype(np.float32)
    root = (rng.standard_normal((D, D)) * 0.2).astype(np.float32)
    bias = np.zeros((D,), np.float32)
    mj = jnp.asarray(mask)
    nbr = lattice.build_neighbors(mj)
    args = (jnp.asarray(x), mj, nbr, jnp.asarray(gate), jnp.asarray(rel_w),
            jnp.asarray(root), jnp.asarray(bias))
    clean = np.asarray(lattice.gcl_apply(*args))

    @jax.jit
    def one(key):
        return lattice.gcl_apply(*args, message_dropout=P, dropout_rng=key,
                                 message_dropout_mode="edge")

    n = 600
    acc = np.zeros_like(clean, np.float64)
    for i in range(n):
        acc += np.asarray(one(jax.random.key(i)), np.float64)
    mean = acc / n
    # scale tolerance to the magnitude of the output
    scale = np.abs(clean).mean() + 1e-6
    assert np.abs(mean - clean).mean() < 0.05 * scale


@pytest.mark.slow
def test_model_trains_with_exact_edge_dropout():
    from polyphemus_tpu.config import ModelConfig, TrainConfig
    from polyphemus_tpu.data.dataset import synthetic_batch
    from polyphemus_tpu.models import VAE
    from polyphemus_tpu.train.trainer import (create_train_state,
                                              make_optimizer, make_train_step)

    cfg = TrainConfig(
        batch_size=4,
        model=ModelConfig(d=32, gnn_n_layers=2, n_bars=2, resolution=8,
                          dropout=0.0, batch_norm=True, message_dropout=0.1,
                          message_dropout_mode="edge"))
    model = VAE(cfg.model)
    toks, mask = synthetic_batch(np.random.default_rng(5), 4, 2)
    toks, mask = jnp.asarray(toks), jnp.asarray(mask)
    state = create_train_state(model, cfg, jax.random.key(0), toks, mask)
    step = jax.jit(make_train_step(model, cfg, make_optimizer(cfg)))
    state, losses, _ = step(state, toks, mask, jax.random.key(1))
    assert np.isfinite(float(losses["tot"]))
    # different rng -> different dropout noise -> different loss
    _, losses2, _ = step(state, toks, mask, jax.random.key(2))
    _, losses2b, _ = step(state, toks, mask, jax.random.key(2))
    assert float(losses2["tot"]) == pytest.approx(float(losses2b["tot"]))
