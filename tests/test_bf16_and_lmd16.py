"""bf16 training policy + 16-bar (LMD16-shaped) model support."""
import pytest
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from polyphemus_tpu.config import ModelConfig, TrainConfig
from polyphemus_tpu.data.dataset import synthetic_batch
from polyphemus_tpu.generate import make_generator
from polyphemus_tpu.models import VAE
from polyphemus_tpu.train.trainer import (create_train_state, make_optimizer,
                                          make_train_step)

SMALL = ModelConfig(d=32, gnn_n_layers=2, n_bars=2, resolution=8,
                    dropout=0.0, batch_norm=True)


@pytest.mark.slow
def test_bf16_train_step_finite_and_fp32_state():
    cfg = TrainConfig(batch_size=4, model=SMALL, bf16=True)
    model = VAE(SMALL)
    toks, mask = synthetic_batch(np.random.default_rng(0), 4, 2)
    toks, mask = jnp.asarray(toks), jnp.asarray(mask)
    state = create_train_state(model, cfg, jax.random.key(0), toks, mask)
    step = jax.jit(make_train_step(model, cfg, make_optimizer(cfg)))
    for i in range(2):
        state, losses, accs = step(state, toks, mask, jax.random.key(i))
    assert np.isfinite(float(losses["tot"]))
    # master params and running stats stay fp32
    for leaf in jax.tree_util.tree_leaves(state.params):
        assert leaf.dtype == jnp.float32
    for leaf in jax.tree_util.tree_leaves(state.batch_stats):
        assert leaf.dtype == jnp.float32


def test_bf16_generator_mostly_agrees():
    model = VAE(SMALL)
    toks, mask = synthetic_batch(np.random.default_rng(1), 2, 2)
    variables = model.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        jnp.asarray(toks), jnp.asarray(mask), deterministic=True)
    z = jax.random.normal(jax.random.key(3), (4, SMALL.d))
    m32, t32 = [np.asarray(x) for x in make_generator(model, variables)(z)]
    m16, t16 = [np.asarray(x) for x in
                make_generator(model, variables, bf16=True)(z)]
    assert (m32 == m16).mean() > 0.95
    both = m32 & m16
    if both.any():
        assert (t32[both] == t16[both]).mean() > 0.9


def test_lmd16_shapes():
    cfg16 = dataclasses.replace(SMALL, n_bars=16)
    model = VAE(cfg16)
    toks, mask = synthetic_batch(np.random.default_rng(2), 2, 16)
    variables = model.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        jnp.asarray(toks), jnp.asarray(mask), deterministic=True)
    (s_logits, c_logits), mu, lv = model.apply(
        variables, jnp.asarray(toks), jnp.asarray(mask), deterministic=True,
        rngs={"sample": jax.random.key(2)})
    assert s_logits.shape == (2, 16, 4, 32)
    assert c_logits.shape == (2, 16, 4, 32, 15, 230)
    # generation at 16 bars
    z = jax.random.normal(jax.random.key(4), (2, cfg16.d))
    m, t = make_generator(model, variables)(z)
    assert m.shape == (2, 16, 4, 32)
    assert np.asarray(m).any(axis=(-1, -2)).all()
