"""VAE shape/compile smoke tests on a small config."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from polyphemus_tpu import constants
from polyphemus_tpu.config import ModelConfig
from polyphemus_tpu.models import VAE

CFG = ModelConfig(d=32, gnn_n_layers=2, n_bars=2, resolution=8,
                  dropout=0.0, batch_norm=True)


def make_batch(rng, b=2, cfg=CFG):
    t, s = cfg.n_tracks, cfg.n_timesteps
    mask = rng.random((b, cfg.n_bars, t, s)) < 0.2
    toks = np.stack(
        [
            rng.integers(0, constants.N_PITCH_TOKENS,
                         (b, cfg.n_bars, t, s, constants.MAX_SIMU_TOKENS)),
            rng.integers(0, constants.N_DUR_TOKENS,
                         (b, cfg.n_bars, t, s, constants.MAX_SIMU_TOKENS)),
        ],
        axis=-1,
    ).astype(np.int32)
    return jnp.asarray(toks), jnp.asarray(mask)


@pytest.fixture(scope="module")
def model_and_vars():
    model = VAE(CFG)
    rng = np.random.default_rng(0)
    toks, mask = make_batch(rng)
    variables = model.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        toks, mask, deterministic=True,
    )
    return model, variables, toks, mask


def test_forward_shapes(model_and_vars):
    model, variables, toks, mask = model_and_vars
    (s_logits, c_logits), mu, log_var = model.apply(
        variables, toks, mask, deterministic=True,
        rngs={"sample": jax.random.key(2)},
    )
    b, nb = toks.shape[0], CFG.n_bars
    t, s = CFG.n_tracks, CFG.n_timesteps
    assert s_logits.shape == (b, nb, t, s)
    assert c_logits.shape == (b, nb, t, s, constants.MAX_SIMU_TOKENS - 1,
                              constants.D_TOKEN_PAIR)
    assert mu.shape == (b, CFG.d) and log_var.shape == (b, CFG.d)
    assert np.isfinite(np.asarray(s_logits)).all()
    assert np.isfinite(np.asarray(c_logits)).all()


def test_train_mode_updates_batch_stats(model_and_vars):
    model, variables, toks, mask = model_and_vars
    out, updates = model.apply(
        variables, toks, mask, deterministic=False,
        rngs={"sample": jax.random.key(3), "dropout": jax.random.key(4)},
        mutable=["batch_stats"],
    )
    old = jax.tree_util.tree_leaves(variables["batch_stats"])
    new = jax.tree_util.tree_leaves(updates["batch_stats"])
    changed = any(not np.allclose(a, b) for a, b in zip(old, new))
    assert changed


def test_decode_unconditional(model_and_vars):
    model, variables, toks, mask = model_and_vars
    z = jax.random.normal(jax.random.key(5), (3, CFG.d))
    s_logits, c_logits, used_mask = model.apply(
        variables, z, method=VAE.decode)
    assert used_mask.shape == (3, CFG.n_bars, CFG.n_tracks, CFG.n_timesteps)
    # every bar non-empty (fake-activation fixup)
    assert np.asarray(used_mask).any(axis=(-1, -2)).all()
    # threshold consistency: mask == (sigmoid(s_logits) >= 0.5) up to fixups
    probs = jax.nn.sigmoid(s_logits)
    raw = np.asarray(probs >= 0.5)
    um = np.asarray(used_mask)
    diff = um != raw
    # differences only at cell [0,0] of empty bars
    assert (diff.sum(axis=(-1, -2)) <= 1).all()


def test_decode_conditioned_jits(model_and_vars):
    model, variables, toks, mask = model_and_vars

    @jax.jit
    def dec(z, m):
        return model.apply(variables, z, m, method=VAE.decode)

    z = jax.random.normal(jax.random.key(6), (2, CFG.d))
    s_logits, c_logits, um = dec(z, mask)
    assert (np.asarray(um) == np.asarray(mask)).all()
