"""End-to-end numerical parity: converted torch weights -> dense JAX model
matches the torch-semantics oracle (eval mode), encoder and decoder.

This is the test that guards note-level output parity for ported LMD2/LMD16
checkpoints (BASELINE.md protocol).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from polyphemus_tpu import constants
from polyphemus_tpu.config import ModelConfig
from polyphemus_tpu.convert import convert_state_dict
from polyphemus_tpu.models import VAE
from polyphemus_tpu.ops import lattice

from . import torch_ref

CFGS = {
    "bn": ModelConfig(d=32, gnn_n_layers=2, n_bars=2, resolution=8,
                      dropout=0.0, batch_norm=True),
    "nobn": ModelConfig(d=32, gnn_n_layers=2, n_bars=2, resolution=8,
                        dropout=0.0, batch_norm=False),
}


def build(cfg, seed=0):
    sd = torch_ref.random_state_dict(cfg, seed=seed)
    sd_np = {k: v.numpy() for k, v in sd.items()}
    variables = convert_state_dict(sd_np, cfg)
    variables = jax.tree_util.tree_map(jnp.asarray, variables)
    return sd, variables, VAE(cfg)


def random_inputs(cfg, b=3, seed=1, density=0.15):
    rng = np.random.default_rng(seed)
    t, s = cfg.n_tracks, cfg.n_timesteps
    mask = rng.random((b, cfg.n_bars, t, s)) < density
    mask = np.asarray(lattice.ensure_nonempty_bars(jnp.asarray(mask)))
    toks = np.stack(
        [rng.integers(0, constants.N_PITCH_TOKENS,
                      (b, cfg.n_bars, t, s, constants.MAX_SIMU_TOKENS)),
         rng.integers(0, constants.N_DUR_TOKENS,
                      (b, cfg.n_bars, t, s, constants.MAX_SIMU_TOKENS))],
        axis=-1).astype(np.int64)
    return toks, mask


def test_converter_shapes_match_init():
    cfg = CFGS["bn"]
    _, variables, model = build(cfg)
    toks, mask = random_inputs(cfg, b=2)
    init_vars = model.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        jnp.asarray(toks, jnp.int32), jnp.asarray(mask), deterministic=True)
    conv_shapes = jax.tree_util.tree_map(jnp.shape, variables)
    init_shapes = jax.tree_util.tree_map(jnp.shape, init_vars)
    flat_c, _ = jax.tree_util.tree_flatten_with_path(conv_shapes)
    flat_i, _ = jax.tree_util.tree_flatten_with_path(init_shapes)
    paths_c = {jax.tree_util.keystr(p): v for p, v in flat_c}
    paths_i = {jax.tree_util.keystr(p): v for p, v in flat_i}
    assert paths_c == paths_i


@pytest.mark.parametrize("which", ["bn", "nobn"])
def test_encoder_parity(which):
    cfg = CFGS[which]
    sd, variables, model = build(cfg)
    toks, mask = random_inputs(cfg)

    with torch.no_grad():
        mu_t, lv_t = torch_ref.encode(sd, cfg, toks, mask)

    mu_j, lv_j = model.apply(
        variables, jnp.asarray(toks, jnp.int32), jnp.asarray(mask),
        method=VAE.encode)
    np.testing.assert_allclose(np.asarray(mu_j), mu_t.numpy(),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(lv_j), lv_t.numpy(),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("which", ["bn", "nobn"])
def test_decoder_parity_unconditional(which):
    cfg = CFGS[which]
    sd, variables, model = build(cfg, seed=3)
    rng = np.random.default_rng(7)
    z = rng.standard_normal((4, cfg.d)).astype(np.float32)

    with torch.no_grad():
        s_t, c_t, m_t = torch_ref.decode(sd, cfg, torch.from_numpy(z))

    s_j, c_j, m_j = model.apply(variables, jnp.asarray(z), method=VAE.decode)
    np.testing.assert_allclose(np.asarray(s_j), s_t, rtol=2e-4, atol=2e-4)
    assert (np.asarray(m_j) == m_t).all(), "generated structure masks differ"
    # content logits only meaningful at active cells
    act = m_t.astype(bool)
    np.testing.assert_allclose(np.asarray(c_j)[act], c_t[act],
                               rtol=3e-4, atol=3e-4)


def test_decoder_parity_conditioned():
    cfg = CFGS["bn"]
    sd, variables, model = build(cfg, seed=5)
    _, mask = random_inputs(cfg, b=2, seed=11, density=0.25)
    rng = np.random.default_rng(13)
    z = rng.standard_normal((2, cfg.d)).astype(np.float32)

    with torch.no_grad():
        s_t, c_t, _ = torch_ref.decode(sd, cfg, torch.from_numpy(z),
                                       mask=mask)
    s_j, c_j, m_j = model.apply(variables, jnp.asarray(z), jnp.asarray(mask),
                                method=VAE.decode)
    act = mask.astype(bool)
    np.testing.assert_allclose(np.asarray(s_j), s_t, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(c_j)[act], c_t[act],
                               rtol=3e-4, atol=3e-4)
