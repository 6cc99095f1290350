"""Gather-fused content-encoder front end == plain path (values, batch
stats, gradients), train and eval modes."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from polyphemus_tpu.config import ModelConfig
from polyphemus_tpu.data.dataset import synthetic_batch
from polyphemus_tpu.models import VAE
from polyphemus_tpu.models.vae import ContentEncoder
from polyphemus_tpu.ops import lattice

CFG = ModelConfig(d=32, gnn_n_layers=2, n_bars=2, resolution=8,
                  dropout=0.0, batch_norm=True)
CFG_F = dataclasses.replace(CFG, fused_content_encoder=True)


def setup_inputs(seed=0, b=3):
    rng = np.random.default_rng(seed)
    toks, mask = synthetic_batch(rng, b, CFG.n_bars, density=0.25)
    toks, mask = jnp.asarray(toks), jnp.asarray(mask)
    nbr = lattice.build_neighbors(mask)
    return toks, mask, nbr


def init_encoder(cfg, toks, mask, nbr):
    enc = ContentEncoder(cfg)
    variables = enc.init(jax.random.key(0), toks, mask, nbr,
                         deterministic=True)
    return enc, variables


def test_fused_matches_plain_eval_and_train():
    toks, mask, nbr = setup_inputs()
    enc_p, variables = init_encoder(CFG, toks, mask, nbr)
    enc_f = ContentEncoder(CFG_F)

    # eval mode: outputs identical
    z_p = enc_p.apply(variables, toks, mask, nbr, deterministic=True)
    z_f = enc_f.apply(variables, toks, mask, nbr, deterministic=True)
    np.testing.assert_allclose(np.asarray(z_f), np.asarray(z_p),
                               rtol=2e-4, atol=2e-4)

    # train mode: outputs + updated batch stats identical
    zt_p, up_p = enc_p.apply(variables, toks, mask, nbr,
                             deterministic=False, mutable=["batch_stats"])
    zt_f, up_f = enc_f.apply(variables, toks, mask, nbr,
                             deterministic=False, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(zt_f), np.asarray(zt_p),
                               rtol=2e-4, atol=2e-4)
    for (p1, l1), (p2, l2) in zip(
            jax.tree_util.tree_flatten_with_path(up_p["batch_stats"])[0],
            jax.tree_util.tree_flatten_with_path(up_f["batch_stats"])[0]):
        np.testing.assert_allclose(np.asarray(l2), np.asarray(l1),
                                   rtol=2e-4, atol=1e-5,
                                   err_msg=jax.tree_util.keystr(p1))


def test_fused_gradients_match():
    toks, mask, nbr = setup_inputs(seed=1)
    enc_p, variables = init_encoder(CFG, toks, mask, nbr)
    enc_f = ContentEncoder(CFG_F)

    def loss(enc):
        def f(params):
            z, _ = enc.apply(
                {"params": params,
                 "batch_stats": variables["batch_stats"]},
                toks, mask, nbr, deterministic=False,
                mutable=["batch_stats"])
            return jnp.sum(jnp.tanh(z))
        return f

    g_p = jax.grad(loss(enc_p))(variables["params"])
    g_f = jax.grad(loss(enc_f))(variables["params"])
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(g_p)[0],
            jax.tree_util.tree_flatten_with_path(g_f)[0]):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-3, atol=5e-5,
            err_msg=jax.tree_util.keystr(path))


def test_full_vae_with_fused_encoder():
    toks, mask, _ = setup_inputs(seed=2)
    model_p = VAE(CFG)
    variables = model_p.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        toks, mask, deterministic=True)
    model_f = VAE(CFG_F)
    mu_p, lv_p = model_p.apply(variables, toks, mask, method=VAE.encode)
    mu_f, lv_f = model_f.apply(variables, toks, mask, method=VAE.encode)
    np.testing.assert_allclose(np.asarray(mu_f), np.asarray(mu_p),
                               rtol=2e-4, atol=2e-4)
