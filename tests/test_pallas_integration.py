"""Pallas GCL integrated in the VAE (interpret mode): same generations."""
import dataclasses

import jax
import numpy as np

from polyphemus_tpu.config import ModelConfig
from polyphemus_tpu.data.dataset import synthetic_batch
from polyphemus_tpu.generate import make_generator
from polyphemus_tpu.models import VAE

CFG = ModelConfig(d=32, gnn_n_layers=2, n_bars=2, resolution=8,
                  dropout=0.0, batch_norm=True)


def test_generator_pallas_matches_xla():
    import jax.numpy as jnp

    model = VAE(CFG)
    toks, mask = synthetic_batch(np.random.default_rng(0), 2, 2)
    variables = model.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        jnp.asarray(toks), jnp.asarray(mask), deterministic=True)

    z = jax.random.normal(jax.random.key(7), (4, CFG.d))
    m0, t0 = make_generator(model, variables)(z)
    m1, t1 = make_generator(model, variables, pallas=True)(z)
    assert (np.asarray(m0) == np.asarray(m1)).all()
    act = np.asarray(m0)
    assert (np.asarray(t0)[act] == np.asarray(t1)[act]).all()


def test_encoder_pallas_matches_xla():
    import jax.numpy as jnp

    model = VAE(CFG)
    toks, mask = synthetic_batch(np.random.default_rng(1), 2, 2)
    variables = model.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        jnp.asarray(toks), jnp.asarray(mask), deterministic=True)
    mu0, lv0 = model.apply(variables, jnp.asarray(toks), jnp.asarray(mask),
                           method=VAE.encode)
    model_p = VAE(dataclasses.replace(CFG, use_pallas_gcl=True))
    mu1, lv1 = model_p.apply(variables, jnp.asarray(toks), jnp.asarray(mask),
                             method=VAE.encode)
    np.testing.assert_allclose(np.asarray(mu0), np.asarray(mu1),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lv0), np.asarray(lv1),
                               rtol=1e-4, atol=1e-5)
