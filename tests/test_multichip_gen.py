"""Data-parallel generation across the virtual 8-device mesh."""
import jax
import jax.numpy as jnp
import numpy as np

from polyphemus_tpu.config import ModelConfig
from polyphemus_tpu.data.dataset import synthetic_batch
from polyphemus_tpu.models import VAE
from polyphemus_tpu.parallel import mesh as pmesh

CFG = ModelConfig(d=32, gnn_n_layers=2, n_bars=2, resolution=8,
                  dropout=0.0, batch_norm=True)


def test_sharded_generation_matches_single_device():
    assert jax.device_count() >= 8
    model = VAE(CFG)
    toks, mask = synthetic_batch(np.random.default_rng(0), 2, 2)
    variables = model.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        jnp.asarray(toks), jnp.asarray(mask), deterministic=True)

    mesh = pmesh.make_mesh(1)
    bsh = pmesh.batch_sharding(mesh)
    z = jax.random.normal(jax.random.key(5), (16, CFG.d))

    dec = jax.jit(lambda zz: model.apply(variables, zz,
                                         method=VAE.decode_tokens),
                  in_shardings=(bsh,))
    s_sh, tok_sh, m_sh = dec(jax.device_put(z, bsh))
    s_1, tok_1, m_1 = model.apply(variables, z, method=VAE.decode_tokens)

    assert (np.asarray(m_sh) == np.asarray(m_1)).all()
    act = np.asarray(m_1)
    assert (np.asarray(tok_sh)[act] == np.asarray(tok_1)[act]).all()
    np.testing.assert_allclose(np.asarray(s_sh), np.asarray(s_1),
                               rtol=1e-5, atol=1e-5)
