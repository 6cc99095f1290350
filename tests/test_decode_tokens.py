"""Fused slot-scanned decode_tokens == argmax over the logits path."""
import pytest
import jax
import numpy as np

from polyphemus_tpu.config import ModelConfig
from polyphemus_tpu.data.dataset import synthetic_batch
from polyphemus_tpu.generate import _tokens_from_logits
from polyphemus_tpu.models import VAE

CFG = ModelConfig(d=32, gnn_n_layers=2, n_bars=2, resolution=8,
                  dropout=0.0, batch_norm=True)


@pytest.mark.slow
def test_decode_tokens_matches_logits_argmax():
    import jax.numpy as jnp

    model = VAE(CFG)
    toks, mask = synthetic_batch(np.random.default_rng(0), 2, 2)
    variables = model.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        jnp.asarray(toks), jnp.asarray(mask), deterministic=True)

    z = jax.random.normal(jax.random.key(5), (4, CFG.d))
    s1, c_logits, m1 = model.apply(variables, z, method=VAE.decode)
    s2, token_ids, m2 = model.apply(variables, z, method=VAE.decode_tokens)

    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-6)
    assert (np.asarray(m1) == np.asarray(m2)).all()
    want = np.asarray(_tokens_from_logits(c_logits))
    got = np.asarray(token_ids)
    assert got.shape == want.shape
    m = np.asarray(m1)
    # argmax identical at active cells (inactive cells are don't-care but
    # should match too since both paths compute the same masked x)
    assert (got[m] == want[m]).all()
