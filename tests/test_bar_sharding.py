"""Sequence parallelism over the bar axis.

The model's sequence dimension is bars (SURVEY.md §5 long-context): all
lattice/GNN compute is per-bar independent, so for long sequences (LMD16+)
the bar axis shards across devices like a batch axis — GSPMD only needs
collectives at the two cross-bar Linears (bars_encoder/decoder)."""
import pytest
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from polyphemus_tpu.config import ModelConfig
from polyphemus_tpu.data.dataset import synthetic_batch
from polyphemus_tpu.models import VAE
from polyphemus_tpu.parallel import mesh as pmesh


@pytest.mark.slow
def test_bars_axis_sharded_decode_matches():
    assert jax.device_count() >= 8
    cfg = ModelConfig(d=32, gnn_n_layers=2, n_bars=16, resolution=8,
                      dropout=0.0, batch_norm=True)
    model = VAE(cfg)
    toks, mask = synthetic_batch(np.random.default_rng(0), 2, 16)
    variables = model.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        jnp.asarray(toks), jnp.asarray(mask), deterministic=True)

    mesh = pmesh.make_mesh(1)
    # bars axis (dim 1 of the mask) sharded over the 8 'data' devices
    bar_sh = NamedSharding(mesh, P(None, pmesh.DATA_AXIS))

    z = jax.random.normal(jax.random.key(3), (4, cfg.d))
    s1, t1, m1 = model.apply(variables, z, method=VAE.decode_tokens)

    dec = jax.jit(
        lambda zz: model.apply(variables, zz, method=VAE.decode_tokens),
        out_shardings=(None, bar_sh, bar_sh))
    s2, t2, m2 = dec(z)

    assert (np.asarray(m1) == np.asarray(m2)).all()
    act = np.asarray(m1)
    assert (np.asarray(t1)[act] == np.asarray(t2)[act]).all()
