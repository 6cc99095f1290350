"""Pallas fused GCL kernel (interpret mode on CPU) vs the XLA lattice path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from polyphemus_tpu.ops import lattice
from polyphemus_tpu.ops.kernels import gcl_pallas

T, S, D = 4, 32, 16


@pytest.mark.parametrize("seed,density", [(0, 0.05), (1, 0.2), (2, 0.6)])
def test_pallas_matches_xla(seed, density):
    rng = np.random.default_rng(seed)
    B, NB = 2, 2
    mask = rng.random((B, NB, T, S)) < density
    mask[..., 0, 0] = True
    x = (rng.standard_normal((B, NB, T, S, D)).astype(np.float32)
         * mask[..., None])
    gate = rng.standard_normal((S, D)).astype(np.float32)
    rel_w = (rng.standard_normal((6, D, D)) * 0.2).astype(np.float32)
    root = (rng.standard_normal((D, D)) * 0.2).astype(np.float32)
    bias = (rng.standard_normal((D,)) * 0.2).astype(np.float32)

    mj = jnp.asarray(mask)
    nbr = lattice.build_neighbors(mj)
    want = lattice.gcl_apply(jnp.asarray(x), mj, nbr, jnp.asarray(gate),
                             jnp.asarray(rel_w), jnp.asarray(root),
                             jnp.asarray(bias))

    aux = gcl_pallas.build_kernel_aux(mj)
    wbig = gcl_pallas.pack_weights(jnp.asarray(rel_w), jnp.asarray(root),
                                   T, dtype=jnp.float32)
    got = gcl_pallas.gcl_apply_pallas(
        jnp.asarray(x), aux, jnp.asarray(gate), wbig, jnp.asarray(bias),
        bars_per_block=2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_pallas_single_node_bar():
    mask = np.zeros((1, 1, T, S), bool)
    mask[0, 0, 2, 7] = True
    rng = np.random.default_rng(3)
    x = (rng.standard_normal((1, 1, T, S, D)).astype(np.float32)
         * mask[..., None])
    gate = rng.standard_normal((S, D)).astype(np.float32)
    rel_w = (rng.standard_normal((6, D, D)) * 0.3).astype(np.float32)
    root = (rng.standard_normal((D, D)) * 0.3).astype(np.float32)
    bias = (rng.standard_normal((D,)) * 0.3).astype(np.float32)

    mj = jnp.asarray(mask)
    want = lattice.gcl_apply(jnp.asarray(x), mj,
                             lattice.build_neighbors(mj), jnp.asarray(gate),
                             jnp.asarray(rel_w), jnp.asarray(root),
                             jnp.asarray(bias))
    aux = gcl_pallas.build_kernel_aux(mj)
    wbig = gcl_pallas.pack_weights(jnp.asarray(rel_w), jnp.asarray(root), T,
                                   dtype=jnp.float32)
    got = gcl_pallas.gcl_apply_pallas(
        jnp.asarray(x), aux, jnp.asarray(gate), wbig, jnp.asarray(bias),
        bars_per_block=1, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
