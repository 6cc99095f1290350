"""Randomized sweep: dense lattice GCL vs the sparse oracle over many
random structures (single compile, many evaluations)."""
import jax
import jax.numpy as jnp
import numpy as np

from polyphemus_tpu import constants
from polyphemus_tpu.generate import mtp_from_logits
from polyphemus_tpu.ops import lattice

from . import oracle

T, S, D = 4, 32, 8


def test_fuzz_gcl_many_masks():
    rng = np.random.default_rng(42)
    gate = rng.standard_normal((S, D)).astype(np.float32)
    rel_w = (rng.standard_normal((6, D, D)) * 0.3).astype(np.float32)
    root = (rng.standard_normal((D, D)) * 0.3).astype(np.float32)
    bias = (rng.standard_normal((D,)) * 0.3).astype(np.float32)

    @jax.jit
    def run(x, m):
        nbr = lattice.build_neighbors(m)
        return lattice.gcl_apply(x, m, nbr, jnp.asarray(gate),
                                 jnp.asarray(rel_w), jnp.asarray(root),
                                 jnp.asarray(bias))

    for trial in range(20):
        density = float(rng.uniform(0.01, 0.95))
        bar = rng.random((T, S)) < density
        if not bar.any():
            bar[rng.integers(T), rng.integers(S)] = True
        n = int(bar.sum())
        x_nodes = rng.standard_normal((n, D))
        want = oracle.gcl_forward(bar, x_nodes, gate.astype(np.float64),
                                  rel_w.astype(np.float64),
                                  root.astype(np.float64),
                                  bias.astype(np.float64))
        x_full = oracle.nodes_to_lattice(bar, x_nodes.astype(np.float32), D)
        got_full = run(jnp.asarray(x_full), jnp.asarray(bar))
        got = oracle.lattice_to_nodes(bar, np.asarray(got_full))
        np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4,
                                   err_msg=f"trial {trial} density "
                                           f"{density:.2f}")


def test_mtp_from_logits_silence_pattern():
    rng = np.random.default_rng(0)
    b, nb = 2, 2
    c_logits = rng.standard_normal((b, nb, T, S, 15, 230)).astype(np.float32)
    mask = rng.random((b, nb, T, S)) < 0.3
    mtp = np.asarray(mtp_from_logits(jnp.asarray(c_logits),
                                     jnp.asarray(mask)))
    # active cells keep their logits
    np.testing.assert_array_equal(mtp[mask], c_logits[mask])
    # inactive cells: pitch EOS one-hot at slot 0, PAD at the rest
    # (reference utils.py:67-76)
    inactive = mtp[~mask]
    assert (inactive[:, 0, constants.PitchToken.EOS] == 1).all()
    assert (inactive[:, 1:, constants.PitchToken.PAD] == 1).all()
    assert inactive.sum() == inactive.shape[0] * 15  # exactly one 1 per slot
