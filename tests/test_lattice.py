"""Dense lattice ops vs. the sparse numpy oracle."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from polyphemus_tpu.ops import lattice
from . import oracle

T, S, D = 4, 32, 16


def random_mask(rng, density=0.2, t=T, s=S):
    return rng.random((t, s)) < density


@pytest.mark.parametrize("density", [0.0, 0.03, 0.15, 0.5, 1.0])
def test_ensure_nonempty(density):
    rng = np.random.default_rng(0)
    m = np.stack([random_mask(rng, density) for _ in range(8)])
    out = np.asarray(lattice.ensure_nonempty_bars(jnp.asarray(m)))
    assert out.any(axis=(-1, -2)).all()
    # Non-empty bars unchanged; empty bars only gain cell [0, 0].
    for i in range(8):
        if m[i].any():
            assert (out[i] == m[i]).all()
        else:
            exp = np.zeros_like(m[i]); exp[0, 0] = True
            assert (out[i] == exp).all()


def test_neighbors_match_bruteforce():
    rng = np.random.default_rng(1)
    for density in (0.05, 0.2, 0.7):
        m = random_mask(rng, density)
        m[0, 0] = True  # ensure nonempty
        nbr = lattice.build_neighbors(jnp.asarray(m))
        for t in range(T):
            for c in range(S):
                prevs = [cc for cc in range(c) if m[t, cc]]
                nexts = [cc for cc in range(c + 1, S) if m[t, cc]]
                assert bool(nbr.prev_in_row_ok[t, c]) == bool(prevs)
                if prevs:
                    assert int(nbr.prev_in_row[t, c]) == prevs[-1]
                assert bool(nbr.next_in_row_ok[t, c]) == bool(nexts)
                if nexts:
                    assert int(nbr.next_in_row[t, c]) == nexts[0]
        col_act = m.any(axis=0)
        for c in range(S):
            prevs = [cc for cc in range(c) if col_act[cc]]
            assert bool(nbr.prev_col_ok[c]) == bool(prevs)
            if prevs:
                assert int(nbr.prev_col[c]) == prevs[-1]
        assert (np.asarray(nbr.col_count) == m.sum(axis=0)).all()
        assert bool(nbr.single_node) == (m.sum() == 1)


@pytest.mark.parametrize("seed,density", [(0, 0.05), (1, 0.15), (2, 0.4),
                                          (3, 0.9), (4, 0.01)])
def test_gcl_matches_oracle(seed, density):
    rng = np.random.default_rng(seed)
    bar = random_mask(rng, density)
    if not bar.any():
        bar[0, 0] = True

    n_nodes = int(bar.sum())
    x_nodes = rng.standard_normal((n_nodes, D)).astype(np.float64)
    gate = rng.standard_normal((S, D)).astype(np.float64)
    rel_w = rng.standard_normal((6, D, D)).astype(np.float64) * 0.2
    root = rng.standard_normal((D, D)).astype(np.float64) * 0.2
    bias = rng.standard_normal((D,)).astype(np.float64) * 0.2

    want = oracle.gcl_forward(bar, x_nodes, gate, rel_w, root, bias)

    x_full = oracle.nodes_to_lattice(bar, x_nodes.astype(np.float32), D)
    mj = jnp.asarray(bar)
    nbr = lattice.build_neighbors(mj)
    got_full = lattice.gcl_apply(
        jnp.asarray(x_full), mj, nbr, jnp.asarray(gate, jnp.float32),
        jnp.asarray(rel_w, jnp.float32), jnp.asarray(root, jnp.float32),
        jnp.asarray(bias, jnp.float32),
    )
    got = oracle.lattice_to_nodes(bar, np.asarray(got_full))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_gcl_single_node_selfloop():
    # One active cell on a NON-drum row: reference still routes the fake
    # self-edge through relation 0 (data.py:170-176).
    bar = np.zeros((T, S), bool)
    bar[2, 7] = True
    rng = np.random.default_rng(9)
    x_nodes = rng.standard_normal((1, D))
    gate = rng.standard_normal((S, D))
    rel_w = rng.standard_normal((6, D, D)) * 0.3
    root = rng.standard_normal((D, D)) * 0.3
    bias = rng.standard_normal((D,)) * 0.3

    want = oracle.gcl_forward(bar, x_nodes, gate, rel_w, root, bias)
    # oracle must include the self message: verify it's not just root+bias
    assert not np.allclose(want, x_nodes @ root + bias)

    x_full = oracle.nodes_to_lattice(bar, x_nodes.astype(np.float32), D)
    mj = jnp.asarray(bar)
    got_full = lattice.gcl_apply(
        jnp.asarray(x_full), mj, lattice.build_neighbors(mj),
        jnp.asarray(gate, jnp.float32), jnp.asarray(rel_w, jnp.float32),
        jnp.asarray(root, jnp.float32), jnp.asarray(bias, jnp.float32),
    )
    got = oracle.lattice_to_nodes(bar, np.asarray(got_full))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_gcl_batched_jit_static_shapes():
    rng = np.random.default_rng(3)
    B, NB = 3, 2
    m = rng.random((B, NB, T, S)) < 0.2
    m[..., 0, 0] = True
    x = rng.standard_normal((B, NB, T, S, D)).astype(np.float32)
    x = x * m[..., None]
    gate = jnp.asarray(rng.standard_normal((S, D)), jnp.float32)
    rel_w = jnp.asarray(rng.standard_normal((6, D, D)) * 0.2, jnp.float32)
    root = jnp.asarray(rng.standard_normal((D, D)) * 0.2, jnp.float32)
    bias = jnp.asarray(rng.standard_normal((D,)) * 0.2, jnp.float32)

    @jax.jit
    def run(x, m):
        nbr = lattice.build_neighbors(m)
        return lattice.gcl_apply(x, m, nbr, gate, rel_w, root, bias)

    out = run(jnp.asarray(x), jnp.asarray(m))
    assert out.shape == x.shape
    # inactive cells stay exactly zero
    assert np.asarray(out)[~m].max(initial=0.0) == 0.0
    # per-(batch, bar) result equals per-bar oracle
    for b in range(B):
        for nb in range(NB):
            bar = m[b, nb]
            x_nodes = oracle.lattice_to_nodes(bar, x[b, nb]).astype(np.float64)
            want = oracle.gcl_forward(
                bar, x_nodes, np.asarray(gate, np.float64),
                np.asarray(rel_w, np.float64), np.asarray(root, np.float64),
                np.asarray(bias, np.float64))
            got = oracle.lattice_to_nodes(bar, np.asarray(out[b, nb]))
            np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)
