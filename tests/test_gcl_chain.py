"""Chained eval GCL kernel (round 5): K layers per Pallas invocation.

The generation-path kernel chains gcl layers so node states never return
to HBM between layers (VERDICT r4 item 2). Chaining must be a pure
scheduling change: outputs bit-identical (in interpret mode) to the
per-layer Pallas path for every chain length, including remainders, and
equal to the XLA lattice formulation within fp32 tolerance.
"""
import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from polyphemus_tpu.config import ModelConfig
from polyphemus_tpu.models import VAE
from polyphemus_tpu.ops import lattice
from polyphemus_tpu.ops.kernels import gcl_pallas


def _stack_case(seed=0, b=3, nb=2, t=4, s=32, d=64, n_layers=3):
    rng = np.random.default_rng(seed)
    mask = rng.random((b, nb, t, s)) < 0.3
    mask[..., 0, 0] = True
    x = (rng.standard_normal((b, nb, t, s, d)).astype(np.float32)
         * mask[..., None])
    gate = rng.standard_normal((s, d)).astype(np.float32) * 0.3
    layers = []
    for i in range(n_layers):
        rel_w = (rng.standard_normal((6, d, d)) * (d ** -0.5)
                 ).astype(np.float32)
        root = (rng.standard_normal((d, d)) * (d ** -0.5)).astype(np.float32)
        bias = rng.standard_normal((d,)).astype(np.float32) * 0.1
        ea = 1.0 + 0.1 * rng.standard_normal((d,)).astype(np.float32)
        eb = 0.1 * rng.standard_normal((d,)).astype(np.float32)
        layers.append((rel_w, root, bias, ea, eb))
    return jnp.asarray(x), jnp.asarray(mask), jnp.asarray(gate), layers


def _run_per_layer(x, mask, gate, layers):
    aux = gcl_pallas.build_kernel_aux(mask)
    t = mask.shape[-2]
    for rel_w, root, bias, ea, eb in layers:
        wbig = gcl_pallas.pack_weights(jnp.asarray(rel_w), jnp.asarray(root),
                                       t, dtype=x.dtype)
        x = gcl_pallas.gcl_apply_pallas(
            x, aux, gate, wbig, jnp.asarray(bias),
            epilogue_affine=(jnp.asarray(ea), jnp.asarray(eb)))
    return x


def _run_chained(x, mask, gate, layers, chain):
    aux = gcl_pallas.build_kernel_aux(mask)
    t = mask.shape[-2]
    d = x.shape[-1]
    packed = [(gcl_pallas.pack_weights(jnp.asarray(w), jnp.asarray(r), t,
                                       dtype=x.dtype),
               jnp.asarray(b), jnp.asarray(ea), jnp.asarray(eb))
              for w, r, b, ea, eb in layers]
    for lo in range(0, len(packed), chain):
        grp = packed[lo:lo + chain]
        x = gcl_pallas.gcl_apply_pallas_chain(
            x, aux, gate,
            jnp.stack([g[0] for g in grp]),
            jnp.stack([g[1].reshape(1, d) for g in grp]),
            jnp.stack([g[2].reshape(1, d) for g in grp]),
            jnp.stack([g[3].reshape(1, d) for g in grp]))
    return x


@pytest.mark.parametrize("chain", [1, 2, 3])
def test_chain_matches_per_layer(chain):
    x, mask, gate, layers = _stack_case(n_layers=3)
    ref = _run_per_layer(x, mask, gate, layers)
    out = _run_chained(x, mask, gate, layers, chain)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_chain_matches_xla_stack():
    """Chained kernel vs the XLA formulation of the same residual stack
    (gcl -> affine -> mask -> relu -> +residual per layer)."""
    x, mask, gate, layers = _stack_case(seed=1, n_layers=2)
    out = _run_chained(x, mask, gate, layers, 2)
    nbr = lattice.build_neighbors(mask)
    ref = x
    m = mask[..., None].astype(x.dtype)
    for rel_w, root, bias, ea, eb in layers:
        y = lattice.gcl_apply(ref, mask, nbr, gate, jnp.asarray(rel_w),
                              jnp.asarray(root), jnp.asarray(bias))
        y = (y * jnp.asarray(ea) + jnp.asarray(eb)) * m
        ref = ref + jax.nn.relu(y)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("chain", [2, 4])
def test_decode_identical_under_chaining(chain):
    """Full VAE.decode: gcl_chain is a pure scheduling knob (same params,
    same outputs) for every chain length incl. non-divisors of n_layers."""
    base = ModelConfig(d=32, gnn_n_layers=3, n_bars=2, resolution=8,
                       dropout=0.0, batch_norm=True, use_pallas_gcl=True)
    toks0 = jnp.zeros((1, 2, 4, 32, 16, 2), jnp.int32)
    mask0 = jnp.zeros((1, 2, 4, 32), bool).at[:, :, 0, 0].set(True)
    variables = VAE(base).init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        toks0, mask0, deterministic=True)
    z = jax.random.normal(jax.random.key(5), (3, base.d))
    s1, c1, _ = VAE(base).apply(variables, z, method=VAE.decode)
    cfg = dataclasses.replace(base, gcl_chain=chain)
    s2, c2, _ = VAE(cfg).apply(variables, z, method=VAE.decode)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2),
                               rtol=1e-6, atol=1e-6)


def test_chain_env_override(monkeypatch):
    """POLY_GCL_CHAIN sweeps the chain without touching the config."""
    x, mask, gate, layers = _stack_case(seed=2, n_layers=2, d=32)
    ref = _run_per_layer(x, mask, gate, layers)
    base = ModelConfig(d=32, gnn_n_layers=2, n_bars=2, resolution=8,
                       dropout=0.0, batch_norm=False, use_pallas_gcl=True)
    # env parse path only (model-level equality is covered above): ensure
    # make_generator sizes VMEM from the env value without crashing
    monkeypatch.setenv("POLY_GCL_CHAIN", "2")
    from polyphemus_tpu.generate import make_generator
    toks0 = jnp.zeros((1, 2, 4, 32, 16, 2), jnp.int32)
    mask0 = jnp.zeros((1, 2, 4, 32), bool).at[:, :, 0, 0].set(True)
    variables = VAE(base).init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        toks0, mask0, deterministic=True)
    gen = make_generator(VAE(base), variables, pallas=True)
    used_mask, tokens = gen(jax.random.normal(jax.random.key(1), (2, 32)))
    assert tokens.shape[:2] == (2, 2)
    assert np.asarray(ref).shape == np.asarray(x).shape


def test_make_generator_defaults_to_chain2(monkeypatch):
    """Round-5 shipped default: make_generator(pallas=True) with a default
    config (gcl_chain=1, no POLY_GCL_CHAIN) runs the chained kernel at
    chain=2 — and the outputs are identical to an explicit chain=1 run."""
    monkeypatch.delenv("POLY_GCL_CHAIN", raising=False)
    from polyphemus_tpu.generate import make_generator
    base = ModelConfig(d=32, gnn_n_layers=2, n_bars=2, resolution=8,
                       dropout=0.0, batch_norm=True, use_pallas_gcl=True)
    assert base.gcl_chain == 1
    toks0 = jnp.zeros((1, 2, 4, 32, 16, 2), jnp.int32)
    mask0 = jnp.zeros((1, 2, 4, 32), bool).at[:, :, 0, 0].set(True)
    variables = VAE(base).init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        toks0, mask0, deterministic=True)
    z = jax.random.normal(jax.random.key(7), (2, base.d))
    gen_default = make_generator(VAE(base), variables, pallas=True)
    m_def, t_def = gen_default(z)
    # explicit opt-out pins chain=1 (per-layer kernel)
    monkeypatch.setenv("POLY_GCL_CHAIN", "1")
    gen_per_layer = make_generator(VAE(base), variables, pallas=True)
    m_ref, t_ref = gen_per_layer(z)
    np.testing.assert_array_equal(np.asarray(m_def), np.asarray(m_ref))
    np.testing.assert_array_equal(np.asarray(t_def), np.asarray(t_ref))


def test_chain_vmem_bytes_sizing():
    """Sizing helper: small cases fit the default budget (None); flagship
    fp32 chain-2 does not and returns a concrete limit."""
    assert gcl_pallas.chain_vmem_bytes(2, 64, 8, 4) is None
    need = gcl_pallas.chain_vmem_bytes(2, 512, 8, 4)
    assert need is not None and need > 16 * 2**20
    # weights alone (2 x 8.4 MB fp32) must be covered
    assert need > 2 * 8 * 512 * 512 * 4
