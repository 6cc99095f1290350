"""Round-4 raised-VMEM knobs: env plumbing + kernel equivalence.

POLY_VMEM_LIMIT_MB raises Mosaic's scoped-VMEM budget (per-kernel
vmem_limit_bytes) and utils.compiler_options() supplies the matching
xla_tpu_scoped_vmem_limit_kib for the enclosing jit. On CPU the kernels
run in interpret mode (no Mosaic), so here we verify the policy logic and
that tile-size overrides never change semantics; the on-hardware win is
recorded by scripts/probes/vmem_probe.py + PERFORMANCE.md.
"""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from polyphemus_tpu import utils
from polyphemus_tpu.ops import lattice
from polyphemus_tpu.ops.kernels import gcl_pallas


@pytest.fixture
def clean_env(monkeypatch):
    monkeypatch.delenv("POLY_VMEM_LIMIT_MB", raising=False)
    monkeypatch.delenv("POLY_GCL_FWD_BB", raising=False)
    monkeypatch.delenv("POLY_GCL_BWD_BB_DATA", raising=False)
    monkeypatch.delenv("POLY_GCL_BWD_BB_W", raising=False)
    return monkeypatch


def test_compiler_options_default_none(clean_env):
    assert utils.compiler_options() is None
    assert gcl_pallas.vmem_limit_bytes() is None


def test_compiler_options_env(clean_env):
    clean_env.setenv("POLY_VMEM_LIMIT_MB", "64")
    # the XLA option is TPU-only: on the CPU suite backend it must be
    # suppressed (the CPU compiler rejects unknown options), while a TPU
    # backend gets the kib value
    assert utils.compiler_options() is None  # suite runs on CPU
    clean_env.setattr(utils.jax, "default_backend", lambda: "tpu")
    assert utils.compiler_options() == {
        "xla_tpu_scoped_vmem_limit_kib": 64 * 1024}
    assert gcl_pallas.vmem_limit_bytes() == 64 * 2**20
    # interpret mode never attaches Mosaic params (CPU suite must not
    # depend on the TPU compiler)
    assert gcl_pallas._compiler_params(interpret=True) is None
    params = gcl_pallas._compiler_params(interpret=False)
    assert params is not None and params.vmem_limit_bytes == 64 * 2**20


def test_zero_disables_everywhere(clean_env):
    """POLY_VMEM_LIMIT_MB=0 means "disabled", not a 0-byte budget (round-5
    ADVICE fix): both the Mosaic kernel param and the XLA jit option must
    behave exactly as if the var were unset."""
    clean_env.setenv("POLY_VMEM_LIMIT_MB", "0")
    assert gcl_pallas.vmem_limit_bytes() is None
    assert gcl_pallas._compiler_params(interpret=False) is None
    clean_env.setattr(utils.jax, "default_backend", lambda: "tpu")
    assert utils.compiler_options() is None


def test_compiler_options_non_tpu_backends(clean_env):
    """The scoped-VMEM option is attached only on TPU backends ('tpu' or
    the tunneled 'axon'); GPUs/CPUs reject unknown XLA options."""
    clean_env.setenv("POLY_VMEM_LIMIT_MB", "32")
    for backend, want in [("cpu", None), ("gpu", None), ("cuda", None),
                          ("tpu", {"xla_tpu_scoped_vmem_limit_kib": 32768}),
                          ("axon", {"xla_tpu_scoped_vmem_limit_kib": 32768})]:
        clean_env.setattr(utils.jax, "default_backend", lambda b=backend: b)
        assert utils.compiler_options() == want, backend


def test_tpu_jit_wrapper(clean_env):
    """utils.tpu_jit pairs the jit with compiler_options() automatically
    and otherwise behaves as jax.jit."""
    clean_env.setenv("POLY_VMEM_LIMIT_MB", "64")
    f = utils.tpu_jit(lambda x, n: x * n, static_argnums=1)
    assert float(f(jnp.float32(2.0), 3)) == 6.0


def _tiny_case(seed=0, b=3, nb=2, t=4, s=32, d=64):
    rng = np.random.default_rng(seed)
    mask = rng.random((b, nb, t, s)) < 0.3
    mask[..., 0, 0] = True
    x = (rng.standard_normal((b, nb, t, s, d)).astype(np.float32)
         * mask[..., None])
    gate = rng.standard_normal((s, d)).astype(np.float32) * 0.3
    rel_w = (rng.standard_normal((6, d, d)) * (d ** -0.5)).astype(np.float32)
    root = (rng.standard_normal((d, d)) * (d ** -0.5)).astype(np.float32)
    bias = rng.standard_normal((d,)).astype(np.float32) * 0.1
    return (jnp.asarray(x), jnp.asarray(mask), jnp.asarray(gate),
            jnp.asarray(rel_w), jnp.asarray(root), jnp.asarray(bias))


def test_fwd_bb_env_override_same_result(clean_env):
    """POLY_GCL_FWD_BB only changes the tile size, never the math."""
    x, mask, gate, rel_w, root, bias = _tiny_case()
    aux = gcl_pallas.build_kernel_aux(mask)
    ref = gcl_pallas.gcl_fused(x, gate, rel_w, root, bias, aux, mask)
    clean_env.setenv("POLY_GCL_FWD_BB", "2")
    out = gcl_pallas.gcl_fused(x, gate, rel_w, root, bias, aux, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_bwd_tile_env_override_same_grads(clean_env):
    """Backward tile overrides keep gradients identical."""
    import jax

    x, mask, gate, rel_w, root, bias = _tiny_case(seed=1)
    aux = gcl_pallas.build_kernel_aux(mask)

    def loss(params):
        out = gcl_pallas.gcl_fused(params["x"], params["g"], params["w"],
                                   params["r"], params["b"], aux, mask)
        return jnp.sum(out * out)

    p = {"x": x, "g": gate, "w": rel_w, "r": root, "b": bias}
    ref = jax.grad(loss)(p)
    clean_env.setenv("POLY_GCL_BWD_BB_DATA", "1")
    clean_env.setenv("POLY_GCL_BWD_BB_W", "3")
    out = jax.grad(loss)(p)
    for k in p:
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]),
                                   rtol=1e-5, atol=1e-5, err_msg=k)


def test_raised_limit_does_not_change_interpret_semantics(clean_env):
    """With the raised-VMEM env set, CPU (interpret) results match the XLA
    lattice oracle exactly as before."""
    clean_env.setenv("POLY_VMEM_LIMIT_MB", "64")
    x, mask, gate, rel_w, root, bias = _tiny_case(seed=2)
    aux = gcl_pallas.build_kernel_aux(mask)
    out = gcl_pallas.gcl_fused(x, gate, rel_w, root, bias, aux, mask)
    nbr = lattice.build_neighbors(mask)
    ref = lattice.gcl_apply(x, mask, nbr, gate, rel_w, root, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
