"""Reference-faithful training config on the fast path.

The reference ALWAYS trains with dropout: p=0.1 on MLP/coder/slot hiddens
(training.json `dropout`) and a hard-coded p=0.1 on every GCL edge message
(/root/reference/model.py:44,133). Round 2/3 made that config exact but
slow (logits-path CE, XLA GCL). These tests cover the fast-path pieces:

  * fused_ce with model.dropout > 0: the slot scan draws per-slot dropout
    keys (same iid semantics as the logits path's nn.Dropout on the full
    (..., 15, d) slot-hidden tensor) — deterministic per rng, active, and
    unbiased against the logits path in expectation;
  * (kernel edge dropout covered in tests/test_kernel_dropout.py).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from polyphemus_tpu.config import ModelConfig, TrainConfig
from polyphemus_tpu.data.dataset import synthetic_batch
from polyphemus_tpu.models import VAE
from polyphemus_tpu.train.trainer import (_forward_loss, create_train_state,
                                          make_optimizer, make_train_step)


def _setup(dropout, d=24, layers=1, batch=3):
    mcfg = ModelConfig(d=d, gnn_n_layers=layers, n_bars=2, resolution=8,
                       dropout=dropout, batch_norm=True)
    cfg = TrainConfig(batch_size=batch, fused_ce=True, model=mcfg)
    model = VAE(mcfg)
    toks, mask = synthetic_batch(np.random.default_rng(3), batch, 2)
    toks, mask = jnp.asarray(toks), jnp.asarray(mask)
    state = create_train_state(model, cfg, jax.random.key(0), toks, mask)
    return model, cfg, state, toks, mask


@pytest.mark.slow
def test_fused_ce_dropout_trains_fused_and_deterministic():
    model, cfg, state, toks, mask = _setup(dropout=0.3)
    step = jax.jit(make_train_step(model, cfg, make_optimizer(cfg)))
    _, l1, _ = step(state, toks, mask, jax.random.key(1))
    _, l1b, _ = step(state, toks, mask, jax.random.key(1))
    _, l2, _ = step(state, toks, mask, jax.random.key(2))
    assert float(l1["tot"]) == float(l1b["tot"])  # same rng -> same draws
    assert float(l1["tot"]) != float(l2["tot"])   # dropout is live
    assert np.isfinite(float(l1["tot"]))


def test_fused_ce_dropout_unbiased_vs_logits_path():
    """E[loss] under the fused path's per-slot dropout keys must match
    E[loss] under the logits path's one-shot nn.Dropout (same iid Bernoulli
    semantics, different draws)."""
    model, cfg_f, state, toks, mask = _setup(dropout=0.25)
    cfg_l = dataclasses.replace(cfg_f, fused_ce=False)

    def mean_loss(cfg, n=48):
        fwd = jax.jit(lambda r: _forward_loss(
            model, cfg, state.params, state.batch_stats, toks, mask, r,
            jnp.zeros(()), True)[0])
        vals = [float(fwd(jax.random.key(i))) for i in range(n)]
        return float(np.mean(vals)), float(np.std(vals) / np.sqrt(n))

    mf, sf = mean_loss(cfg_f)
    ml, sl = mean_loss(cfg_l)
    # means agree within 4 joint standard errors (same distribution)
    tol = 4.0 * float(np.hypot(sf, sl)) + 1e-6
    assert abs(mf - ml) < tol, (mf, ml, tol)


def test_fused_ce_dropout_zero_matches_logits_exactly():
    """p=0 stays the numerically-equivalent path (regression: the dropout
    plumbing must be inert when disabled)."""
    model, cfg_f, state, toks, mask = _setup(dropout=0.0)
    cfg_l = dataclasses.replace(cfg_f, fused_ce=False)
    lf = _forward_loss(model, cfg_f, state.params, state.batch_stats, toks,
                       mask, jax.random.key(5), jnp.zeros(()), True)[0]
    ll = _forward_loss(model, cfg_l, state.params, state.batch_stats, toks,
                       mask, jax.random.key(5), jnp.zeros(()), True)[0]
    assert float(lf) == pytest.approx(float(ll), rel=2e-5)
