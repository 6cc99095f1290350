"""Masked statistics ops: batch-norm and attention pooling over padded lattices.

The reference operates on packed variable-length node sets, so its BatchNorm1d
(/root/reference/model.py:318-320, :335-339) and GlobalAttention softmax
(/root/reference/model.py:340, :407-409) see only real nodes. Our dense layout
keeps every lattice cell, so statistics and softmaxes must be computed under
the activation mask to match.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def masked_moments(x: jax.Array, mask: jax.Array, axes) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Mean/biased-variance of x over `axes`, counting only mask-true entries.

    x: (..., d); mask broadcastable to x's shape minus the feature dim.
    Returns (mean, var, count) reduced over `axes`.
    """
    m = mask.astype(x.dtype)[..., None]
    cnt = jnp.sum(m, axis=axes)
    cnt_safe = jnp.maximum(cnt, 1.0)
    mean = jnp.sum(x * m, axis=axes) / cnt_safe
    var = jnp.sum(jnp.square(x) * m, axis=axes) / cnt_safe - jnp.square(mean)
    var = jnp.maximum(var, 0.0)
    return mean, var, cnt


def batch_norm_masked(
    x: jax.Array,
    mask: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    running_mean: jax.Array,
    running_var: jax.Array,
    *,
    use_running: bool,
    momentum: float = 0.1,
    eps: float = 1e-5,
):
    """BatchNorm over all leading axes with masked statistics.

    Matches torch BatchNorm1d semantics (momentum 0.1, biased variance for
    normalization, unbiased for the running update). Returns
    (y, new_running_mean, new_running_var).
    """
    axes = tuple(range(x.ndim - 1))
    if use_running:
        mean, var = running_mean, running_var
        new_mean, new_var = running_mean, running_var
    else:
        mean, var, cnt = masked_moments(x, mask, axes)
        n = jnp.sum(mask.astype(x.dtype))
        unbias = jnp.where(n > 1, n / jnp.maximum(n - 1.0, 1.0), 1.0)
        new_mean = (1 - momentum) * running_mean + momentum * mean
        new_var = (1 - momentum) * running_var + momentum * var * unbias
    y = (x - mean) * jax.lax.rsqrt(var + eps) * scale + bias
    return y, new_mean, new_var


def masked_softmax(logits: jax.Array, mask: jax.Array, axis: int) -> jax.Array:
    """Softmax over `axis` with inactive entries forced to zero probability.

    Computed in fp32 regardless of input dtype, mirroring the reference's
    fp32 autocast island around attention pooling (model.py:407-409).
    """
    dt = logits.dtype
    x = logits.astype(jnp.float32)
    neg = jnp.finfo(jnp.float32).min
    x = jnp.where(mask, x, neg)
    x = x - jax.lax.stop_gradient(jnp.max(x, axis=axis, keepdims=True))
    ex = jnp.exp(x) * mask.astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(ex, axis=axis, keepdims=True), 1e-30)
    return (ex / denom).astype(dt)


def attention_pool_bars(
    x: jax.Array, gates: jax.Array, mask: jax.Array
) -> jax.Array:
    """Soft-attention pooling of lattice cells into a bar embedding.

    x: (..., T, S, d); gates: (..., T, S, 1) raw gate logits;
    mask: (..., T, S). Returns (..., d). Equivalent to PyG GlobalAttention
    with segment ids = distinct bars (reference model.py:334-340, :407-409).
    """
    lead = x.shape[:-3]
    d = x.shape[-1]
    cells = x.shape[-3] * x.shape[-2]
    xf = x.reshape(lead + (cells, d))
    gf = gates.reshape(lead + (cells,))
    mf = mask.reshape(lead + (cells,))
    w = masked_softmax(gf, mf, axis=-1)
    return jnp.einsum("...c,...cd->...d", w.astype(jnp.float32),
                      xf.astype(jnp.float32)).astype(x.dtype)
