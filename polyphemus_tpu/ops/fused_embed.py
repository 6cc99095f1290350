"""Histogram-fused content-encoder front end.

The plain path materializes per-slot embeddings (B, nb, T, S, 15, d/2),
batch-normalizes them (multi-GB intermediates + several HBM passes) and runs
the chord Linear. Because embeddings are table lookups, both steps collapse:

  * masked BN batch statistics are EXACT functions of the per-vocab
    histogram of active-cell token ids:
        E[x]  = (hist @ table) / N + b_emb
        E[x²] = (hist @ table²) / N + 2 b_emb (hist @ table)/N + b_emb²
  * the BN affine (x·A + B) and the chord projection then fold into
    per-slot fused lookup tables
        T_s[v] = (A ⊙ table[v]) @ W_chord[slot s rows]
    so the whole stage becomes 2×15 gathers from (vocab, d) tables plus a
    constant — no (cells, 15, d) tensor ever exists.

Numerically identical to the plain path (same stats, same affine; verified
in tests). Differentiable end-to-end: gradients flow to the embedding
tables, BN scale/bias and the chord kernel through the table algebra.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class GroupStats(NamedTuple):
    mean: jax.Array
    var: jax.Array   # biased (normalization) variance
    count: jax.Array


def embedding_stats(table, emb_bias, ids, cell_mask) -> GroupStats:
    """Exact masked-BN batch stats of the `table[id] + bias` rows, via one
    gather-reduce (XLA fuses the square; no (cells, slots, d) tensor in HBM).

    ids: (..., n_slots) int; cell_mask: (...) bool — every slot of an
    active cell counts once, matching BN over the packed rows.
    """
    w = jnp.broadcast_to(cell_mask[..., None],
                         ids.shape).astype(jnp.float32)
    # histogram route (round 4): sum_cells table[id] = hist @ table, so the
    # per-cell gather (TPU-serialized, and the reason the fused front lost
    # its round-2 bench) disappears. The one-hot never materializes — XLA
    # fuses the iota-compare into the (vocab,)-shaped reduce — and integer
    # counts in f32 are exact, so these stats are if anything BETTER
    # rounded than reducing a bf16 embedding tensor.
    vocab = table.shape[0]
    oh = jax.nn.one_hot(ids, vocab, dtype=jnp.float32)
    axes = tuple(range(w.ndim))
    hist = jnp.sum(oh * w[..., None], axis=axes)  # (vocab,)
    n = jnp.maximum(jnp.sum(w), 1.0)
    t32 = table.astype(jnp.float32)
    s1 = (hist @ t32) / n
    s2 = (hist @ jnp.square(t32)) / n
    mean = s1 + emb_bias
    ex2 = s2 + 2.0 * emb_bias * s1 + jnp.square(emb_bias)
    var = jnp.maximum(ex2 - jnp.square(mean), 0.0)
    return GroupStats(mean, var, jnp.sum(w))


def bn_affine(stats_mean, stats_var, scale, bn_bias, eps: float = 1e-5):
    a = scale * jax.lax.rsqrt(stats_var + eps)
    return a, bn_bias - stats_mean * a


def running_update(r_mean, r_var, stats: GroupStats, momentum: float = 0.1):
    """torch-convention running update (unbiased var)."""
    n = jnp.maximum(stats.count, 1.0)
    unbias = jnp.where(n > 1, n / jnp.maximum(n - 1.0, 1.0), 1.0)
    new_mean = (1 - momentum) * r_mean + momentum * stats.mean
    new_var = (1 - momentum) * r_var + momentum * stats.var * unbias
    return new_mean, new_var


def fused_tables(table, emb_bias, a, b, w_slot_rows):
    """Per-slot fused lookup table + constant.

    table (vocab, h), emb_bias (h,), BN affine (a, b) (h,), w_slot_rows
    (n_slots, h, d). Returns (T (n_slots, vocab, d), const (n_slots, d))
    with T_s[v] + const_s == ((table[v]+emb_bias)*a + b) @ w_slot_rows[s].
    """
    scaled = table * a  # (vocab, h)
    t = jnp.einsum("vh,shd->svd", scaled, w_slot_rows)
    offset = emb_bias * a + b  # (h,)
    const = jnp.einsum("h,shd->sd", offset, w_slot_rows)
    return t, const


def gather_sum(tables, const, ids):
    """sum_s tables[s][ids[..., s]] + const[s] -> (..., d).

    Lookup as a one-hot matmul per slot (round 4): tables[s][ids] ==
    onehot(ids) @ tables[s]. The forward rides the MXU and the backward
    (dT_s = onehot^T @ g) is a matmul too, instead of the scatter-add the
    gather lowering produced — the same trade EmbedLinear makes
    (models/vae.py:44-51), which is what kept the fused front slower than
    the plain path until now."""
    out = jnp.sum(const, axis=0)
    vocab = tables.shape[1]
    for s in range(tables.shape[0]):
        oh = jax.nn.one_hot(ids[..., s], vocab, dtype=tables.dtype)
        out = out + oh @ tables[s]
    return out
