"""Dense bar-lattice graph operations.

The reference builds an explicit heterogeneous graph per bar on the host
(/root/reference/data.py:141-204) and runs sparse message passing with
torch-scatter (/root/reference/model.py:41-135). Both are XLA-hostile: dynamic
node counts, per-relation Python loops, CPU graph construction inside the
decoder forward (/root/reference/model.py:596-632).

Here the graph never materializes. Nodes are ALL `n_tracks x n_timesteps`
lattice cells of a bar, with a boolean activation mask (the structure tensor).
The six edge relations are pure functions of the mask:

  * TRACK t (t in 0..3): consecutive active cells within row t, both
    directions (reference data.py:24-51).
  * ONSET: all pairs of active cells in the same column, both directions
    (reference data.py:54-80).
  * NEXT: all cross-track pairs from an active column to the *next* active
    column, forward only (reference data.py:83-121).

Each relation reduces to gathers along the time axis + tiny reductions over
the 4-track axis — no scatter ops, fully static shapes, vmappable over batch
and bars, with the per-relation projections fused into MXU matmuls.

Message semantics follow the reference GCL exactly
(/root/reference/model.py:101-135): per-edge message
`relu(x_src * gate(dist))`, MEAN-aggregated per relation per destination
(PyG RGCNConv default), then `sum_r h_r @ W_r + x @ root + bias`.

Quirks reproduced (SURVEY.md §2.2 context):
  * empty bar -> fake activation at cell [0, 0] (data.py:152-153) — callers
    apply `ensure_nonempty_bars` to the mask first;
  * single-node bar -> fake self-edge of relation 0 with distance 0
    (data.py:170-176), regardless of the node's track.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


def ensure_nonempty_bars(mask: jax.Array) -> jax.Array:
    """Force cell [0, 0] active in bars with no activations.

    mask: (..., n_tracks, n_timesteps) bool. Mirrors reference
    data.py:152-153 and model.py:619-621.
    """
    empty = ~jnp.any(mask, axis=(-1, -2), keepdims=True)  # (..., 1, 1)
    t, s = mask.shape[-2], mask.shape[-1]
    cell00 = (
        (jnp.arange(t)[:, None] == 0) & (jnp.arange(s)[None, :] == 0)
    )
    return mask | (empty & cell00)


class LatticeNeighbors(NamedTuple):
    """Static-shape neighbor structure derived from an activation mask.

    All index tensors are int32 and clipped-safe (validity carried in the
    companion boolean); shapes broadcast over arbitrary leading dims.
    """

    # Previous/next active cell in the same row: (..., T, S)
    prev_in_row: jax.Array
    prev_in_row_ok: jax.Array
    next_in_row: jax.Array
    next_in_row_ok: jax.Array
    # Previous active column (any track): (..., S)
    prev_col: jax.Array
    prev_col_ok: jax.Array
    # Active tracks per column: (..., S) int32
    col_count: jax.Array
    # Bars with exactly one active cell (self-loop quirk): (...,) bool
    single_node: jax.Array


def build_neighbors(mask: jax.Array) -> LatticeNeighbors:
    """Compute lattice neighbor indices from mask (..., T, S) bool."""
    s = mask.shape[-1]
    iota = jnp.arange(s, dtype=jnp.int32)

    # prev active index along last axis (exclusive): running max of
    # (index where active else -1), shifted right by one.
    def prev_scan(m):
        vals = jnp.where(m, iota, -1)
        incl = jax.lax.cummax(vals, axis=vals.ndim - 1)
        return jnp.concatenate(
            [jnp.full(m.shape[:-1] + (1,), -1, incl.dtype), incl[..., :-1]],
            axis=-1,
        )

    def next_scan(m):
        vals = jnp.where(m, iota, s)
        incl = jnp.flip(
            jax.lax.cummin(jnp.flip(vals, -1), axis=vals.ndim - 1), -1
        )
        return jnp.concatenate(
            [incl[..., 1:], jnp.full(m.shape[:-1] + (1,), s, incl.dtype)],
            axis=-1,
        )

    prev_row = prev_scan(mask)
    next_row = next_scan(mask)
    col_active = jnp.any(mask, axis=-2)  # (..., S)
    prev_col = prev_scan(col_active)

    col_count = jnp.sum(mask.astype(jnp.int32), axis=-2)
    n_active = jnp.sum(mask.astype(jnp.int32), axis=(-1, -2))

    return LatticeNeighbors(
        prev_in_row=jnp.maximum(prev_row, 0).astype(jnp.int32),
        prev_in_row_ok=prev_row >= 0,
        next_in_row=jnp.minimum(next_row, s - 1).astype(jnp.int32),
        next_in_row_ok=next_row < s,
        prev_col=jnp.maximum(prev_col, 0).astype(jnp.int32),
        prev_col_ok=prev_col >= 0,
        col_count=col_count,
        single_node=n_active == 1,
    )


def _gather_time(x: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather x (..., S, d) at time indices idx (..., S) -> (..., S, d)."""
    return jnp.take_along_axis(x, idx[..., None], axis=-2)


def relational_messages(
    x: jax.Array,
    mask: jax.Array,
    nbr: LatticeNeighbors,
    gate_table: jax.Array,
    *,
    edge_dropout_p: float = 0.0,
    edge_dropout_rng=None,
):
    """Aggregate per-relation mean messages over the lattice.

    Args:
      x: node states (..., T, S, d); inactive cells must be zero.
      mask: (..., T, S) bool.
      nbr: neighbors from `build_neighbors(mask)`.
      gate_table: (S, d) — `edge_nn` evaluated on each one-hot timestep
        distance (reference model.py:123-131: message = relu(x_j * nn(dist))).

    Returns:
      h_track: (..., T, S, d) mean-aggregated TRACK-relation messages; row t
        holds relation t (rows are disjoint across track relations).
      h_onset: (..., T, S, d) ONSET-relation messages.
      h_next:  (..., T, S, d) NEXT-relation messages.
      h_self:  (..., T, S, d) single-node fake self-edge messages, to be
        routed through relation 0's weight.

    Per-edge dropout (edge_dropout_p > 0 with a rng): reproduces the
    reference's hard-coded p=0.1 dropout on every edge message EXACTLY
    (model.py:44,133 — F.dropout on each message before aggregation; GCN
    never forwards its configured dropout to GCL). TRACK/self messages are
    individually materialized, so iid elementwise masks on them are per-edge
    by construction; ONSET/NEXT aggregates expand to explicit
    (dst_track, src_track, step) message tensors (T=4, so 4x the message
    memory) so every ordered edge gets its own draw. Verified edge-for-edge
    against a sparse per-edge oracle (tests/oracle.py). The mask draw order
    (split into p/n/onset/next/self) is a stable contract the test oracle
    replays.
    """
    s = mask.shape[-1]
    t = mask.shape[-2]
    dt = x.dtype
    iota = jnp.arange(s, dtype=jnp.int32)
    m_f = mask.astype(dt)[..., None]  # (..., T, S, 1)

    ed = edge_dropout_p > 0.0 and edge_dropout_rng is not None
    if ed:
        keep = 1.0 - edge_dropout_p
        k_p, k_n, k_on, k_nx, k_self = jax.random.split(edge_dropout_rng, 5)

        def drop(msg, key):
            km = jax.random.bernoulli(key, keep, msg.shape)
            return jnp.where(km, msg / keep, 0.0).astype(dt)

    # --- TRACK relations: prev/next active cell in the same row -----------
    xp = _gather_time(x, nbr.prev_in_row)
    gp = gate_table[jnp.clip(iota - nbr.prev_in_row, 0, s - 1)]
    ok_p = nbr.prev_in_row_ok[..., None].astype(dt)
    msg_p = jax.nn.relu(xp * gp) * ok_p

    xn = _gather_time(x, nbr.next_in_row)
    gn = gate_table[jnp.clip(nbr.next_in_row - iota, 0, s - 1)]
    ok_n = nbr.next_in_row_ok[..., None].astype(dt)
    msg_n = jax.nn.relu(xn * gn) * ok_n

    if ed:
        # each destination has at most one prev and one next edge: a mask
        # per (dst cell, feature, direction) IS a mask per edge
        msg_p = drop(msg_p, k_p)
        msg_n = drop(msg_n, k_n)

    cnt = ok_p + ok_n
    h_track = jnp.where(cnt > 0, (msg_p + msg_n) / jnp.maximum(cnt, 1), 0.0)
    h_track = h_track * m_f

    # --- ONSET relation: other active tracks in the same column -----------
    y0 = jax.nn.relu(x * gate_table[0]) * m_f  # (..., T, S, d)
    cnt_on = (nbr.col_count[..., None, :] - mask.astype(jnp.int32))[..., None]
    # incoming count for an active cell = active tracks in column - itself
    if not ed:
        col_sum = jnp.sum(y0, axis=-3, keepdims=True)  # (..., 1, S, d)
        h_onset = (col_sum - y0) / jnp.maximum(cnt_on, 1).astype(dt)
    else:
        # explicit per-(dst_track, src_track) messages so each ordered edge
        # draws its own mask; axis -4 = dst track, -3 = src track
        not_eye = ~jnp.eye(t, dtype=bool)[:, :, None]  # (T, T, 1)
        valid_on = (mask[..., :, None, :] & mask[..., None, :, :] & not_eye)
        msgs_on = (jnp.broadcast_to(y0[..., None, :, :, :],
                                    y0.shape[:-3] + (t, t, s) + y0.shape[-1:])
                   * valid_on[..., None].astype(dt))
        msgs_on = drop(msgs_on, k_on)
        h_onset = (jnp.sum(msgs_on, axis=-3)
                   / jnp.maximum(cnt_on, 1).astype(dt))
    h_onset = jnp.where((cnt_on > 0) & (m_f > 0), h_onset, 0.0)

    # --- NEXT relation: all cross-track cells of the previous active column
    pcol = nbr.prev_col[..., None, :]  # (..., 1, S)
    pcol_b = jnp.broadcast_to(pcol, mask.shape)
    xsrc = _gather_time(x, pcol_b)  # (..., T, S, d): x[t, prev_col[c]]
    msrc = jnp.take_along_axis(mask, pcol_b, axis=-1)  # (..., T, S)
    gnx = gate_table[jnp.clip(iota - nbr.prev_col, 0, s - 1)]  # (..., S, d)
    z = jax.nn.relu(xsrc * gnx[..., None, :, :]) * msrc[..., None].astype(dt)
    cnt_src = jnp.sum(msrc.astype(jnp.int32), axis=-2)[..., None, :]
    cnt_nx = (cnt_src - msrc.astype(jnp.int32))[..., None]
    ok_nx = nbr.prev_col_ok[..., None, :, None] & (cnt_nx > 0) & (m_f > 0)
    if not ed:
        zsum = jnp.sum(z, axis=-3, keepdims=True)  # (..., 1, S, d)
        h_next_raw = (zsum - z) / jnp.maximum(cnt_nx, 1).astype(dt)
    else:
        not_eye = ~jnp.eye(t, dtype=bool)[:, :, None]
        valid_nx = (msrc[..., None, :, :] & mask[..., :, None, :] & not_eye
                    & nbr.prev_col_ok[..., None, None, :])
        msgs_nx = (jnp.broadcast_to(z[..., None, :, :, :],
                                    z.shape[:-3] + (t, t, s) + z.shape[-1:])
                   * valid_nx[..., None].astype(dt))
        msgs_nx = drop(msgs_nx, k_nx)
        h_next_raw = (jnp.sum(msgs_nx, axis=-3)
                      / jnp.maximum(cnt_nx, 1).astype(dt))
    h_next = jnp.where(ok_nx, h_next_raw, 0.0)

    # --- Single-node self-loop quirk (relation 0, distance 0) -------------
    single = nbr.single_node[..., None, None, None].astype(dt)
    h_self = jax.nn.relu(x * gate_table[0]) * m_f * single
    if ed:
        h_self = drop(h_self, k_self)

    return h_track, h_onset, h_next, h_self


def gcl_apply(
    x: jax.Array,
    mask: jax.Array,
    nbr: LatticeNeighbors,
    gate_table: jax.Array,
    rel_weight: jax.Array,
    root: jax.Array,
    bias: jax.Array,
    *,
    message_dropout: float = 0.0,
    dropout_rng=None,
    message_dropout_mode: str = "edge",
):
    """One dense relational graph-convolution layer (reference GCL forward,
    model.py:101-121): out = sum_r mean_msgs_r @ W_r + x @ root + bias.

    rel_weight: (n_relations=6, d, d); root: (d, d); bias: (d,).
    message_dropout/dropout_rng: dropout on edge messages. Mode "edge"
    (default) reproduces the reference's per-edge message dropout EXACTLY
    (model.py:44,133) — see `relational_messages`. Mode "aggregate" is the
    cheaper round-2 proxy: iid dropout on the per-destination per-relation
    aggregates (unbiased, lower variance — drops are shared across the
    sources feeding one aggregate). Returns masked output (..., T, S, d).
    """
    active = message_dropout > 0.0 and dropout_rng is not None
    if message_dropout_mode not in ("edge", "aggregate"):
        raise ValueError(f"unknown message_dropout_mode "
                         f"{message_dropout_mode!r}")
    exact = active and message_dropout_mode == "edge"
    h_track, h_onset, h_next, h_self = relational_messages(
        x, mask, nbr, gate_table,
        edge_dropout_p=message_dropout if exact else 0.0,
        edge_dropout_rng=dropout_rng if exact else None,
    )
    if active and not exact:
        keep = 1.0 - message_dropout
        stacked = jnp.stack([h_track, h_onset, h_next, h_self])
        keep_mask = jax.random.bernoulli(dropout_rng, keep, stacked.shape)
        stacked = jnp.where(keep_mask, stacked / keep, 0.0).astype(x.dtype)
        h_track, h_onset, h_next, h_self = stacked
    n_tracks = mask.shape[-2]
    w_track = rel_weight[:n_tracks]  # (T, d, d)
    out = jnp.einsum(
        "...tsd,tde->...tse", h_track, w_track,
        preferred_element_type=x.dtype,
    )
    # Fuse [self (W0), onset (W4), next (W5), root] into one matmul.
    hcat = jnp.concatenate([h_self, h_onset, h_next, x], axis=-1)
    wcat = jnp.concatenate(
        [rel_weight[0], rel_weight[n_tracks], rel_weight[n_tracks + 1], root],
        axis=0,
    )
    out = out + hcat @ wcat
    out = out + bias
    return out * mask[..., None].astype(x.dtype)
