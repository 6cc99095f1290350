"""Numpy test oracle re-deriving the reference's graph semantics.

This is an independent re-implementation (edge lists + sparse mean-aggregated
message passing) of the behavior specified by /root/reference/data.py:24-204
and /root/reference/model.py:41-135, used ONLY as ground truth in tests.
The production code path (polyphemus_tpu.ops.lattice) never builds edge lists.
"""
from __future__ import annotations

import numpy as np

N_TRACKS = 4


def bar_edges(bar: np.ndarray):
    """All edges of one bar mask (T, S) -> list of (src, dst, rel, dist).

    Node ids follow the reference labeling: rank order of activations in
    row-major (track, timestep) order (data.py:14-21). Includes the
    fake-self-edge quirk for single-node bars (data.py:170-176).
    Assumes the bar is non-empty (callers apply the empty-bar fixup first).
    """
    t_idx, s_idx = np.nonzero(bar)
    label = {}
    for n, (t, s) in enumerate(zip(t_idx, s_idx)):
        label[(int(t), int(s))] = n

    edges = []

    # TRACK relations: consecutive active steps within a row, both directions.
    for t in range(bar.shape[0]):
        steps = sorted(int(s) for s in np.nonzero(bar[t])[0])
        for a, b in zip(steps, steps[1:]):
            u, v = label[(t, a)], label[(t, b)]
            edges.append((u, v, t, b - a))
            edges.append((v, u, t, b - a))

    # ONSET relation: all pairs of active tracks at the same step.
    for s in range(bar.shape[1]):
        tracks = sorted(int(t) for t in np.nonzero(bar[:, s])[0])
        for i in range(len(tracks)):
            for j in range(i + 1, len(tracks)):
                u = label[(tracks[i], s)]
                v = label[(tracks[j], s)]
                edges.append((u, v, N_TRACKS, 0))
                edges.append((v, u, N_TRACKS, 0))

    # NEXT relation: consecutive active columns, cross-track, forward only.
    active_cols = sorted(int(s) for s in np.nonzero(bar.any(axis=0))[0])
    for a, b in zip(active_cols, active_cols[1:]):
        for t1 in np.nonzero(bar[:, a])[0]:
            for t2 in np.nonzero(bar[:, b])[0]:
                if int(t1) == int(t2):
                    continue
                edges.append(
                    (label[(int(t1), a)], label[(int(t2), b)],
                     N_TRACKS + 1, b - a)
                )

    if not edges:
        # Single active node: fake self-edge, relation 0, distance 0.
        edges.append((0, 0, 0, 0))

    return edges, [(int(t), int(s)) for t, s in zip(t_idx, s_idx)]


def gcl_forward(bar: np.ndarray, x_nodes: np.ndarray, gate_table: np.ndarray,
                rel_w: np.ndarray, root: np.ndarray, bias: np.ndarray):
    """Sparse reference GCL forward on one bar (eval mode, no dropout).

    x_nodes: (n_nodes, d) features in node-label order.
    gate_table: (S, d) = edge_nn(one-hot distance d).
    Returns (n_nodes, d): sum_r mean-aggr(relu(x_src * gate)) @ W_r
                          + x @ root + bias.
    """
    edges, _ = bar_edges(bar)
    n, d = x_nodes.shape
    out = x_nodes @ root + bias
    n_rel = rel_w.shape[0]
    for r in range(n_rel):
        acc = np.zeros((n, d), dtype=np.float64)
        cnt = np.zeros((n,), dtype=np.int64)
        for (u, v, rel, dist) in edges:
            if rel != r:
                continue
            msg = np.maximum(x_nodes[u] * gate_table[dist], 0.0)
            acc[v] += msg
            cnt[v] += 1
        h = np.where(cnt[:, None] > 0, acc / np.maximum(cnt[:, None], 1), 0.0)
        out = out + h @ rel_w[r]
    return out


def nodes_to_lattice(bar: np.ndarray, x_nodes: np.ndarray, d: int):
    """Scatter node-ordered features onto the dense (T, S, d) lattice."""
    full = np.zeros(bar.shape + (d,), dtype=x_nodes.dtype)
    t_idx, s_idx = np.nonzero(bar)
    full[t_idx, s_idx] = x_nodes
    return full


def lattice_to_nodes(bar: np.ndarray, x_full: np.ndarray):
    t_idx, s_idx = np.nonzero(bar)
    return x_full[t_idx, s_idx]


def gcl_forward_edge_dropout(bar: np.ndarray, x_nodes: np.ndarray,
                             gate_table: np.ndarray, rel_w: np.ndarray,
                             root: np.ndarray, bias: np.ndarray,
                             keep_masks: dict, p: float):
    """Sparse per-edge-dropout GCL forward on one bar (training mode).

    Literal reference semantics (/root/reference/model.py:44,133): every
    edge message relu(x_src * gate(dist)) passes through F.dropout(p)
    independently before mean aggregation. `keep_masks` replays the dense
    implementation's draws so equality is exact:
      'p', 'n', 'self': (T, S, d) bool — per-destination-cell masks for the
          prev-/next-in-row track edges and the single-node self edge;
      'on', 'nx': (T_dst, T_src, S, d) bool — per-ordered-pair masks for
          ONSET and NEXT edges, indexed at the destination column.
    """
    edges, cells = bar_edges(bar)
    n, d = x_nodes.shape
    keep = 1.0 - p
    out = x_nodes @ root + bias
    n_rel = rel_w.shape[0]
    single_node = len(cells) == 1
    for r in range(n_rel):
        acc = np.zeros((n, d), dtype=np.float64)
        cnt = np.zeros((n,), dtype=np.int64)
        for (u, v, rel, dist) in edges:
            if rel != r:
                continue
            msg = np.maximum(x_nodes[u] * gate_table[dist], 0.0)
            td, sd = cells[v]
            ts, sc = cells[u]
            if u == v and single_node:
                km = keep_masks["self"][td, sd]
            elif rel < N_TRACKS:
                km = (keep_masks["p"][td, sd] if sc < sd
                      else keep_masks["n"][td, sd])
            elif rel == N_TRACKS:
                km = keep_masks["on"][td, ts, sd]
            else:
                km = keep_masks["nx"][td, ts, sd]
            msg = np.where(km, msg / keep, 0.0)
            acc[v] += msg
            cnt[v] += 1
        h = np.where(cnt[:, None] > 0, acc / np.maximum(cnt[:, None], 1), 0.0)
        out = out + h @ rel_w[r]
    return out
