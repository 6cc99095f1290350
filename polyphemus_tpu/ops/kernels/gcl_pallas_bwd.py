"""Pallas backward kernels for the fused lattice GCL.

Forward (gcl_pallas._kernel):
    msg_p = relu((P x) * Gp),  msg_n = relu((N x) * Gn)
    h_track = (msg_p + msg_n) * r_tr * m
    y0 = relu(x * g0) * m
    h_onset = (C y0 - y0) * r_on * m
    z = relu((Pn x) * Gpn)            (source-masked via the selection)
    h_next = (C z - z) * r_nx * m
    h_self = y0 * single
    out = [RowMask_t h_track | h_self | h_onset | h_next | x] @ Wbig + b, * m

Backward comes in two shapes:

  * Two-kernel split (`gcl_backward_pallas`, the PRODUCTION path for both
    dtypes — this is what the custom_vjp in gcl_pallas.py calls): kernel A
    (dx/dG/dbias, Wbig resident) + kernel B (dWbig, accumulators
    resident).
  * FUSED single-pass kernel (`gcl_backward_fused`): dx, dG, dbias AND
    dWbig in ONE pass — selection matrices/relu masks built once per bar
    and shared; x/g stream from HBM exactly once; all eight (d, d) dW
    accumulators VMEM-resident (8 MB f32 at d=512). Measured SLOWER than
    the split on hardware (5.1 ms vs 3.6 ms, 512 bars bf16,
    scripts/probes/bwd_probe.py): the resident bf16 Wbig (4.2 MB) + f32
    accumulators leave no VMEM headroom to double-buffer the streamed
    blocks, and bb=4 fails to compile. fp32 cannot fuse at all (Wbig
    8.4 MB + accumulators 8.4 MB alone exceed the 16 MB scoped VMEM).
    Kept as the recorded negative result (PERFORMANCE.md) and still
    correctness-tested so it cannot silently rot.

Both variants are verified against jax.grad of the XLA lattice path in
interpret mode (tests/test_pallas_grad.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .gcl_pallas import (CNT_NX, CNT_ON, DIST_N, DIST_P, DIST_PN, MASK_CH,
                         MSRC, N_AUX, NEXT_SRC, OK_N, OK_P, OK_PN, PN_SRC,
                         PREV_SRC, SINGLE, _compiler_params)

F32 = jnp.float32


def _common(aux_ref, b, n, n_steps, cdt=F32):
    """Shared per-bar selection helpers. Selection/one-hot matrices are
    exact in any float dtype; emitting them in the compute dtype (`cdt` =
    x's dtype) lets every dot run with native-MXU inputs under the bf16
    policy (all dots still accumulate in f32), and makes the recomputed
    relu masks match the forward kernel's bit for bit."""
    src_j = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    dst_j = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col_i = dst_j % n_steps
    col_j = src_j % n_steps
    a_col = (col_i == col_j).astype(cdt)
    dist_cols = jax.lax.broadcasted_iota(jnp.int32, (n, n_steps), 1)
    dist_rows = jax.lax.broadcasted_iota(jnp.int32, (n_steps, n), 0)

    def ch(c):
        return aux_ref[b, c][:, None]  # (n, 1) int32

    def ch_row(c):
        return aux_ref[b, c][None, :]  # (1, n) int32

    def sel(idx_col, ok_col):
        return ((src_j == idx_col) & (ok_col > 0)).astype(cdt)

    def sel_t(idx_row, ok_row):
        # transposed selection: selT[j, i] = (j == idx[i]) & ok[i]
        return ((dst_j == idx_row) & (ok_row > 0)).astype(cdt)

    def seld(dist_col, ok_col):
        return ((dist_cols == dist_col) & (ok_col > 0)).astype(cdt)

    def seld_t(dist_row, ok_row):
        return ((dist_rows == dist_row) & (ok_row > 0)).astype(cdt)

    def recip(cnt_i, valid_i):
        r = 1.0 / jnp.maximum(cnt_i.astype(F32), 1.0)
        return jnp.where(valid_i, r, 0.0).astype(cdt)

    return ch, ch_row, sel, sel_t, seld, seld_t, recip, a_col


def _bwd_data_kernel(aux_ref, x_ref, g_ref, gates_ref, wbig_ref,
                     dx_ref, dg_ref, dbias_ref,
                     *, bars_per_block: int, n_tracks: int, n_steps: int,
                     d: int):
    n = n_tracks * n_steps
    first = pl.program_id(0) == 0

    @pl.when(first)
    def _():
        dg_ref[...] = jnp.zeros_like(dg_ref)
        dbias_ref[...] = jnp.zeros_like(dbias_ref)

    cdt = x_ref.dtype  # compute dtype: dots take cdt inputs, f32 accum
    gates = gates_ref[:].astype(cdt)
    g0 = gates[0:1, :]
    wbig = wbig_ref[:]  # (8d, d) compute dtype

    def t_dot(a, b):
        # a^T @ b without materializing a^T: contract dim 0 of both
        return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                                   preferred_element_type=F32)

    # ---- bar-batched dH dots (round 4): one (bb*n, d) @ (d, 4d) for the
    # four shared relation blocks and one (bb*S, d) @ (d, d) per track,
    # instead of per-bar M=n / M=S dots that under-fill the MXU.
    ms = [(aux_ref[b, MASK_CH][:, None] > 0).astype(cdt)
          for b in range(bars_per_block)]
    gs = [g_ref[b] * ms[b] for b in range(bars_per_block)]
    gall = jnp.concatenate(gs, axis=0)  # (bb*n, d), masked
    dh4_all = jax.lax.dot_general(
        gall, wbig[n_tracks * d:], (((1,), (1,)), ((), ())),
        preferred_element_type=F32)  # (bb*n, 4d) f32
    # Track rows are contiguous (cell i = t*S + s); stack each track's
    # 32-row slices across bars for the per-track weight blocks.
    dht = [jax.lax.dot_general(
        jnp.concatenate([g[t * n_steps:(t + 1) * n_steps] for g in gs],
                        axis=0),
        wbig[t * d:(t + 1) * d],
        (((1,), (1,)), ((), ())), preferred_element_type=F32)
        for t in range(n_tracks)]  # each (bb*S, d) f32
    dbias_ref[...] += jnp.sum(gall.astype(F32), axis=0,
                              keepdims=True).astype(dbias_ref.dtype)

    for b in range(bars_per_block):
        (ch, ch_row, sel, sel_t, seld, seld_t, recip, a_col) = _common(
            aux_ref, b, n, n_steps, cdt)
        x = x_ref[b]
        m = ms[b]
        g = gs[b]

        dh4 = dh4_all[b * n:(b + 1) * n]
        dh_self = dh4[:, :d]
        dh_onset = dh4[:, d:2 * d]
        dh_next = dh4[:, 2 * d:3 * d]
        dx = dh4[:, 3 * d:]  # root path, f32 accumulator

        dh_track = jnp.concatenate(
            [dht[t][b * n_steps:(b + 1) * n_steps]
             for t in range(n_tracks)], axis=0)  # (n, d)

        # ---- stacked gather recompute: track-prev, track-next, NEXT-col
        # in one (3n, n) @ (n, d) and one (3n, S) @ (S, d); pre-activations
        # use the same cdt-dot/f32-accum ops as the forward kernel so the
        # relu masks agree bit for bit
        ok_p, ok_n = ch(OK_P), ch(OK_N)
        ok_pn = ((ch(OK_PN) > 0) & (ch(MSRC) > 0)).astype(jnp.int32)
        sel3 = jnp.concatenate([sel(ch(PREV_SRC), ok_p),
                                sel(ch(NEXT_SRC), ok_n),
                                sel(ch(PN_SRC), ok_pn)], axis=0)
        sd3 = jnp.concatenate([seld(ch(DIST_P), ok_p),
                               seld(ch(DIST_N), ok_n),
                               seld(ch(DIST_PN), ok_pn)], axis=0)
        x3 = jax.lax.dot(sel3, x, preferred_element_type=F32).astype(cdt)
        g3 = jax.lax.dot(sd3, gates, preferred_element_type=F32).astype(cdt)
        pre3 = x3 * g3

        # ---- TRACK upstream ------------------------------------------------
        cnt_i = ok_p + ok_n
        dmsg = dh_track * recip(cnt_i, cnt_i > 0) * m  # f32, same for p/n

        # ---- NEXT upstream -------------------------------------------------
        cnt_nx_i = ch(CNT_NX)
        valid_nx = (ch(OK_PN) > 0) & (cnt_nx_i > 0)
        dnx = (dh_next * recip(cnt_nx_i, valid_nx) * m).astype(cdt)
        dz = (jax.lax.dot(a_col, dnx, preferred_element_type=F32)
              - dnx.astype(F32))

        # stacked dpre for all three gathered relations, then the two
        # transposed scatters (dx and dG) each collapse into ONE dot over
        # the already-built sel3/sd3 (contract dim 0 = transpose)
        dpre3 = (jnp.concatenate([dmsg, dmsg, dz], axis=0)
                 * (pre3.astype(F32) > 0).astype(F32))
        dx += t_dot(sel3, (dpre3 * g3.astype(F32)).astype(cdt))
        dg_ref[...] += t_dot(sd3, (dpre3 * x3.astype(F32)).astype(cdt)
                             ).astype(dg_ref.dtype)

        # ---- ONSET + SELF path --------------------------------------------
        cnt_on_i = ch(CNT_ON)
        r_on = recip(cnt_on_i, cnt_on_i > 0)
        dcol = (dh_onset * r_on * m).astype(cdt)
        dy0 = (jax.lax.dot(a_col, dcol, preferred_element_type=F32)
               - dcol.astype(F32))
        single = ch(SINGLE).astype(F32)
        dy0 += dh_self * single
        pre0 = x * g0
        dpre0 = dy0 * m.astype(F32) * (pre0.astype(F32) > 0).astype(F32)
        dx += dpre0 * g0.astype(F32)
        dg_row0 = jnp.sum(dpre0 * x.astype(F32), axis=0, keepdims=True)
        dg_ref[0:1, :] += dg_row0.astype(dg_ref.dtype)

        dx_ref[b] = dx.astype(dx_ref.dtype)


def _bwd_weight_kernel(aux_ref, x_ref, g_ref, gates_ref, dw_ref,
                       *, bars_per_block: int, n_tracks: int, n_steps: int,
                       d: int):
    """Single pass over the bars: all eight (d, d) accumulator blocks stay
    VMEM-resident (the out block's index map is constant across the grid),
    so x/g stream from HBM exactly once and every h is computed once per
    bar. The dW contractions are BAR-BATCHED (round 4): the per-bar h's
    stack along the contraction dim so each relation block is ONE dot with
    K = bb*n (or bb*S for the per-track blocks) instead of bb dots with
    K = n (or S=32, which starved the 128x128 MXU — the round-4 profile
    showed this kernel at 2.0 ms/call vs a ~0.4 ms matmul floor)."""
    n = n_tracks * n_steps
    first_bar_block = pl.program_id(0) == 0

    @pl.when(first_bar_block)
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    cdt = x_ref.dtype
    gates = gates_ref[:].astype(cdt)
    g0 = gates[0:1, :]

    def dw(h, gg):
        return jax.lax.dot_general(h.astype(cdt), gg,
                                   (((0,), (0,)), ((), ())),
                                   preferred_element_type=F32)

    h_trs, h_selfs, h_ons, h_nxs, gs = [], [], [], [], []
    for b in range(bars_per_block):
        (ch, ch_row, sel, sel_t, seld, seld_t, recip, a_col) = _common(
            aux_ref, b, n, n_steps, cdt)
        x = x_ref[b]
        m = (ch(MASK_CH) > 0).astype(cdt)
        g = g_ref[b] * m

        # h rebuild with the stacked-selection trick (one (3n, n) gather
        # dot + one (3n, S) gate dot); identical ops to the forward kernel
        # (cdt dots, f32 accum) so h matches bit-for-bit
        ok_p, ok_n = ch(OK_P), ch(OK_N)
        ok_pn = ((ch(OK_PN) > 0) & (ch(MSRC) > 0)).astype(jnp.int32)
        sel3 = jnp.concatenate([sel(ch(PREV_SRC), ok_p),
                                sel(ch(NEXT_SRC), ok_n),
                                sel(ch(PN_SRC), ok_pn)], axis=0)
        sd3 = jnp.concatenate([seld(ch(DIST_P), ok_p),
                               seld(ch(DIST_N), ok_n),
                               seld(ch(DIST_PN), ok_pn)], axis=0)
        x3 = jax.lax.dot(sel3, x, preferred_element_type=F32).astype(cdt)
        g3 = jax.lax.dot(sd3, gates, preferred_element_type=F32).astype(cdt)
        msg3 = jax.nn.relu(x3 * g3)

        cnt_i = ok_p + ok_n
        h_trs.append((msg3[:n] + msg3[n:2 * n])
                     * recip(cnt_i, cnt_i > 0) * m)

        y = jax.nn.relu(x * g0) * m

        cnt_on_i = ch(CNT_ON)
        col_sum = jax.lax.dot(a_col, y, preferred_element_type=F32
                              ).astype(cdt)
        h_ons.append((col_sum - y) * recip(cnt_on_i, cnt_on_i > 0) * m)

        z = msg3[2 * n:]
        z_sum = jax.lax.dot(a_col, z, preferred_element_type=F32
                            ).astype(cdt)
        cnt_nx_i = ch(CNT_NX)
        valid = (ch(OK_PN) > 0) & (cnt_nx_i > 0)
        h_nxs.append((z_sum - z) * recip(cnt_nx_i, valid) * m)
        h_selfs.append(y * ch(SINGLE).astype(cdt))
        gs.append(g)

    gall = jnp.concatenate(gs, axis=0)  # (bb*n, d), masked
    xall = x_ref[...].reshape(bars_per_block * n, d)
    for t in range(n_tracks):
        rows = slice(t * n_steps, (t + 1) * n_steps)
        ht = jnp.concatenate([h[rows] for h in h_trs], axis=0)
        gt = jnp.concatenate([g_[rows] for g_ in gs], axis=0)
        dw_ref[t * d:(t + 1) * d, :] += dw(ht, gt).astype(dw_ref.dtype)
    for i, hs in enumerate((h_selfs, h_ons, h_nxs)):
        blk = slice((n_tracks + i) * d, (n_tracks + i + 1) * d)
        dw_ref[blk, :] += dw(jnp.concatenate(hs, axis=0),
                             gall).astype(dw_ref.dtype)
    dw_ref[(n_tracks + 3) * d:(n_tracks + 4) * d, :] += dw(
        xall, gall).astype(dw_ref.dtype)


def _bwd_fused_kernel(aux_ref, x_ref, g_ref, gates_ref, wbig_ref,
                      dx_ref, dg_ref, dbias_ref, dw_ref,
                      *, bars_per_block: int, n_tracks: int, n_steps: int,
                      d: int):
    """Single-pass backward: dx (streamed), dG/dbias/dWbig (VMEM-resident
    accumulators). Shares every recomputed forward intermediate between the
    data-grad and weight-grad paths and never builds a transposed selection
    matrix: sel^T contractions are dot_generals over dim 0 of sel."""
    n = n_tracks * n_steps
    first = pl.program_id(0) == 0

    @pl.when(first)
    def _():
        dg_ref[...] = jnp.zeros_like(dg_ref)
        dbias_ref[...] = jnp.zeros_like(dbias_ref)
        dw_ref[...] = jnp.zeros_like(dw_ref)

    cdt = x_ref.dtype
    gates = gates_ref[:].astype(cdt)
    g0 = gates[0:1, :]
    wbig = wbig_ref[:]  # (8d, d) compute dtype

    def t_dot(a, b):
        # a^T @ b without materializing a^T: contract dim 0 of both
        return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                                   preferred_element_type=F32)

    for b in range(bars_per_block):
        (ch, ch_row, sel, sel_t, seld, seld_t, recip, a_col) = _common(
            aux_ref, b, n, n_steps, cdt)
        x = x_ref[b]
        m = (ch(MASK_CH) > 0).astype(cdt)
        g = g_ref[b] * m

        # upstream grads per relation block (track rows are contiguous, so
        # each track's dh needs only its 32-row slice of g)
        def dh(block):
            return jax.lax.dot_general(
                g, wbig[block * d:(block + 1) * d], (((1,), (1,)), ((), ())),
                preferred_element_type=F32)

        dh_track = jnp.concatenate([
            jax.lax.dot_general(
                g[t * n_steps:(t + 1) * n_steps],
                wbig[t * d:(t + 1) * d],
                (((1,), (1,)), ((), ())), preferred_element_type=F32)
            for t in range(n_tracks)], axis=0)  # (n, d)
        dh_self = dh(n_tracks)
        dh_onset = dh(n_tracks + 1)
        dh_next = dh(n_tracks + 2)
        dx = dh(n_tracks + 3)  # root path, f32 accumulator

        dbias_ref[...] += jnp.sum(g.astype(F32), axis=0,
                                  keepdims=True).astype(dbias_ref.dtype)

        # ---- TRACK path: p/n messages recomputed once, feeding both the
        # h_track rebuild (weight grad) and dpre (data grad)
        ok_p, ok_n = ch(OK_P), ch(OK_N)
        cnt_i = ok_p + ok_n
        r_tr = recip(cnt_i, cnt_i > 0)
        dmsg = dh_track * r_tr * m
        msg_sum = jnp.zeros((n, d), cdt)
        for idx_c, dist_c, ok_c in ((PREV_SRC, DIST_P, OK_P),
                                    (NEXT_SRC, DIST_N, OK_N)):
            ok = ch(ok_c)
            s_m = sel(ch(idx_c), ok)
            sd = seld(ch(dist_c), ok)
            xg = jax.lax.dot(s_m, x, preferred_element_type=F32).astype(cdt)
            gr = jax.lax.dot(sd, gates, preferred_element_type=F32
                             ).astype(cdt)
            pre = xg * gr
            msg_sum += jax.nn.relu(pre)
            dpre = dmsg * (pre.astype(F32) > 0).astype(F32)
            dx += t_dot(s_m, (dpre * gr).astype(cdt))
            dg_ref[...] += t_dot(sd, (dpre * xg).astype(cdt)
                                 ).astype(dg_ref.dtype)
        h_tr = msg_sum * r_tr * m

        # ---- ONSET + SELF path
        y = jax.nn.relu(x * g0) * m
        cnt_on_i = ch(CNT_ON)
        r_on = recip(cnt_on_i, cnt_on_i > 0)
        col_sum = jax.lax.dot(a_col, y, preferred_element_type=F32
                              ).astype(cdt)
        h_on = (col_sum - y) * r_on * m
        dcol = (dh_onset * r_on.astype(F32) * m.astype(F32)).astype(cdt)
        dy = (jax.lax.dot(a_col, dcol, preferred_element_type=F32)
              - dcol.astype(F32))
        single = ch(SINGLE).astype(cdt)
        h_self = y * single
        dy += dh_self * single.astype(F32)
        pre0 = x * g0
        dpre0 = dy * m.astype(F32) * (pre0.astype(F32) > 0).astype(F32)
        dx += dpre0 * g0.astype(F32)
        dg_ref[0:1, :] += jnp.sum(dpre0 * x.astype(F32), axis=0,
                                  keepdims=True).astype(dg_ref.dtype)

        # ---- NEXT path
        ok_pn = ((ch(OK_PN) > 0) & (ch(MSRC) > 0)).astype(jnp.int32)
        s_pn = sel(ch(PN_SRC), ok_pn)
        sd_pn = seld(ch(DIST_PN), ok_pn)
        xg_pn = jax.lax.dot(s_pn, x, preferred_element_type=F32).astype(cdt)
        gr_pn = jax.lax.dot(sd_pn, gates, preferred_element_type=F32
                            ).astype(cdt)
        pre_pn = xg_pn * gr_pn
        z = jax.nn.relu(pre_pn)
        z_sum = jax.lax.dot(a_col, z, preferred_element_type=F32
                            ).astype(cdt)
        cnt_nx_i = ch(CNT_NX)
        valid_nx = (ch(OK_PN) > 0) & (cnt_nx_i > 0)
        r_nx = recip(cnt_nx_i, valid_nx)
        h_nx = (z_sum - z) * r_nx * m
        dnx = (dh_next * r_nx.astype(F32) * m.astype(F32)).astype(cdt)
        dz = (jax.lax.dot(a_col, dnx, preferred_element_type=F32)
              - dnx.astype(F32))
        dpre_pn = dz * (pre_pn.astype(F32) > 0).astype(F32)
        dx += t_dot(s_pn, (dpre_pn * gr_pn).astype(cdt))
        dg_ref[...] += t_dot(sd_pn, (dpre_pn * xg_pn).astype(cdt)
                             ).astype(dg_ref.dtype)

        # ---- weight grads: h^T @ g with VMEM-resident accumulators;
        # track blocks contract only their 32 contiguous live rows
        for t in range(n_tracks):
            rows = slice(t * n_steps, (t + 1) * n_steps)
            dw_ref[t * d:(t + 1) * d, :] += t_dot(
                h_tr[rows], g[rows]).astype(dw_ref.dtype)
        dw_ref[n_tracks * d:(n_tracks + 1) * d, :] += t_dot(
            h_self, g).astype(dw_ref.dtype)
        dw_ref[(n_tracks + 1) * d:(n_tracks + 2) * d, :] += t_dot(
            h_on, g).astype(dw_ref.dtype)
        dw_ref[(n_tracks + 2) * d:(n_tracks + 3) * d, :] += t_dot(
            h_nx, g).astype(dw_ref.dtype)
        dw_ref[(n_tracks + 3) * d:(n_tracks + 4) * d, :] += t_dot(
            x, g).astype(dw_ref.dtype)

        dx_ref[b] = dx.astype(dx_ref.dtype)


def gcl_backward_fused(x, aux, gate_table, wbig, g, *,
                       bars_per_block: int = 2,
                       interpret: bool | None = None):
    """Single-kernel backward. Returns (dx, dgate_table, dwbig, dbias);
    dx comes back in x.dtype (it is cast there by the custom_vjp anyway),
    the accumulators in f32. VMEM-viable for 2-byte compute dtypes only."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    lead = x.shape[:-3]
    t, s, d = x.shape[-3], x.shape[-2], x.shape[-1]
    n = t * s
    nbar = int(np.prod(lead)) if lead else 1
    xf = x.reshape(nbar, n, d)
    gf = g.reshape(nbar, n, d)
    auxf = aux.reshape(nbar, N_AUX, n)
    bb = max(1, min(bars_per_block, nbar))
    pad = (-nbar) % bb
    if pad:
        xf = jnp.concatenate([xf, jnp.zeros((pad, n, d), xf.dtype)], 0)
        gf = jnp.concatenate([gf, jnp.zeros((pad, n, d), gf.dtype)], 0)
        auxf = jnp.concatenate(
            [auxf, jnp.zeros((pad, N_AUX, n), auxf.dtype)], 0)
    nblocks = (nbar + pad) // bb

    kern = functools.partial(_bwd_fused_kernel, bars_per_block=bb,
                             n_tracks=t, n_steps=s, d=d)
    dx, dg, dbias, dwbig = pl.pallas_call(
        kern,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((bb, N_AUX, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, n, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, n, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8 * d, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bb, n, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8 * d, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nblocks * bb, n, d), x.dtype),
            jax.ShapeDtypeStruct((s, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((8 * d, d), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=_compiler_params(interpret),
        cost_estimate=pl.CostEstimate(
            flops=4 * (nbar + pad) * n * (8 * d) * d,
            bytes_accessed=3 * (nbar + pad) * n * d * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(auxf, xf, gf, gate_table, wbig)

    dx = dx[:nbar].reshape(lead + (t, s, d))
    return dx, dg, dwbig, dbias[0]


def gcl_backward_pallas(x, aux, gate_table, wbig, g, *,
                        bars_per_block_data: int = 2,
                        bars_per_block_w: int = 4,
                        interpret: bool | None = None):
    """Returns (dx, dgate_table, dwbig, dbias) for the fused GCL layer.

    x, g: (..., T, S, d); aux: (..., N_AUX, T*S); wbig: (8d, d) as packed by
    pack_weights. Gradients accumulate in f32 and are returned in f32.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    lead = x.shape[:-3]
    t, s, d = x.shape[-3], x.shape[-2], x.shape[-1]
    n = t * s
    nbar = int(np.prod(lead)) if lead else 1
    xf = x.reshape(nbar, n, d)
    gf = g.reshape(nbar, n, d)
    auxf = aux.reshape(nbar, N_AUX, n)

    def padded(bb):
        pad = (-nbar) % bb
        if pad:
            xp = jnp.concatenate([xf, jnp.zeros((pad, n, d), xf.dtype)], 0)
            gp = jnp.concatenate([gf, jnp.zeros((pad, n, d), gf.dtype)], 0)
            ap = jnp.concatenate(
                [auxf, jnp.zeros((pad, N_AUX, n), auxf.dtype)], 0)
            return xp, gp, ap, (nbar + pad) // bb
        return xf, gf, auxf, nbar // bb

    # kernel A: dx, dG, dbias
    bb = bars_per_block_data
    xp, gp, ap, nblocks = padded(bb)
    kern_a = functools.partial(_bwd_data_kernel, bars_per_block=bb,
                               n_tracks=t, n_steps=s, d=d)
    dx, dg, dbias = pl.pallas_call(
        kern_a,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((bb, N_AUX, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, n, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, n, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8 * d, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bb, n, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            # dx in the compute dtype (the custom_vjp casts to x.dtype
            # anyway): halves the out-stream VMEM + HBM under bf16
            jax.ShapeDtypeStruct((nblocks * bb, n, d), x.dtype),
            jax.ShapeDtypeStruct((s, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=_compiler_params(interpret),
    )(ap, xp, gp, gate_table, wbig)

    # kernel B: dWbig
    bbw = bars_per_block_w
    xp, gp, ap, nblocks_w = padded(bbw)
    kern_b = functools.partial(_bwd_weight_kernel, bars_per_block=bbw,
                               n_tracks=t, n_steps=s, d=d)
    dwbig = pl.pallas_call(
        kern_b,
        grid=(nblocks_w,),
        in_specs=[
            pl.BlockSpec((bbw, N_AUX, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bbw, n, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bbw, n, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        # constant index map -> the full (8d, d) accumulator stays VMEM-
        # resident across the whole grid (one HBM pass over x/g total)
        out_specs=pl.BlockSpec((8 * d, d), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8 * d, d), jnp.float32),
        interpret=interpret,
        compiler_params=_compiler_params(interpret),
    )(ap, xp, gp, gate_table)

    dx = dx[:nbar].reshape(lead + (t, s, d)).astype(x.dtype)
    return dx, dg, dwbig, dbias[0]
