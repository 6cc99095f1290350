"""Pallas TPU kernel: fused lattice relational graph-conv layer.

One kernel invocation processes a block of bars. For each bar (128 cells =
one MXU tile row):

  * gather-style ops become one-hot selection matmuls in VMEM
    ((128,128) @ (128,d) on the MXU — no HBM scatter/gather);
  * gate lookups become (128, S) one-hot @ gate-table matmuls;
  * ONSET/NEXT column sums reuse one static same-column (128,128) matrix;
  * all eight projections (4 track relations, self, onset, next, root) fuse
    into a single (128, 8d) @ (8d, d) matmul.

Per layer, HBM traffic is one read of x and one write of the output (plus
the shared weights); the XLA path materializes every gathered/gated
intermediate. Semantics identical to ops.lattice.gcl_apply (tested).

Generation uses the epilogue-fused eval path (folded BN + relu + residual
in-kernel). Training uses `gcl_fused`, a custom_vjp whose backward pass runs
the hand-written Pallas kernels in gcl_pallas_bwd (data-grad via transposed
selection matmuls; weight-grad with VMEM-resident (d,d) accumulators);
gradients are tested against jax.grad of the XLA formulation.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import lattice


def vmem_limit_bytes() -> int | None:
    """Optional raised Mosaic scoped-VMEM limit, from POLY_VMEM_LIMIT_MB.

    Mosaic's default scoped-VMEM budget is 16 MB; the v5e core physically
    has much more, and raising the budget admits larger bar tiles (deeper
    grids pipeline less but each invocation fills the MXU better). A raised
    limit must be paired with the XLA option
    ``xla_tpu_scoped_vmem_limit_kib`` on the ENCLOSING jit (see
    utils.compiler_options) or Mosaic refuses the kernel at compile time.
    """
    v = os.environ.get("POLY_VMEM_LIMIT_MB")
    lim = int(v) if v else 0
    return lim * 2**20 or None  # "0" disables, same as unset


def _compiler_params(interpret: bool):
    lim = None if interpret else vmem_limit_bytes()
    if lim is None:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=lim)

# aux channel layout (all int32, per flat cell i = t*S + c)
PREV_SRC, OK_P, DIST_P = 0, 1, 2
NEXT_SRC, OK_N, DIST_N = 3, 4, 5
PN_SRC, OK_PN, MSRC, DIST_PN = 6, 7, 8, 9
CNT_ON, CNT_NX, MASK_CH, SINGLE = 10, 11, 12, 13
N_AUX = 14


def build_kernel_aux(mask: jax.Array) -> jax.Array:
    """mask (..., T, S) bool -> aux (..., N_AUX, T*S) int32."""
    t, s = mask.shape[-2], mask.shape[-1]
    nbr = lattice.build_neighbors(mask)
    iota_s = jnp.arange(s, dtype=jnp.int32)
    row_base = (jnp.arange(t, dtype=jnp.int32) * s)[:, None]

    def flat(x):
        return x.reshape(x.shape[:-2] + (t * s,)).astype(jnp.int32)

    prev_src = flat(row_base + nbr.prev_in_row)
    next_src = flat(row_base + nbr.next_in_row)
    dist_p = flat(jnp.clip(iota_s - nbr.prev_in_row, 0, s - 1)
                  * jnp.ones((t, 1), jnp.int32))
    dist_n = flat(jnp.clip(nbr.next_in_row - iota_s, 0, s - 1)
                  * jnp.ones((t, 1), jnp.int32))
    ok_p = flat(nbr.prev_in_row_ok)
    ok_n = flat(nbr.next_in_row_ok)

    pcol = nbr.prev_col[..., None, :]  # (..., 1, S)
    pcol_b = jnp.broadcast_to(pcol, mask.shape)
    pn_src = flat(row_base + pcol_b)
    ok_pn = flat(jnp.broadcast_to(nbr.prev_col_ok[..., None, :], mask.shape))
    msrc = flat(jnp.take_along_axis(mask, pcol_b, axis=-1))
    dist_pn = flat(jnp.broadcast_to(
        jnp.clip(iota_s - nbr.prev_col, 0, s - 1)[..., None, :], mask.shape))

    m_i = mask.astype(jnp.int32)
    cnt_on = flat(nbr.col_count[..., None, :] - m_i)
    cnt_src = jnp.sum(
        jnp.take_along_axis(mask, pcol_b, axis=-1).astype(jnp.int32),
        axis=-2, keepdims=True)
    cnt_nx = flat(cnt_src - jnp.take_along_axis(mask, pcol_b,
                                                axis=-1).astype(jnp.int32))
    m_flat = flat(m_i)
    single = jnp.broadcast_to(
        nbr.single_node[..., None, None].astype(jnp.int32),
        mask.shape[:-2] + (1, t * s)).reshape(mask.shape[:-2] + (t * s,))

    chans = [None] * N_AUX
    chans[PREV_SRC], chans[OK_P], chans[DIST_P] = prev_src, ok_p, dist_p
    chans[NEXT_SRC], chans[OK_N], chans[DIST_N] = next_src, ok_n, dist_n
    chans[PN_SRC], chans[OK_PN] = pn_src, ok_pn
    chans[MSRC], chans[DIST_PN] = msrc, dist_pn
    chans[CNT_ON], chans[CNT_NX] = cnt_on, cnt_nx
    chans[MASK_CH], chans[SINGLE] = m_flat, single
    return jnp.stack(chans, axis=-2)  # (..., N_AUX, T*S)


def pack_weights(rel_weight, root, n_tracks: int, dtype=jnp.bfloat16):
    """(n_rel, d, d) + (d, d) -> (8d, d): [W_t0..t3 | W0(self) | W_on |
    W_next | root]."""
    blocks = [rel_weight[i] for i in range(n_tracks)]
    blocks += [rel_weight[0], rel_weight[n_tracks],
               rel_weight[n_tracks + 1], root]
    return jnp.concatenate(blocks, axis=0).astype(dtype)


def _bar_statics(aux_ref, b, gates, *, n_tracks: int, n_steps: int):
    """Everything in one bar's GCL math that does NOT depend on the node
    states x (and so is shared by every layer of a chained stack): the
    batched selection matrix, the gate messages g3 = sd3 @ gates (the gate
    table is shared across layers, model.py:175-184), the masked mean
    reciprocals and the mask/single-node columns."""
    n = n_tracks * n_steps
    f32 = jnp.float32
    cdt = gates.dtype
    src_j = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    dist_j = jax.lax.broadcasted_iota(jnp.int32, (n, n_steps), 1)

    def ch(c):
        return aux_ref[b, c][:, None]  # (n, 1) int32

    def sel(idx, ok):
        return ((src_j == idx) & (ok > 0)).astype(cdt)

    # all comparisons stay in the int32 domain (Mosaic lacks bf16 cmpf);
    # mean-divisions become f32 reciprocals cast to the compute dtype
    def recip(cnt_i, valid_i):
        r = 1.0 / jnp.maximum(cnt_i.astype(f32), 1.0)
        return jnp.where(valid_i, r, 0.0).astype(cdt)

    m = (ch(MASK_CH) > 0).astype(cdt)  # (n, 1)

    # All three gathers (track-prev, track-next, NEXT-col) batch into
    # ONE (3n, n) @ (n, d) selection matmul, and the three gate-table
    # lookups into ONE (3n, S) @ (S, d) — fewer, bigger MXU dispatches
    # and one big fused relu(x*g) instead of three small ones.
    ok_p, ok_n = ch(OK_P), ch(OK_N)
    ok_pn = ((ch(OK_PN) > 0) & (ch(MSRC) > 0)).astype(jnp.int32)
    sel3 = jnp.concatenate([sel(ch(PREV_SRC), ok_p),
                            sel(ch(NEXT_SRC), ok_n),
                            sel(ch(PN_SRC), ok_pn)], axis=0)
    dist_j3 = jnp.concatenate([dist_j] * 3, axis=0)
    dist3 = jnp.concatenate([ch(DIST_P), ch(DIST_N), ch(DIST_PN)], 0)
    ok3 = jnp.concatenate([ok_p, ok_n, ok_pn], 0)
    sd3 = ((dist_j3 == dist3) & (ok3 > 0)).astype(cdt)
    g3 = jax.lax.dot(sd3, gates, preferred_element_type=f32).astype(cdt)

    cnt_i = ok_p + ok_n
    rec_track = recip(cnt_i, cnt_i > 0) * m
    cnt_on_i = ch(CNT_ON)
    rec_on = recip(cnt_on_i, cnt_on_i > 0) * m
    cnt_nx_i = ch(CNT_NX)
    valid_nx = (ch(OK_PN) > 0) & (cnt_nx_i > 0)
    rec_nx = recip(cnt_nx_i, valid_nx) * m
    single = ch(SINGLE).astype(cdt)
    return m, sel3, g3, rec_track, rec_on, rec_nx, single


def _layer_math(x, statics, g0, wbig, bias, ea, eb, *,
                n_tracks: int, n_steps: int, epilogue: bool,
                out_ref=None, b=None):
    """One GCL layer on one bar's (n, d) node states. With out_ref set,
    writes the per-track row blocks straight to out_ref[b] and returns
    None; otherwise returns the (n, d) result (chained intermediate)."""
    n = n_tracks * n_steps
    d = x.shape[-1]
    f32 = jnp.float32
    cdt = x.dtype
    m, sel3, g3, rec_track, rec_on, rec_nx, single = statics
    col_i = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0) % n_steps
    col_j = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1) % n_steps
    a_col = (col_i == col_j).astype(cdt)  # same-column sum matrix

    x3 = jax.lax.dot(sel3, x, preferred_element_type=f32).astype(cdt)
    msg3 = jax.nn.relu(x3 * g3)  # (3n, d)

    # TRACK relations
    h_track = (msg3[:n] + msg3[n:2 * n]) * rec_track

    # ONSET relation
    y0 = jax.nn.relu(x * g0) * m
    col_sum = jax.lax.dot(a_col, y0, preferred_element_type=f32).astype(cdt)
    h_onset = (col_sum - y0) * rec_on

    # NEXT relation
    z = msg3[2 * n:]
    z_sum = jax.lax.dot(a_col, z, preferred_element_type=f32).astype(cdt)
    h_next = (z_sum - z) * rec_nx

    # single-node self loop (relation 0)
    h_self = y0 * single

    # project: shared relations in one (n, 4d) matmul; the 4 per-track
    # relations as row-block matmuls (their weights differ per row
    # block — zero-padding them into one matmul would double the
    # FLOPs). NOTE a bar-batched variant (one (bb*n, 4d) @ (4d, d)
    # projection for the whole block) measured flat-to-slower
    # (3.26 vs ~2.9-3.15 ms / 512 bars bf16): the h-tensor
    # concatenations cost what the bigger dots save. Reverted.
    hcat = jnp.concatenate([h_self, h_onset, h_next, x], axis=1)
    wshared = wbig[n_tracks * d:]  # [W0(self); W_on; W_next; root]
    base = jax.lax.dot(hcat, wshared,
                       preferred_element_type=f32).astype(cdt) + bias
    blks = []
    for t in range(n_tracks):
        lo, hi = t * n_steps, (t + 1) * n_steps
        wt = wbig[t * d:(t + 1) * d]
        blk = base[lo:hi] + jax.lax.dot(
            h_track[lo:hi], wt, preferred_element_type=f32).astype(cdt)
        blk = blk * m[lo:hi]
        if epilogue:
            blk = jax.nn.relu((blk * ea + eb) * m[lo:hi]) + x[lo:hi]
        if out_ref is not None:
            out_ref[b, lo:hi] = blk
        else:
            blks.append(blk)
    if out_ref is None:
        return jnp.concatenate(blks, axis=0)


def _kernel(aux_ref, x_ref, gates_ref, wbig_ref, bias_ref, *rest,
            bars_per_block: int, n_tracks: int, n_steps: int, d: int,
            epilogue: bool):
    if epilogue:
        # fused eval-mode BN (folded affine) + relu + residual
        ea_ref, eb_ref, out_ref = rest
        ea, eb = ea_ref[:], eb_ref[:]
    else:
        (out_ref,) = rest
        ea = eb = None
    gates = gates_ref[:]  # (S, d)
    g0 = gates[0:1, :]    # (1, d)
    wbig = wbig_ref[:]    # (8d, d)
    bias = bias_ref[:]    # (1, d)

    for b in range(bars_per_block):
        statics = _bar_statics(aux_ref, b, gates,
                               n_tracks=n_tracks, n_steps=n_steps)
        _layer_math(x_ref[b], statics, g0, wbig, bias, ea, eb,
                    n_tracks=n_tracks, n_steps=n_steps, epilogue=epilogue,
                    out_ref=out_ref, b=b)


def _kernel_chain(aux_ref, x_ref, gates_ref, wbig_ref, bias_ref,
                  ea_ref, eb_ref, out_ref, *, bars_per_block: int,
                  n_tracks: int, n_steps: int, d: int, n_chain: int):
    """n_chain stacked GCL layers (epilogue-fused eval form) per bar:
    intermediate node states never leave VMEM, the per-bar selection
    statics and gate messages are built once and shared by every layer
    (the gate table is stack-shared). Weight stacks: wbig (K, 8d, d),
    bias/ea/eb (K, 1, d)."""
    gates = gates_ref[:]
    g0 = gates[0:1, :]
    for b in range(bars_per_block):
        statics = _bar_statics(aux_ref, b, gates,
                               n_tracks=n_tracks, n_steps=n_steps)
        x = x_ref[b]
        for k in range(n_chain):
            last = k == n_chain - 1
            x = _layer_math(
                x, statics, g0, wbig_ref[k], bias_ref[k],
                ea_ref[k], eb_ref[k],
                n_tracks=n_tracks, n_steps=n_steps, epilogue=True,
                out_ref=out_ref if last else None, b=b)


def gcl_apply_pallas(x, aux, gate_table, wbig, bias, *,
                     bars_per_block: int = 4, interpret: bool | None = None,
                     epilogue_affine=None):
    """Fused GCL layer.

    x: (..., T, S, d) masked node states; aux from build_kernel_aux (same
    leading dims); gate_table (S, d); wbig from pack_weights (8d, d);
    bias (d,). Returns (..., T, S, d).

    epilogue_affine=(A, B) additionally fuses the whole GCN layer tail for
    eval mode: out = relu((gcl(x)*A + B) * mask) + x (BN folded to an
    affine; identity = (ones, zeros)).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    lead = x.shape[:-3]
    t, s, d = x.shape[-3], x.shape[-2], x.shape[-1]
    n = t * s
    nbar = int(np.prod(lead)) if lead else 1
    xf = x.reshape(nbar, n, d)
    auxf = aux.reshape(nbar, N_AUX, n)

    # clamp to the actual (static) bar count so small batches never pad a
    # handful of bars up to a full block (batch-1 latency path). In fp32
    # the packed weights alone hold 8d^2*4 bytes of VMEM (8.4 MB at d=512)
    # and blocks > 4 bars overflow the 16 MB scoped limit in some graphs
    # (pure-generation graphs compiled bb=8, the batch-256 eval-forward
    # graph OOM'd at both 8 and 6) — cap fp32 at the round-1-proven 4.
    # bf16 halves every buffer and runs the full block size (the sweep's
    # 8/16 win).
    esize = np.dtype(x.dtype).itemsize
    raised = not interpret and vmem_limit_bytes() is not None
    cap = bars_per_block if (esize <= 2 or raised) \
        else min(bars_per_block, 4)
    bb = max(1, min(cap, nbar))
    pad = (-nbar) % bb
    if pad:
        xf = jnp.concatenate([xf, jnp.zeros((pad, n, d), xf.dtype)], 0)
        auxf = jnp.concatenate([auxf, jnp.zeros((pad, N_AUX, n),
                                                auxf.dtype)], 0)
    nblocks = (nbar + pad) // bb
    epilogue = epilogue_affine is not None

    kern = functools.partial(_kernel, bars_per_block=bb, n_tracks=t,
                             n_steps=s, d=d, epilogue=epilogue)
    in_specs = [
        pl.BlockSpec((bb, N_AUX, n), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bb, n, d), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((s, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((8 * d, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    operands = [auxf, xf, gate_table.astype(x.dtype), wbig.astype(x.dtype),
                bias.reshape(1, d).astype(x.dtype)]
    if epilogue:
        ea, eb = epilogue_affine
        in_specs += [pl.BlockSpec((1, d), lambda i: (0, 0),
                                  memory_space=pltpu.VMEM)] * 2
        operands += [ea.reshape(1, d).astype(x.dtype),
                     eb.reshape(1, d).astype(x.dtype)]

    out = pl.pallas_call(
        kern,
        grid=(nblocks,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bb, n, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nbar + pad, n, d), x.dtype),
        interpret=interpret,
        compiler_params=_compiler_params(interpret),
        cost_estimate=pl.CostEstimate(
            flops=2 * (nbar + pad) * n * (8 * d) * d,
            bytes_accessed=(nbar + pad) * n * d * 2 * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(*operands)

    if pad:
        out = out[:nbar]
    return out.reshape(lead + (t, s, d))


def chain_vmem_bytes(n_chain: int, d: int, bars_per_block: int,
                     itemsize: int, n: int = 128) -> int | None:
    """Scoped-VMEM bytes the chained eval kernel needs (weights + blocks +
    per-bar scratch, 1.3x margin), or None when the default 16 MB budget
    suffices. Used to size the kernel's CompilerParams AND the enclosing
    jit's xla_tpu_scoped_vmem_limit_kib (utils.compiler_options)."""
    e = itemsize
    need = (n_chain * 8 * d * d * e            # stacked packed weights
            + 4 * bars_per_block * n * d * e   # x in/out, double-buffered
            + 2 * bars_per_block * N_AUX * n * 4
            + n * (3 * n + 18 * d) * e         # per-bar scratch (sel3, msgs)
            + (32 + 3 * n_chain) * d * e)      # gates + bias/ea/eb stacks
    need = int(need * 1.3)
    return need if need > 16 * 2**20 else None


def gcl_apply_pallas_chain(x, aux, gate_table, wbigs, biases, eas, ebs, *,
                           bars_per_block: int = 8,
                           interpret: bool | None = None):
    """n_chain stacked epilogue-fused GCL layers in ONE kernel invocation
    (generation path): per layer-boundary, x stays in VMEM instead of a
    full HBM write+read, and the per-bar selection statics build once.

    wbigs (K, 8d, d) from pack_weights per layer; biases/eas/ebs (K, d).
    Needs scoped VMEM beyond 16 MB for most (K, dtype) combos —
    chain_vmem_bytes sizes it; the caller's jit must raise
    xla_tpu_scoped_vmem_limit_kib to match (utils.compiler_options).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    k = wbigs.shape[0]
    lead = x.shape[:-3]
    t, s, d = x.shape[-3], x.shape[-2], x.shape[-1]
    n = t * s
    nbar = int(np.prod(lead)) if lead else 1
    xf = x.reshape(nbar, n, d)
    auxf = aux.reshape(nbar, N_AUX, n)
    bb = max(1, min(bars_per_block, nbar))
    pad = (-nbar) % bb
    if pad:
        xf = jnp.concatenate([xf, jnp.zeros((pad, n, d), xf.dtype)], 0)
        auxf = jnp.concatenate([auxf, jnp.zeros((pad, N_AUX, n),
                                                auxf.dtype)], 0)
    nblocks = (nbar + pad) // bb

    kern = functools.partial(_kernel_chain, bars_per_block=bb, n_tracks=t,
                             n_steps=s, d=d, n_chain=k)
    in_specs = [
        pl.BlockSpec((bb, N_AUX, n), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bb, n, d), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((s, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((k, 8 * d, d), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ] + [pl.BlockSpec((k, 1, d), lambda i: (0, 0, 0),
                      memory_space=pltpu.VMEM)] * 3
    operands = [auxf, xf, gate_table.astype(x.dtype),
                wbigs.astype(x.dtype),
                biases.reshape(k, 1, d).astype(x.dtype),
                eas.reshape(k, 1, d).astype(x.dtype),
                ebs.reshape(k, 1, d).astype(x.dtype)]

    if interpret:
        params = None
    else:
        need = chain_vmem_bytes(k, d, bb, np.dtype(x.dtype).itemsize, n)
        env = vmem_limit_bytes()
        lim = max(need or 0, env or 0) or None
        params = (pltpu.CompilerParams(vmem_limit_bytes=lim)
                  if lim else None)

    out = pl.pallas_call(
        kern,
        grid=(nblocks,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bb, n, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nbar + pad, n, d), x.dtype),
        interpret=interpret,
        compiler_params=params,
        cost_estimate=pl.CostEstimate(
            flops=2 * (nbar + pad) * n * (8 * d) * d * k,
            bytes_accessed=(nbar + pad) * n * d * 2 * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(*operands)

    if pad:
        out = out[:nbar]
    return out.reshape(lead + (t, s, d))


# --------------------------------------------------------------- differentiable
def _float0_like(x):
    return np.zeros(x.shape, jax.dtypes.float0)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def gcl_fused(x, gate_table, rel_weight, root, bias, aux, mask):
    """Differentiable fused GCL: Pallas forward AND Pallas backward.

    Same semantics as lattice.gcl_apply; the backward pass calls the
    hand-written kernels in gcl_pallas_bwd (no saved message intermediates —
    gathers/gates recompute in VMEM). mask/aux receive float0 cotangents.
    """
    wbig = pack_weights(rel_weight, root, mask.shape[-2], dtype=x.dtype)
    # bf16 halves every VMEM buffer: run double-size training tiles
    # (fp32 stays at 4 — within ~1 MB of the 16 MB scoped limit already,
    # unless POLY_VMEM_LIMIT_MB raises the Mosaic budget)
    bb = 8 if np.dtype(x.dtype).itemsize <= 2 else 4
    env = os.environ.get("POLY_GCL_FWD_BB")
    if env:
        bb = int(env)
    return gcl_apply_pallas(x, aux, gate_table, wbig, bias.astype(x.dtype),
                            bars_per_block=bb)


def _gcl_fused_fwd(x, gate_table, rel_weight, root, bias, aux, mask):
    out = gcl_fused(x, gate_table, rel_weight, root, bias, aux, mask)
    # aux is saved as a residual (int32, ~n/8 the size of one activation)
    # instead of being rebuilt from the mask per layer in the backward
    return out, (x, gate_table, rel_weight, root, bias, aux, mask)


def _gcl_fused_bwd(res, g):
    from . import gcl_pallas_bwd

    x, gate_table, rel_weight, root, bias, aux, mask = res
    n_tracks = mask.shape[-2]
    d = x.shape[-1]
    wbig = pack_weights(rel_weight, root, n_tracks, dtype=x.dtype)
    bf16 = np.dtype(x.dtype).itemsize <= 2
    # Two-kernel backward (dx/dG/dbias + dW) wins on hardware: the
    # single-pass gcl_backward_fused variant measured 5.1 ms vs 3.6 ms for
    # 512 bars bf16 (scripts/probes/bwd_probe.py) — the fused kernel's resident
    # Wbig + f32 dW accumulators leave no VMEM for pipelining the
    # streamed blocks, and bb=4 fails to compile. Kept for reference;
    # measurement recorded in PERFORMANCE.md.
    # Weight-kernel tiles shrank with the round-4 bar-batched rewrite: its
    # stacked h's (6 x (bb*n, d) in the compute dtype) now count against
    # the scoped VMEM stack, so the training graph fits w4 in bf16 (w8
    # overflowed by 1.9 MB; w4 measures within 6% of w8 standalone —
    # bwd_probe2: 4.55 vs 4.30 ms full backward) and w2 in fp32 (w4
    # overflowed by 816 KB).
    bb_d = int(os.environ.get("POLY_GCL_BWD_BB_DATA", 0)) \
        or (4 if bf16 else 2)
    bb_w = int(os.environ.get("POLY_GCL_BWD_BB_W", 0)) or (4 if bf16 else 2)
    dx, dgt, dwbig, dbias = gcl_pallas_bwd.gcl_backward_pallas(
        x, aux, gate_table.astype(x.dtype), wbig, g,
        bars_per_block_data=bb_d, bars_per_block_w=bb_w)
    blocks = [dwbig[i * d:(i + 1) * d] for i in range(8)]
    d_rel = jnp.stack([blocks[0] + blocks[n_tracks]] + blocks[1:n_tracks]
                      + blocks[n_tracks + 1:n_tracks + 3])
    droot = blocks[n_tracks + 3]
    return (dx.astype(x.dtype), dgt.astype(gate_table.dtype),
            d_rel.astype(rel_weight.dtype), droot.astype(root.dtype),
            dbias.astype(bias.dtype), _float0_like(aux),
            _float0_like(mask))


gcl_fused.defvjp(_gcl_fused_fwd, _gcl_fused_bwd)
