"""Pallas kernel: fused chord-decode -> unembed -> argmax generation tail.

The XLA slot-scan (models/vae.py ContentDecoder emit='tokens') re-reads the
(cells, d) node states from HBM for every one of the 15 note slots. Here the
grid is (bar_blocks, n_slots) with the slot as the fast axis: a bar block's
states load into VMEM once and all slot projections + vocab unembeddings +
argmax run in-core; only int32 token ids leave.

Drum (row 0) and melodic rows use separate pitch unembeddings, applied as
two static row-range matmuls.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .gcl_pallas import _compiler_params

F32 = jnp.float32


def _kernel(x_ref, w_ref, b_ref, pkd_ref, pbd_ref, pkn_ref, pbn_ref,
            dk_ref, db_ref, out_ref, *, bars_per_block: int, n_tracks: int,
            n_steps: int, d: int):
    n = n_tracks * n_steps
    h = d // 2
    w = w_ref[0]  # (d, d) this slot's chord projection
    b = b_ref[0]  # (1, d)

    for bb in range(bars_per_block):
        x = x_ref[bb]  # (n, d)
        slot_h = jax.lax.dot(x, w, preferred_element_type=F32) \
            + b.astype(F32)
        ph, dh = slot_h[:, :h], slot_h[:, h:]

        drums = jax.lax.dot(ph[:n_steps], pkd_ref[:],
                            preferred_element_type=F32) + pbd_ref[:]
        melodic = jax.lax.dot(ph[n_steps:], pkn_ref[:],
                              preferred_element_type=F32) + pbn_ref[:]
        pitch = jnp.concatenate([drums, melodic], axis=0)  # (n, vocab_p)
        dur = jax.lax.dot(dh, dk_ref[:], preferred_element_type=F32) \
            + db_ref[:]

        p_ids = jnp.argmax(pitch, axis=-1).astype(jnp.int32)
        d_ids = jnp.argmax(dur, axis=-1).astype(jnp.int32)
        out_ref[bb, 0] = jnp.stack([p_ids, d_ids], axis=-1)


def chord_tail_tokens(x, chord_kernel, chord_bias, pk_drums, pb_drums,
                      pk_nd, pb_nd, dk, db, *, n_slots: int,
                      bars_per_block: int = 8,
                      interpret: bool | None = None):
    """x (..., T, S, d) -> token ids (..., T, S, n_slots, 2) int32.

    chord_kernel (d, n_slots*d), chord_bias (n_slots*d,); unembed params as
    in ContentDecoder (pitch drums/non-drums (h, P), dur (h, D)).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    lead = x.shape[:-3]
    t, s, d = x.shape[-3], x.shape[-2], x.shape[-1]
    n = t * s
    nbar = int(np.prod(lead)) if lead else 1
    xf = x.reshape(nbar, n, d)
    bb = max(1, min(bars_per_block, nbar))  # never pad past the bar count
    pad = (-nbar) % bb
    if pad:
        xf = jnp.concatenate([xf, jnp.zeros((pad, n, d), xf.dtype)], 0)
    nblocks = (nbar + pad) // bb

    cdt = x.dtype
    w_slots = jnp.moveaxis(chord_kernel.reshape(d, n_slots, d), 1, 0)
    b_slots = chord_bias.reshape(n_slots, 1, d)
    vp = pk_drums.shape[1]
    vd = dk.shape[1]
    # pad vocab dims to lane width for clean tiling
    def pad_last(a, to):
        want = -(-a.shape[-1] // to) * to
        if want == a.shape[-1]:
            return a
        cfg = [(0, 0)] * (a.ndim - 1) + [(0, want - a.shape[-1])]
        return jnp.pad(a, cfg, constant_values=-jnp.inf
                       if a.ndim == 1 else 0)

    # pitch/dur kernels padded with 0 columns; biases with -inf so argmax
    # ignores padding
    pkd = pad_last(pk_drums.astype(cdt), 128)
    pkn = pad_last(pk_nd.astype(cdt), 128)
    dkp = pad_last(dk.astype(cdt), 128)
    pbd = pad_last(pb_drums.astype(F32), 128).reshape(1, -1)
    pbn = pad_last(pb_nd.astype(F32), 128).reshape(1, -1)
    dbp = pad_last(db.astype(F32), 128).reshape(1, -1)

    kern = functools.partial(_kernel, bars_per_block=bb, n_tracks=t,
                             n_steps=s, d=d)
    out = pl.pallas_call(
        kern,
        grid=(nblocks, n_slots),
        in_specs=[
            pl.BlockSpec((bb, n, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, d), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d // 2, pkd.shape[1]), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, pbd.shape[1]), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d // 2, pkn.shape[1]), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, pbn.shape[1]), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d // 2, dkp.shape[1]), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dbp.shape[1]), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bb, 1, n, 2), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nbar + pad, n_slots, n, 2),
                                       jnp.int32),
        interpret=interpret,
        compiler_params=_compiler_params(interpret),
    )(xf, w_slots.astype(cdt), b_slots, pkd, pbd, pkn, pbn, dkp, dbp)

    if pad:
        out = out[:nbar]
    out = jnp.moveaxis(out, 1, 2)  # (nbar, n, n_slots, 2)
    return out.reshape(lead + (t, s, n_slots, 2))
