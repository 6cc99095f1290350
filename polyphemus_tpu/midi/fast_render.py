"""Native token-tensor -> .mid rendering (ctypes wrapper).

Byte-identical to generate.song_from_tokens + midi.writer.write_midi (tested)
but ~2 orders of magnitude faster on the single-core host. Returns None when
the native toolchain is unavailable; callers fall back to the Python path.
"""
from __future__ import annotations

import ctypes
from typing import Optional, Sequence

import numpy as np

from .. import constants
from ..native import load_midirender


def render_midi_bytes(tokens: np.ndarray, mask: np.ndarray, resolution: int,
                      programs: Optional[Sequence[int]] = None,
                      n_loops: int = 1, tempo: float = 120.0,
                      track_names: Optional[Sequence[str]] = None
                      ) -> Optional[bytes]:
    """One sample: tokens (nb, T, S, n_slots, 2) int, mask (nb, T, S) bool."""
    lib = load_midirender()
    if lib is None:
        return None
    nb, t, s = mask.shape
    n_slots = tokens.shape[-2]
    if programs is None:
        programs = [constants.DEFAULT_MIDI_PROGRAMS[n] for n in
                    constants.TRACKS[:t]]
    if track_names is None:
        track_names = list(constants.TRACKS[:t])
    names_cat = b"".join(n.encode("latin-1", "replace")[:127]
                         for n in track_names)
    name_lens = np.asarray(
        [min(len(n.encode("latin-1", "replace")), 127)
         for n in track_names], np.int32)

    toks = np.ascontiguousarray(tokens, np.int32)
    m = np.ascontiguousarray(mask, np.uint8)
    progs = np.ascontiguousarray(programs, np.int32)
    names_buf = np.frombuffer(names_cat, np.uint8).copy() if names_cat \
        else np.zeros(1, np.uint8)

    cap = 4 * 1024 * 1024
    out = np.empty(cap, np.uint8)
    tempo_usec = int(round(60_000_000 / tempo))
    n = lib.poly_render_midi(
        toks.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int32(nb), ctypes.c_int32(t), ctypes.c_int32(s),
        ctypes.c_int32(n_slots),
        progs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        names_buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        name_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int32(resolution), ctypes.c_int32(max(n_loops, 1)),
        ctypes.c_int32(tempo_usec),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(cap))
    if n < 0:
        return None
    return bytes(out[:n].tobytes())
