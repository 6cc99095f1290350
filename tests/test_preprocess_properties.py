"""Preprocessor fidelity property tests (VERDICT r1 item 8).

The reference preprocesses via muspy/pypianoroll, which are NOT installable
offline — their exact quantization grid is a KNOWN-UNKNOWN (documented in
data/preprocess.py's module docstring). What CAN be pinned:

  * quantize_song edge cases: .5-grid ties (Python round -> banker's
    rounding of the scaled float), zero-length-after-quantize notes
    (clamped to duration 1 — a note never disappears), monotonicity;
  * pianoroll round-trip merge semantics (muspy.from_pypianoroll): touching
    same-pitch notes merge, overlapping same-pitch regions merge, gaps
    split;
  * pack_track slot-budget behavior: at most MAX_SIMU_TOKENS-1 payload
    slots (SOS + 14 + EOS... the counter stops at 15 leaving EOS in the
    last written slot), exact reference layout (preprocess.py:111-157).
"""
import numpy as np

from polyphemus_tpu import constants
from polyphemus_tpu.data.preprocess import (notes_to_pianoroll, pack_track,
                                            pianoroll_to_notes)
from polyphemus_tpu.midi.parser import quantize_song
from polyphemus_tpu.midi.song import Note, Song, Track


def _q(notes, tpq, res):
    song = Song(resolution=tpq, tempo=120.0,
                tracks=[Track("t", 0, False, list(notes))])
    return quantize_song(song, tpq, res).tracks[0].notes


# ----------------------------------------------------------- quantization
def test_quantize_halfway_ties_round_half_even():
    # tick 12 at tpq=24 -> res 8: 12*8/24 = 4.0 exact, no tie. Construct a
    # true tie: tick 3 at tpq=24 res 4 -> 3*4/24 = 0.5 -> round() = 0
    # (banker's rounding to even). End 9 -> 1.5 -> 2.
    out = _q([Note(3, 60, 6, 64)], 24, 4)
    assert out[0].time == 0
    assert out[0].duration == 2  # end 1.5 -> 2 minus start 0

    # tie landing on odd half: 4.5 -> 4 (even), not 5
    out = _q([Note(27, 60, 1, 64)], 24, 4)  # 27*4/24 = 4.5
    assert out[0].time == 4


def test_quantize_zero_duration_clamps_to_one():
    # a 1-tick note at high tpq collapses to the same grid point; the
    # quantizer must keep it audible (duration 1), as a pianoroll with a
    # single active step would
    out = _q([Note(10, 60, 1, 64)], 480, 8)
    assert out[0].duration == 1


def test_quantize_preserves_order_and_scales():
    rng = np.random.default_rng(0)
    times = np.sort(rng.integers(0, 10_000, 50))
    notes = [Note(int(t), 60, int(rng.integers(1, 500)), 64) for t in times]
    out = _q(notes, 480, 8)
    starts = [n.time for n in out]
    assert starts == sorted(starts)
    for n_in, n_out in zip(notes, out):
        assert abs(n_out.time - n_in.time * 8 / 480) <= 0.5 + 1e-9
        assert n_out.duration >= 1


# ------------------------------------------------------ pianoroll merging
def _roundtrip(notes, length=64):
    return pianoroll_to_notes(notes_to_pianoroll(notes, length))


def test_overlapping_same_pitch_notes_merge():
    # [0,4) and [2,6) overlap -> one note [0,6)
    out = _roundtrip([Note(0, 60, 4, 64), Note(2, 60, 4, 64)])
    assert len(out) == 1
    assert (out[0].time, out[0].duration) == (0, 6)


def test_touching_same_pitch_notes_merge():
    # [0,4) and [4,8) touch -> contiguous active region -> one note
    out = _roundtrip([Note(0, 60, 4, 64), Note(4, 60, 4, 64)])
    assert len(out) == 1
    assert (out[0].time, out[0].duration) == (0, 8)


def test_gapped_same_pitch_notes_stay_split():
    out = _roundtrip([Note(0, 60, 3, 64), Note(5, 60, 3, 64)])
    assert [(n.time, n.duration) for n in out] == [(0, 3), (5, 3)]


def test_different_pitches_never_merge():
    out = _roundtrip([Note(0, 60, 4, 64), Note(2, 62, 4, 64)])
    assert len(out) == 2


# ------------------------------------------------------------- pack_track
def test_pack_track_slot_budget_and_layout():
    msim = constants.MAX_SIMU_TOKENS
    # 20 simultaneous notes at t=0: only msim-2 = 14 payload slots fit
    # (slot 0 = SOS; the counter refuses at msim-1 so the last slot keeps
    # room for EOS), mirroring reference preprocess.py:131-144
    notes = [Note(0, 30 + p, 4, 64) for p in range(20)]
    content, acts = pack_track(notes, 8)
    assert content.shape == (8, msim, 2)
    assert content[0, 0, 0] == constants.PitchToken.SOS
    payload = content[0, 1:msim - 1, 0]
    assert (payload < 128).all()  # 14 real pitches
    assert content[0, msim - 1, 0] == constants.PitchToken.EOS
    assert acts[0] and not acts[1:].any()


def test_pack_track_eos_after_last_token_and_silence_pattern():
    content, acts = pack_track([Note(2, 60, 3, 64)], 8)
    # active step: SOS, pitch, EOS, PAD...
    assert content[2, 0, 0] == constants.PitchToken.SOS
    assert content[2, 1, 0] == 60
    assert content[2, 2, 0] == constants.PitchToken.EOS
    assert (content[2, 3:, 0] == constants.PitchToken.PAD).all()
    # silent step: SOS then EOS at slot 1
    assert content[0, 0, 0] == constants.PitchToken.SOS
    assert content[0, 1, 0] == constants.PitchToken.EOS
    assert not acts[0] and acts[2]
    # durations: stored as dur-1 (reference stores dur index shifted)
    assert content[2, 1, 1] == 2
