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


# ------------------------------------------- vectorized fast paths (round 3)
def test_roll_events_pack_matches_loop_implementations():
    """The vectorized pipeline (_roll_events + _pack_track_events) is
    behavior-identical to pack_track(pianoroll_to_notes(roll)) across
    densities incl. >14-simultaneous-note truncation."""
    from polyphemus_tpu.data.preprocess import (_pack_track_events,
                                                _roll_events,
                                                pianoroll_to_notes)

    rng = np.random.default_rng(7)
    for density in (0.01, 0.05, 0.3, 0.8):
        for _ in range(20):
            t_len = int(rng.integers(1, 96))
            roll = ((rng.random((t_len, 128)) < density)
                    .astype(np.uint8) * 64)
            ref_c, ref_a = pack_track(pianoroll_to_notes(roll), t_len)
            new_c, new_a = _pack_track_events(*_roll_events(roll), t_len)
            np.testing.assert_array_equal(ref_c, new_c)
            np.testing.assert_array_equal(ref_a, new_a)


def test_keep_window_matches_per_track_bruteforce():
    from polyphemus_tpu.data.preprocess import _keep_window

    def brute(s_tensor, n_bars):
        ba = np.any(s_tensor.reshape(s_tensor.shape[0], n_bars, -1), axis=2)
        for tr in range(ba.shape[0]):
            cols = np.where(~ba[tr])[0]
            if cols.size >= 2 and (np.diff(cols) == 1).any():
                return False
        return not (~ba.any(axis=0)).any()

    rng = np.random.default_rng(3)
    for _ in range(300):
        nb = int(rng.integers(2, 6))
        st = rng.random((4, nb * 32)) < rng.choice([0.02, 0.1, 0.5])
        assert _keep_window(st, nb) == brute(st, nb)


def test_save_npz_uncompressed_is_np_load_and_fastloader_compatible(tmp_path):
    """The one-write .npz writer round-trips through np.load, a strict
    zipfile CRC check, and the fastloader's mmap member parser."""
    import zipfile

    from polyphemus_tpu.data.fastloader import _npz_member_views
    from polyphemus_tpu.data.preprocess import save_npz_uncompressed

    rng = np.random.default_rng(5)
    c = rng.integers(-5, 300, (4, 64, 16, 2)).astype(np.int16)
    s = rng.random((4, 64)) < 0.3
    path = save_npz_uncompressed(str(tmp_path / "w0"), c_tensor=c,
                                 s_tensor=s)
    assert path.endswith(".npz")
    with np.load(path) as z:
        np.testing.assert_array_equal(z["c_tensor"], c)
        np.testing.assert_array_equal(z["s_tensor"], s)
    with zipfile.ZipFile(path) as zf:
        assert zf.testzip() is None
        assert sorted(zf.namelist()) == ["c_tensor.npy", "s_tensor.npy"]
    views, mm, f = _npz_member_views(path, ("c_tensor", "s_tensor"))
    np.testing.assert_array_equal(views["c_tensor"], c)
    np.testing.assert_array_equal(views["s_tensor"], s)
    del views
    mm.close()
    f.close()
