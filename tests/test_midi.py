"""MIDI writer/parser roundtrip and generation rendering."""
import numpy as np

from polyphemus_tpu import constants
from polyphemus_tpu.generate import song_from_tokens
from polyphemus_tpu.midi import Note, Song, Track, read_midi, write_midi
from polyphemus_tpu.midi.parser import quantize_song
from polyphemus_tpu.midi.song import loop_song


def make_song():
    return Song(resolution=8, tempo=120.0, tracks=[
        Track("Drums", -1, True, [Note(0, 36, 2), Note(8, 38, 2),
                                  Note(16, 36, 4)]),
        Track("Bass", 34, False, [Note(0, 40, 8), Note(8, 43, 8)]),
        Track("Guitar", 1, False, [Note(4, 60, 4), Note(4, 64, 4),
                                   Note(4, 67, 4)]),
    ])


def test_midi_roundtrip(tmp_path):
    song = make_song()
    path = str(tmp_path / "x.mid")
    write_midi(path, song)
    parsed, tpq, sigs = read_midi(path)
    assert tpq == 8
    assert abs(parsed.tempo - 120.0) < 1e-6
    assert sigs == [(4, 4)]
    # channel 9 track is the drum track
    drums = [t for t in parsed.tracks if t.is_drum]
    melodic = [t for t in parsed.tracks if not t.is_drum]
    assert len(drums) == 1 and len(melodic) == 2
    got = sorted((n.time, n.pitch, n.duration) for n in drums[0].notes)
    assert got == [(0, 36, 2), (8, 38, 2), (16, 36, 4)]
    progs = sorted(t.program for t in melodic)
    assert progs == [1, 34]
    chord = [t for t in melodic if t.program == 1][0]
    assert sorted(n.pitch for n in chord.notes) == [60, 64, 67]


def test_quantize():
    song = Song(resolution=480, tracks=[
        Track(notes=[Note(0, 60, 480), Note(480, 62, 240), Note(725, 64, 5)])
    ])
    q = quantize_song(song, 480, 8)
    got = [(n.time, n.duration) for n in q.tracks[0].notes]
    assert got == [(0, 8), (8, 4), (12, 1)]


def test_loop_song():
    song = make_song()
    looped = loop_song(song, 3, 2, 8)  # 2 bars, res 8 -> shift 64
    assert len(looped.tracks[0].notes) == 9
    times = sorted(n.time for n in looped.tracks[0].notes)
    assert times == [0, 8, 16, 64, 72, 80, 128, 136, 144]
    # original untouched
    assert len(song.tracks[0].notes) == 3


def test_song_from_tokens_semantics():
    nb, t, s = 1, 4, 32
    tokens = np.full((nb, t, s, 15, 2), 0, np.int32)
    tokens[..., 0] = constants.PitchToken.PAD
    tokens[..., 1] = constants.DurationToken.PAD
    mask = np.zeros((nb, t, s), bool)

    # active cell with 2 notes then EOS
    mask[0, 1, 4] = True
    tokens[0, 1, 4, 0] = (60, 7)     # pitch 60, dur id 7 -> 8 steps
    tokens[0, 1, 4, 1] = (64, 3)
    tokens[0, 1, 4, 2] = (constants.PitchToken.EOS,
                          constants.DurationToken.EOS)
    # SOS pitch is skipped, following notes still read
    mask[0, 2, 0] = True
    tokens[0, 2, 0, 0] = (constants.PitchToken.SOS,
                          constants.DurationToken.SOS)
    tokens[0, 2, 0, 1] = (50, 95)    # dur 96 clamped to 32-0=32
    tokens[0, 2, 0, 2] = (constants.PitchToken.EOS,
                          constants.DurationToken.EOS)
    # inactive cells contribute nothing even with junk tokens
    tokens[0, 3, 10, 0] = (70, 3)

    song = song_from_tokens(tokens, mask, resolution=8)
    bass = song.tracks[1]
    assert sorted((n.time, n.pitch, n.duration) for n in bass.notes) == \
        [(4, 60, 8), (4, 64, 4)]
    guitar = song.tracks[2]
    assert [(n.time, n.pitch, n.duration) for n in guitar.notes] == \
        [(0, 50, 32)]
    strings = song.tracks[3]
    assert strings.notes == []
    assert song.tracks[0].is_drum
