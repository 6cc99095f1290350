"""Preprocessing pipeline: MIDI -> .npz samples -> dataset -> batch."""
import numpy as np

from polyphemus_tpu import constants
from polyphemus_tpu.cli.preprocess import main as pre_main
from polyphemus_tpu.data import BatchLoader, PolyphemusDataset
from polyphemus_tpu.data.preprocess import (pack_track, pianoroll_to_notes,
                                            notes_to_pianoroll,
                                            preprocess_midi_file)
from polyphemus_tpu.midi import Note, Song, Track, write_midi


def full_band_song(n_bars=4, resolution=8):
    """4/4 song with drums/bass/guitar/strings activity in every bar."""
    bar = 4 * resolution
    drums, bass, guitar, strings = [], [], [], []
    for b in range(n_bars):
        t0 = b * bar
        drums += [Note(t0, 36, 2), Note(t0 + 16, 38, 2)]
        bass += [Note(t0, 40 + b % 5, 8), Note(t0 + 16, 45, 8)]
        guitar += [Note(t0 + 8, 60, 4), Note(t0 + 8, 64, 4)]
        strings += [Note(t0 + 4, 72, 16)]
    return Song(resolution=resolution, tempo=120, tracks=[
        Track("d", -1, True, drums),
        Track("b", 34, False, bass),
        Track("g", 1, False, guitar),
        Track("s", 50, False, strings),
    ])


def test_pianoroll_roundtrip():
    notes = [Note(0, 60, 4), Note(4, 60, 2), Note(2, 64, 6)]
    roll = notes_to_pianoroll(notes, 10)
    back = pianoroll_to_notes(roll)
    # overlapping/adjacent same-pitch runs merge: 60@[0,6), 64@[2,8)
    assert [(n.time, n.pitch, n.duration) for n in back] == \
        [(0, 60, 6), (2, 64, 6)]


def test_pack_track_tokens():
    notes = [Note(0, 60, 4), Note(0, 64, 4), Note(3, 70, 200)]
    content, acts = pack_track(notes, 8)
    assert content.shape == (8, 16, 2)
    assert content[0, 0, 0] == constants.PitchToken.SOS
    assert content[0, 1, 0] == 60 and content[0, 2, 0] == 64
    assert content[0, 3, 0] == constants.PitchToken.EOS
    # duration clamped to 96 -> token 95
    assert content[3, 1, 1] == constants.MAX_DUR_TOKEN
    assert list(acts) == [True, False, False, True, False, False, False,
                          False]


def test_preprocess_to_training_batch(tmp_path):
    midi_dir = tmp_path / "midi" / "sub"
    midi_dir.mkdir(parents=True)
    out_dir = tmp_path / "samples"
    for i in range(2):
        write_midi(str(midi_dir / f"song{i}.mid"), full_band_song())

    pre_main([str(tmp_path / "midi"), str(out_dir), "--n_bars", "2",
              "--resolution", "8"])

    ds = PolyphemusDataset(str(out_dir), n_bars=2)
    assert len(ds) >= 4  # 4-bar songs, 2-bar window, stride 1 bar, 2 files
    toks, mask = ds[0]
    assert toks.shape == (2, 4, 32, 16, 2)
    assert mask.shape == (2, 4, 32)
    assert mask.any()
    # every active cell has a real first token; SOS at slot 0 everywhere
    assert (toks[..., 0, 0] == constants.PitchToken.SOS).all()
    act = np.argwhere(mask)
    b, t, s = act[0]
    assert toks[b, t, s, 1, 0] <= constants.MAX_PITCH_TOKEN

    loader = BatchLoader(ds, batch_size=2, shuffle=True, num_workers=2)
    batches = list(iter(loader))
    assert len(batches) == len(ds) // 2
    bt, bm = batches[0]
    assert bt.shape == (2, 2, 4, 32, 16, 2) and bt.dtype == np.int32


def test_silence_filter(tmp_path):
    # song with a fully silent middle bar -> those windows dropped
    resolution = 8
    bar = 4 * resolution
    song = full_band_song(n_bars=3, resolution=resolution)
    for tr in song.tracks:
        tr.notes = [n for n in tr.notes if not (bar <= n.time < 2 * bar)]
    p = tmp_path / "x.mid"
    write_midi(str(p), song)
    out = tmp_path / "out"
    out.mkdir()
    n = preprocess_midi_file(str(p), str(out), 2, resolution)
    # windows [bar0,bar1] and [bar1,bar2] both contain the silent bar
    assert n == 0


def test_non_44_rejected(tmp_path):
    song = full_band_song(n_bars=2)
    p = tmp_path / "y.mid"
    write_midi(str(p), song)
    # patch the time signature bytes: our writer emits 4/4 at fixed offset;
    # rewrite with a 3/4 meta event instead
    raw = bytearray(p.read_bytes())
    idx = raw.find(bytes([0xFF, 0x58, 0x04, 4, 2]))
    assert idx > 0
    raw[idx + 3] = 3
    p.write_bytes(bytes(raw))
    out = tmp_path / "out2"
    out.mkdir()
    assert preprocess_midi_file(str(p), str(out), 2, 8) == 0
