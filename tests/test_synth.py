"""Built-in software synth: Song -> WAV without external tools."""
import wave

import numpy as np

from polyphemus_tpu.generate import synthesize_audio
from polyphemus_tpu.midi import Note, Song, Track, write_midi
from polyphemus_tpu.midi.synth import synthesize, song_to_wav


def demo_song():
    return Song(resolution=8, tempo=120, tracks=[
        Track("Drums", -1, True, [Note(0, 36, 2), Note(8, 38, 2),
                                  Note(16, 42, 1)]),
        Track("Bass", 34, False, [Note(0, 40, 16)]),
        Track("Strings", 50, False, [Note(8, 64, 24), Note(8, 67, 24)]),
    ])


def test_synthesize_nonsilent_bounded():
    wav = synthesize(demo_song(), sample_rate=8000)
    assert wav.dtype == np.float32
    assert np.abs(wav).max() <= 1.0
    assert np.abs(wav).max() > 0.01  # audible
    # energy exists where the strings play (step 8 onward)
    sec_per_step = 60 / 120 / 8
    idx = int(10 * sec_per_step * 8000)
    assert np.abs(wav[idx:idx + 4000]).max() > 0.01


def test_song_to_wav_file(tmp_path):
    p = tmp_path / "x.wav"
    song_to_wav(demo_song(), str(p), sample_rate=8000)
    with wave.open(str(p)) as f:
        assert f.getframerate() == 8000
        assert f.getnchannels() == 1
        assert f.getnframes() > 8000  # > 1 second


def test_synthesize_audio_fallback(tmp_path):
    midi = tmp_path / "y.mid"
    write_midi(str(midi), demo_song())
    ok = synthesize_audio(str(midi), soundfont_path=None)
    assert ok
    assert (tmp_path / "y.wav").exists()
