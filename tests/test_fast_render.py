"""Native MIDI renderer: byte-identical to the Python path, much faster."""
import time

import numpy as np
import pytest

from polyphemus_tpu import constants
from polyphemus_tpu.generate import song_from_tokens
from polyphemus_tpu.midi.fast_render import render_midi_bytes
from polyphemus_tpu.midi.song import loop_song
from polyphemus_tpu.midi.writer import write_midi
from polyphemus_tpu.native import load_midirender


def random_sample(rng, nb=2, density=0.25):
    t, s, slots = 4, 32, 15
    mask = rng.random((nb, t, s)) < density
    mask[0, 0, 0] = True
    tokens = np.zeros((nb, t, s, slots, 2), np.int32)
    tokens[..., 0] = constants.PitchToken.PAD
    tokens[..., 1] = constants.DurationToken.PAD
    for idx in np.argwhere(mask):
        n_notes = int(rng.integers(1, 5))
        for k in range(n_notes):
            tokens[tuple(idx) + (k,)] = (int(rng.integers(0, 128)),
                                         int(rng.integers(0, 96)))
        if n_notes < slots:
            tokens[tuple(idx) + (n_notes,)] = (constants.PitchToken.EOS,
                                               constants.DurationToken.EOS)
    # sprinkle a SOS quirk cell
    first = tuple(np.argwhere(mask)[0])
    tokens[first + (0,)] = (constants.PitchToken.SOS,
                            constants.DurationToken.SOS)
    return tokens, mask


def python_bytes(tokens, mask, resolution, n_loops, tmp_path, tag):
    song = song_from_tokens(tokens, mask, resolution)
    if n_loops > 1:
        song = loop_song(song, n_loops, mask.shape[0], resolution)
    p = tmp_path / f"{tag}.mid"
    write_midi(str(p), song)
    return p.read_bytes()


@pytest.mark.parametrize("seed,n_loops", [(0, 1), (1, 1), (2, 4)])
def test_bytes_identical(tmp_path, seed, n_loops):
    assert load_midirender() is not None
    rng = np.random.default_rng(seed)
    tokens, mask = random_sample(rng)
    want = python_bytes(tokens, mask, 8, n_loops, tmp_path, f"py{seed}")
    got = render_midi_bytes(tokens, mask, 8, n_loops=n_loops)
    assert got == want


def test_render_throughput(tmp_path):
    rng = np.random.default_rng(3)
    samples = [random_sample(rng) for _ in range(16)]
    # warm-up / correctness on one
    render_midi_bytes(*samples[0], 8)
    t0 = time.perf_counter()
    reps = 8
    for _ in range(reps):
        for toks, mask in samples:
            render_midi_bytes(toks, mask, 8)
    dt = time.perf_counter() - t0
    native_rate = reps * len(samples) / dt

    t0 = time.perf_counter()
    for toks, mask in samples:
        song_from_tokens(toks, mask, 8)
    py_rate = len(samples) / (time.perf_counter() - t0)
    assert native_rate > 3 * py_rate, (native_rate, py_rate)
