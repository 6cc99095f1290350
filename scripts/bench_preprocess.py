"""Host-side preprocessing throughput — the BASELINE.json "preprocess
graphs/sec" tracked metric. Pure host pipeline (MIDI parse -> quantize ->
pianoroll -> token pack -> window filter -> .npz), no TPU involved; forces
the CPU backend so it runs independently of the tunnel.

Builds a synthetic 4-track corpus with the dependency-free MIDI writer
(varied note patterns per file so the parser/packer see non-identical
inputs), then times `preprocess_midi_dataset` end-to-end. Reports both
files/sec and produced samples (graph windows)/sec, merged into
bench_report.json. Reference counterpart: /root/reference/preprocess.py
(muspy/pypianoroll pipeline, wall-clock printed per run, no published
numbers — SURVEY.md §6).
"""
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_platforms", "cpu")  # host-only; never touch the tunnel

import numpy as np

from polyphemus_tpu.data.preprocess import preprocess_midi_dataset
from polyphemus_tpu.midi import Note, Song, Track, write_midi

N_FILES = int(os.environ.get("POLY_BENCH_PRE_FILES", "256"))
N_BARS_PER_FILE = int(os.environ.get("POLY_BENCH_PRE_BARS", "16"))
RESOLUTION = 8


def make_song(rng: np.random.Generator, n_bars: int) -> Song:
    """4/4 full-band song with randomized (but always-active) bars."""
    bar = 4 * RESOLUTION
    drums, bass, guitar, strings = [], [], [], []
    for b in range(n_bars):
        t0 = b * bar
        for k in range(int(rng.integers(2, 6))):
            drums.append(Note(t0 + int(rng.integers(0, bar)),
                              int(rng.choice([36, 38, 42, 46])), 2))
        bass.append(Note(t0, int(rng.integers(35, 55)),
                         int(rng.integers(4, 17))))
        bass.append(Note(t0 + bar // 2, int(rng.integers(35, 55)),
                         int(rng.integers(4, 17))))
        for p in rng.choice(np.arange(55, 80), size=3, replace=False):
            guitar.append(Note(t0 + int(rng.integers(0, bar // 2)),
                               int(p), int(rng.integers(2, 9))))
        strings.append(Note(t0 + int(rng.integers(0, 8)),
                            int(rng.integers(60, 84)),
                            int(rng.integers(8, bar))))
    return Song(resolution=RESOLUTION, tempo=120, tracks=[
        Track("drums", -1, True, drums),
        Track("bass", 34, False, bass),
        Track("guitar", 1, False, guitar),
        Track("strings", 50, False, strings),
    ])


def main() -> None:
    rng = np.random.default_rng(0)
    tmp = tempfile.mkdtemp(prefix="poly_pre_bench_")
    midi_dir = os.path.join(tmp, "midi", "corpus")
    out_dir = os.path.join(tmp, "samples")
    os.makedirs(midi_dir)
    for i in range(N_FILES):
        write_midi(os.path.join(midi_dir, f"song{i:04d}.mid"),
                   make_song(rng, N_BARS_PER_FILE))

    # single worker: the benchmark machine has ONE core; the pipeline
    # scales by process via preprocess_midi_dataset(n_workers=N)
    t0 = time.perf_counter()
    preprocess_midi_dataset(os.path.join(tmp, "midi"), out_dir,
                            n_bars=2, resolution=RESOLUTION, n_workers=1)
    dt = time.perf_counter() - t0
    n_samples = len([f for f in os.listdir(out_dir) if f.endswith(".npz")])
    shutil.rmtree(tmp)

    report_path = "bench_report.json"
    report = (json.load(open(report_path))
              if os.path.exists(report_path) else {})
    report["preprocess_files_s"] = round(N_FILES / dt, 1)
    report["preprocess_graphs_s"] = round(n_samples / dt, 1)
    with open(report_path, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({"files": N_FILES, "bars_per_file": N_BARS_PER_FILE,
                      "samples": n_samples, "seconds": round(dt, 2),
                      "files_s": report["preprocess_files_s"],
                      "graphs_s": report["preprocess_graphs_s"]}))


if __name__ == "__main__":
    main()
