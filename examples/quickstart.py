"""End-to-end quickstart: MIDI -> tensors -> shards -> train -> generate.

Runs the ENTIRE pipeline on synthetic data in ~2 minutes on CPU:

    python examples/quickstart.py /tmp/poly_quickstart

Steps (each is the same CLI/API a real run uses — only the data is toy):
  1. write a few 4-track MIDI files with the built-in SMF writer;
  2. preprocess them into reference-format .npz samples;
  3. pack the samples into mmap-able shards (native fastloader format);
  4. train a small model for a few steps (checkpoint + metrics.jsonl);
  5. generate new sequences from the checkpoint and write .mid files.

Reference counterpart: the README walkthrough of
/root/reference (preprocess.py -> train.py -> generate.py).
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(root: str) -> None:
    # Toy demo: run on host CPU by default so it works (and finishes in
    # ~2 min) even when the machine's accelerator backend is busy or
    # unreachable. POLY_QUICKSTART_ACCEL=1 opts into the default backend.
    # The env var alone is not enough under sitecustomize-pinned backends —
    # jax.config is authoritative (CLAUDE.md).
    if os.environ.get("POLY_QUICKSTART_ACCEL", "0") != "1":
        import jax

        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from polyphemus_tpu.midi import Note, Song, Track, write_midi

    midi_dir = os.path.join(root, "midi")
    os.makedirs(midi_dir, exist_ok=True)

    # 1. synthetic source MIDI: drums/bass/guitar/strings, 4/4, 8 bars
    rng = np.random.default_rng(0)
    for i in range(4):
        tracks = []
        for name, program, is_drum, base in (
                ("drums", 0, True, 40), ("bass", 33, False, 40),
                ("guitar", 25, False, 60), ("strings", 48, False, 70)):
            notes = [Note(int(t), int(base + rng.integers(0, 12)),
                          int(rng.integers(1, 4)), 80)
                     for t in range(0, 8 * 32, int(rng.integers(2, 6)))]
            tracks.append(Track(name, program, is_drum, notes))
        write_midi(os.path.join(midi_dir, f"song{i}.mid"),
                   Song(resolution=8, tempo=120.0, tracks=tracks))

    # 2. preprocess (same flags as the reference CLI)
    from polyphemus_tpu.cli.preprocess import main as pre_main

    samples_dir = os.path.join(root, "samples")
    pre_main([midi_dir, samples_dir, "--n_bars", "2", "--resolution", "8"])

    # 3. pack into shards for the native fastloader
    from polyphemus_tpu.cli.pack_dataset import main as pack_main

    shards_dir = os.path.join(root, "shards")
    pack_main([samples_dir, shards_dir, "--n_bars", "2",
               "--shard_size", "64"])

    # 4. train a tiny model for a few steps
    from polyphemus_tpu.cli.train import main as train_main

    cfg_path = os.path.join(root, "config.json")
    with open(cfg_path, "w") as f:
        json.dump({"batch_size": 8,
                   "model": {"d": 32, "gnn_n_layers": 2, "n_bars": 2,
                             "resolution": 8, "dropout": 0,
                             "batch_norm": True}}, f)
    models_dir = os.path.join(root, "models")
    train_main([samples_dir, models_dir, cfg_path,
                "--model_name", "quickstart", "--early_exit", "3",
                "--print_every", "1", "--num_workers", "2",
                "--tr_split", "1.0", "--seed", "0"])

    # 5. generate from the trained checkpoint
    from polyphemus_tpu.cli.generate import main as gen_main

    out_dir = os.path.join(root, "generated")
    gen_main([os.path.join(models_dir, "quickstart"), out_dir,
              "--n", "2", "--no_audio"])

    mids = [os.path.join(dp, f) for dp, _, fs in os.walk(out_dir)
            for f in fs if f.endswith(".mid")]
    print(f"quickstart complete: {len(mids)} generated MIDI files under "
          f"{out_dir}")
    assert mids, "expected generated MIDI output"


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/poly_quickstart")
