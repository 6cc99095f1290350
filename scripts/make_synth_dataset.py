"""Build an offline training corpus through the FULL data pipeline.

The sandbox has no network, so the LMD corpus the reference trains on
(/root/reference/README.md:49-57) cannot be fetched. This script exercises
the identical pipeline end-to-end on generated music instead:

  dependency-free MIDI writer -> data/preprocess.py (parse, quantize, 4/4
  filter, pianoroll, token pack, window filter, .npz) -> cli.pack_dataset
  (packed mmap shards + native batch gather)

The songs are patterned (drums on a fixed kit, bass on beats 1/3, guitar
triads, string pads — scripts/bench_preprocess.make_song) so a training run
on the output has real learnable structure; scripts/sustained duration runs
(PERFORMANCE.md) train on this.

Usage: python scripts/make_synth_dataset.py OUT_DIR [--files 800]
       [--bars 16] [--n_bars 2] [--seed 0]
"""
import argparse
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_platforms", "cpu")  # host-only; never touch the tunnel

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench_preprocess import make_song, RESOLUTION  # noqa: E402
from polyphemus_tpu.cli.pack_dataset import main as pack_main  # noqa: E402
from polyphemus_tpu.data.preprocess import preprocess_midi_dataset  # noqa: E402
from polyphemus_tpu.midi import write_midi  # noqa: E402


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("out_dir")
    ap.add_argument("--files", type=int, default=800)
    ap.add_argument("--bars", type=int, default=16,
                    help="bars per generated song")
    ap.add_argument("--n_bars", type=int, default=2,
                    help="window length (graphs per sample)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--keep_midi", action="store_true")
    args = ap.parse_args(argv)

    rng = np.random.default_rng(args.seed)
    work = tempfile.mkdtemp(prefix="synthmidi_")
    midi_dir = os.path.join(work, "midi")
    sample_dir = os.path.join(work, "samples")
    os.makedirs(midi_dir)
    print(f"Writing {args.files} synthetic MIDI files...")
    for i in range(args.files):
        write_midi(os.path.join(midi_dir, f"song_{i:05d}.mid"),
                   make_song(rng, args.bars))

    print("Preprocessing (parse -> quantize -> pianoroll -> windows)...")
    preprocess_midi_dataset(midi_dir, sample_dir, n_bars=args.n_bars,
                            resolution=RESOLUTION, n_workers=1)
    n_samples = len([f for f in os.listdir(sample_dir) if f.endswith(".npz")])
    print(f"Produced {n_samples} window samples; packing shards...")

    pack_main([sample_dir, args.out_dir, "--n_bars", str(args.n_bars)])
    if args.keep_midi:
        shutil.move(midi_dir, os.path.join(args.out_dir, "midi"))
    shutil.rmtree(work, ignore_errors=True)
    print(f"Dataset ready at {args.out_dir} ({n_samples} samples)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
