"""Note-level output parity harness vs the PyTorch reference.

Usage (two phases, so each side can run in its own environment):

  # 1. in any environment with this repo: generate with a fixed z
  python scripts/parity_check.py ours TORCH_MODEL_DIR OUT_DIR --n 8 --seed 0

  # 2. in an environment with the reference + torch_geometric:
  #    python /path/to/reference/generate.py ... with the SAME z
  #    (OUT_DIR/z.npy; patch generate_z or load it), writing MIDI to REF_DIR
  # 3. compare:
  python scripts/parity_check.py compare OUT_DIR REF_DIR

Compares the (track, time, pitch, duration) note multisets per sequence —
the BASELINE.md parity criterion.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def cmd_ours(args):
    import jax

    from polyphemus_tpu import generate as G
    from polyphemus_tpu.midi.fast_render import render_midi_bytes

    model, variables, cfg = G.load_model(args.model_dir)
    mc = cfg.model
    rng = np.random.default_rng(args.seed)
    z = rng.standard_normal((args.n, mc.d)).astype(np.float32)
    os.makedirs(args.out_dir, exist_ok=True)
    np.save(os.path.join(args.out_dir, "z.npy"), z)

    gen = G.make_generator(model, variables,
                           pallas=jax.default_backend() == "tpu")
    mask, tokens = gen(np.asarray(z))
    mask, tokens = np.asarray(mask), np.asarray(tokens)
    for i in range(args.n):
        d = os.path.join(args.out_dir, str(i))
        os.makedirs(d, exist_ok=True)
        raw = render_midi_bytes(tokens[i], mask[i], mc.resolution)
        if raw is None:
            song = G.song_from_tokens(tokens[i], mask[i], mc.resolution)
            G.save_song(song, d, "generated")
        else:
            with open(os.path.join(d, "generated.mid"), "wb") as f:
                f.write(raw)
    print(f"Wrote {args.n} sequences + z.npy to {args.out_dir}")


def note_set(midi_path):
    from polyphemus_tpu.midi import read_midi

    song, tpq, _ = read_midi(midi_path)
    notes = []
    for ti, track in enumerate(sorted(song.tracks,
                                      key=lambda t: (not t.is_drum,
                                                     t.program))):
        for n in track.notes:
            notes.append((ti, n.time, n.pitch, n.duration))
    return sorted(notes)


def cmd_compare(args):
    total, same = 0, 0
    for name in sorted(os.listdir(args.ours_dir)):
        a = os.path.join(args.ours_dir, name, "generated.mid")
        b = os.path.join(args.ref_dir, name, "generated.mid")
        if not (os.path.exists(a) and os.path.exists(b)):
            continue
        total += 1
        na, nb = note_set(a), note_set(b)
        if na == nb:
            same += 1
        else:
            extra = set(na) - set(nb)
            missing = set(nb) - set(na)
            print(f"seq {name}: MISMATCH (+{len(extra)} / -{len(missing)})")
    print(f"note-level parity: {same}/{total} sequences identical")
    sys.exit(0 if same == total and total > 0 else 1)


def main():
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    po = sub.add_parser("ours")
    po.add_argument("model_dir")
    po.add_argument("out_dir")
    po.add_argument("--n", type=int, default=8)
    po.add_argument("--seed", type=int, default=0)
    po.set_defaults(fn=cmd_ours)
    pc = sub.add_parser("compare")
    pc.add_argument("ours_dir")
    pc.add_argument("ref_dir")
    pc.set_defaults(fn=cmd_compare)
    args = p.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
