"""Note-level output parity harness vs the PyTorch reference.

ONE-COMMAND closure (requires network for the checkpoint download and the
reference's pip dependencies; runs the reference side in a venv it
provisions itself):

  python scripts/parity_check.py full --model lmd2

which: downloads the published checkpoint (huggingface_hub, reference
download_models.py:7-26), generates N sequences with OUR engine from a
fixed z (auto-converting the torch checkpoint), provisions a venv with
torch + torch_geometric + muspy, replays the SAME z through the
reference's own generate.py/utils.py (scripts/_ref_generate_driver.py),
and diffs the note multisets.

Manual two-phase mode (each side in its own environment):

  # 1. in any environment with this repo: generate with a fixed z
  python scripts/parity_check.py ours TORCH_MODEL_DIR OUT_DIR --n 8 --seed 0

  # 2. in an environment with the reference + torch_geometric:
  python scripts/_ref_generate_driver.py REF_DIR TORCH_MODEL_DIR \
      OUT_DIR/z.npy REF_OUT_DIR
  # 3. compare:
  python scripts/parity_check.py compare OUT_DIR REF_OUT_DIR

Compares the (track, time, pitch, duration) note multisets per sequence —
the BASELINE.md parity criterion.
"""
import argparse
import os
import shutil
import subprocess
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
    sys.exit(0 if _compare_dirs(args.ours_dir, args.ref_dir) else 1)


def _compare_dirs(ours_dir, ref_dir):
    total, same = 0, 0
    for name in sorted(os.listdir(ours_dir)):
        a = os.path.join(ours_dir, name, "generated.mid")
        b = os.path.join(ref_dir, name, "generated.mid")
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
    return total > 0 and same == total


REF_DEPS = ["torch", "torch_geometric", "torch_scatter", "torch_sparse",
            "muspy", "pyyaml", "numpy", "prettytable"]


def cmd_full(args):
    """Download -> ours -> venv -> reference -> compare. Network required
    for the download and the venv's pip installs; everything is cached, so
    re-runs are cheap."""
    work = os.path.abspath(args.work_dir)
    os.makedirs(work, exist_ok=True)

    # 1. published torch checkpoint (reference download_models.py:7-26;
    # the HF repo stores them as models/LMD2 and models/LMD16)
    models_dir = os.path.join(work, "models")
    torch_model_dir = os.path.join(models_dir, args.model.upper())
    if not os.path.exists(os.path.join(torch_model_dir, "checkpoint")):
        print(f"[full] downloading {args.model} checkpoint ...")
        from huggingface_hub import snapshot_download

        snapshot_download(repo_id="EmanueleCosenza/polyphemus",
                          local_dir=models_dir)
    if not os.path.exists(os.path.join(torch_model_dir, "checkpoint")):
        sys.exit(f"no checkpoint at {torch_model_dir} after download")

    # 2. our side: fixed z -> MIDI (auto-converts the torch checkpoint)
    ours_dir = os.path.join(work, "ours")
    args_ours = argparse.Namespace(model_dir=torch_model_dir,
                                   out_dir=ours_dir, n=args.n,
                                   seed=args.seed)
    cmd_ours(args_ours)

    # 3. reference side in its own venv
    venv = os.path.join(work, "ref_venv")
    vpy = os.path.join(venv, "bin", "python")
    provisioned = os.path.join(venv, ".deps_installed")
    if not os.path.exists(provisioned):
        # not atomic vs a partial earlier attempt (venv created but pip
        # failed): rebuild from scratch and only stamp after pip succeeds
        if os.path.exists(venv):
            print(f"[full] removing partially provisioned venv {venv} ...")
            shutil.rmtree(venv)
        print(f"[full] creating venv {venv} ...")
        import venv as venv_mod

        venv_mod.EnvBuilder(with_pip=True).create(venv)
        subprocess.run([vpy, "-m", "pip", "install", "-q"] + REF_DEPS,
                       check=True)
        with open(provisioned, "w") as f:
            f.write(" ".join(REF_DEPS) + "\n")
    ref_out = os.path.join(work, "reference")
    driver = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "_ref_generate_driver.py")
    subprocess.run([vpy, driver, args.reference_dir, torch_model_dir,
                    os.path.join(ours_dir, "z.npy"), ref_out], check=True)

    # 4. compare note multisets
    ok = _compare_dirs(ours_dir, ref_out)
    sys.exit(0 if ok else 1)


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
    pf = sub.add_parser("full", help="download + ours + reference + compare "
                                     "in one command (needs network)")
    pf.add_argument("--model", choices=["lmd2", "lmd16"], default="lmd2")
    pf.add_argument("--n", type=int, default=8)
    pf.add_argument("--seed", type=int, default=0)
    pf.add_argument("--work_dir", default="parity_work")
    pf.add_argument("--reference_dir", default="/root/reference")
    pf.set_defaults(fn=cmd_full)
    args = p.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
