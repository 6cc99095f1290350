"""Generation CLI — flag-compatible with the reference's generate.py
(/root/reference/generate.py:117-256).

    python -m polyphemus_tpu.cli.generate MODEL_DIR OUTPUT_DIR \
        [--n 5] [--n_loops 1] [--no_audio] [--s_file structure.json] \
        [--seed N] [--gen_config cfg.yaml] [--plot_struct] [--plot_proll]
"""
from __future__ import annotations

import argparse
import os
import time

import jax
import numpy as np

from .. import generate as G
from ..config import GenerationConfig
from ..midi.song import loop_song


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Generates MIDI music with a trained model.")
    p.add_argument("model_dir", type=str)
    p.add_argument("output_dir", type=str)
    p.add_argument("--n", type=int, default=5,
                   help="Number of sequences to generate (default 5).")
    p.add_argument("--n_loops", type=int, default=1)
    p.add_argument("--no_audio", action="store_true", default=False)
    p.add_argument("--s_file", type=str,
                   help="JSON file with a binary structure tensor.")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--z_file", type=str, default=None,
                   help="Load latent z from a .npy file (n, d) instead of "
                        "sampling — e.g. a torch-generated z for parity "
                        "checks against the reference.")
    p.add_argument("--gen_config", type=str, default=None,
                   help="YAML/JSON with MIDI_PROGRAMS / SOUNDFONT_PATH.")
    p.add_argument("--plot_struct", action="store_true", default=False)
    p.add_argument("--plot_proll", action="store_true", default=False)
    p.add_argument("--no_pallas", action="store_true", default=False,
                   help="Disable the fused TPU kernel (use plain XLA).")
    p.add_argument("--bf16", action="store_true", default=False,
                   help="bfloat16 decode (faster; measured vs fp32 at "
                        "n=256 random-init flagship: 0.09%% structure-cell "
                        "flips, 4.0%% note-multiset diff — bench_report "
                        "bf16_* keys).")
    p.add_argument("--s_temp", type=float, default=0.0,
                   help="Structure sampling temperature (0 = reference "
                        "hard threshold).")
    p.add_argument("--c_temp", type=float, default=0.0,
                   help="Content sampling temperature (0 = reference "
                        "argmax).")
    args = p.parse_args(argv)

    from ..utils import enable_compile_cache

    enable_compile_cache()

    gen_cfg = GenerationConfig.load(args.gen_config)

    print(f"Loading the model from {args.model_dir}...")
    model, variables, cfg = G.load_model(args.model_dir)
    mc = cfg.model

    s_batch = None
    if args.s_file is not None:
        s = G.load_structure_file(args.s_file, mc.n_bars, mc.n_tracks,
                                  mc.n_timesteps)
        s_batch = np.broadcast_to(s, (args.n,) + s.shape).copy()

    if args.z_file is not None:
        print(f"Loading z from {args.z_file}...")
        z = np.load(args.z_file).astype(np.float32)
        if z.shape != (args.n, mc.d):
            raise ValueError(f"z file shape {z.shape} != ({args.n}, {mc.d})")
    else:
        print("Generating z...")
        z = G.generate_z(args.seed, args.n, mc.d)

    print("Generating music with the model...")
    use_pallas = jax.default_backend() == "tpu" and not args.no_pallas
    gen = G.make_generator(model, variables, conditioned=s_batch is not None,
                           bf16=args.bf16, pallas=use_pallas,
                           structure_temp=args.s_temp,
                           content_temp=args.c_temp,
                           sample_seed=args.seed)
    # compile excluded from the timed run (one-time cost)
    if s_batch is not None:
        jax.block_until_ready(gen(z, s_batch))
        t0 = time.time()
        mask, tokens = jax.block_until_ready(gen(z, s_batch))
    else:
        jax.block_until_ready(gen(z))
        t0 = time.time()
        mask, tokens = jax.block_until_ready(gen(z))
    dt = time.time() - t0
    print(f"Inference time: {dt:.3f} s ({args.n / max(dt, 1e-9):.1f} seq/s)")

    mask_np = np.asarray(mask)
    tokens_np = np.asarray(tokens)

    from .. import constants
    from ..midi.fast_render import render_midi_bytes

    programs = [0 if name == "Drums" else gen_cfg.midi_programs.get(name, 0)
                for name in constants.TRACKS[:mc.n_tracks]]

    print(f"Saving MIDI files in {args.output_dir}...")
    for i in range(args.n):
        out_dir = os.path.join(args.output_dir, str(i))
        os.makedirs(out_dir, exist_ok=True)
        song = None
        for name, loops in (("generated", 1),) + (
                (("extended", args.n_loops),) if args.n_loops > 1 else ()):
            raw = render_midi_bytes(tokens_np[i], mask_np[i], mc.resolution,
                                    programs=programs, n_loops=loops)
            midi_path = os.path.join(out_dir, name + ".mid")
            if raw is not None:  # native fast path
                with open(midi_path, "wb") as f:
                    f.write(raw)
                if not args.no_audio:
                    G.synthesize_audio(midi_path, gen_cfg.soundfont_path)
            else:  # pure-Python fallback
                song = song or G.song_from_tokens(
                    tokens_np[i], mask_np[i], mc.resolution, gen_cfg)
                s = song if loops == 1 else loop_song(
                    song, loops, mc.n_bars, mc.resolution)
                G.save_song(s, out_dir, name, audio=not args.no_audio,
                            soundfont_path=gen_cfg.soundfont_path)
        if args.plot_struct or args.plot_proll:
            from .. import plotting

            if args.plot_struct:
                plotting.plot_structure(mask_np[i], out_dir)
            if args.plot_proll:
                song = song or G.song_from_tokens(
                    tokens_np[i], mask_np[i], mc.resolution, gen_cfg)
                plotting.plot_pianoroll(song, out_dir)
    print("Finished saving MIDI files.")


if __name__ == "__main__":
    main()
