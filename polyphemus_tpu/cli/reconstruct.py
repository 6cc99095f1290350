"""Reconstruction CLI: encode preprocessed samples, decode them back, save
original + reconstructed MIDI side by side (model-quality inspection — a
capability the reference only exercises implicitly during training).

    python -m polyphemus_tpu.cli.reconstruct MODEL_DIR SAMPLE... OUT_DIR \
        [--sample_z] [--predict_structure] [--seed N]
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from .. import generate as G
from ..config import GenerationConfig
from ..data.dataset import load_sample
from ..models import VAE


def main(argv=None):
    p = argparse.ArgumentParser(description="Reconstructs samples through "
                                            "the VAE.")
    p.add_argument("model_dir", type=str)
    p.add_argument("samples", nargs="+", type=str,
                   help="Preprocessed .npz sample files.")
    p.add_argument("out_dir", type=str)
    p.add_argument("--sample_z", action="store_true", default=False,
                   help="Sample z ~ N(mu, sigma) instead of using mu.")
    p.add_argument("--predict_structure", action="store_true", default=False,
                   help="Let the decoder predict structure instead of "
                        "teacher-forcing the original.")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    from ..utils import enable_compile_cache

    enable_compile_cache()

    model, variables, cfg = G.load_model(args.model_dir)
    mc = cfg.model
    gen_cfg = GenerationConfig()

    toks, masks = zip(*(load_sample(s, mc.n_bars) for s in args.samples))
    toks = jnp.asarray(np.stack(toks), jnp.int32)
    masks = jnp.asarray(np.stack(masks))

    mu, log_var = model.apply(variables, toks, masks, method=VAE.encode)
    if args.sample_z:
        eps = jax.random.normal(jax.random.key(args.seed), mu.shape)
        z = mu + jnp.exp(0.5 * log_var) * eps
    else:
        z = mu

    cond = None if args.predict_structure else masks
    s_logits, tokens, used_mask = model.apply(
        variables, z, cond, method=VAE.decode_tokens)

    tokens, used_mask = np.asarray(tokens), np.asarray(used_mask)
    toks_np, masks_np = np.asarray(toks), np.asarray(masks)
    for i, path in enumerate(args.samples):
        out = os.path.join(args.out_dir, str(i))
        orig = G.song_from_tokens(toks_np[i][..., 1:, :], masks_np[i],
                                  mc.resolution, gen_cfg)
        rec = G.song_from_tokens(tokens[i], used_mask[i], mc.resolution,
                                 gen_cfg)
        G.save_song(orig, out, "original")
        G.save_song(rec, out, "reconstructed")
        print(f"{path} -> {out}/original.mid, {out}/reconstructed.mid")


if __name__ == "__main__":
    main()
