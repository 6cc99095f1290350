"""End-to-end generation flow: model dir -> CLI -> MIDI files on disk."""
import json
import os

import jax
import numpy as np
import torch
from flax import serialization

from polyphemus_tpu import constants
from polyphemus_tpu.cli.generate import main as gen_main
from polyphemus_tpu.config import (ModelConfig, TrainConfig,
                                   save_train_config, train_config_to_dict)
from polyphemus_tpu.generate import load_model
from polyphemus_tpu.midi import read_midi
from polyphemus_tpu.models import VAE

from . import torch_ref

CFG = ModelConfig(d=32, gnn_n_layers=2, n_bars=2, resolution=8,
                  dropout=0.0, batch_norm=True)


def save_native_model(tmp_path):
    model = VAE(CFG)
    toks = np.zeros((1, 2, 4, 32, 16, 2), np.int32)
    mask = np.zeros((1, 2, 4, 32), bool)
    mask[:, :, 0, 0] = True
    variables = model.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        toks, mask, deterministic=True)
    model_dir = tmp_path / "native_model"
    os.makedirs(model_dir)
    with open(model_dir / "checkpoint.msgpack", "wb") as f:
        f.write(serialization.to_bytes(
            {"params": variables["params"],
             "batch_stats": variables["batch_stats"]}))
    save_train_config(TrainConfig(model=CFG), model_dir / "config.json")
    return str(model_dir)


def test_cli_uncond_and_structure(tmp_path):
    model_dir = save_native_model(tmp_path)
    out = tmp_path / "out"
    gen_main([model_dir, str(out), "--n", "2", "--no_audio", "--seed", "3",
              "--n_loops", "2"])
    for i in range(2):
        mid = out / str(i) / "generated.mid"
        ext = out / str(i) / "extended.mid"
        assert mid.exists() and ext.exists()
        song, tpq, _ = read_midi(str(mid))
        assert tpq == CFG.resolution

    # structure-conditioned with the repo's example structure file
    s = np.zeros((2, 4, 32), int)
    s[:, :, 0] = 1
    s[0, 1, 8] = 1
    s_file = tmp_path / "structure.json"
    s_file.write_text(json.dumps(s.tolist()))
    out2 = tmp_path / "out2"
    gen_main([model_dir, str(out2), "--n", "1", "--no_audio",
              "--s_file", str(s_file)])
    assert (out2 / "0" / "generated.mid").exists()


def test_partial_structure_tiling(tmp_path):
    model_dir = save_native_model(tmp_path)
    # single-bar structure for a 2-bar model -> tiled (generate.py:218-222)
    s = np.zeros((1, 4, 32), int)
    s[0, 0, 0] = 1
    s_file = tmp_path / "s1.json"
    s_file.write_text(json.dumps(s.tolist()))
    out = tmp_path / "out3"
    gen_main([model_dir, str(out), "--n", "1", "--no_audio",
              "--s_file", str(s_file)])
    assert (out / "0" / "generated.mid").exists()


def test_load_model_torch_dir(tmp_path):
    """A reference-style torch model dir loads transparently."""
    sd = torch_ref.random_state_dict(CFG, seed=2)
    model_dir = tmp_path / "torch_model"
    os.makedirs(model_dir)
    torch.save({"model_state_dict": sd}, model_dir / "checkpoint")
    raw = train_config_to_dict(TrainConfig(model=CFG))
    torch.save({"model": raw["model"]}, model_dir / "configuration")

    model, variables, cfg = load_model(str(model_dir))
    assert cfg.model.d == CFG.d
    z = jax.random.normal(jax.random.key(0), (2, CFG.d))
    s_logits, c_logits, mask = model.apply(variables, z, method=VAE.decode)
    assert mask.shape == (2, 2, 4, 32)
