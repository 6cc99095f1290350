"""convert + pack_dataset CLIs end to end."""
import os

import jax
import numpy as np
import torch

from polyphemus_tpu.cli.convert import main as convert_main
from polyphemus_tpu.cli.pack_dataset import main as pack_main
from polyphemus_tpu.config import ModelConfig, TrainConfig, train_config_to_dict
from polyphemus_tpu.data.fastloader import FastShardedBatcher
from polyphemus_tpu.generate import load_model
from polyphemus_tpu.models import VAE

from . import torch_ref
from .test_sharded import make_sample_dir

CFG = ModelConfig(d=32, gnn_n_layers=2, n_bars=2, resolution=8,
                  dropout=0.0, batch_norm=True)


def test_convert_cli_roundtrip(tmp_path):
    sd = torch_ref.random_state_dict(CFG, seed=4)
    tdir = tmp_path / "torch_model"
    os.makedirs(tdir)
    torch.save({"model_state_dict": sd}, tdir / "checkpoint")
    torch.save({"model": train_config_to_dict(TrainConfig(model=CFG))["model"]},
               tdir / "configuration")

    ndir = tmp_path / "native"
    convert_main([str(tdir), str(ndir)])
    assert (ndir / "checkpoint.msgpack").exists()
    assert (ndir / "config.json").exists()

    # native dir decodes identically to the on-the-fly converted torch dir
    m1, v1, c1 = load_model(str(ndir))
    m2, v2, c2 = load_model(str(tdir))
    z = jax.random.normal(jax.random.key(0), (2, CFG.d))
    s1, t1, k1 = m1.apply(v1, z, method=VAE.decode_tokens)
    s2, t2, k2 = m2.apply(v2, z, method=VAE.decode_tokens)
    assert (np.asarray(k1) == np.asarray(k2)).all()
    act = np.asarray(k1)
    assert (np.asarray(t1)[act] == np.asarray(t2)[act]).all()


def test_pack_dataset_cli(tmp_path):
    src = make_sample_dir(tmp_path, n=12)
    out = tmp_path / "packed"
    pack_main([src, str(out), "--n_bars", "2", "--shard_size", "5"])
    ds = FastShardedBatcher(str(out))
    assert len(ds) == 12
    toks, mask = ds.gather_batch(np.arange(12))
    assert toks.shape[0] == 12
