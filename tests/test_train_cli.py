"""End-to-end training CLI: dataset dir -> training -> checkpoint -> resume
-> stats plots."""
import json
import os

import numpy as np

from polyphemus_tpu.cli.stats import main as stats_main
from polyphemus_tpu.cli.train import main as train_main


def make_dataset(tmp_path, n=24, n_bars=2):
    d = tmp_path / "data"
    d.mkdir()
    rng = np.random.default_rng(0)
    for i in range(n):
        c = rng.integers(0, 90, (4, n_bars * 32, 16, 2)).astype(np.int16)
        c[..., 0, 0] = 128  # SOS
        c[..., 0, 1] = 96
        s = rng.random((4, n_bars * 32)) < 0.2
        np.savez(d / f"s{i:03d}", c_tensor=c, s_tensor=s)
    return str(d)


def write_config(tmp_path):
    cfg = {
        "batch_size": 4,
        "model": {"d": 32, "gnn_n_layers": 2, "n_bars": 2, "resolution": 8,
                  "dropout": 0, "batch_norm": True},
        "optimizer": {"betas": [0.9, 0.98], "eps": 1e-9, "lr": 1e-3},
        "lr_scheduler": {"peak_lr": 1e-3, "final_lr_scale": 0.01,
                         "warmup_steps": 10, "decay_steps": 1000},
        "beta_scheduler": {"anneal_start": 5, "beta_max": 0.01,
                           "step_size": 0.001, "anneal_end": 50},
    }
    p = tmp_path / "training.json"
    p.write_text(json.dumps(cfg))
    return str(p)


def test_train_cli_end_to_end(tmp_path):
    data = make_dataset(tmp_path)
    cfg_path = write_config(tmp_path)
    out = tmp_path / "runs"

    train_main([data, str(out), cfg_path, "--model_name", "m1",
                "--max_epochs", "1", "--save_every", "2",
                "--print_every", "10", "--eval", "--eval_every", "3",
                "--num_workers", "2", "--seed", "0", "--early_exit", "3"])

    model_dir = out / "m1"
    assert (model_dir / "checkpoint.msgpack").exists()
    assert (model_dir / "config.json").exists()
    assert (model_dir / "metrics.jsonl").exists()
    lines = [json.loads(ln) for ln in
             (model_dir / "metrics.jsonl").read_text().splitlines()]
    assert len(lines) >= 3
    assert "loss/tot" in lines[0] and "acc/note" in lines[0]

    # resume continues from the checkpoint
    train_main([data, str(out), cfg_path, "--model_name", "m1",
                "--max_epochs", "1", "--save_every", "2",
                "--print_every", "10", "--num_workers", "2",
                "--seed", "0", "--early_exit", "2", "--resume"])
    meta = json.loads((model_dir / "checkpoint.json").read_text())
    assert meta["tot_batches"] >= 3

    # stats plots from the checkpoint history
    stats_main([str(model_dir)])
    assert (model_dir / "losses.png").exists()
    assert (model_dir / "accuracies.png").exists()
