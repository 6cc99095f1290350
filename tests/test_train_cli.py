"""End-to-end training CLI: dataset dir -> training -> checkpoint -> resume
-> stats plots."""
import json
import os

import numpy as np
import pytest

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


@pytest.mark.slow
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


def test_train_cli_on_packed_shards(tmp_path):
    """The CLI auto-detects a packed shard dir (shards.json) and trains
    through the FastShardedBatcher batch-gather path."""
    from polyphemus_tpu.data.sharded import pack_dataset

    data = make_dataset(tmp_path, n=16)
    packed = tmp_path / "packed"
    assert pack_dataset(data, str(packed), n_bars=2) == 16
    cfg_path = write_config(tmp_path)
    out = tmp_path / "runs"

    train_main([str(packed), str(out), cfg_path, "--model_name", "mp",
                "--max_epochs", "1", "--save_every", "2",
                "--print_every", "10", "--num_workers", "2",
                "--seed", "0", "--early_exit", "2"])
    model_dir = out / "mp"
    assert (model_dir / "checkpoint.msgpack").exists()
    lines = [json.loads(ln) for ln in
             (model_dir / "metrics.jsonl").read_text().splitlines()]
    assert lines and np.isfinite(lines[-1]["loss/tot"])

    # n_bars mismatch between packed data and config fails loudly
    import pytest
    cfg = json.loads((tmp_path / "training.json").read_text())
    cfg["model"]["n_bars"] = 4
    bad_cfg = tmp_path / "training4.json"
    bad_cfg.write_text(json.dumps(cfg))
    with pytest.raises(SystemExit, match="n_bars"):
        train_main([str(packed), str(out), str(bad_cfg),
                    "--model_name", "mp4", "--max_epochs", "1"])
