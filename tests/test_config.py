"""Config loading: drop-in reference training.json compatibility."""
import json

from polyphemus_tpu.config import (GenerationConfig, TrainConfig,
                                   load_train_config, save_train_config,
                                   train_config_from_dict)


def test_reference_training_json_loads():
    cfg = load_train_config("/root/reference/training.json")
    assert cfg.batch_size == 256
    assert cfg.model.d == 512
    assert cfg.model.gnn_n_layers == 8
    assert cfg.model.n_bars == 2
    assert cfg.model.resolution == 8
    assert cfg.model.batch_norm is True
    assert cfg.model.dropout == 0
    assert cfg.optimizer.betas == (0.9, 0.98)
    assert cfg.optimizer.eps == 1e-9
    assert cfg.lr_scheduler.peak_lr == 1e-4
    assert cfg.lr_scheduler.warmup_steps == 8000
    assert cfg.beta_scheduler.beta_max == 0.01
    assert cfg.model.n_timesteps == 32


def test_roundtrip(tmp_path):
    cfg = load_train_config("/root/reference/training.json")
    p = tmp_path / "cfg.json"
    save_train_config(cfg, p)
    cfg2 = load_train_config(p)
    assert cfg2 == cfg


def test_unknown_keys_ignored():
    raw = json.load(open("/root/reference/training.json"))
    raw["model"]["exotic_future_knob"] = 42
    raw["whatever"] = True
    cfg = train_config_from_dict(raw)
    assert cfg.model.d == 512


def test_generation_config_yaml(tmp_path):
    p = tmp_path / "gen.yaml"
    p.write_text("MIDI_PROGRAMS:\n  Drums: -1\n  Bass: 33\n  Guitar: 4\n"
                 "  Strings: 54\nSOUNDFONT_PATH: \"sf/x.sf2\"\n")
    gc = GenerationConfig.load(str(p))
    assert gc.midi_programs["Bass"] == 33
    assert gc.soundfont_path == "sf/x.sf2"
    # defaults when no file
    gd = GenerationConfig.load(None)
    assert gd.midi_programs["Bass"] == 34
