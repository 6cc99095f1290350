"""Sanity checks for the analytic FLOP accounting (polyphemus_tpu/flops.py)."""
from polyphemus_tpu import flops as F
from polyphemus_tpu.config import ModelConfig


def test_flagship_magnitudes():
    cfg = ModelConfig(d=512, gnn_n_layers=8, n_bars=2, resolution=8)
    gen = F.generation_flops_per_seq(cfg)
    fwd = F.train_fwd_flops_per_seq(cfg)
    step = F.train_step_flops_per_seq(cfg)
    # decoder GCN (5.4G) + chord tail (2.0G) + unembed (0.45G) ~ 8G
    assert 6e9 < gen < 11e9
    assert fwd > gen  # encoder adds chord_encoder + its own GCN
    assert step == 3 * fwd


def test_scaling_relations():
    base = ModelConfig(d=512, gnn_n_layers=8, n_bars=2, resolution=8)
    deep = ModelConfig(d=512, gnn_n_layers=16, n_bars=2, resolution=8)
    wide = ModelConfig(d=1024, gnn_n_layers=8, n_bars=2, resolution=8)
    long = ModelConfig(d=512, gnn_n_layers=8, n_bars=16, resolution=8)
    # GCN-dominated: doubling layers adds ~5.4G of the ~8G
    assert F.generation_flops_per_seq(deep) > \
        1.5 * F.generation_flops_per_seq(base)
    # d^2 scaling of the dominant terms
    assert F.generation_flops_per_seq(wide) > \
        3 * F.generation_flops_per_seq(base)
    # linear-ish in bars
    r = F.generation_flops_per_seq(long) / F.generation_flops_per_seq(base)
    assert 7 < r < 9


def test_mfu():
    cfg = ModelConfig(d=512, gnn_n_layers=8, n_bars=2, resolution=8)
    g = F.generation_flops_per_seq(cfg)
    # 10,527 seq/s (bench_report r1) -> tens-of-percent MFU, not >100
    m = F.mfu(10527, g)
    assert 10 < m < 100
