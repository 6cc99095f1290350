"""Analytic FLOP accounting + MFU for the perf suite.

The reference publishes no perf numbers (SURVEY.md §6), so the framework
defines its own accounting: *model* FLOPs — the matmul/conv work the
architecture semantically requires (2·M·N·K per GEMM), not implementation
FLOPs (the Pallas kernels' one-hot selection matmuls, for instance, are
implementation overhead and deliberately NOT counted; gathers/embeddings
count as zero). MFU = model FLOP rate / chip peak, the convention of the
PaLM paper and the scaling book.

Peak: TPU v5e ≈ 197 TFLOP/s bf16 per chip. fp32 matmuls on the MXU are
bf16-rounded by default (CLAUDE.md), so the same peak applies to the
default-precision fp32 path; true-fp32 (HIGHEST precision) would be ~1/8
of that but nothing in this framework requests it.

Per-sequence counts for the flagship LMD2 config (d=512, 8 layers, 2 bars):
generation ≈ 8.1 GFLOP, training fwd ≈ 16.5 GFLOP, training step ≈ 3x fwd.
"""
from __future__ import annotations

from . import constants
from .config import ModelConfig

V5E_PEAK_FLOPS = 197e12  # bf16, one chip

_N_SLOTS = constants.MAX_SIMU_TOKENS - 1  # 15
_PV = constants.N_PITCH_TOKENS  # 131
_DV = constants.N_DUR_TOKENS  # 99


def _gemm(m: float, n: float, k: float) -> float:
    return 2.0 * m * n * k


def gcn_flops(cfg: ModelConfig) -> float:
    """One GCN stack, per sequence. Per cell, each layer applies five d x d
    projections (its track relation, self, onset, next, root — models/gnn.py,
    reference model.py:101-121); edge gating is elementwise (VPU, excluded
    from the matmul count by the convention above)."""
    n_cells = cfg.n_bars * cfg.n_tracks * cfg.n_timesteps
    return cfg.gnn_n_layers * _gemm(n_cells, cfg.d, cfg.d) * 5


def _cnn_encoder_flops(cfg: ModelConfig) -> float:
    """CNNEncoder per bar (models/layers.py:101-133)."""
    t, s, d = cfg.n_tracks, cfg.n_timesteps, cfg.d
    conv0 = _gemm(t * s, 8, 1 * 9)
    conv1 = _gemm(t * (s // 4), 16, 8 * 9)
    lin0 = _gemm(1, d, 16 * t * (s // 4))
    lin1 = _gemm(1, d, d)
    return conv0 + conv1 + lin0 + lin1


def _cnn_decoder_flops(cfg: ModelConfig) -> float:
    """CNNDecoder per bar (models/layers.py:136-164)."""
    t, s, d = cfg.n_tracks, cfg.n_timesteps, cfg.d
    lin0 = _gemm(1, d, d)
    lin1 = _gemm(1, 16 * t * (s // 4), d)
    conv0 = _gemm(t * s, 8, 16 * 9)
    conv1 = _gemm(t * s, 1, 8 * 9)
    return lin0 + lin1 + conv0 + conv1


def encoder_flops(cfg: ModelConfig) -> float:
    """VAE encoder, per sequence (models/vae.py Encoder)."""
    d = cfg.d
    n_cells = cfg.n_bars * cfg.n_tracks * cfg.n_timesteps
    chord_enc = _gemm(n_cells, d, _N_SLOTS * d)
    gate = _gemm(n_cells, 1, d)
    pool = 2.0 * n_cells * d  # elementwise weight + segment sum
    bars_enc_c = _gemm(1, d, cfg.n_bars * d)
    s_enc = cfg.n_bars * _cnn_encoder_flops(cfg) + _gemm(1, d, cfg.n_bars * d)
    head = _gemm(1, d, 2 * d) + 2 * _gemm(1, d, d)
    return (chord_enc + gcn_flops(cfg) + gate + pool + bars_enc_c
            + s_enc + head)


def decoder_flops(cfg: ModelConfig) -> float:
    """VAE decoder = the whole generation pipeline, per sequence
    (structure decode + lattice + content decode + unembed)."""
    d, h = cfg.d, cfg.d // 2
    n_cells = cfg.n_bars * cfg.n_tracks * cfg.n_timesteps
    lin_dec = _gemm(1, 2 * d, d)
    s_dec = _gemm(1, cfg.n_bars * d, d) + cfg.n_bars * _cnn_decoder_flops(cfg)
    bars_dec_c = _gemm(1, cfg.n_bars * d, d)
    chord_dec = _gemm(n_cells, _N_SLOTS * d, d)
    unembed = _N_SLOTS * (_gemm(n_cells, _PV, h) + _gemm(n_cells, _DV, h))
    return (lin_dec + s_dec + bars_dec_c + gcn_flops(cfg)
            + chord_dec + unembed)


def generation_flops_per_seq(cfg: ModelConfig) -> float:
    """z -> token ids (the bench.py pipeline)."""
    return decoder_flops(cfg)


def train_fwd_flops_per_seq(cfg: ModelConfig) -> float:
    return encoder_flops(cfg) + decoder_flops(cfg)


def train_step_flops_per_seq(cfg: ModelConfig) -> float:
    """fwd + bwd ~= 3x fwd matmul FLOPs (each GEMM backward needs two GEMMs
    of the forward's size); optimizer update FLOPs are negligible."""
    return 3.0 * train_fwd_flops_per_seq(cfg)


def mfu(seq_per_sec: float, flops_per_seq: float,
        peak: float = V5E_PEAK_FLOPS) -> float:
    """Model FLOPs utilization in percent."""
    return 100.0 * seq_per_sec * flops_per_seq / peak
