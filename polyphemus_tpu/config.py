"""Typed configuration for the whole framework.

One dataclass tree replaces the reference's three config mechanisms (argparse
flags, training.json kwargs-splat, generation YAML read from CWD — see
/root/reference/train.py:128, /root/reference/generation_config.py:15).
JSON field names match the reference's training.json so existing configs load
unchanged.
"""
from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Any, Mapping

from . import constants


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    d: int = 512
    gnn_n_layers: int = 8
    n_bars: int = 2
    resolution: int = constants.DEFAULT_RESOLUTION
    dropout: float = 0.0
    # Per-message dropout inside each GCL. The reference hard-codes p=0.1 on
    # every edge message in training mode regardless of config
    # (/root/reference/model.py:44,133 — GCN never forwards its dropout to
    # GCL). Default 0 here (flagship configs train without it and the fused
    # Pallas training kernel requires 0); set 0.1 to reproduce reference
    # training dynamics. Forces the XLA GCL during training.
    message_dropout: float = 0.0
    # "edge" (default): exact reference semantics — every ordered edge
    # message gets its own iid mask (ONSET/NEXT expand to per-(src,dst)
    # message tensors; ~4x message memory on those relations, training
    # only). "aggregate": the cheaper round-2 proxy — iid dropout on the
    # per-destination per-relation aggregates (unbiased, lower variance).
    message_dropout_mode: str = "edge"
    batch_norm: bool = True
    # Use the fused Pallas GCL kernels (forward + hand-written backward).
    use_pallas_gcl: bool = False
    # Pallas kernel tile sizes (bars resident in VMEM per kernel
    # invocation) for the EVAL/generation path; kernels clamp to the actual
    # flattened bar count, so small batches never pad up to a block. 8/16
    # won the round-2 sweep at both 2 and 16 bars (PERFORMANCE.md); the
    # training custom-vjp kernels keep their own (smaller) VMEM-safe tiles.
    # NOTE: on the fp32 eval path the GCL tile is additionally clamped to 4
    # (fp32 packed weights alone hold 8.4 MB of the 16 MB scoped VMEM, and
    # 6/8-bar fp32 blocks overflowed inside the batch-256 eval graph) — so
    # values > 4 here only take full effect under bf16.
    gcl_bars_per_block: int = 8
    tail_bars_per_block: int = 16
    # GCL layers fused per Pallas invocation on the EVAL/generation path
    # (1 = one kernel per layer). Chained layers keep node states in VMEM
    # across layer boundaries and build the per-bar selection statics
    # once; most (chain, dtype) combos need scoped VMEM beyond 16 MB, so
    # the enclosing jit must raise xla_tpu_scoped_vmem_limit_kib
    # (generate.make_generator handles this; env POLY_GCL_CHAIN sweeps).
    gcl_chain: int = 1
    # Histogram-fused content-encoder front end: computes the masked BN
    # stats analytically from the embedding tables (hist @ table — exact
    # counts, so better-rounded than reducing a bf16 embedding tensor) and
    # folds BN + chord projection into per-slot lookup tables applied as
    # one-hot matmuls — the (cells, 15, d) intermediates, their BN pass,
    # and the big chord dot (fwd+bwd ~12 ms/step, round-4 profile) all
    # disappear. Default ON since round 4: bf16 train step 0.1404 ->
    # 0.1234 s (42.3 -> 48.1% MFU). Same parameter tree; the plain path
    # stays for parity tests (identical math, different f32 association).
    fused_content_encoder: bool = True

    @property
    def n_timesteps(self) -> int:
        return constants.timesteps_per_bar(self.resolution)

    @property
    def n_tracks(self) -> int:
        return constants.N_TRACKS


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    lr: float = 5e-06
    betas: tuple[float, float] = (0.9, 0.98)
    eps: float = 1e-09
    weight_decay: float = 0.0


@dataclasses.dataclass(frozen=True)
class LRSchedulerConfig:
    peak_lr: float = 1e-4
    warmup_steps: int = 8000
    final_lr_scale: float = 0.01
    decay_steps: int = 800_000
    # Reference quirk (/root/reference/training.py:65-66): "warmup" holds the
    # LR constant at peak_lr instead of ramping. ramp_warmup=True fixes it.
    ramp_warmup: bool = False


@dataclasses.dataclass(frozen=True)
class BetaSchedulerConfig:
    anneal_start: int = 40_000
    anneal_end: int = 500_000
    beta_max: float = 0.01
    step_size: float = 0.001


@dataclasses.dataclass(frozen=True)
class ParallelConfig:
    """Device-mesh layout. axes: data (dp), model (tp). Sizes of 1 disable."""

    data_axis: int = -1  # -1 = all remaining devices
    model_axis: int = 1


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    batch_size: int = 256
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    optimizer: OptimizerConfig = dataclasses.field(default_factory=OptimizerConfig)
    lr_scheduler: LRSchedulerConfig = dataclasses.field(default_factory=LRSchedulerConfig)
    beta_scheduler: BetaSchedulerConfig = dataclasses.field(default_factory=BetaSchedulerConfig)
    parallel: ParallelConfig = dataclasses.field(default_factory=ParallelConfig)
    # Gradient accumulation microbatches per optimizer step
    # (reference: iters_to_accumulate, /root/reference/training.py:97).
    iters_to_accumulate: int = 1
    # bf16 compute policy for the hot path (params stay fp32).
    bf16: bool = False
    # Slot-scanned content CE + metrics (the training-side mirror of the
    # generation fast path): the (B, nb, T, S, 15, 230) logits never
    # materialize. Numerically equivalent to the logits path (fp32 CE, same
    # masks); with model.dropout > 0 the scan draws per-slot dropout keys
    # for the slot hiddens (same iid semantics as the logits path).
    fused_ce: bool = True
    seed: int = 0
    # Reference-parity mode: reproduce the reference's training quirks
    # (degenerate structure loss, beta pinned to 0 — SURVEY.md §2.2).
    ref_parity: bool = False


def _filter_kwargs(cls, d: Mapping[str, Any]) -> dict:
    names = {f.name for f in dataclasses.fields(cls)}
    return {k: v for k, v in d.items() if k in names}


def train_config_from_dict(raw: Mapping[str, Any]) -> TrainConfig:
    """Build a TrainConfig from a reference-style training.json dict."""
    model = ModelConfig(**_filter_kwargs(ModelConfig, raw.get("model", {})))
    opt_raw = dict(raw.get("optimizer", {}))
    if "betas" in opt_raw:
        opt_raw["betas"] = tuple(opt_raw["betas"])
    optimizer = OptimizerConfig(**_filter_kwargs(OptimizerConfig, opt_raw))
    lr = LRSchedulerConfig(**_filter_kwargs(LRSchedulerConfig, raw.get("lr_scheduler", {})))
    beta = BetaSchedulerConfig(**_filter_kwargs(BetaSchedulerConfig, raw.get("beta_scheduler", {})))
    top = _filter_kwargs(TrainConfig, raw)
    top.pop("model", None), top.pop("optimizer", None)
    top.pop("lr_scheduler", None), top.pop("beta_scheduler", None)
    top.pop("parallel", None)
    parallel = ParallelConfig(**_filter_kwargs(ParallelConfig, raw.get("parallel", {})))
    return TrainConfig(model=model, optimizer=optimizer, lr_scheduler=lr,
                       beta_scheduler=beta, parallel=parallel, **top)


def train_config_to_dict(cfg: TrainConfig) -> dict:
    d = dataclasses.asdict(cfg)
    d["optimizer"]["betas"] = list(d["optimizer"]["betas"])
    return d


def load_train_config(path: str | Path) -> TrainConfig:
    with open(path) as f:
        return train_config_from_dict(json.load(f))


def save_train_config(cfg: TrainConfig, path: str | Path) -> None:
    with open(path, "w") as f:
        json.dump(train_config_to_dict(cfg), f, indent=2)


@dataclasses.dataclass(frozen=True)
class GenerationConfig:
    """Rendering config (reference: generation_config.yaml, loaded from CWD at
    import time — we load explicitly, from an explicit path)."""

    midi_programs: Mapping[str, int] = dataclasses.field(
        default_factory=lambda: dict(constants.DEFAULT_MIDI_PROGRAMS))
    soundfont_path: str = constants.DEFAULT_SOUNDFONT_PATH

    @staticmethod
    def load(path: str | Path | None) -> "GenerationConfig":
        if path is None:
            return GenerationConfig()
        text = Path(path).read_text()
        if str(path).endswith((".yaml", ".yml")):
            import yaml

            raw = yaml.safe_load(text) or {}
        else:
            raw = json.loads(text)
        return GenerationConfig(
            midi_programs=raw.get("MIDI_PROGRAMS", dict(constants.DEFAULT_MIDI_PROGRAMS)),
            soundfont_path=raw.get("SOUNDFONT_PATH", constants.DEFAULT_SOUNDFONT_PATH),
        )
