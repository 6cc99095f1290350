"""LR and KL-beta schedules.

Reference semantics (/root/reference/training.py:19-75) with the documented
bugs fixed by default; `ref_parity` reproduces them exactly (SURVEY.md §2.2):
  * warmup holds LR at peak instead of ramping (training.py:65-66);
  * beta condition `or` is always true and beta is never capped
    (training.py:34-38) — and the trainer never applies the scheduled beta
    anyway (training.py:116, :171-172), so parity-mode training uses beta=0.

Both schedules are pure functions of the optimizer-update step count, usable
inside jit via jnp ops.
"""
from __future__ import annotations

import math

import jax.numpy as jnp

from ..config import BetaSchedulerConfig, LRSchedulerConfig


def lr_schedule(cfg: LRSchedulerConfig, step):
    """step: 1-based count of optimizer updates (jnp or python int)."""
    decay_factor = -math.log(cfg.final_lr_scale) / cfg.decay_steps
    step = jnp.asarray(step, jnp.float32)
    after = step - cfg.warmup_steps
    decayed = cfg.peak_lr * jnp.exp(-decay_factor * jnp.maximum(after, 0.0))
    if cfg.ramp_warmup:
        warm = cfg.peak_lr * step / max(cfg.warmup_steps, 1)
    else:
        warm = jnp.asarray(cfg.peak_lr, jnp.float32)
    return jnp.where(step <= cfg.warmup_steps, warm, decayed)


def beta_schedule(cfg: BetaSchedulerConfig, step, *, ref_parity: bool = False):
    """KL weight at a given update step."""
    n_steps = max(int(cfg.beta_max // cfg.step_size), 1)
    inc_every = max((cfg.anneal_end - cfg.anneal_start) // n_steps, 1)
    step = jnp.asarray(step, jnp.int32)
    if ref_parity:
        # Reference trainer never applies the scheduler output.
        return jnp.zeros((), jnp.float32)
    cur = (step - cfg.anneal_start) // inc_every
    beta = cfg.step_size * (cur + 1).astype(jnp.float32)
    beta = jnp.clip(beta, 0.0, cfg.beta_max)
    return jnp.where(step < cfg.anneal_start, 0.0, beta)
