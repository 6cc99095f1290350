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


def lr_schedule(cfg: LRSchedulerConfig, step, xp=jnp):
    """step: 1-based count of optimizer updates (jnp or python int).

    xp selects the array backend: jnp (default, jit-safe) or numpy — the
    trainer's host-side metric drain uses numpy so logging never dispatches
    eager device ops (same formulas, parity-tested against each other)."""
    decay_factor = -math.log(cfg.final_lr_scale) / cfg.decay_steps
    step = xp.asarray(step, xp.float32)
    after = step - cfg.warmup_steps
    decayed = cfg.peak_lr * xp.exp(-decay_factor * xp.maximum(after, 0.0))
    if cfg.ramp_warmup:
        warm = cfg.peak_lr * step / max(cfg.warmup_steps, 1)
    else:
        warm = xp.asarray(cfg.peak_lr, xp.float32)
    return xp.where(step <= cfg.warmup_steps, warm, decayed)


def beta_schedule(cfg: BetaSchedulerConfig, step, *, ref_parity: bool = False,
                  xp=jnp):
    """KL weight at a given update step (xp: see lr_schedule)."""
    n_steps = max(int(cfg.beta_max // cfg.step_size), 1)
    inc_every = max((cfg.anneal_end - cfg.anneal_start) // n_steps, 1)
    step = xp.asarray(step, xp.int32)
    if ref_parity:
        # Reference trainer never applies the scheduler output.
        return xp.zeros((), xp.float32)
    cur = (step - cfg.anneal_start) // inc_every
    beta = cfg.step_size * (cur + 1).astype(xp.float32)
    beta = xp.clip(beta, 0.0, cfg.beta_max)
    return xp.where(step < cfg.anneal_start, 0.0, beta)
