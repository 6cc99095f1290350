"""Training losses — same seven components and names as the reference
(/root/reference/training.py:298-347): tot, pitch, dur, structure,
reconstruction, kld, beta*kld.

Dense layout: c_logits (B, nb, T, S, 15, 230); targets are token ids
(B, nb, T, S, 16, 2) (slot 0 = SOS, dropped here like training.py:301).
Cross-entropies ignore PAD tokens and inactive lattice cells, matching the
reference's sparse node set + ignore_index semantics (training.py:101-102).

`ref_parity=True` reproduces the reference's structure-loss bug, where the
targets are passed as logits (training.py:307 overwrites s_logits with a
reshape of s_tensor), for checkpoint-equivalence comparisons (SURVEY.md §2.2).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import constants


def _masked_ce(logits, labels, weights):
    """Mean cross-entropy over elements with weights>0 (ignore_index style).

    The label pick is a one-hot multiply-reduce, not take_along_axis:
    TPU gathers (and their scatter-add backward) serialize, while the
    masked reduce is pure VPU work (round-3 profile: ~30 ms/step saved
    on the slot-scanned path)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    oh = jax.nn.one_hot(labels, logits.shape[-1], dtype=logp.dtype)
    ll = jnp.sum(logp * oh, axis=-1)
    w = weights.astype(logits.dtype)
    denom = jnp.maximum(jnp.sum(w), 1.0)
    return -jnp.sum(ll * w) / denom


def compute_losses(s_logits, c_logits, tokens, mask, mu, log_var, beta,
                   *, ref_parity: bool = False):
    """Returns (tot_loss, dict of scalar losses). Loss math runs in fp32
    regardless of compute dtype (bf16 policy keeps softmax/KLD stable)."""
    s_logits = s_logits.astype(jnp.float32)
    c_logits = c_logits.astype(jnp.float32)
    mu = mu.astype(jnp.float32)
    log_var = log_var.astype(jnp.float32)
    targets = tokens[..., 1:, :]  # drop SOS slot
    pitch_true = targets[..., 0]
    dur_true = targets[..., 1]
    act = mask[..., None] & jnp.ones(pitch_true.shape[-1:], bool)

    pitch_logits = c_logits[..., : constants.N_PITCH_TOKENS]
    dur_logits = c_logits[..., constants.N_PITCH_TOKENS:]

    pitch_w = act & (pitch_true != constants.PitchToken.PAD)
    dur_w = act & (dur_true != constants.DurationToken.PAD)
    pitch_loss = _masked_ce(pitch_logits, pitch_true, pitch_w)
    dur_loss = _masked_ce(dur_logits, dur_true, dur_w)

    s_target = mask.astype(s_logits.dtype)
    s_in = s_target if ref_parity else s_logits
    s_loss = jnp.mean(
        jnp.maximum(s_in, 0) - s_in * s_target
        + jnp.log1p(jnp.exp(-jnp.abs(s_in)))
    )

    kld = -0.5 * jnp.sum(1 + log_var - jnp.square(mu) - jnp.exp(log_var),
                         axis=1)
    kld = jnp.mean(kld)

    rec = pitch_loss + dur_loss + s_loss
    tot = rec + beta * kld
    return tot, {
        "tot": tot,
        "pitch": pitch_loss,
        "dur": dur_loss,
        "structure": s_loss,
        "reconstruction": rec,
        "kld": kld,
        "beta*kld": beta * kld,
    }


def structure_loss(s_logits, mask, *, ref_parity: bool = False):
    """BCE-with-logits on the structure tensor (training.py:310-312);
    ref_parity feeds the targets back as logits (the reference bug)."""
    s_logits = s_logits.astype(jnp.float32)
    s_target = mask.astype(jnp.float32)
    s_in = s_target if ref_parity else s_logits
    return jnp.mean(
        jnp.maximum(s_in, 0) - s_in * s_target
        + jnp.log1p(jnp.exp(-jnp.abs(s_in)))
    )


def kld_loss(mu, log_var):
    mu = mu.astype(jnp.float32)
    log_var = log_var.astype(jnp.float32)
    kld = -0.5 * jnp.sum(1 + log_var - jnp.square(mu) - jnp.exp(log_var),
                         axis=1)
    return jnp.mean(kld)


def losses_from_stats(stats, s_logits, mask, mu, log_var, beta,
                      *, ref_parity: bool = False):
    """Same seven components as compute_losses, from the slot-scanned
    content statistics (models/vae.py ContentDecoder emit='train_stats'):
    the (B, nb, T, S, 15, 230) logits tensor never materializes."""
    pitch_loss = stats["pitch_nll"] / jnp.maximum(stats["n_p"], 1.0)
    dur_loss = stats["dur_nll"] / jnp.maximum(stats["n_d"], 1.0)
    s_loss = structure_loss(s_logits, mask, ref_parity=ref_parity)
    kld = kld_loss(mu, log_var)
    rec = pitch_loss + dur_loss + s_loss
    tot = rec + beta * kld
    return tot, {
        "tot": tot,
        "pitch": pitch_loss,
        "dur": dur_loss,
        "structure": s_loss,
        "reconstruction": rec,
        "kld": kld,
        "beta*kld": beta * kld,
    }
