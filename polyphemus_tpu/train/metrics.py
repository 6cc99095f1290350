"""Training metrics — same nine names/semantics as the reference
(/root/reference/training.py:349-496): note, pitch, pitch_drums,
pitch_non_drums, dur, s_acc, s_precision, s_recall, s_f1.

`ref_parity=True` reproduces the reference bug where structure metrics are
computed on targets-reinterpreted-as-logits (training.py:356): after the
sigmoid>=0.5 threshold every cell predicts active, so s_acc/s_precision
equal the target density and s_recall is 1.
"""
from __future__ import annotations

import jax.numpy as jnp

from .. import constants


def _ratio(num, den):
    return num / jnp.maximum(den, 1e-12)


def compute_accuracies(s_logits, c_logits, tokens, mask,
                       *, ref_parity: bool = False):
    targets = tokens[..., 1:, :]
    pitch_true, dur_true = targets[..., 0], targets[..., 1]
    act = mask[..., None] & jnp.ones(pitch_true.shape[-1:], bool)

    pitch_rec = jnp.argmax(c_logits[..., : constants.N_PITCH_TOKENS], axis=-1)
    dur_rec = jnp.argmax(c_logits[..., constants.N_PITCH_TOKENS:], axis=-1)

    np_pad = act & (pitch_true != constants.PitchToken.PAD)
    nd_pad = act & (dur_true != constants.DurationToken.PAD)
    correct_p = (pitch_rec == pitch_true) & np_pad
    correct_d = (dur_rec == dur_true) & nd_pad

    is_drum_cells = jnp.zeros(mask.shape, bool).at[..., 0, :].set(True)
    drum = is_drum_cells[..., None] & jnp.ones(pitch_true.shape[-1:], bool)

    def acc(c, w):
        return _ratio(jnp.sum(c), jnp.sum(w))

    note_acc = _ratio(jnp.sum(correct_p & correct_d), jnp.sum(np_pad))
    pitch_acc = acc(correct_p, np_pad)
    pitch_drums = acc(correct_p & drum, np_pad & drum)
    pitch_non_drums = acc(correct_p & ~drum, np_pad & ~drum)
    dur_acc = acc(correct_d, nd_pad)

    s_true = mask
    if ref_parity:
        # The reference overwrites s_logits with the binary targets
        # (training.py:356) and then thresholds sigmoid(targets) at 0.5
        # (training.py:470-496). sigmoid(0)=0.5 lands ON the >=0.5 branch,
        # so the "predictions" are all-ones: s_acc == s_precision == target
        # density, s_recall == 1. Verified against the literal reference
        # code in tests/test_ref_ground.py.
        s_pred = jnp.ones(mask.shape, bool)
    else:
        import jax

        s_pred = jax.nn.sigmoid(s_logits) >= 0.5
    tp = jnp.sum(s_pred & s_true)
    s_acc = _ratio(jnp.sum(s_pred == s_true), s_true.size)
    s_precision = _ratio(tp, jnp.sum(s_pred))
    s_recall = _ratio(tp, jnp.sum(s_true))
    s_f1 = _ratio(2 * s_recall * s_precision, s_recall + s_precision)

    return {
        "note": note_acc,
        "pitch": pitch_acc,
        "pitch_drums": pitch_drums,
        "pitch_non_drums": pitch_non_drums,
        "dur": dur_acc,
        "s_acc": s_acc,
        "s_precision": s_precision,
        "s_recall": s_recall,
        "s_f1": s_f1,
    }


def structure_metrics(s_logits, mask, *, ref_parity: bool = False):
    """The four structure metrics alone (shared by the slot-scanned path,
    which never materializes content logits)."""
    s_true = mask
    if ref_parity:
        s_pred = jnp.ones(mask.shape, bool)
    else:
        import jax

        s_pred = jax.nn.sigmoid(s_logits) >= 0.5
    tp = jnp.sum(s_pred & s_true)
    s_acc = _ratio(jnp.sum(s_pred == s_true), s_true.size)
    s_precision = _ratio(tp, jnp.sum(s_pred))
    s_recall = _ratio(tp, jnp.sum(s_true))
    s_f1 = _ratio(2 * s_recall * s_precision, s_recall + s_precision)
    return {"s_acc": s_acc, "s_precision": s_precision,
            "s_recall": s_recall, "s_f1": s_f1}


def accuracies_from_stats(stats, s_logits, mask, *,
                          ref_parity: bool = False):
    """Same nine names/semantics as compute_accuracies, from the
    slot-scanned content statistics (ContentDecoder emit='train_stats')."""
    out = {
        "note": _ratio(stats["c_both"], stats["n_p"]),
        "pitch": _ratio(stats["c_p"], stats["n_p"]),
        "pitch_drums": _ratio(stats["c_p_dr"], stats["n_p_dr"]),
        "pitch_non_drums": _ratio(stats["c_p_nd"], stats["n_p_nd"]),
        "dur": _ratio(stats["c_d"], stats["n_d"]),
    }
    out.update(structure_metrics(s_logits, mask, ref_parity=ref_parity))
    return out
