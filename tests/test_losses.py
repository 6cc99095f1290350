"""Loss semantics vs torch CrossEntropyLoss(ignore_index) on the sparse
node set (the reference's formulation, training.py:298-347)."""
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from polyphemus_tpu import constants
from polyphemus_tpu.train.losses import compute_losses


def test_ce_matches_torch_ignore_index():
    rng = np.random.default_rng(0)
    b, nb, t, s = 2, 2, 4, 8
    mask = rng.random((b, nb, t, s)) < 0.4
    mask[..., 0, 0] = True
    c_logits = rng.standard_normal((b, nb, t, s, 15, 230)).astype(np.float32)
    pitch = rng.integers(0, constants.N_PITCH_TOKENS, (b, nb, t, s, 16))
    dur = rng.integers(0, constants.N_DUR_TOKENS, (b, nb, t, s, 16))
    tokens = np.stack([pitch, dur], -1).astype(np.int32)
    s_logits = rng.standard_normal((b, nb, t, s)).astype(np.float32)
    mu = rng.standard_normal((b, 16)).astype(np.float32)
    lv = rng.standard_normal((b, 16)).astype(np.float32)

    tot, losses = compute_losses(
        jnp.asarray(s_logits), jnp.asarray(c_logits), jnp.asarray(tokens),
        jnp.asarray(mask), jnp.asarray(mu), jnp.asarray(lv), beta=0.5)

    # torch reference on the sparse node set
    act = np.argwhere(mask)
    pl_rows = []
    pt_rows, dl_rows, dt_rows = [], [], []
    for bb, nn_, tt, ss in act:
        for slot in range(15):
            pl_rows.append(c_logits[bb, nn_, tt, ss, slot, :131])
            dl_rows.append(c_logits[bb, nn_, tt, ss, slot, 131:])
            pt_rows.append(tokens[bb, nn_, tt, ss, slot + 1, 0])
            dt_rows.append(tokens[bb, nn_, tt, ss, slot + 1, 1])
    pl = torch.tensor(np.stack(pl_rows))
    dl = torch.tensor(np.stack(dl_rows))
    pt = torch.tensor(np.array(pt_rows), dtype=torch.long)
    dt = torch.tensor(np.array(dt_rows), dtype=torch.long)
    want_pitch = F.cross_entropy(pl, pt,
                                 ignore_index=int(constants.PitchToken.PAD))
    want_dur = F.cross_entropy(dl, dt,
                               ignore_index=int(constants.DurationToken.PAD))
    np.testing.assert_allclose(float(losses["pitch"]), float(want_pitch),
                               rtol=1e-5)
    np.testing.assert_allclose(float(losses["dur"]), float(want_dur),
                               rtol=1e-5)

    # structure BCE over the full tensor
    want_s = F.binary_cross_entropy_with_logits(
        torch.tensor(s_logits), torch.tensor(mask, dtype=torch.float32))
    np.testing.assert_allclose(float(losses["structure"]), float(want_s),
                               rtol=1e-5)

    # analytic KLD
    mu_t, lv_t = torch.tensor(mu), torch.tensor(lv)
    want_kld = torch.mean(
        -0.5 * torch.sum(1 + lv_t - mu_t.pow(2) - lv_t.exp(), dim=1))
    np.testing.assert_allclose(float(losses["kld"]), float(want_kld),
                               rtol=1e-5)
    np.testing.assert_allclose(
        float(tot),
        float(want_pitch + want_dur + want_s + 0.5 * want_kld), rtol=1e-5)
