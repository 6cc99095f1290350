"""MaskedBatchNorm training-mode parity vs torch BatchNorm1d on the packed
node set (SURVEY.md §7 'hard parts': masked batch statistics)."""
import jax
import jax.numpy as jnp
import numpy as np
import torch

from polyphemus_tpu.models.layers import MaskedBatchNorm


def test_train_mode_stats_match_torch():
    rng = np.random.default_rng(0)
    b, cells, f = 3, 40, 8
    mask = rng.random((b, cells)) < 0.4
    mask[0, 0] = True
    x = rng.standard_normal((b, cells, f)).astype(np.float32)

    bn = MaskedBatchNorm(f)
    variables = bn.init(jax.random.key(0), jnp.asarray(x), jnp.asarray(mask),
                        use_running_average=False)
    # non-default params to exercise scale/bias
    params = {"scale": jnp.asarray(rng.standard_normal(f), jnp.float32),
              "bias": jnp.asarray(rng.standard_normal(f), jnp.float32)}
    y, updates = bn.apply(
        {"params": params, "batch_stats": variables["batch_stats"]},
        jnp.asarray(x), jnp.asarray(mask), use_running_average=False,
        mutable=["batch_stats"])

    tb = torch.nn.BatchNorm1d(f)
    with torch.no_grad():
        tb.weight.copy_(torch.tensor(np.asarray(params["scale"])))
        tb.bias.copy_(torch.tensor(np.asarray(params["bias"])))
    tb.train()
    packed = torch.tensor(x[mask])  # (n_active, f)
    want = tb(packed)

    got = np.asarray(y)[mask]
    np.testing.assert_allclose(got, want.detach().numpy(), rtol=1e-4,
                               atol=1e-5)
    # running stats follow torch's momentum=0.1 + unbiased-var convention
    np.testing.assert_allclose(
        np.asarray(updates["batch_stats"]["mean"]),
        tb.running_mean.numpy(), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(updates["batch_stats"]["var"]),
        tb.running_var.numpy(), rtol=1e-4, atol=1e-6)

    # eval mode then uses the running stats
    y2 = bn.apply({"params": params,
                   "batch_stats": updates["batch_stats"]},
                  jnp.asarray(x), jnp.asarray(mask),
                  use_running_average=True)
    tb.eval()
    want2 = tb(packed)
    np.testing.assert_allclose(np.asarray(y2)[mask], want2.detach().numpy(),
                               rtol=1e-4, atol=1e-5)


def test_sequential_double_update_matches_torch():
    """The shared dur-BN is applied twice per forward (drums then
    non-drums); running stats must chain exactly like torch."""
    rng = np.random.default_rng(1)
    f = 4
    xa = rng.standard_normal((10, f)).astype(np.float32)
    xb = rng.standard_normal((6, f)).astype(np.float32)

    bn = MaskedBatchNorm(f)
    v = bn.init(jax.random.key(0), jnp.asarray(xa), None,
                use_running_average=False)
    stats = v["batch_stats"]
    params = v["params"]
    _, up = bn.apply({"params": params, "batch_stats": stats},
                     jnp.asarray(xa), None, use_running_average=False,
                     mutable=["batch_stats"])
    _, up2 = bn.apply({"params": params, "batch_stats": up["batch_stats"]},
                      jnp.asarray(xb), None, use_running_average=False,
                      mutable=["batch_stats"])

    tb = torch.nn.BatchNorm1d(f)
    tb.train()
    tb(torch.tensor(xa))
    tb(torch.tensor(xb))
    np.testing.assert_allclose(np.asarray(up2["batch_stats"]["mean"]),
                               tb.running_mean.numpy(), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(up2["batch_stats"]["var"]),
                               tb.running_var.numpy(), rtol=1e-4, atol=1e-6)
