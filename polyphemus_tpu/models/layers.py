"""Shared neural building blocks (flax.linen).

Counterparts of the reference's torch modules — MLP (/root/reference/
model.py:138-164), CNNEncoder (:211-256), CNNDecoder (:259-299) — plus a
masked BatchNorm that reproduces torch BatchNorm semantics over padded
lattices (see ops/masked.py).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import masked as mops


class MaskedBatchNorm(nn.Module):
    """BatchNorm1d-equivalent with masked statistics.

    x: (..., features); mask broadcastable to x.shape[:-1] (None = all valid).
    `use_running_average=False` computes masked batch stats and updates the
    'batch_stats' collection (torch momentum convention: new = (1-m)*old + m*batch).
    """

    features: int
    momentum: float = 0.1
    eps: float = 1e-5

    def setup(self):
        self.scale = self.param("scale", nn.initializers.ones,
                                (self.features,))
        self.bias = self.param("bias", nn.initializers.zeros,
                               (self.features,))
        self.ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.features,)))
        self.ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.features,)))

    def __call__(self, x, mask=None, *, use_running_average: bool):
        if mask is None:
            mask = jnp.ones(x.shape[:-1], bool)
        mask = jnp.broadcast_to(mask, x.shape[:-1])
        y, new_mean, new_var = mops.batch_norm_masked(
            x, mask, self.scale, self.bias, self.ra_mean.value,
            self.ra_var.value, use_running=use_running_average,
            momentum=self.momentum, eps=self.eps,
        )
        if not use_running_average and not self.is_initializing():
            self.ra_mean.value = new_mean
            self.ra_var.value = new_var
        return y

    def folded_affine(self):
        """Eval-mode BN as y = x*A + B (running stats folded), for fusing
        into kernel epilogues."""
        a = self.scale * jax.lax.rsqrt(self.ra_var.value + self.eps)
        b = self.bias - self.ra_mean.value * a
        return a, b

    def affine_from_stats(self, mean, var):
        """BN as y = x*A + B for externally-computed batch statistics
        (histogram/gather-fused paths)."""
        a = self.scale * jax.lax.rsqrt(var + self.eps)
        return a, self.bias - mean * a

    def update_running(self, mean, var, count):
        """Apply the torch-convention running update for externally
        computed batch stats (no-op during init)."""
        if self.is_initializing():
            return
        n = jnp.maximum(count, 1.0)
        unbias = jnp.where(n > 1, n / jnp.maximum(n - 1.0, 1.0), 1.0)
        self.ra_mean.value = ((1 - self.momentum) * self.ra_mean.value
                              + self.momentum * mean)
        self.ra_var.value = ((1 - self.momentum) * self.ra_var.value
                             + self.momentum * var * unbias)

    def running_stats(self):
        return self.ra_mean.value, self.ra_var.value


class MLP(nn.Module):
    """Linear stack with pre-layer dropout (reference model.py:138-164)."""

    features: Sequence[int]  # output dim of each layer
    activation: bool = True
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, *, deterministic: bool):
        for i, f in enumerate(self.features):
            x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
            x = nn.Dense(f, name=f"layers_{i}")(x)
            if self.activation:
                x = jax.nn.relu(x)
        return x


class Conv3x3(nn.Module):
    """3x3 same-padding conv as an im2col matmul.

    Parameter tree is identical to nn.Conv (kernel (3, 3, Cin, Cout) +
    bias), so checkpoints and the torch converter are unaffected. The
    structure CNNs run 1/8/16-channel convs on tiny 4x32 images; XLA's
    conv lowering spends ~0.2 ms per invocation on these shapes (round-3
    profile: 10.9 ms/step across fwd+bwd), while the unrolled-patch matmul
    is a single small dot whose backward is two dots."""

    features: int

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, cin, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        n, h, w, _ = x.shape
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        patches = jnp.concatenate(
            [xp[:, i:i + h, j:j + w, :] for i in range(3) for j in range(3)],
            axis=-1)  # (N, H, W, 9*Cin), (i, j, c) index order
        out = patches @ kernel.reshape(9 * cin, self.features)
        return out + bias


class CNNEncoder(nn.Module):
    """Per-bar structure matrix (T, S) -> embedding (reference model.py:211-256).

    Conv(1->8) [+BN] relu -> MaxPool(1,4) -> Conv(8->16) [+BN] relu
    -> flatten -> MLP. Input NHWC: (N, T, S, 1).
    """

    output_dim: int
    dense_dim: int
    batch_norm: bool = False
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, *, deterministic: bool):
        x = Conv3x3(8, name="conv0")(x)
        if self.batch_norm:
            x = MaskedBatchNorm(8, name="bn0")(
                x, use_running_average=deterministic)
        x = jax.nn.relu(x)
        x = nn.max_pool(x, (1, 4), strides=(1, 4))
        x = Conv3x3(16, name="conv1")(x)
        if self.batch_norm:
            x = MaskedBatchNorm(16, name="bn1")(
                x, use_running_average=deterministic)
        x = jax.nn.relu(x)
        # NHWC flatten; the torch->jax converter permutes the following
        # kernel so numerics match the reference's NCHW flatten.
        x = x.reshape(x.shape[0], -1)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        x = jax.nn.relu(nn.Dense(self.dense_dim, name="lin0")(x))
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        x = nn.Dense(self.output_dim, name="lin1")(x)
        return x


class CNNDecoder(nn.Module):
    """Embedding -> per-bar structure logits (T, S) (reference model.py:259-299)."""

    input_dim: int
    dense_dim: int
    n_tracks: int = 4
    n_timesteps: int = 32
    batch_norm: bool = False
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, *, deterministic: bool):
        h = self.n_tracks
        w = self.n_timesteps // 4
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        x = jax.nn.relu(nn.Dense(self.dense_dim, name="lin0")(x))
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        x = jax.nn.relu(nn.Dense(16 * h * w, name="lin1")(x))
        # unflatten to NHWC (N, T, S/4, 16); converter permutes lin1 rows.
        x = x.reshape(x.shape[0], h, w, 16)
        # nearest-neighbor upsample (1, 4) along the time axis
        x = jnp.repeat(x, 4, axis=2)
        x = Conv3x3(8, name="conv0")(x)
        if self.batch_norm:
            x = MaskedBatchNorm(8, name="bn0")(
                x, use_running_average=deterministic)
        x = jax.nn.relu(x)
        x = Conv3x3(1, name="conv1")(x)
        return x[..., 0]  # (N, T, S)
