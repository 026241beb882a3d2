"""LTS stability filter: SPCT offset-attention point transformer.

Equivalent of the reference baseline at
/root/reference/c_ws/src/inference_model/lts_filter/scripts/transformer.py:
  * Embedding: two 1x1 convs (pointwise dense) with BN+ReLU, 3 -> 128.
  * 4 stacked Offset-Attention (OA) blocks: q/k share weights (C -> C/4),
    attention softmax over keys then L1-normalized over queries, offset
    x - attn(v) passed through conv+BN+ReLU, residual added.
  * head: concat of the 4 OA outputs (512) -> 2048, global max+mean
    concat (2048*3) -> 512 -> 256 -> 1 -> sigmoid.

Dense attention over range-image windows — pure MXU work, trivially
TPU-friendly (batch of 1024-azimuth windows, loader.py:29-33).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class BN1d(nn.Module):
    """torch BatchNorm1d over (B, N, C): per-channel stats over B*N."""

    features: int
    momentum: float = 0.1
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool):
        c = self.features
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,)))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((c,)))
        if train:
            x32 = x.astype(jnp.float32)
            mean = x32.mean(axis=(0, 1))
            var = x32.var(axis=(0, 1))
            if not self.is_initializing():
                n = x.shape[0] * x.shape[1]
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * var * n / max(n - 1, 1)
        else:
            mean, var = ra_mean.value, ra_var.value
        inv = jnp.reciprocal(jnp.sqrt(var + self.eps))
        return ((x - mean) * (inv * scale) + bias).astype(x.dtype)


class OffsetAttention(nn.Module):
    """transformer.py:32-70. q and k share one projection."""

    channels: int

    @nn.compact
    def __call__(self, x, train: bool):
        c = self.channels
        qk = nn.Dense(c // 4, use_bias=False, name="qk")  # shared q/k weight
        v = nn.Dense(c, name="v")
        x_q = qk(x)  # (B, N, C/4)
        x_k = qk(x)
        x_v = v(x)
        energy = jnp.einsum("bnc,bmc->bnm", x_q, x_k)
        attn = nn.softmax(energy, axis=-1)
        # L1 renormalize over the query axis (transformer.py:64).
        attn = attn / (1e-9 + attn.sum(axis=1, keepdims=True))
        x_r = jnp.einsum("bnm,bmc->bnc", attn, x_v)
        x_r = nn.Dense(c, name="trans")(x - x_r)
        x_r = nn.relu(BN1d(c, name="after_norm")(x_r, train))
        return x + x_r


class SPCTReg(nn.Module):
    """transformer.py:72-137."""

    dropout: float = 0.2

    @nn.compact
    def __call__(self, xyz, train: bool = False):
        """xyz: (B, N, 3) -> (B, N) stability scores in [0, 1]."""
        x = nn.relu(BN1d(128, name="ebn1")(nn.Dense(128, use_bias=False, name="e1")(xyz), train))
        x = nn.relu(BN1d(128, name="ebn2")(nn.Dense(128, use_bias=False, name="e2")(x), train))

        xs = []
        for i in range(1, 5):
            x = OffsetAttention(128, name=f"sa{i}")(x, train)
            xs.append(x)
        x = jnp.concatenate(xs, axis=-1)  # (B, N, 512)

        x = nn.leaky_relu(
            BN1d(2048, name="l1bn")(nn.Dense(2048, use_bias=False, name="l1")(x), train),
            negative_slope=0.2,
        )
        x_max = jnp.max(x, axis=1, keepdims=True)
        x_mean = jnp.mean(x, axis=1, keepdims=True)
        n = x.shape[1]
        x = jnp.concatenate(
            [x, jnp.broadcast_to(x_max, x.shape), jnp.broadcast_to(x_mean, x.shape)],
            axis=-1,
        )  # (B, N, 2048*3)

        x = nn.silu(BN1d(512, name="l2bn")(nn.Dense(512, name="l2")(x), train))
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.silu(BN1d(256, name="l3bn")(nn.Dense(256, name="l3")(x), train))
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Dense(1, name="convs")(x)
        return nn.sigmoid(x)[..., 0]
