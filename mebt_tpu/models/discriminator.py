"""PatchGAN discriminators for VQGAN training (2-D frame + 3-D video).

Behavioural reference: mebt/vqgan.py:416-520 (NLayerDiscriminator,
NLayerDiscriminator3D): kernel 4, stride 2 pyramid with channel doubling
capped at 512, LeakyReLU(0.2), norm after every conv except the first
and last, intermediate features returned for the GAN feature-matching
loss.

Norm: the reference uses SyncBatchNorm. Under a sharded jit the batch
statistics computed below are *global* across the data mesh axis (XLA
inserts the reduction), which is exactly what sync-BN provides — no
explicit collective needed (SURVEY.md §2.3).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


class BatchStatNorm(nn.Module):
    """Training-mode batch normalization (batch statistics, learned
    affine). Running stats are not tracked: the discriminator is only
    ever evaluated in training mode by the reference."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        axes = tuple(range(x.ndim - 1))
        mean = jnp.mean(x, axis=axes)
        var = jnp.var(x, axis=axes)
        y = (x - mean) * jax.lax.rsqrt(var + 1e-5)
        return y * scale.astype(x.dtype) + bias.astype(x.dtype)


def _conv(nd: int, features: int, stride: int, name: str, dtype):
    k = (4,) * nd
    s = (stride,) * nd
    # torch padding = ceil((4-1)/2) = 2, symmetric
    pad = [(2, 2)] * nd
    return nn.Conv(
        features, k, strides=s, padding=pad, dtype=dtype, name=name
    )


class NLayerDiscriminator(nn.Module):
    """2-D PatchGAN over individual frames. Input (B, H, W, C)."""

    ndf: int = 64
    n_layers: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        feats = [x]
        h = _conv(2, self.ndf, 2, "conv0", self.dtype)(x)
        h = nn.leaky_relu(h, 0.2)
        feats.append(h)
        nf = self.ndf
        for n in range(1, self.n_layers):
            nf = min(nf * 2, 512)
            h = _conv(2, nf, 2, f"conv{n}", self.dtype)(h)
            h = BatchStatNorm(dtype=self.dtype, name=f"norm{n}")(h)
            h = nn.leaky_relu(h, 0.2)
            feats.append(h)
        nf = min(nf * 2, 512)
        h = _conv(2, nf, 1, f"conv{self.n_layers}", self.dtype)(h)
        h = BatchStatNorm(dtype=self.dtype, name=f"norm{self.n_layers}")(h)
        h = nn.leaky_relu(h, 0.2)
        feats.append(h)
        logits = _conv(2, 1, 1, "conv_out", self.dtype)(h)
        feats.append(logits)
        return logits, feats[1:]


class NLayerDiscriminator3D(nn.Module):
    """3-D PatchGAN over videos. Input (B, T, H, W, C)."""

    ndf: int = 64
    n_layers: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        feats = [x]
        h = _conv(3, self.ndf, 2, "conv0", self.dtype)(x)
        h = nn.leaky_relu(h, 0.2)
        feats.append(h)
        nf = self.ndf
        for n in range(1, self.n_layers):
            nf = min(nf * 2, 512)
            h = _conv(3, nf, 2, f"conv{n}", self.dtype)(h)
            h = BatchStatNorm(dtype=self.dtype, name=f"norm{n}")(h)
            h = nn.leaky_relu(h, 0.2)
            feats.append(h)
        nf = min(nf * 2, 512)
        h = _conv(3, nf, 1, f"conv{self.n_layers}", self.dtype)(h)
        h = BatchStatNorm(dtype=self.dtype, name=f"norm{self.n_layers}")(h)
        h = nn.leaky_relu(h, 0.2)
        feats.append(h)
        logits = _conv(3, 1, 1, "conv_out", self.dtype)(h)
        feats.append(logits)
        return logits, feats[1:]


def hinge_d_loss(logits_real, logits_fake):
    """Reference vqgan.py:27-31."""
    return 0.5 * (
        jnp.mean(jax.nn.relu(1.0 - logits_real))
        + jnp.mean(jax.nn.relu(1.0 + logits_fake))
    )


def vanilla_d_loss(logits_real, logits_fake):
    """Reference vqgan.py:33-37."""
    return 0.5 * (
        jnp.mean(jax.nn.softplus(-logits_real))
        + jnp.mean(jax.nn.softplus(logits_fake))
    )


def adopt_weight(global_step, threshold: int, value: float = 0.0):
    """GAN warm-up gate (reference mebt/utils.py adopt_weight:120)."""
    return jnp.where(global_step < threshold, value, 1.0)
