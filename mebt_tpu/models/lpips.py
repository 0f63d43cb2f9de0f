"""LPIPS perceptual metric (VGG16 variant) in JAX.

Behavioural reference: mebt/modules/lpips.py (LPIPS:53, vgg16:118,
ScalingLayer:99, NetLinLayer:109): shift/scale the input, run VGG16
features to the five relu endpoints (relu1_2, relu2_2, relu3_3,
relu4_3, relu5_3), channel-unit-normalize, squared difference, 1x1
"lin" convs, spatial average, sum over endpoints.

Weights: the five lin-layer tensors ship with the reference
(mebt/modules/cache/vgg.pth, ~7 KB); the VGG16 backbone comes from a
torchvision `vgg16` state dict supplied by the user (`--vgg_path`).
Missing weights are a HARD ERROR in `cli/train_vqgan.py` when
perceptual_weight > 0 (the reference always trains with the perceptual
term, mebt/vqgan.py:186-189 — silently dropping it trains a different
model); `--no_perceptual` is the explicit opt-out.
"""

from __future__ import annotations

from typing import Any, Mapping

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# channels at the five endpoints
VGG_CHANNELS = (64, 128, 256, 512, 512)
# conv layer indices (torchvision vgg16 .features numbering) per slice
VGG_SLICES = (
    (0, 2),          # conv1_1, conv1_2
    (5, 7),          # conv2_1, conv2_2
    (10, 12, 14),    # conv3_*
    (17, 19, 21),    # conv4_*
    (24, 26, 28),    # conv5_*
)

SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class VGG16Features(nn.Module):
    """VGG16 conv stack emitting the five relu endpoints. Input
    (B, H, W, 3), channels-last."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        outs = []
        for si, convs in enumerate(VGG_SLICES):
            if si > 0:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            for ci, idx in enumerate(convs):
                ch = VGG_CHANNELS[si]
                x = nn.Conv(
                    ch, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype,
                    name=f"conv{idx}",
                )(x)
                x = jax.nn.relu(x)
            outs.append(x)
        return outs


class LPIPS(nn.Module):
    """Full metric. Inputs (B, H, W, 3) in [-1, 1] (the reference feeds
    [-0.5, 0.5] videos directly; the scaling layer absorbs range)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, y):
        shift = jnp.asarray(SHIFT)
        scale = jnp.asarray(SCALE)
        net = VGG16Features(dtype=self.dtype, name="vgg")
        fx = net((x - shift) / scale)
        fy = net((y - shift) / scale)
        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            a = a / (jnp.sqrt(jnp.sum(a**2, -1, keepdims=True)) + 1e-10)
            b = b / (jnp.sqrt(jnp.sum(b**2, -1, keepdims=True)) + 1e-10)
            d = (a - b) ** 2
            lin = self.param(
                f"lin{i}",
                nn.initializers.ones,
                (VGG_CHANNELS[i], 1),
                jnp.float32,
            )
            v = jnp.einsum("bhwc,co->bhwo", d, lin.astype(d.dtype))
            total = total + jnp.mean(v, axis=(1, 2))  # spatial average
        return total[..., 0]


def import_lpips_params(
    vgg_sd: Mapping[str, np.ndarray], lin_sd: Mapping[str, np.ndarray]
) -> dict:
    """Map torchvision vgg16 `features.*` weights + the reference's
    cache/vgg.pth lin weights onto LPIPS params."""
    vgg = {}
    for convs in VGG_SLICES:
        for idx in convs:
            w = np.asarray(vgg_sd[f"features.{idx}.weight"], np.float32)
            b = np.asarray(vgg_sd[f"features.{idx}.bias"], np.float32)
            vgg[f"conv{idx}"] = {
                "kernel": np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0))),
                "bias": b,
            }
    params = {"vgg": vgg}
    for i in range(5):
        # reference NetLinLayer: lin{i}.model.1.weight (1, C, 1, 1)
        key = f"lin{i}.model.1.weight"
        if key not in lin_sd:
            key = f"lins.{i}.model.1.weight"
        w = np.asarray(lin_sd[key], np.float32)  # (1, C, 1, 1)
        params[f"lin{i}"] = w[:, :, 0, 0].T  # -> (C, 1)
    return params


def load_lpips(vgg_path: str, lin_path: str):
    """-> (LPIPS model, params) from torch weight files."""
    import torch

    vgg_sd = torch.load(vgg_path, map_location="cpu", weights_only=False)
    if hasattr(vgg_sd, "state_dict"):
        vgg_sd = vgg_sd.state_dict()
    lin_sd = torch.load(lin_path, map_location="cpu", weights_only=False)
    vgg_sd = {k: v.numpy() for k, v in vgg_sd.items()}
    lin_sd = {k: v.numpy() for k, v in lin_sd.items()}
    model = LPIPS()
    return model, import_lpips_params(vgg_sd, lin_sd)
