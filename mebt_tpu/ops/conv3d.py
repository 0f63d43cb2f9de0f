"""Same-padded 3D convolution / transposed convolution for TPU (NDHWC).

Behavioural reference: mebt/vqgan.py:368-413 (SamePadConv3d,
SamePadConvTranspose3d). The reference pads the input with
(p//2 + p%2, p//2) per axis where p = kernel - stride (replicate
padding by default), then runs a VALID conv; the transposed variant
pads the same way and runs ConvTranspose3d with padding = kernel-1,
which reduces to: dilate the padded input by the stride and run a
VALID cross-correlation with the spatially flipped kernel.

Layout: activations are (B, D, H, W, C) — channels-last, the layout XLA
tiles best on TPU. Kernels are (kd, kh, kw, in, out) (DHWIO). Torch
checkpoints (out, in, kd, kh, kw) are transposed at import time
(mebt_tpu/utils/torch_ckpt.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_PAD_MODES = {
    "replicate": "edge",
    "constant": "constant",
    "reflect": "reflect",
    "circular": "wrap",
}

DIMNUMS = lax.conv_dimension_numbers(
    (1, 1, 1, 1, 1), (1, 1, 1, 1, 1), ("NDHWC", "DHWIO", "NDHWC")
)


def same_pad(
    x: jax.Array,
    kernel_size: tuple[int, int, int],
    stride: tuple[int, int, int],
    padding_type: str = "replicate",
) -> jax.Array:
    """Asymmetric same-padding: (p//2 + p%2, p//2) per spatial axis."""
    pads = [(0, 0)]
    for k, s in zip(kernel_size, stride):
        p = k - s
        pads.append((p // 2 + p % 2, p // 2))
    pads.append((0, 0))
    return jnp.pad(x, pads, mode=_PAD_MODES[padding_type])


def same_pad_conv3d(
    x: jax.Array,
    kernel: jax.Array,
    stride: tuple[int, int, int],
    padding_type: str = "replicate",
) -> jax.Array:
    """x: (B, D, H, W, Cin); kernel: (kd, kh, kw, Cin, Cout)."""
    ks = kernel.shape[:3]
    x = same_pad(x, ks, stride, padding_type)
    return lax.conv_general_dilated(
        x,
        kernel,
        window_strides=stride,
        padding="VALID",
        dimension_numbers=DIMNUMS,
    )


def same_pad_conv_transpose3d(
    x: jax.Array,
    kernel: jax.Array,
    stride: tuple[int, int, int],
    padding_type: str = "replicate",
) -> jax.Array:
    """Transposed conv matching the reference's SamePadConvTranspose3d.

    x: (B, D, H, W, Cin); kernel: (kd, kh, kw, Cin, Cout) — stored
    un-flipped; the spatial flip required by the transpose equivalence
    happens here.
    """
    ks = kernel.shape[:3]
    x = same_pad(x, ks, stride, padding_type)
    flipped = jnp.flip(kernel, axis=(0, 1, 2))
    return lax.conv_general_dilated(
        x,
        flipped,
        window_strides=(1, 1, 1),
        padding=[(0, 0)] * 3,
        lhs_dilation=stride,
        dimension_numbers=DIMNUMS,
    )
