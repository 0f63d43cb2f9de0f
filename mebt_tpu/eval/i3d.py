"""Inception-v1 I3D (Kinetics-400) in JAX — the FVD embedding network.

Behavioural reference: mebt/fvd/pytorch_i3d.py (InceptionI3d:153,
InceptionModule:125, Unit3D:49, MaxPool3dSamePadding:14). Weights are
imported from the reference's `i3d_pretrained_400.pt` torch state dict
(itself converted from the DeepMind TF-Hub release).

Padding notes:
  * Unit3D uses TF-style dynamic 'SAME' padding with the extra pad at
    the trailing edge — exactly XLA's padding='SAME'.
  * MaxPool3dSamePadding zero-pads then max-pools. Every pool in I3D
    consumes post-ReLU (>= 0) activations, so zero-padding and XLA's
    -inf padding agree; we still zero-pad explicitly for bit fidelity.
  * BatchNorm runs in eval mode (running stats, eps 1e-5).

Layout: channels-last (B, T, H, W, C); the public wrapper accepts the
reference's (B, C, T, H, W).
"""

from __future__ import annotations

import functools
from typing import Any, Mapping, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mebt_tpu.ops.conv3d import DIMNUMS

# (name, kind, spec)
# conv: (out_channels, kernel, stride)
# pool: (kernel, stride)
# mixed: (branch channel list)
I3D_STEM: list[tuple[str, str, Any]] = [
    ("Conv3d_1a_7x7", "conv", (64, (7, 7, 7), (2, 2, 2))),
    ("MaxPool3d_2a_3x3", "pool", ((1, 3, 3), (1, 2, 2))),
    ("Conv3d_2b_1x1", "conv", (64, (1, 1, 1), (1, 1, 1))),
    ("Conv3d_2c_3x3", "conv", (192, (3, 3, 3), (1, 1, 1))),
    ("MaxPool3d_3a_3x3", "pool", ((1, 3, 3), (1, 2, 2))),
    ("Mixed_3b", "mixed", (64, 96, 128, 16, 32, 32)),
    ("Mixed_3c", "mixed", (128, 128, 192, 32, 96, 64)),
    ("MaxPool3d_4a_3x3", "pool", ((3, 3, 3), (2, 2, 2))),
    ("Mixed_4b", "mixed", (192, 96, 208, 16, 48, 64)),
    ("Mixed_4c", "mixed", (160, 112, 224, 24, 64, 64)),
    ("Mixed_4d", "mixed", (128, 128, 256, 24, 64, 64)),
    ("Mixed_4e", "mixed", (112, 144, 288, 32, 64, 64)),
    ("Mixed_4f", "mixed", (256, 160, 320, 32, 128, 128)),
    ("MaxPool3d_5a_2x2", "pool", ((2, 2, 2), (2, 2, 2))),
    ("Mixed_5b", "mixed", (256, 160, 320, 32, 128, 128)),
    ("Mixed_5c", "mixed", (384, 192, 384, 48, 128, 128)),
]


def _same_pads(size: Sequence[int], kernel, stride):
    pads = []
    for s, k, st in zip(size, kernel, stride):
        pad = max(k - st, 0) if s % st == 0 else max(k - (s % st), 0)
        pads.append((pad // 2, pad - pad // 2))
    return pads


class Unit3D(nn.Module):
    """Conv3d (SAME, no bias) + eval-mode BatchNorm + ReLU."""

    out_channels: int
    kernel: tuple[int, int, int] = (1, 1, 1)
    stride: tuple[int, int, int] = (1, 1, 1)
    use_bn: bool = True
    use_bias: bool = False
    relu: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (*self.kernel, x.shape[-1], self.out_channels),
            jnp.float32,
        )
        pads = _same_pads(x.shape[1:4], self.kernel, self.stride)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            window_strides=self.stride,
            padding=pads,
            dimension_numbers=DIMNUMS,
        )
        if self.use_bias:
            y = y + self.param(
                "bias", nn.initializers.zeros, (self.out_channels,),
                jnp.float32,
            ).astype(self.dtype)
        if self.use_bn:
            scale = self.param(
                "bn_scale", nn.initializers.ones, (self.out_channels,),
                jnp.float32,
            )
            bias = self.param(
                "bn_bias", nn.initializers.zeros, (self.out_channels,),
                jnp.float32,
            )
            mean = self.param(
                "bn_mean", nn.initializers.zeros, (self.out_channels,),
                jnp.float32,
            )
            var = self.param(
                "bn_var", nn.initializers.ones, (self.out_channels,),
                jnp.float32,
            )
            inv = (scale / jnp.sqrt(var + 1e-5)).astype(self.dtype)
            y = y * inv + (bias - mean * scale / jnp.sqrt(var + 1e-5)).astype(
                self.dtype
            )
        if self.relu:
            y = jax.nn.relu(y)
        return y


def max_pool_same(x, kernel, stride):
    """Zero-pad TF-SAME then VALID max-pool (reference
    MaxPool3dSamePadding:14-46)."""
    pads = _same_pads(x.shape[1:4], kernel, stride)
    x = jnp.pad(x, [(0, 0), *pads, (0, 0)], mode="constant")
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, *kernel, 1),
        window_strides=(1, *stride, 1),
        padding="VALID",
    )


class InceptionModule(nn.Module):
    out_channels: tuple[int, ...]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        oc = self.out_channels
        dt = self.dtype
        b0 = Unit3D(oc[0], dtype=dt, name="b0")(x)
        b1 = Unit3D(oc[2], (3, 3, 3), dtype=dt, name="b1b")(
            Unit3D(oc[1], dtype=dt, name="b1a")(x)
        )
        b2 = Unit3D(oc[4], (3, 3, 3), dtype=dt, name="b2b")(
            Unit3D(oc[3], dtype=dt, name="b2a")(x)
        )
        b3 = Unit3D(oc[5], dtype=dt, name="b3b")(
            max_pool_same(x, (3, 3, 3), (1, 1, 1))
        )
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class InceptionI3d(nn.Module):
    """Full I3D; forward returns per-video mean logits over time
    (reference pytorch_i3d.py:336-346).

    `final_endpoint` mirrors the reference constructor arg
    (pytorch_i3d.py:200-228): build the network only up to the named
    stem layer and return its globally average-pooled features instead
    of logits. Any I3D_STEM name is valid; the default "Logits" keeps
    the full network. Truncated endpoints are what blob-free tests use
    — shallow random conv features stay discriminative where the
    full-depth random network contracts all inputs to near-identical
    logits."""

    num_classes: int = 400
    dtype: Any = jnp.float32
    final_endpoint: str = "Logits"

    @nn.compact
    def __call__(self, x):
        if self.final_endpoint != "Logits" and self.final_endpoint not in {
            name for name, _, _ in I3D_STEM
        }:
            raise ValueError(f"Unknown final endpoint {self.final_endpoint}")
        for name, kind, spec in I3D_STEM:
            if kind == "conv":
                out, k, s = spec
                x = Unit3D(out, k, s, dtype=self.dtype, name=name)(x)
            elif kind == "pool":
                k, s = spec
                x = max_pool_same(x, k, s)
            else:
                x = InceptionModule(spec, dtype=self.dtype, name=name)(x)
            if name == self.final_endpoint:
                # global avg pool over (T, H, W) -> per-video features
                return jnp.mean(x, axis=(1, 2, 3)).astype(jnp.float32)
        # avg pool [2,7,7] stride 1, VALID
        x = jax.lax.reduce_window(
            x, 0.0, jax.lax.add,
            window_dimensions=(1, 2, 7, 7, 1),
            window_strides=(1, 1, 1, 1, 1),
            padding="VALID",
        ) / (2 * 7 * 7)
        x = Unit3D(
            self.num_classes, use_bn=False, use_bias=True, relu=False,
            dtype=self.dtype, name="logits",
        )(x)
        # (B, T', 1, 1, C) -> mean over remaining time
        return jnp.mean(x[:, :, 0, 0, :], axis=1).astype(jnp.float32)


# -----------------------------------------------------------------------------
# torch state-dict import


def _unit_params(sd: Mapping[str, np.ndarray], key: str) -> dict:
    w = np.asarray(sd[f"{key}.conv3d.weight"], np.float32)
    out = {"kernel": np.ascontiguousarray(np.transpose(w, (2, 3, 4, 1, 0)))}
    if f"{key}.conv3d.bias" in sd:
        out["bias"] = np.asarray(sd[f"{key}.conv3d.bias"], np.float32)
    if f"{key}.bn.weight" in sd:
        out["bn_scale"] = np.asarray(sd[f"{key}.bn.weight"], np.float32)
        out["bn_bias"] = np.asarray(sd[f"{key}.bn.bias"], np.float32)
        out["bn_mean"] = np.asarray(
            sd[f"{key}.bn.running_mean"], np.float32
        )
        out["bn_var"] = np.asarray(sd[f"{key}.bn.running_var"], np.float32)
    return out


def import_i3d_params(sd: Mapping[str, np.ndarray]) -> dict:
    """Map the reference i3d_pretrained_400.pt state dict to flax params."""
    params: dict = {}
    for name, kind, _ in I3D_STEM:
        if kind == "conv":
            params[name] = _unit_params(sd, name)
        elif kind == "mixed":
            params[name] = {
                "b0": _unit_params(sd, f"{name}.b0"),
                "b1a": _unit_params(sd, f"{name}.b1a"),
                "b1b": _unit_params(sd, f"{name}.b1b"),
                "b2a": _unit_params(sd, f"{name}.b2a"),
                "b2b": _unit_params(sd, f"{name}.b2b"),
                "b3b": _unit_params(sd, f"{name}.b3b"),
            }
    params["logits"] = _unit_params(sd, "logits")
    return params


def load_i3d(path: str, dtype=jnp.float32):
    """-> (model, params). Reference load_fvd_model (fvd.py:34-40)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    model = InceptionI3d(400, dtype=dtype)
    return model, import_i3d_params(sd)


@functools.partial(jax.jit, static_argnames=("model",))
def i3d_logits(model: InceptionI3d, params, videos_bthwc: jax.Array):
    return model.apply({"params": params}, videos_bthwc)
