"""3D VQGAN tokenizer (stage 1), TPU-native.

Behavioural reference: mebt/vqgan.py (VQGAN:39, Encoder:263,
Decoder:298, ResBlock:336) and mebt/modules/codebook.py (Codebook:12).
At MeBT training/sampling time the VQGAN is frozen and loaded from TATS
checkpoints (reference transformer.py:180-192); training of the VQGAN
itself (EMA codebook, GAN losses) lives in mebt_tpu/train/vqgan_train.py.

Layout: activations are channels-last (B, D, H, W, C); the public
`encode`/`decode` accept/return the reference's (B, C, T, H, W) videos
so CLI surfaces stay drop-in compatible.

The codebook is a pytree of buffers (not flax params) because its EMA
update is a running-statistics transform, not a gradient step.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Mapping, Sequence

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from mebt_tpu.ops.conv3d import same_pad_conv3d, same_pad_conv_transpose3d
from mebt_tpu.ops.vq_pallas import nearest_code


def silu(x):
    return x * jax.nn.sigmoid(x)


# -----------------------------------------------------------------------------
# Codebook


@flax.struct.dataclass
class CodebookState:
    """EMA codebook buffers (reference codebook.py:15-17)."""

    embeddings: jax.Array  # (n_codes, D)
    cluster_size: jax.Array  # (n_codes,)  — reference `N`
    z_avg: jax.Array  # (n_codes, D)

    @classmethod
    def create(cls, rng, n_codes: int, embedding_dim: int) -> "CodebookState":
        emb = jax.random.normal(rng, (n_codes, embedding_dim), jnp.float32)
        return cls(
            embeddings=emb,
            cluster_size=jnp.zeros((n_codes,), jnp.float32),
            # distinct buffer: embeddings and z_avg live in the same
            # donated train-state pytree, and donating one buffer twice
            # is a runtime error (jit outputs never alias, so only this
            # host-side init needs the copy)
            z_avg=jnp.array(emb, copy=True),
        )


def codebook_lookup(state: CodebookState, codes: jax.Array) -> jax.Array:
    return jnp.take(state.embeddings, codes, axis=0)


def codebook_quantize(state: CodebookState, z: jax.Array):
    """z: (..., D) continuous latents -> (codes, embeddings_st, aux).

    Straight-through estimator and commitment loss follow reference
    codebook.py:48-97.
    """
    flat = z.reshape(-1, z.shape[-1])
    codes = nearest_code(flat, state.embeddings).reshape(z.shape[:-1])
    quantized = codebook_lookup(state, codes)
    commitment_loss = 0.25 * jnp.mean(
        (z - jax.lax.stop_gradient(quantized)) ** 2
    )
    embeddings_st = z + jax.lax.stop_gradient(quantized - z)

    counts = jnp.zeros((state.embeddings.shape[0],), jnp.float32).at[
        codes.reshape(-1)
    ].add(1.0)
    avg_probs = counts / flat.shape[0]
    perplexity = jnp.exp(
        -jnp.sum(avg_probs * jnp.log(avg_probs + 1e-10))
    )
    aux = {
        "commitment_loss": commitment_loss,
        "perplexity": perplexity,
        "counts": counts,
    }
    return codes, embeddings_st, aux


def _tile_to_codes(flat: jax.Array, n_codes: int, rng: jax.Array | None):
    """Repeat rows (with small noise) until >= n_codes rows exist
    (reference codebook.py:25-32 `_tile`)."""
    d, dim = flat.shape
    if d >= n_codes:
        return flat
    n_repeats = -(-n_codes // d)
    std = 0.01 / np.sqrt(dim)
    tiled = jnp.tile(flat, (n_repeats, 1))
    if rng is not None:
        tiled = tiled + jax.random.normal(rng, tiled.shape) * std
    return tiled


def codebook_init_from_data(
    state: CodebookState,
    z: jax.Array,
    rng: jax.Array | None = None,
    perm: jax.Array | None = None,
) -> CodebookState:
    """Data-dependent codebook init from the first training batch
    (reference codebook.py:34-51 `_init_embeddings`): tile the flattened
    encoder outputs up to n_codes rows, pick a random subset as the
    initial embeddings/z_avg, and set all cluster sizes to 1.

    Under a sharded jit, `z` is the global batch and `rng` must be a
    replicated key so every shard computes the same init (supersedes the
    reference's dist.broadcast at codebook.py:42-43).

    `perm` overrides the random permutation (parity tests).
    """
    n_codes, dim = state.embeddings.shape
    flat = z.reshape(-1, dim)
    t_rng = p_rng = None
    if rng is not None:
        t_rng, p_rng = jax.random.split(rng)
    y = _tile_to_codes(flat, n_codes, t_rng)
    if perm is None:
        perm = jax.random.permutation(p_rng, y.shape[0])
    k_rand = y[perm[:n_codes]]
    return CodebookState(
        embeddings=k_rand,
        cluster_size=jnp.ones((n_codes,), jnp.float32),
        z_avg=k_rand,
    )


def codebook_ema_update(
    state: CodebookState,
    z: jax.Array,
    codes: jax.Array,
    rng: jax.Array,
    decay: float = 0.99,
    no_random_restart: bool = False,
    restart_thres: float = 1.0,
) -> CodebookState:
    """EMA + Laplace smoothing + random restart (reference
    codebook.py:66-89). Under a sharded jit the sums below are global
    (XLA inserts the cross-device reduction), which supersedes the
    reference's explicit `dist.all_reduce`; the restart candidates use a
    shared deterministic key, superseding `dist.broadcast`.
    """
    n_codes, dim = state.embeddings.shape
    flat = z.reshape(-1, dim)
    onehot_sum = jnp.zeros((n_codes,), jnp.float32).at[codes.reshape(-1)].add(1.0)
    encode_sum = (
        jnp.zeros((n_codes, dim), jnp.float32)
        .at[codes.reshape(-1)]
        .add(flat)
    )

    new_N = state.cluster_size * decay + onehot_sum * (1.0 - decay)
    new_z_avg = state.z_avg * decay + encode_sum * (1.0 - decay)

    n = jnp.sum(new_N)
    weights = (new_N + 1e-7) / (n + n_codes * 1e-7) * n
    new_emb = new_z_avg / weights[:, None]

    if not no_random_restart:
        # tile inputs up to n_codes (noise only when tiling is needed),
        # pick a random subset (reference _tile + randperm,
        # codebook.py:25-32, 82-85)
        k_rng, p_rng = jax.random.split(rng)
        tiled = _tile_to_codes(flat, n_codes, k_rng)
        perm = jax.random.permutation(p_rng, tiled.shape[0])[:n_codes]
        k_rand = tiled[perm]
        usage = (new_N >= restart_thres).astype(jnp.float32)[:, None]
        new_emb = new_emb * usage + k_rand * (1.0 - usage)

    return CodebookState(
        embeddings=new_emb, cluster_size=new_N, z_avg=new_z_avg
    )


# -----------------------------------------------------------------------------
# Conv modules


class SamePadConv3d(nn.Module):
    out_channels: int
    kernel_size: int | tuple[int, int, int]
    stride: int | tuple[int, int, int] = 1
    use_bias: bool = True
    padding_type: str = "replicate"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        ks = self.kernel_size
        ks = (ks,) * 3 if isinstance(ks, int) else tuple(ks)
        st = self.stride
        st = (st,) * 3 if isinstance(st, int) else tuple(st)
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (*ks, x.shape[-1], self.out_channels),
            jnp.float32,
        )
        y = same_pad_conv3d(
            x.astype(self.dtype), kernel.astype(self.dtype), st,
            self.padding_type,
        )
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.out_channels,), jnp.float32
            )
            y = y + bias.astype(self.dtype)
        return y


class SamePadConvTranspose3d(nn.Module):
    out_channels: int
    kernel_size: int | tuple[int, int, int]
    stride: int | tuple[int, int, int] = 1
    use_bias: bool = True
    padding_type: str = "replicate"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        ks = self.kernel_size
        ks = (ks,) * 3 if isinstance(ks, int) else tuple(ks)
        st = self.stride
        st = (st,) * 3 if isinstance(st, int) else tuple(st)
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (*ks, x.shape[-1], self.out_channels),
            jnp.float32,
        )
        y = same_pad_conv_transpose3d(
            x.astype(self.dtype), kernel.astype(self.dtype), st,
            self.padding_type,
        )
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.out_channels,), jnp.float32
            )
            y = y + bias.astype(self.dtype)
        return y


class Normalize(nn.Module):
    """GroupNorm(32, eps=1e-6) — reference vqgan.py:255-260. The 'batch'
    (SyncBatchNorm) option is intentionally mapped to GroupNorm; all MeBT
    generator configs use GroupNorm and sync-BN only appears in the
    discriminators (see mebt_tpu/models/discriminator.py)."""

    norm_type: str = "group"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # 32 groups in every real config; clamp only so tiny test models
        # (channels < 32) remain constructible.
        groups = min(32, x.shape[-1])
        return nn.GroupNorm(
            num_groups=groups, epsilon=1e-6, dtype=self.dtype
        )(x)


class ResBlock(nn.Module):
    out_channels: int | None = None
    norm_type: str = "group"
    padding_type: str = "replicate"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        out_ch = self.out_channels or in_ch
        h = Normalize(self.norm_type, dtype=self.dtype, name="norm1")(x)
        h = silu(h)
        h = SamePadConv3d(
            out_ch, 3, padding_type=self.padding_type, dtype=self.dtype,
            name="conv1",
        )(h)
        h = Normalize(self.norm_type, dtype=self.dtype, name="norm2")(h)
        h = silu(h)
        h = SamePadConv3d(
            out_ch, 3, padding_type=self.padding_type, dtype=self.dtype,
            name="conv2",
        )(h)
        if in_ch != out_ch:
            x = SamePadConv3d(
                out_ch, 3, padding_type=self.padding_type, dtype=self.dtype,
                name="conv_shortcut",
            )(x)
        return x + h


def _stage_strides(downsample: Sequence[int]) -> list[tuple[int, int, int]]:
    """Per-stage stride tuples: each axis downsamples by 2 until its
    log2(downsample) budget is exhausted (reference vqgan.py:266-280)."""
    n_times = [int(math.log2(d)) for d in downsample]
    max_ds = max(n_times)
    strides = []
    remaining = list(n_times)
    for _ in range(max_ds):
        strides.append(tuple(2 if r > 0 else 1 for r in remaining))
        remaining = [r - 1 for r in remaining]
    return strides


class Encoder(nn.Module):
    n_hiddens: int
    downsample: Sequence[int]
    norm_type: str = "group"
    padding_type: str = "replicate"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        strides = _stage_strides(self.downsample)
        h = SamePadConv3d(
            self.n_hiddens, 3, padding_type=self.padding_type,
            dtype=self.dtype, name="conv_first",
        )(x)
        for i, st in enumerate(strides):
            out_ch = self.n_hiddens * 2 ** (i + 1)
            h = SamePadConv3d(
                out_ch, 4, stride=st, padding_type=self.padding_type,
                dtype=self.dtype, name=f"down_{i}",
            )(h)
            h = ResBlock(
                out_ch, self.norm_type, self.padding_type, dtype=self.dtype,
                name=f"res_{i}",
            )(h)
        h = Normalize(self.norm_type, dtype=self.dtype, name="final_norm")(h)
        return silu(h)


class Decoder(nn.Module):
    n_hiddens: int
    upsample: Sequence[int]
    norm_type: str = "group"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        strides = _stage_strides(self.upsample)
        max_us = len(strides)
        h = Normalize(self.norm_type, dtype=self.dtype, name="final_norm")(x)
        h = silu(h)
        for i, st in enumerate(strides):
            out_ch = self.n_hiddens * 2 ** (max_us - i)
            h = SamePadConvTranspose3d(
                out_ch, 4, stride=st, dtype=self.dtype, name=f"up_{i}"
            )(h)
            h = ResBlock(out_ch, self.norm_type, dtype=self.dtype,
                         name=f"res_{i}_1")(h)
            h = ResBlock(out_ch, self.norm_type, dtype=self.dtype,
                         name=f"res_{i}_2")(h)
        return SamePadConv3d(3, 3, dtype=self.dtype, name="conv_last")(h)


# -----------------------------------------------------------------------------
# Full model


@dataclass(frozen=True)
class VQGANConfig:
    """Schema-compatible with the reference argparse/hparams surface
    (vqgan.py:229-251)."""

    embedding_dim: int = 256
    n_codes: int = 16384
    n_hiddens: int = 32
    downsample: tuple[int, int, int] = (4, 8, 8)
    image_channels: int = 3
    norm_type: str = "group"
    padding_type: str = "replicate"
    # argparse store_true default in the reference (vqgan.py:248)
    no_random_restart: bool = False
    restart_thres: float = 1.0
    # loss weights (training only)
    l1_weight: float = 4.0
    image_gan_weight: float = 1.0
    video_gan_weight: float = 1.0
    perceptual_weight: float = 4.0
    gan_feat_weight: float = 4.0
    disc_channels: int = 64
    disc_layers: int = 3
    disc_loss_type: str = "hinge"
    discriminator_iter_start: int = 50000
    dtype: Any = jnp.float32

    @classmethod
    def from_hparams(cls, hp: Mapping, **overrides) -> "VQGANConfig":
        known = {f.name for f in __import__("dataclasses").fields(cls)}
        kw = {k: hp[k] for k in known if k in hp}
        if "downsample" in kw:
            kw["downsample"] = tuple(int(d) for d in kw["downsample"])
        kw.update(overrides)
        return cls(**kw)


class VQGANCore(nn.Module):
    """Encoder/decoder conv stacks (codebook buffers live outside)."""

    config: VQGANConfig

    def setup(self):
        cfg = self.config
        self.encoder = Encoder(
            cfg.n_hiddens, cfg.downsample, cfg.norm_type, cfg.padding_type,
            dtype=cfg.dtype,
        )
        self.decoder = Decoder(
            cfg.n_hiddens, cfg.downsample, cfg.norm_type, dtype=cfg.dtype
        )
        self.pre_vq_conv = SamePadConv3d(
            cfg.embedding_dim, 1, padding_type=cfg.padding_type,
            dtype=cfg.dtype, name="pre_vq_conv",
        )
        self.post_vq_conv = SamePadConv3d(
            self.encoder.n_hiddens * 2 ** max(
                int(math.log2(d)) for d in cfg.downsample
            ),
            1,
            dtype=cfg.dtype,
            name="post_vq_conv",
        )

    def encode_latent(self, video):
        """(B, D, H, W, C) pixels -> (B, d, h, w, embedding_dim)."""
        return self.pre_vq_conv(self.encoder(video))

    def decode_latent(self, z):
        """(B, d, h, w, embedding_dim) -> (B, D, H, W, C) pixels."""
        return self.decoder(self.post_vq_conv(z))

    def __call__(self, video):
        # init-path convenience: run both directions once
        z = self.encode_latent(video)
        return self.decode_latent(z)


@flax.struct.dataclass
class VQGAN:
    """Bundled conv params + codebook buffers with reference-shaped API.

    encode/decode mirror reference vqgan.py:82-93 including the
    (B, C, T, H, W) layout at the boundary.
    """

    config: VQGANConfig = flax.struct.field(pytree_node=False)
    params: Any
    codebook: CodebookState

    @property
    def core(self) -> VQGANCore:
        return VQGANCore(self.config)

    @classmethod
    def create(cls, rng, config: VQGANConfig, example_shape=(1, 4, 32, 32, 3)):
        p_rng, c_rng = jax.random.split(rng)
        params = cls(config, None, None).core.init(
            p_rng, jnp.zeros(example_shape, jnp.float32)
        )["params"]
        codebook = CodebookState.create(
            c_rng, config.n_codes, config.embedding_dim
        )
        return cls(config=config, params=params, codebook=codebook)

    # -- reference-layout API -------------------------------------------------

    def encode(self, video_bcthw: jax.Array, include_embeddings: bool = False):
        video = jnp.moveaxis(video_bcthw, 1, -1)  # -> (B, T, H, W, C)
        z = self.core.apply(
            {"params": self.params}, video, method=VQGANCore.encode_latent
        )
        codes, emb_st, _ = codebook_quantize(self.codebook, z)
        if include_embeddings:
            return jnp.moveaxis(emb_st, -1, 1), codes
        return codes

    def decode(self, codes_bthw: jax.Array) -> jax.Array:
        z = codebook_lookup(self.codebook, codes_bthw)
        video = self.core.apply(
            {"params": self.params}, z, method=VQGANCore.decode_latent
        )
        return jnp.moveaxis(video, -1, 1)  # -> (B, C, T, H, W)

    def latent_shape(self, sequence_length: int, resolution: int):
        d = self.config.downsample
        return (
            sequence_length // d[0],
            resolution // d[1],
            resolution // d[2],
        )
