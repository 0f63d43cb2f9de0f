"""VQGAN parity and shape tests.

Conv semantics are checked against torch (CPU) ground truth — the
reference implements SamePadConv3d as replicate-pad + Conv3d and
SamePadConvTranspose3d as replicate-pad + ConvTranspose3d(padding=k-1)
(mebt/vqgan.py:368-413); torch's ops define the expected numerics.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mebt_tpu.models.vqgan import (
    CodebookState,
    VQGAN,
    VQGANConfig,
    codebook_ema_update,
    codebook_quantize,
)
from mebt_tpu.ops.conv3d import same_pad_conv3d, same_pad_conv_transpose3d
from mebt_tpu.ops.vq_pallas import nearest_code_pallas, nearest_code_xla

torch = pytest.importorskip("torch")


def _torch_same_pad(x_t, k, s, mode="replicate"):
    import torch.nn.functional as F

    pads = []
    for kk, ss in zip(k[::-1], s[::-1]):
        p = kk - ss
        pads += [p // 2 + p % 2, p // 2]
    return F.pad(x_t, pads, mode=mode)


@pytest.mark.parametrize(
    "k,s",
    [((3, 3, 3), (1, 1, 1)), ((4, 4, 4), (2, 2, 2)), ((4, 4, 4), (1, 2, 2)),
     ((1, 1, 1), (1, 1, 1))],
)
def test_same_pad_conv3d_matches_torch(k, s):
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    B, Cin, Cout, D, H, W = 2, 5, 7, 4, 8, 8
    x = rng.normal(size=(B, D, H, W, Cin)).astype(np.float32)
    w = rng.normal(size=(*k, Cin, Cout)).astype(np.float32) * 0.1

    got = np.asarray(same_pad_conv3d(jnp.asarray(x), jnp.asarray(w), s))

    x_t = torch.from_numpy(x).permute(0, 4, 1, 2, 3)
    w_t = torch.from_numpy(w).permute(4, 3, 0, 1, 2)  # -> (out, in, kd, kh, kw)
    y_t = F.conv3d(_torch_same_pad(x_t, k, s), w_t, stride=s)
    want = y_t.permute(0, 2, 3, 4, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize(
    "k,s", [((4, 4, 4), (2, 2, 2)), ((4, 4, 4), (1, 2, 2)), ((4, 4, 4), (2, 1, 1))]
)
def test_same_pad_conv_transpose3d_matches_torch(k, s):
    import torch.nn.functional as F

    rng = np.random.default_rng(1)
    B, Cin, Cout, D, H, W = 2, 5, 6, 3, 4, 4
    x = rng.normal(size=(B, D, H, W, Cin)).astype(np.float32)
    w = rng.normal(size=(*k, Cin, Cout)).astype(np.float32) * 0.1

    got = np.asarray(
        same_pad_conv_transpose3d(jnp.asarray(x), jnp.asarray(w), s)
    )

    x_t = torch.from_numpy(x).permute(0, 4, 1, 2, 3)
    # torch ConvTranspose3d weight layout: (in, out, kd, kh, kw)
    w_t = torch.from_numpy(w).permute(3, 4, 0, 1, 2)
    y_t = F.conv_transpose3d(
        _torch_same_pad(x_t, k, s),
        w_t,
        stride=s,
        padding=tuple(kk - 1 for kk in k),
    )
    want = y_t.permute(0, 2, 3, 4, 1).numpy()
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_nearest_code_xla_bruteforce():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(133, 16)).astype(np.float32)
    cb = rng.normal(size=(300, 16)).astype(np.float32)
    want = np.argmin(
        ((x[:, None, :] - cb[None, :, :]) ** 2).sum(-1), axis=1
    )
    got = np.asarray(nearest_code_xla(jnp.asarray(x), jnp.asarray(cb), chunk=64))
    np.testing.assert_array_equal(got, want)


def test_nearest_code_pallas_interpret():
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(3)
    x = rng.normal(size=(64, 8)).astype(np.float32)
    cb = rng.normal(size=(96, 8)).astype(np.float32)
    want = np.argmin(((x[:, None, :] - cb[None, :, :]) ** 2).sum(-1), axis=1)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            nearest_code_pallas(jnp.asarray(x), jnp.asarray(cb), tile_m=32, tile_k=32)
        )
    np.testing.assert_array_equal(got, want)


def test_vqgan_encode_decode_shapes():
    cfg = VQGANConfig(
        embedding_dim=8, n_codes=32, n_hiddens=4, downsample=(2, 4, 4)
    )
    model = VQGAN.create(
        jax.random.key(0), cfg, example_shape=(1, 2, 8, 8, 3)
    )
    video = jnp.zeros((2, 3, 4, 16, 16), jnp.float32)  # (B, C, T, H, W)
    codes = model.encode(video)
    assert codes.shape == (2, 2, 4, 4)  # (B, T/2, H/4, W/4)
    emb, codes2 = model.encode(video, include_embeddings=True)
    assert emb.shape == (2, 8, 2, 4, 4)
    recon = model.decode(codes)
    assert recon.shape == video.shape


def test_codebook_ema_update_moves_embeddings():
    state = CodebookState.create(jax.random.key(0), 16, 4)
    rng = np.random.default_rng(4)
    z = jnp.asarray(rng.normal(size=(40, 4)).astype(np.float32))
    codes, _, aux = codebook_quantize(state, z)
    new = codebook_ema_update(
        state, z, codes, jax.random.key(1), no_random_restart=True
    )
    assert not np.allclose(
        np.asarray(new.embeddings), np.asarray(state.embeddings)
    )
    assert float(aux["perplexity"]) > 1.0
    # straight-through: gradient flows to z
    def loss(zz):
        _, emb_st, _ = codebook_quantize(state, zz)
        return jnp.sum(emb_st**2)

    g = jax.grad(loss)(z)
    assert np.abs(np.asarray(g)).sum() > 0
