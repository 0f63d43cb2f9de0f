"""FVD / KVD metrics.

Behavioural reference: mebt/fvd/fvd.py. Embeddings are I3D-400 logits
of 224x224 bilinear-resized videos scaled to [-1, 1]; FVD is the
Fréchet distance with an SVD-based symmetric matrix square root (ported
from tensorflow_gan by the reference, fvd.py:44-53); KVD is the
polynomial-kernel MMD (degree 3, gamma=1/d, coef0=1 — sklearn
polynomial_kernel defaults, fvd.py:103-115).

TPU/host split: the I3D embedding runs jitted on device in MAX_BATCH
chunks; the O(d^3) Fréchet/MMD statistics run in float64 numpy on host
for numerical fidelity (the reference disables TF32 for the same
reason, measure_fvd_with_numpy.py:20-21).
"""

from __future__ import annotations

import numpy as np

MAX_BATCH = 16
FVD_SAMPLE_SIZE = 2048
TARGET_RESOLUTION = (224, 224)


def preprocess(videos_u8: np.ndarray) -> np.ndarray:
    """(B, T, H, W, C) uint8 -> (B, T, 224, 224, C) float32 in [-1, 1]
    (reference fvd.py:17-27; bilinear, align_corners=False)."""
    import jax
    import jax.numpy as jnp

    b, t, h, w, c = videos_u8.shape
    x = jnp.asarray(videos_u8, jnp.float32)

    def resize(frames):  # (T, H, W, C)
        return jax.image.resize(
            frames, (t, *TARGET_RESOLUTION, c), method="bilinear"
        )

    out = jax.jit(jax.vmap(resize))(x)
    return np.asarray(2.0 * out / 255.0 - 1.0, np.float32)


def get_fvd_logits(videos_u8: np.ndarray, i3d_model, i3d_params) -> np.ndarray:
    """I3D embeddings in MAX_BATCH chunks (reference fvd.py:29-32,
    119-127). Accepts (B, T, H, W, C) uint8."""
    from mebt_tpu.eval.i3d import i3d_logits

    videos = preprocess(videos_u8)
    chunks = []
    for i in range(0, videos.shape[0], MAX_BATCH):
        batch = videos[i : i + MAX_BATCH]
        pad = 0
        if batch.shape[0] < MAX_BATCH and i > 0:
            pad = MAX_BATCH - batch.shape[0]
            batch = np.concatenate([batch, batch[:pad]], 0) if pad else batch
        out = np.asarray(i3d_logits(i3d_model, i3d_params, batch))
        chunks.append(out[: out.shape[0] - pad] if pad else out)
    return np.concatenate(chunks, 0)


# -- statistics (host, float64) ----------------------------------------------


def _symmetric_matrix_square_root(mat: np.ndarray, eps: float = 1e-10):
    u, s, vt = np.linalg.svd(mat)
    si = np.where(s < eps, s, np.sqrt(s))
    return u @ np.diag(si) @ vt


def trace_sqrt_product(sigma: np.ndarray, sigma_v: np.ndarray) -> float:
    sqrt_sigma = _symmetric_matrix_square_root(sigma)
    m = sqrt_sigma @ sigma_v @ sqrt_sigma
    return float(np.trace(_symmetric_matrix_square_root(m)))


def frechet_distance(x1: np.ndarray, x2: np.ndarray) -> float:
    """Reference fvd.py:89-100 in float64."""
    x1 = np.asarray(x1, np.float64).reshape(len(x1), -1)
    x2 = np.asarray(x2, np.float64).reshape(len(x2), -1)
    m1, m2 = x1.mean(0), x2.mean(0)
    s1 = np.cov(x1, rowvar=False)
    s2 = np.cov(x2, rowvar=False)
    trace = np.trace(s1 + s2) - 2.0 * trace_sqrt_product(s1, s2)
    return float(trace + np.sum((m1 - m2) ** 2))


def _polynomial_kernel(x, y=None, degree=3, coef0=1.0):
    y = x if y is None else y
    gamma = 1.0 / x.shape[1]
    return (gamma * (x @ y.T) + coef0) ** degree


def polynomial_mmd(x: np.ndarray, y: np.ndarray) -> float:
    """KVD — reference fvd.py:103-115 (unbiased diagonal-removed MMD)."""
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    m, n = len(x), len(y)
    k_xx = _polynomial_kernel(x)
    k_yy = _polynomial_kernel(y)
    k_xy = _polynomial_kernel(x, y)
    s_xx = (k_xx.sum() - np.trace(k_xx)) / (m * (m - 1))
    s_yy = (k_yy.sum() - np.trace(k_yy)) / (n * (n - 1))
    s_xy = k_xy.sum() / (m * n)
    return float(s_xx + s_yy - 2.0 * s_xy)
