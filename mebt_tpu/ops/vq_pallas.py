"""Fused nearest-neighbor codebook search (Pallas TPU kernel + XLA fallback).

Behavioural reference: mebt/modules/codebook.py:48-61 — the expanded-L2
search `argmin_k ||x||^2 - 2 x·e_k + ||e_k||^2` over a 16384-entry
codebook. The `||x||^2` term is constant per row and dropped (it cannot
change the argmin). Tie-breaking matches torch/jnp argmin: first index.

TPU design: inputs are tiled over rows (M) and the codebook over entries
(K); the kernel keeps a running (min, argmin) pair in VMEM scratch and
never materializes the full (M, K) distance matrix in HBM. The inner
matmul x @ E^T maps straight onto the MXU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _nn_kernel(x_ref, et_ref, e2_ref, idx_ref, minval, minidx, *, tile_k: int):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        minval[:] = jnp.full_like(minval, jnp.inf)
        minidx[:] = jnp.zeros_like(minidx)

    # scores[m, k] = -2 x·e_k + ||e_k||^2 for this codebook tile
    scores = -2.0 * jnp.dot(
        x_ref[:], et_ref[:], preferred_element_type=jnp.float32
    )
    scores = scores + e2_ref[:]

    local_min = jnp.min(scores, axis=1, keepdims=True)
    local_arg = jnp.argmin(scores, axis=1).astype(jnp.int32)[:, None]
    local_arg = local_arg + j * tile_k

    better = local_min < minval[:]
    minidx[:] = jnp.where(better, local_arg, minidx[:])
    minval[:] = jnp.where(better, local_min, minval[:])

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        idx_ref[:] = minidx[:]


@functools.partial(jax.jit, static_argnames=("tile_m", "tile_k"))
def nearest_code_pallas(
    flat_inputs: jax.Array,  # (M, D) fp32
    codebook: jax.Array,  # (K, D) fp32
    tile_m: int = 256,
    tile_k: int = 2048,
) -> jax.Array:
    """Returns (M,) int32 nearest-codebook-entry indices."""
    M, D = flat_inputs.shape
    K = codebook.shape[0]
    tile_m = min(tile_m, M)
    tile_k = min(tile_k, K)

    pad_m = _cdiv(M, tile_m) * tile_m - M
    x = jnp.pad(flat_inputs, ((0, pad_m), (0, 0))) if pad_m else flat_inputs
    pad_k = _cdiv(K, tile_k) * tile_k - K
    eb = jnp.pad(codebook, ((0, pad_k), (0, 0))) if pad_k else codebook

    et = eb.T  # (D, K)
    e2 = jnp.sum(eb.astype(jnp.float32) ** 2, axis=1)[None, :]  # (1, K)
    if pad_k:
        # padded rows must never win the argmin
        e2 = e2.at[:, K:].set(jnp.inf)

    Mp, Kp = x.shape[0], et.shape[1]
    grid = (Mp // tile_m, Kp // tile_k)

    idx = pl.pallas_call(
        functools.partial(_nn_kernel, tile_k=tile_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_m, D), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, tile_k), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_k), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile_m, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Mp, 1), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((tile_m, 1), jnp.float32),
            pltpu.VMEM((tile_m, 1), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * Kp * D,
            bytes_accessed=4 * (Mp * D + D * Kp + Mp),
            transcendentals=0,
        ),
    )(x.astype(jnp.float32), et.astype(jnp.float32), e2)
    return idx[:M, 0]


def nearest_code_xla(
    flat_inputs: jax.Array, codebook: jax.Array, chunk: int = 4096
) -> jax.Array:
    """Chunked XLA fallback (CPU tests / interpret mode). Scans codebook
    chunks to bound the live distance matrix to (M, chunk)."""
    x = flat_inputs.astype(jnp.float32)
    K, D = codebook.shape
    chunk = min(chunk, K)
    n_chunks = _cdiv(K, chunk)
    pad_k = n_chunks * chunk - K
    eb = jnp.pad(codebook.astype(jnp.float32), ((0, pad_k), (0, 0)))
    e2 = jnp.sum(eb**2, axis=1)
    if pad_k:
        e2 = e2.at[K:].set(jnp.inf)
    eb_c = eb.reshape(n_chunks, chunk, D)
    e2_c = e2.reshape(n_chunks, chunk)

    def body(carry, ek):
        best_val, best_idx, offset = carry
        e, e2k = ek
        scores = -2.0 * (x @ e.T) + e2k[None, :]
        lmin = jnp.min(scores, axis=1)
        larg = jnp.argmin(scores, axis=1).astype(jnp.int32) + offset
        better = lmin < best_val
        return (
            jnp.where(better, lmin, best_val),
            jnp.where(better, larg, best_idx),
            offset + chunk,
        ), None

    M = x.shape[0]
    init = (
        jnp.full((M,), jnp.inf, jnp.float32),
        jnp.zeros((M,), jnp.int32),
        jnp.int32(0),
    )
    (_, idx, _), _ = jax.lax.scan(body, init, (eb_c, e2_c))
    return idx


def nearest_code(flat_inputs: jax.Array, codebook: jax.Array) -> jax.Array:
    """Dispatch: Pallas on TPU, chunked XLA elsewhere.

    The output is discrete code indices, so the gradient is zero
    everywhere it exists; stop_gradient keeps autodiff from trying to
    differentiate through the Pallas kernel (pallas_call has no JVP
    rule) when this runs inside a VQGAN training loss.
    """
    flat_inputs = jax.lax.stop_gradient(flat_inputs)
    codebook = jax.lax.stop_gradient(codebook)
    platform = jax.devices()[0].platform
    if platform == "tpu":
        return nearest_code_pallas(flat_inputs, codebook)
    return nearest_code_xla(flat_inputs, codebook)
