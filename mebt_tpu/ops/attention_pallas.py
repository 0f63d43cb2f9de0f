"""Pallas fused masked attention for the MeBT latent-routing shapes.

Why: the XLA path materializes (B, H, NQ, NK) fp32 score and
probability tensors in HBM; at the flagship decode shapes
(16x16x256x1024 per layer, 24 layers) that is tens of ms of HBM traffic
per decode step. These kernels keep scores/probabilities in VMEM and
write only the (B, H, NQ, Dh) output.

Two regimes cover every routed block (models/transformer.py):
  * small-Q / large-K (latent_enc: Q=latents, K=tokens+mask;
    lt2l: Q=latents, K=[latents;tokens]+mask) — flash-style streaming
    over K blocks with running (max, denom, acc).
  * large-Q / small-K (latent_dec: Q=tokens, K=latents, no mask) —
    K/V fit VMEM whole; single-pass softmax per Q block.

Grid design: per-cell work is deliberately large — `heads_per_cell`
heads are processed per grid cell (static unrolled loop) so that the
per-cell dispatch overhead of a naive (B*H, blocks) grid is amortized.

Numerics: scores and softmax accumulate in fp32 regardless of input
dtype (matches the XLA path's probs_dtype=fp32); fully-masked rows
produce zero outputs exactly like ops.attention.masked_softmax.

Gradients: `fused_attention` carries a custom VJP with Pallas flash
backward kernels per regime — streaming over the large axis with the
probability tile recomputed in VMEM (small-Q saves the forward's lse;
large-Q recomputes everything in-kernel), so the (B, H, NQ, NK) fp32
tensors of the naive backward never hit HBM. Backward matmul precision
is keyed on the input dtype: bf16 inputs (the production models) run
single-pass MXU matmuls with fp32 accumulation — identical products to
any multi-pass scheme on bf16-sourced operands, and the in-kernel
score recompute then matches the forward bit-for-bit — with the fp32
probability/ds tiles cast to bf16 for their matmuls exactly as the
forward casts p before the PV matmul. Genuine fp32 inputs keep
HIGHEST-precision matmuls throughout; measured against a float64 host
reference that path's grads are 2-7x closer than the XLA fp32-einsum
backward on TPU (whose MXU passes are bf16-based). The XLA formulation
remains as the fallback for shapes outside both regimes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mebt_tpu.ops.attention import masked_attention as _xla_attention

NEG_BIG = -1e30
NK_SMALL_LIMIT = 512


def _cdiv(a, b):
    return -(-a // b)


def _pick_hc(H: int, requested: int) -> int:
    hc = min(requested, H)
    while H % hc:
        hc -= 1
    return hc


# ---------------------------------------------------------------------------
# small-Q / large-K : flash over K blocks, hc heads per cell


def _drop_keep(shape, p_drop: float):
    """Bernoulli keep-mask scaled by 1/(1-p) from the in-kernel PRNG.
    Callers must prng_seed identically in forward and backward so the
    same elements drop in both (tile partitioning must match too)."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    thresh = jnp.uint32(min(int(p_drop * 4294967296.0), 4294967295))
    return (bits >= thresh).astype(jnp.float32) * (1.0 / (1.0 - p_drop))


def _smallq_kernel(seed_ref, q_ref, k_ref, v_ref, mask_ref, o_ref, lse_ref,
                   m_ref, l_ref, acc_ref, *, scale: float, use_mask: bool,
                   hc: int, p_drop: float = 0.0):
    g = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_BIG)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    valid = mask_ref[0] != 0 if use_mask else None  # (1, BK)
    if p_drop > 0.0:
        pltpu.prng_seed(seed_ref[0] + g * pl.num_programs(1) + j)

    for h in range(hc):
        q = q_ref[0, h]  # (NQ, D)
        k = k_ref[0, h]  # (BK, D)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (NQ, BK)
        if use_mask:
            s = jnp.where(valid, s, NEG_BIG)

        m_prev = m_ref[h]  # (NQ, 1)
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        if use_mask:
            p = jnp.where(valid, p, 0.0)
        alpha = jnp.exp(m_prev - m_new)
        # dropout applies AFTER the softmax: the denominator accumulates
        # the undropped p, only the PV accumulation sees the keep mask
        l_new = l_ref[h] * alpha + jnp.sum(p, axis=1, keepdims=True)
        p_acc = p * _drop_keep(p.shape, p_drop) if p_drop > 0.0 else p
        acc = acc_ref[h] * alpha + jax.lax.dot_general(
            p_acc.astype(v_ref.dtype), v_ref[0, h], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_ref[h] = m_new
        l_ref[h] = l_new
        acc_ref[h] = acc

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        denom = l_ref[:]
        empty = denom == 0.0
        denom = jnp.where(empty, 1.0, denom)
        o_ref[0] = (acc_ref[:] / denom).astype(o_ref.dtype)
        # logsumexp per query row, saved for the flash backward;
        # fully-masked rows get +BIG so recomputed p == 0 exactly.
        # Emitted lane-major (hc, 1, NQ): a (NQ, 1) column block would
        # pad to 128 lanes and cost ~1 MB of double-buffered VMEM.
        lse = jnp.where(empty, -NEG_BIG, m_ref[:] + jnp.log(denom))
        lse_ref[0] = jnp.swapaxes(lse, 1, 2)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "block_k", "heads_per_cell", "p_drop"),
)
def _smallq_attention(q, k, v, mask, seed=None, *, scale: float,
                      block_k: int = 2048, heads_per_cell: int = 8,
                      p_drop: float = 0.0):
    """q: (G, H, NQ, D); k/v: (G, H, NK, D); mask: (G, NK) int32 or None.

    Returns (out, lse) with lse (G, H, NQ, 1) fp32 — consumed by the
    flash backward; callers on the inference path drop it (the extra
    write is negligible next to the O(NQ*NK) compute)."""
    G, H, NQ, D = q.shape
    NK = k.shape[2]
    hc = _pick_hc(H, heads_per_cell)
    block_k = min(block_k, NK)
    pad_k = _cdiv(NK, block_k) * block_k - NK
    use_mask = mask is not None or pad_k > 0
    if mask is None:
        mask = jnp.ones((G, NK), jnp.int32)
    if seed is None:
        seed = jnp.zeros((), jnp.int32)
    if pad_k:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad_k), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad_k), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, pad_k)))
    NKp = k.shape[2]
    n_cells = G * H // hc
    qh = q.reshape(n_cells, hc, NQ, D)
    kh = k.reshape(n_cells, hc, NKp, D)
    vh = v.reshape(n_cells, hc, NKp, D)
    maskh = jnp.repeat(
        mask.reshape(G, 1, NKp), H // hc, axis=1
    ).reshape(n_cells, 1, NKp)
    grid = (n_cells, NKp // block_k)

    out, lse = pl.pallas_call(
        functools.partial(
            _smallq_kernel, scale=scale, use_mask=use_mask, hc=hc,
            p_drop=p_drop,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, hc, NQ, D), lambda g, j: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hc, block_k, D), lambda g, j: (g, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hc, block_k, D), lambda g, j: (g, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k), lambda g, j: (g, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, hc, NQ, D), lambda g, j: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hc, 1, NQ), lambda g, j: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_cells, hc, NQ, D), q.dtype),
            jax.ShapeDtypeStruct((n_cells, hc, 1, NQ), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((hc, NQ, 1), jnp.float32),
            pltpu.VMEM((hc, NQ, 1), jnp.float32),
            pltpu.VMEM((hc, NQ, D), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * G * H * NQ * NKp * D,
            bytes_accessed=2 * G * H * (NQ * D + 2 * NKp * D),
            transcendentals=G * H * NQ * NKp,
        ),
    )(jnp.asarray(seed, jnp.int32).reshape(1), qh, kh, vh, maskh)
    return out.reshape(G, H, NQ, D), lse.reshape(G, H, NQ)[..., None]


# ---------------------------------------------------------------------------
# large-Q / small-K : K resident, single pass per Q block, hc heads/cell


def _largeq_kernel(seed_ref, q_ref, k_ref, v_ref, o_ref, *, scale: float,
                   hc: int, p_drop: float = 0.0):
    if p_drop > 0.0:
        pltpu.prng_seed(
            seed_ref[0] + pl.program_id(0) * pl.num_programs(1)
            + pl.program_id(1)
        )
    for h in range(hc):
        q = q_ref[0, h]  # (BQ, D)
        k = k_ref[0, h]  # (NK, D)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (BQ, NK)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        denom = jnp.sum(p, axis=1, keepdims=True)
        pn = p / denom
        if p_drop > 0.0:
            pn = pn * _drop_keep(pn.shape, p_drop)
        o = jax.lax.dot_general(
            pn.astype(v_ref.dtype), v_ref[0, h],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        o_ref[0, h] = o.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "block_q", "heads_per_cell", "p_drop"),
)
def _largeq_attention(q, k, v, seed=None, *, scale: float,
                      block_q: int = 1024, heads_per_cell: int = 4,
                      p_drop: float = 0.0):
    """q: (G, H, NQ, D); k/v: (G, H, NK, D), NK small, no mask."""
    G, H, NQ, D = q.shape
    NK = k.shape[2]
    hc = _pick_hc(H, heads_per_cell)
    block_q = min(block_q, NQ)
    pad_q = _cdiv(NQ, block_q) * block_q - NQ
    if pad_q:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad_q), (0, 0)))
    if seed is None:
        seed = jnp.zeros((), jnp.int32)
    NQp = q.shape[2]
    n_cells = G * H // hc
    qh = q.reshape(n_cells, hc, NQp, D)
    kh = k.reshape(n_cells, hc, NK, D)
    vh = v.reshape(n_cells, hc, NK, D)
    grid = (n_cells, NQp // block_q)

    out = pl.pallas_call(
        functools.partial(
            _largeq_kernel, scale=scale, hc=hc, p_drop=p_drop
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, hc, block_q, D), lambda g, i: (g, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hc, NK, D), lambda g, i: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hc, NK, D), lambda g, i: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hc, block_q, D),
                               lambda g, i: (g, 0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_cells, hc, NQp, D), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * G * H * NQp * NK * D,
            bytes_accessed=2 * G * H * (2 * NQp * D + 2 * NK * D),
            transcendentals=G * H * NQp * NK,
        ),
    )(jnp.asarray(seed, jnp.int32).reshape(1), qh, kh, vh)
    out = out.reshape(G, H, NQp, D)
    return out[:, :, :NQ] if pad_q else out


# ---------------------------------------------------------------------------
# flash backward kernels — stream over the large axis, never materialize
# the (B, H, NQ, NK) probability tensor in HBM. All in-kernel matmuls
# run in fp32 so gradients match the fp32 XLA reference formulation.


def _smallq_bwd_kernel(seed_ref, q_ref, g_ref, lse_ref, d_ref, k_ref, v_ref,
                       mask_ref, dq_ref, dk_ref, dv_ref, dq_acc,
                       *, scale: float, use_mask: bool, hc: int,
                       p_drop: float = 0.0):
    gcell = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    valid = mask_ref[0] != 0 if use_mask else None  # (1, BK)
    if p_drop > 0.0:
        # identical seeding + per-h draw order as the forward kernel so
        # the same elements drop (tile partitioning must match too)
        pltpu.prng_seed(seed_ref[0] + gcell * pl.num_programs(1) + j)

    # Precision policy (matches the forward): bf16 inputs run
    # single-pass MXU matmuls with fp32 accumulation — upcasting
    # bf16-sourced operands buys nothing and HIGHEST costs 6 passes
    # (scripts/ab_attn_bwd.py: 3.45-3.67 ms/call bf16 vs 4.5-4.8
    # fp32/HIGHEST at the flagship 128f training shapes, probe 143).
    # The recomputed scores then equal the forward's bit-for-bit, so
    # p = exp(s - lse) is exact. The fp32 probabilities/ds are cast to
    # bf16 for their matmuls, exactly like the forward's
    # p_acc.astype(v.dtype). Genuine-fp32 inputs (tests, fp32 models)
    # keep the full-precision path.
    fast = q_ref.dtype == jnp.bfloat16
    prec = None if fast else jax.lax.Precision.HIGHEST

    def _f32(x):
        return x if fast else x.astype(jnp.float32)

    def _op(x):  # fp32 intermediate -> matmul operand dtype
        return x.astype(jnp.bfloat16) if fast else x

    for h in range(hc):
        q = _f32(q_ref[0, h])  # (NQ, D)
        g = _f32(g_ref[0, h])  # (NQ, D)
        k = _f32(k_ref[0, h])  # (BK, D)
        v = _f32(v_ref[0, h])  # (BK, D)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        ) * scale
        p = jnp.exp(s - lse_ref[0, h])  # exact probs via saved lse
        if use_mask:
            p = jnp.where(valid, p, 0.0)
        keep = _drop_keep(p.shape, p_drop) if p_drop > 0.0 else None
        p_v = p * keep if keep is not None else p
        dv_ref[0, h] = jax.lax.dot_general(
            _op(p_v), g, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        ).astype(dv_ref.dtype)
        dp = jax.lax.dot_general(
            g, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        )
        if keep is not None:
            dp = dp * keep  # dL/dP through the dropout mask
        ds = p * (dp - d_ref[0, h]) * scale  # (NQ, BK)
        ds = _op(ds)
        dk_ref[0, h] = jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        ).astype(dk_ref.dtype)
        dq_acc[h] += jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        )

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        dq_ref[0] = dq_acc[:].astype(dq_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "block_k", "heads_per_cell", "p_drop"),
)
def _smallq_backward(q, k, v, mask, out, lse, g, seed=None, *, scale: float,
                     block_k: int = 512, heads_per_cell: int = 4,
                     p_drop: float = 0.0):
    """Flash backward for the small-Q regime. mask: (G, NK) int32|None.
    With p_drop > 0, (block_k, heads_per_cell, seed) MUST equal the
    forward call's so the regenerated dropout mask matches."""
    G, H, NQ, D = q.shape
    NK = k.shape[2]
    hc = _pick_hc(H, heads_per_cell)
    block_k = min(block_k, NK)
    pad_k = _cdiv(NK, block_k) * block_k - NK
    use_mask = mask is not None or pad_k > 0
    if mask is None:
        mask = jnp.ones((G, NK), jnp.int32)
    if seed is None:
        seed = jnp.zeros((), jnp.int32)
    if pad_k:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad_k), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad_k), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, pad_k)))
    NKp = k.shape[2]

    # D_i = sum_j p_ij dp_ij = rowsum(g * out) — tiny, computed in XLA
    dvec = jnp.sum(
        g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1,
        keepdims=True,
    )

    n_cells = G * H // hc
    qh = q.reshape(n_cells, hc, NQ, D)
    gh = g.reshape(n_cells, hc, NQ, D)
    lseh = lse.reshape(n_cells, hc, NQ, 1)
    dh = dvec.reshape(n_cells, hc, NQ, 1)
    kh = k.reshape(n_cells, hc, NKp, D)
    vh = v.reshape(n_cells, hc, NKp, D)
    maskh = jnp.repeat(
        mask.reshape(G, 1, NKp), H // hc, axis=1
    ).reshape(n_cells, 1, NKp)
    grid = (n_cells, NKp // block_k)

    qspec = pl.BlockSpec((1, hc, NQ, D), lambda g_, j: (g_, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    vecspec = pl.BlockSpec((1, hc, NQ, 1), lambda g_, j: (g_, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((1, hc, block_k, D), lambda g_, j: (g_, 0, j, 0),
                         memory_space=pltpu.VMEM)

    dq, dk, dv = pl.pallas_call(
        functools.partial(
            _smallq_bwd_kernel, scale=scale, use_mask=use_mask, hc=hc,
            p_drop=p_drop,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            qspec, qspec, vecspec, vecspec, kspec, kspec,
            pl.BlockSpec((1, 1, block_k), lambda g_, j: (g_, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(qspec, kspec, kspec),
        out_shape=(
            jax.ShapeDtypeStruct((n_cells, hc, NQ, D), q.dtype),
            jax.ShapeDtypeStruct((n_cells, hc, NKp, D), k.dtype),
            jax.ShapeDtypeStruct((n_cells, hc, NKp, D), v.dtype),
        ),
        scratch_shapes=[pltpu.VMEM((hc, NQ, D), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=10 * G * H * NQ * NKp * D,
            bytes_accessed=4 * G * H * (2 * NQ * D + 3 * NKp * D),
            transcendentals=G * H * NQ * NKp,
        ),
    )(jnp.asarray(seed, jnp.int32).reshape(1), qh, gh, lseh, dh, kh, vh,
      maskh)
    dq = dq.reshape(G, H, NQ, D)
    dk = dk.reshape(G, H, NKp, D)
    dv = dv.reshape(G, H, NKp, D)
    if pad_k:
        dk = dk[:, :, :NK]
        dv = dv[:, :, :NK]
    return dq, dk, dv


def _largeq_bwd_kernel(seed_ref, q_ref, g_ref, k_ref, v_ref,
                       dq_ref, dk_ref, dv_ref, dk_acc, dv_acc,
                       *, scale: float, hc: int, p_drop: float = 0.0):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    if p_drop > 0.0:
        # identical seeding + draw order as the forward kernel
        pltpu.prng_seed(
            seed_ref[0] + pl.program_id(0) * pl.num_programs(1) + i
        )

    # Same dtype-keyed precision policy as _smallq_bwd_kernel: bf16
    # inputs run single-pass matmuls (fp32 accumulation), so the
    # in-kernel softmax recompute matches the forward bit-for-bit;
    # fp32 intermediates are cast to bf16 for their matmuls like the
    # forward's pn.astype(v.dtype). fp32 inputs keep HIGHEST.
    fast = q_ref.dtype == jnp.bfloat16
    prec = None if fast else jax.lax.Precision.HIGHEST

    def _f32(x):
        return x if fast else x.astype(jnp.float32)

    def _op(x):
        return x.astype(jnp.bfloat16) if fast else x

    for h in range(hc):
        q = _f32(q_ref[0, h])  # (BQ, D)
        g = _f32(g_ref[0, h])  # (BQ, D)
        k = _f32(k_ref[0, h])  # (NK, D)
        v = _f32(v_ref[0, h])  # (NK, D)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        ) * scale
        m = jnp.max(s, axis=1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, axis=1, keepdims=True)  # (BQ, NK)
        keep = _drop_keep(p.shape, p_drop) if p_drop > 0.0 else None
        p_v = p * keep if keep is not None else p
        p_v = _op(p_v)
        o = jax.lax.dot_general(
            p_v, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        )
        dvec = jnp.sum(g * o, axis=1, keepdims=True)  # (BQ, 1)
        dv_acc[h] += jax.lax.dot_general(
            p_v, g, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        )
        dp = jax.lax.dot_general(
            g, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        )
        if keep is not None:
            dp = dp * keep  # dL/dP through the dropout mask
        ds = p * (dp - dvec) * scale  # (BQ, NK)
        ds = _op(ds)
        dq_ref[0, h] = jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        ).astype(dq_ref.dtype)
        dk_acc[h] += jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        )

    @pl.when(i == pl.num_programs(1) - 1)
    def _():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "block_q", "heads_per_cell", "p_drop"),
)
def _largeq_backward(q, k, v, g, seed=None, *, scale: float,
                     block_q: int = 512, heads_per_cell: int = 4,
                     p_drop: float = 0.0):
    """Flash backward for the large-Q regime (no mask; O and D are
    recomputed in-kernel — nothing needs saving from the forward).
    With p_drop > 0, (block_q, heads_per_cell, seed) MUST equal the
    forward call's so the regenerated dropout mask matches."""
    G, H, NQ, D = q.shape
    NK = k.shape[2]
    hc = _pick_hc(H, heads_per_cell)
    block_q = min(block_q, NQ)
    pad_q = _cdiv(NQ, block_q) * block_q - NQ
    if pad_q:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad_q), (0, 0)))
        g = jnp.pad(g, ((0, 0), (0, 0), (0, pad_q), (0, 0)))
    if seed is None:
        seed = jnp.zeros((), jnp.int32)
    NQp = q.shape[2]
    n_cells = G * H // hc
    qh = q.reshape(n_cells, hc, NQp, D)
    gh = g.reshape(n_cells, hc, NQp, D)
    kh = k.reshape(n_cells, hc, NK, D)
    vh = v.reshape(n_cells, hc, NK, D)
    grid = (n_cells, NQp // block_q)

    qspec = pl.BlockSpec((1, hc, block_q, D), lambda g_, i: (g_, 0, i, 0),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((1, hc, NK, D), lambda g_, i: (g_, 0, 0, 0),
                         memory_space=pltpu.VMEM)

    dq, dk, dv = pl.pallas_call(
        functools.partial(
            _largeq_bwd_kernel, scale=scale, hc=hc, p_drop=p_drop
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            qspec, qspec, kspec, kspec,
        ],
        out_specs=(qspec, kspec, kspec),
        out_shape=(
            jax.ShapeDtypeStruct((n_cells, hc, NQp, D), q.dtype),
            jax.ShapeDtypeStruct((n_cells, hc, NK, D), k.dtype),
            jax.ShapeDtypeStruct((n_cells, hc, NK, D), v.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((hc, NK, D), jnp.float32),
            pltpu.VMEM((hc, NK, D), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=12 * G * H * NQp * NK * D,
            bytes_accessed=4 * G * H * (3 * NQp * D + 2 * NK * D),
            transcendentals=G * H * NQp * NK,
        ),
    )(jnp.asarray(seed, jnp.int32).reshape(1), qh, gh, kh, vh)
    dq = dq.reshape(G, H, NQp, D)
    if pad_q:
        dq = dq[:, :, :NQ]
    return dq, dk.reshape(G, H, NK, D), dv.reshape(G, H, NK, D)


# ---------------------------------------------------------------------------
# public entry with custom VJP (flash backward per regime, XLA fallback)


def _regime(NQ, NK, key_mask):
    if NQ <= 512 and NK > NK_SMALL_LIMIT:
        return "smallq"
    if NK <= NK_SMALL_LIMIT and key_mask is None:
        return "largeq"
    return "xla"


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def fused_attention(q, k, v, key_mask):
    """Drop-in for ops.attention.masked_attention on TPU.

    q/k/v: (B, H, N*, Dh); key_mask: (B, NK) bool or None.
    """
    return _fused_fwd_impl(q, k, v, key_mask)[0]


def _smallq_params(NK):
    # VMEM budget: hc * (2 double-buffered K/V blocks + fp32 score
    # tile) must stay well under the ~16 MB scoped limit
    if NK > 4096:
        return 1024, 4
    if NK > 1024:
        return 2048, 4
    return 1024, 8


def _fused_fwd_impl(q, k, v, key_mask):
    """Returns (out, lse|None) — lse only in the small-Q regime."""
    B, H, NQ, D = q.shape
    NK = k.shape[2]
    scale = 1.0 / (D**0.5)
    regime = _regime(NQ, NK, key_mask)

    if regime == "smallq":
        mask = None if key_mask is None else key_mask.astype(jnp.int32)
        block_k, hc = _smallq_params(NK)
        out, lse = _smallq_attention(
            q, k, v, mask, scale=scale, block_k=block_k, heads_per_cell=hc
        )
        return out, lse
    if regime == "largeq":
        block_q, hc = (1024, 4) if NQ <= 4096 else (1024, 2)
        return _largeq_attention(
            q, k, v, scale=scale, block_q=block_q, heads_per_cell=hc
        ), None
    return _xla_attention(q, k, v, key_mask), None


def _fused_fwd(q, k, v, key_mask):
    out, lse = _fused_fwd_impl(q, k, v, key_mask)
    return out, (q, k, v, key_mask, out, lse)


def _xla_bwd(q, k, v, key_mask, g):
    # standard attention backward via recompute (fp32 probabilities)
    scale = 1.0 / (q.shape[-1] ** 0.5)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * scale
    if key_mask is not None:
        s = jnp.where(key_mask[:, None, None, :], s, -jnp.inf)
    m = jnp.max(s, axis=-1, keepdims=True)
    m = jnp.where(jnp.isfinite(m), m, 0.0)
    e = jnp.exp(s - m)
    if key_mask is not None:
        e = jnp.where(key_mask[:, None, None, :], e, 0.0)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    p = e / jnp.where(denom == 0, 1.0, denom)

    g32 = g.astype(jnp.float32)
    v32 = v.astype(jnp.float32)
    dp = jnp.einsum("bhqd,bhkd->bhqk", g32, v32)
    dv = jnp.einsum("bhqk,bhqd->bhkd", p, g32).astype(v.dtype)
    tmp = jnp.sum(dp * p, axis=-1, keepdims=True)
    ds = p * (dp - tmp) * scale
    dq = jnp.einsum("bhqk,bhkd->bhqd", ds, k.astype(jnp.float32)).astype(
        q.dtype
    )
    dk = jnp.einsum("bhqk,bhqd->bhkd", ds, q.astype(jnp.float32)).astype(
        k.dtype
    )
    return dq, dk, dv


def _fused_bwd(res, g):
    q, k, v, key_mask, out, lse = res
    B, H, NQ, D = q.shape
    NK = k.shape[2]
    scale = 1.0 / (D**0.5)
    regime = _regime(NQ, NK, key_mask)

    if regime == "smallq":
        mask = None if key_mask is None else key_mask.astype(jnp.int32)
        dq, dk, dv = _smallq_backward(
            q, k, v, mask, out, lse, g, scale=scale
        )
        return dq, dk, dv, None
    if regime == "largeq":
        dq, dk, dv = _largeq_backward(q, k, v, g, scale=scale)
        return dq, dk, dv, None
    dq, dk, dv = _xla_bwd(q, k, v, key_mask, g)
    return dq, dk, dv, None


fused_attention.defvjp(_fused_fwd, _fused_bwd)

# ---------------------------------------------------------------------------
# dropout-enabled variant (training path for attn_pdrop > 0)

# forward and backward MUST share these so the regenerated in-kernel
# dropout masks line up element-for-element
def _drop_smallq_params(dtype):
    # fp32 doubles every VMEM block; the backward at block_k=1024/hc=4
    # overflows the ~16 MB scoped limit by ~0.5 MB at 8K contexts, so
    # fp32 halves the K block (fwd and bwd both key off this helper —
    # the dropout tile partitioning stays coherent).
    if dtype == jnp.bfloat16:
        return dict(block_k=1024, heads_per_cell=4)
    return dict(block_k=512, heads_per_cell=4)


_DROP_LARGEQ = dict(block_q=1024, heads_per_cell=4)


def _xla_dropout_attention(q, k, v, key_mask, rate, rng):
    """Differentiable XLA fallback: masked softmax + post-softmax
    dropout (nn.Dropout semantics), used off-TPU / out-of-regime."""
    scale = 1.0 / (q.shape[-1] ** 0.5)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * scale
    if key_mask is not None:
        s = jnp.where(key_mask[:, None, None, :], s, -jnp.inf)
    m = jnp.max(s, axis=-1, keepdims=True)
    m = jnp.where(jnp.isfinite(m), m, 0.0)
    e = jnp.exp(s - m)
    if key_mask is not None:
        e = jnp.where(key_mask[:, None, None, :], e, 0.0)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    p = e / jnp.where(denom == 0, 1.0, denom)
    keep = jax.random.bernoulli(rng, 1.0 - rate, p.shape)
    p = jnp.where(keep, p / (1.0 - rate), 0.0).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _fused_dropout_op(q, k, v, key_mask, seed, rate):
    return _fused_dropout_fwd_impl(q, k, v, key_mask, seed, rate)[0]


def _fused_dropout_fwd_impl(q, k, v, key_mask, seed, rate):
    D = q.shape[-1]
    NQ = q.shape[2]
    NK = k.shape[2]
    scale = 1.0 / (D**0.5)
    regime = _regime(NQ, NK, key_mask)
    if regime == "smallq":
        mask = None if key_mask is None else key_mask.astype(jnp.int32)
        out, lse = _smallq_attention(
            q, k, v, mask, seed, scale=scale, p_drop=rate,
            **_drop_smallq_params(q.dtype),
        )
        return out, lse
    assert regime == "largeq", "xla regime handled by the caller"
    out = _largeq_attention(
        q, k, v, seed, scale=scale, p_drop=rate, **_DROP_LARGEQ
    )
    return out, None


def _fused_dropout_fwd(q, k, v, key_mask, seed, rate):
    out, lse = _fused_dropout_fwd_impl(q, k, v, key_mask, seed, rate)
    return out, (q, k, v, key_mask, seed, out, lse)


def _fused_dropout_bwd(rate, res, g):
    q, k, v, key_mask, seed, out, lse = res
    D = q.shape[-1]
    NQ = q.shape[2]
    NK = k.shape[2]
    scale = 1.0 / (D**0.5)
    regime = _regime(NQ, NK, key_mask)
    if regime == "smallq":
        mask = None if key_mask is None else key_mask.astype(jnp.int32)
        dq, dk, dv = _smallq_backward(
            q, k, v, mask, out, lse, g, seed, scale=scale, p_drop=rate,
            **_drop_smallq_params(q.dtype),
        )
    else:
        dq, dk, dv = _largeq_backward(
            q, k, v, g, seed, scale=scale, p_drop=rate, **_DROP_LARGEQ
        )
    return dq, dk, dv, None, None


_fused_dropout_op.defvjp(_fused_dropout_fwd, _fused_dropout_bwd)


def fused_dropout_attention(q, k, v, key_mask, rate, dropout_rng):
    """Training attention with post-softmax dropout on probabilities
    (nn.Dropout semantics). On TPU, both supported regimes run fully in
    the flash kernels with the dropout mask generated in-kernel
    (identical seed + tiling on the backward, so the same elements drop
    in both passes); the probability tensor never touches HBM. Off-TPU
    or out-of-regime falls back to the differentiable dense form.

    The dropout distribution is i.i.d. Bernoulli either way; the PRNG
    (hardware vs threefry) is not part of the algorithm.
    """
    if rate <= 0.0:
        return fused_attention(q, k, v, key_mask)
    regime = _regime(q.shape[2], k.shape[2], key_mask)
    if jax.default_backend() != "tpu" or regime == "xla":
        return _xla_dropout_attention(q, k, v, key_mask, rate, dropout_rng)
    seed = jax.random.bits(dropout_rng, (), jnp.uint32).astype(jnp.int32)
    return _fused_dropout_op(q, k, v, key_mask, seed, float(rate))
