"""Fused vocab-head + gumbel sampling kernel.

The decode hot loop ends with `head(ln_f(tokens)) -> sample_tokens`:
a (rows, 16384) fp32 logits tensor is written to HBM, then read ~3 more
times (exponential noise + argmax, logsumexp, chosen-prob gather). At
128f/16f decode shapes that tensor is ~1 GB and effective HBM bandwidth
on the target chip measures ~100-130 GB/s — the sampling machinery is
memory-bound, not compute-bound (PERFORMANCE.md).

This kernel streams the head matmul over vocab chunks on the MXU and
keeps everything else in VMEM: per-row running (max, sumexp) for the
logsumexp, and a running gumbel-argmax (the reference's
`argmax(softmax(l)/q)` with q ~ Exp(1) equals `argmax(l/T - log q)`,
transformer.py:826-889). Logits never touch HBM; outputs are just the
sampled ids and their probability under the temperature-scaled softmax.

Grid: (row_tiles, vocab_chunks) with rows OUTER: the x tile stays
resident while vocab chunks stream, and the per-row accumulators are
(row_tile, 1) scratch local to the current tile. (The transposed
vocab-outer design — stats for all rows in lane-major scratch — was
~30x slower in practice: the (D, vc) x (tr, D) contraction and the
sublane-axis argmax both lower badly off the MXU/VPU fast paths.)
The weight matrix re-streams once per row tile: keep row_tile large
(1024 rows -> 16 W passes = ~0.5 GB at 16K rows, ~5 ms at this chip's
measured ~100 GB/s).

Noise: the in-kernel hardware PRNG (`pltpu.prng_*`), seeded per
(chunk, row-tile) cell from a caller-supplied uint32 — i.i.d.
Exponential(1) draws either way; the PRNG choice is not part of the
algorithm (the reference uses torch's Philox). Pass a fresh seed per
step (fold the step index into the JAX key and take 32 bits). NOTE:
interpret mode's PRNG is a zeros stub — noise-dependent behavior is
only testable on real TPU.

Covers the no-top-k sampling paths (the 16f recipe, gibbs revise,
bootstrap); top-k sampling keeps ops/sampling.py:sample_topk_tokens.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a, b):
    return -(-a // b)


def _head_sample_kernel(
    seed_ref, x_ref, w_ref,
    sample_ref, prob_ref,
    m_ref, s_ref, best_ref, besti_ref, bestl_ref,
    *, inv_temp: float, valid_v: int | None,
):
    i = pl.program_id(0)  # row tile (outer — x tile stays resident)
    j = pl.program_id(1)  # vocab chunk (inner — accumulators are local)
    nj = pl.num_programs(1)
    tr = x_ref.shape[0]
    vc = w_ref.shape[1]

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full((tr, 1), -1e30, jnp.float32)
        s_ref[:] = jnp.zeros((tr, 1), jnp.float32)
        best_ref[:] = jnp.full((tr, 1), -1e30, jnp.float32)
        besti_ref[:] = jnp.zeros((tr, 1), jnp.int32)
        bestl_ref[:] = jnp.zeros((tr, 1), jnp.float32)

    l = jax.lax.dot_general(
        x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * inv_temp  # (TR, VC)
    if valid_v is not None:
        # W was padded to a lane-aligned multiple of vc; padding columns
        # must never win the argmax nor contribute to the logsumexp
        col_g = j * vc + jax.lax.broadcasted_iota(jnp.int32, (tr, vc), 1)
        l = jnp.where(col_g < valid_v, l, -1e30)

    # Exp(1) noise: q = -log(U). uint32 -> f32 casts are unsupported in
    # Mosaic; splice the top 23 bits into a [1, 2) mantissa instead,
    # then shift to strict (0, 1) so q stays finite and positive.
    pltpu.prng_seed(seed_ref[0] + i * nj + j)
    bits = pltpu.bitcast(pltpu.prng_random_bits((tr, vc)), jnp.uint32)
    fbits = (bits >> 9) | jnp.uint32(0x3F800000)
    u = (pltpu.bitcast(fbits, jnp.float32) - 1.0) + 2.9802322e-8  # 2^-25
    q = -jnp.log(u)
    perturbed = l - jnp.log(q)

    # running gumbel-argmax (lane-axis reductions)
    c_best = jnp.max(perturbed, axis=1, keepdims=True)  # (TR, 1)
    c_arg = jnp.argmax(perturbed, axis=1).reshape(tr, 1)
    # (gather by c_arg doesn't lower in Mosaic; masked max instead)
    col = jax.lax.broadcasted_iota(jnp.int32, (tr, vc), 1)
    c_logit = jnp.max(
        jnp.where(col == c_arg, l, -1e30), axis=1, keepdims=True
    )
    prev_best = best_ref[:]
    better = c_best > prev_best
    best_ref[:] = jnp.where(better, c_best, prev_best)
    besti_ref[:] = jnp.where(better, c_arg + j * vc, besti_ref[:])
    bestl_ref[:] = jnp.where(better, c_logit, bestl_ref[:])

    # running logsumexp
    m_prev = m_ref[:]
    m_cur = jnp.max(l, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    s_ref[:] = (
        s_ref[:] * jnp.exp(m_prev - m_new)
        + jnp.sum(jnp.exp(l - m_new), axis=1, keepdims=True)
    )
    m_ref[:] = m_new

    @pl.when(j == nj - 1)
    def _():
        lse = m_ref[:] + jnp.log(s_ref[:])
        # outputs are lane-major (1, tr) blocks, one per row tile (a
        # shared whole-(1, Rp) block written via pl.ds would be a
        # cross-iteration dependency on the parallel row axis — megacore
        # chips keep per-core copies and could clobber each other)
        sample_ref[:, :] = besti_ref[:].reshape(1, tr)
        prob_ref[:, :] = jnp.exp(bestl_ref[:] - lse).reshape(1, tr)


def _head_topk_sample_kernel(
    seed_ref, x_ref, w_ref,
    sample_ref, prob_ref,
    bufv_ref, bufp_ref, bufi_ref,
    *, inv_temp: float, k: int, valid_v: int | None,
):
    """Streaming exact top-k + gumbel sampling.

    Per row tile, a (TR, k) buffer holds the running top-k SCALED logits
    sorted descending, with each entry's gumbel-perturbed value and
    global index as payload. Per vocab chunk, candidates that beat the
    current kth-best are extracted one at a time (masked max) and
    sorted-inserted — after the first chunk only ~k/j candidates per row
    survive the threshold, so the while-loop runs O(k·ln nchunks) total
    iterations instead of k per chunk. At the last chunk the buffer IS
    the top-k set: winner = argmax of perturbed among the k entries
    (sampling from the renormalized top-k softmax restricted to the set
    preserves relative probabilities), threshold and logsumexp come from
    the same k values. Exact up to ties at the kth value (the reference
    keeps all tied entries; measure-zero for continuous logits — same
    caveat as ops/sampling.py:sample_topk_tokens)."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    tr = x_ref.shape[0]
    vc = w_ref.shape[1]

    @pl.when(j == 0)
    def _():
        bufv_ref[:] = jnp.full((tr, k), -1e30, jnp.float32)
        bufp_ref[:] = jnp.full((tr, k), -1e30, jnp.float32)
        bufi_ref[:] = jnp.zeros((tr, k), jnp.int32)

    l = jax.lax.dot_general(
        x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * inv_temp  # (TR, VC) scaled logits
    col = jax.lax.broadcasted_iota(jnp.int32, (tr, vc), 1)
    if valid_v is not None:
        l = jnp.where(col + j * vc < valid_v, l, -1e30)

    pltpu.prng_seed(seed_ref[0] + i * nj + j)
    bits = pltpu.bitcast(pltpu.prng_random_bits((tr, vc)), jnp.uint32)
    fbits = (bits >> 9) | jnp.uint32(0x3F800000)
    u = (pltpu.bitcast(fbits, jnp.float32) - 1.0) + 2.9802322e-8
    pert = l - jnp.log(-jnp.log(u))  # l/T - log q, q ~ Exp(1)

    slot = jax.lax.broadcasted_iota(jnp.int32, (tr, k), 1)

    def cond(c):
        it, work, bv, bp, bi = c
        mrow = jnp.max(work, axis=1, keepdims=True)
        return jnp.logical_and(
            it < k, jnp.max(mrow - bv[:, k - 1:k]) > 0
        )

    def body(c):
        it, work, bv, bp, bi = c
        pv = jnp.max(work, axis=1, keepdims=True)  # (TR, 1)
        valid = pv > bv[:, k - 1:k]
        arg = jnp.argmax(work, axis=1).reshape(tr, 1)
        sel = col == arg
        pp = jnp.max(jnp.where(sel, pert, -1e30), axis=1, keepdims=True)
        gidx = arg + j * vc
        pos = jnp.sum((bv >= pv).astype(jnp.int32), axis=1, keepdims=True)
        sv = jnp.concatenate([bv[:, :1], bv[:, :-1]], axis=1)
        sp = jnp.concatenate([bp[:, :1], bp[:, :-1]], axis=1)
        si = jnp.concatenate([bi[:, :1], bi[:, :-1]], axis=1)
        nv = jnp.where(slot < pos, bv, jnp.where(slot == pos, pv, sv))
        np_ = jnp.where(slot < pos, bp, jnp.where(slot == pos, pp, sp))
        ni = jnp.where(slot < pos, bi, jnp.where(slot == pos, gidx, si))
        bv = jnp.where(valid, nv, bv)
        bp = jnp.where(valid, np_, bp)
        bi = jnp.where(valid, ni, bi)
        work = jnp.where(sel & valid, -1e30, work)
        return it + 1, work, bv, bp, bi

    _, _, bv, bp, bi = jax.lax.while_loop(
        cond, body,
        (jnp.int32(0), l, bufv_ref[:], bufp_ref[:], bufi_ref[:]),
    )
    bufv_ref[:] = bv
    bufp_ref[:] = bp
    bufi_ref[:] = bi

    @pl.when(j == nj - 1)
    def _():
        bv = bufv_ref[:]
        bp = bufp_ref[:]
        bi = bufi_ref[:]
        warg = jnp.argmax(bp, axis=1).reshape(tr, 1)
        wsel = slot == warg
        wl = jnp.max(jnp.where(wsel, bv, -1e30), axis=1, keepdims=True)
        wi = jnp.max(jnp.where(wsel, bi, -1), axis=1, keepdims=True)
        mmax = bv[:, :1]
        lse = mmax + jnp.log(
            jnp.sum(jnp.exp(bv - mmax), axis=1, keepdims=True)
        )
        sample_ref[:, :] = wi.reshape(1, tr)
        prob_ref[:, :] = jnp.exp(wl - lse).reshape(1, tr)


def _head_topk_sample_v2_kernel(
    seed_ref, x_ref, w_ref,
    sample_ref, prob_ref, ovf_ref,
    bufv_ref, bufi_ref, rem_ref,
    *, inv_temp: float, k: int, m: int, sub: int, valid_v: int | None,
):
    """Fixed-unroll streaming top-k (v2): no data-dependent control flow.

    v1's per-chunk candidate extraction ran a `while` loop with a scalar
    condition per iteration, which defeats Mosaic's chunk-grid DMA
    pipelining (PERFORMANCE.md "Tried and rejected"). v2 replaces it
    with straight-line vectorized code:

      * per vocab chunk, extract the chunk's top-`m` (value, index)
        pairs with m unrolled masked-max passes (m is static);
      * rank-merge those m candidates into the running sorted top-k
        buffer with an unrolled all-pairs rank pass (ranks are unique
        because ties break on the global index);
      * keep a per-row running max of each chunk's REMAINING (not
        extracted) values. At the end, `overflow = remaining_max >
        kth_value` detects exactly the rows where some chunk held more
        than m of the row's true top-k (strict >, so kth-value ties
        don't flag) — the caller falls back to the unfused exact path
        for that batch via lax.cond.
      * noise is drawn only for the k survivors at the last chunk
        (v1 perturbed every logit — the full-vocab PRNG + log work is
        most of the fused kernels' non-matmul cost).

    With vocab uniformly ~spread top-k (VQ code ids carry no order),
    the count of top-k members per chunk is ~Poisson(k*vc/V); m is
    chosen so the per-step fallback probability is <~1%.
    """
    i = pl.program_id(0)
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    tr = x_ref.shape[0]
    vc = w_ref.shape[1]

    @pl.when(j == 0)
    def _():
        bufv_ref[:] = jnp.full((tr, k), -1e30, jnp.float32)
        bufi_ref[:] = jnp.zeros((tr, k), jnp.int32)
        rem_ref[:] = jnp.full((tr, 1), -1e30, jnp.float32)

    l = jax.lax.dot_general(
        x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * inv_temp  # (TR, VC) scaled logits
    col = jax.lax.broadcasted_iota(jnp.int32, (tr, vc), 1)
    if valid_v is not None:
        l = jnp.where(col + j * vc < valid_v, l, -1e30)

    # top-m of each `sub`-wide slice: m unrolled (max, first-index,
    # mask) passes per slice. Ties take the lowest column (masked-min
    # over ids), and masking is by column — equal values are extracted
    # one per pass, not together. Extraction granularity (`sub`, which
    # sets the miss probability and total extraction work m*V) is
    # decoupled from merge granularity (`vc`, which sets how many
    # rank-merges amortize the per-merge k+candidates unroll).
    cand_v = []
    cand_i = []
    rem = rem_ref[:]
    for h in range(vc // sub):
        work = l[:, h * sub:(h + 1) * sub]
        colh = col[:, h * sub:(h + 1) * sub]
        for _ in range(m):
            v = jnp.max(work, axis=1, keepdims=True)  # (TR, 1)
            idx = jnp.min(
                jnp.where(work == v, colh, jnp.int32(2**30)),
                axis=1, keepdims=True,
            )
            cand_v.append(v)
            cand_i.append(idx + j * vc)
            work = jnp.where(colh == idx, -1e30, work)
        rem = jnp.maximum(rem, jnp.max(work, axis=1, keepdims=True))
    rem_ref[:] = rem
    nc = len(cand_v)  # (vc // sub) * m candidates per chunk
    cv = jnp.concatenate(cand_v, axis=1)  # (TR, nc)
    ci = jnp.concatenate(cand_i, axis=1).astype(jnp.int32)

    # rank-merge candidates into the buffer. rank(e) = #elements
    # strictly ahead of e under (value desc, global index asc) — unique
    # because indices are unique; dummy (-1e30, 0) entries may collide
    # but only ever scatter -1e30 over -1e30.
    allv = jnp.concatenate([bufv_ref[:], cv], axis=1)  # (TR, k+nc)
    alli = jnp.concatenate([bufi_ref[:], ci], axis=1)
    rank = jnp.zeros((tr, k + nc), jnp.int32)
    for t in range(k + nc):
        vt = allv[:, t:t + 1]
        it = alli[:, t:t + 1]
        ahead = (vt > allv) | ((vt == allv) & (it < alli))
        rank = rank + ahead.astype(jnp.int32)
    slot = jax.lax.broadcasted_iota(jnp.int32, (tr, k), 1)
    nbv = jnp.full((tr, k), -1e30, jnp.float32)
    nbi = jnp.zeros((tr, k), jnp.int32)
    for t in range(k + nc):
        put = slot == rank[:, t:t + 1]  # one-hot when rank < k
        nbv = jnp.where(put, allv[:, t:t + 1], nbv)
        nbi = jnp.where(put, alli[:, t:t + 1], nbi)
    bufv_ref[:] = nbv  # sorted descending by construction
    bufi_ref[:] = nbi

    @pl.when(j == nj - 1)
    def _():
        bv = bufv_ref[:]
        bi = bufi_ref[:]
        tau = bv[:, k - 1:k]
        ovf = (rem_ref[:] > tau).astype(jnp.int32)
        # Exp(1) noise for the k survivors only. Draw >=128 lanes
        # (sub-128 PRNG lane dims produce replicated noise) and slice.
        pltpu.prng_seed(seed_ref[0] + i)
        nl = max(128, k)
        bits = pltpu.bitcast(pltpu.prng_random_bits((tr, nl)), jnp.uint32)
        fbits = (bits >> 9) | jnp.uint32(0x3F800000)
        u = (pltpu.bitcast(fbits, jnp.float32) - 1.0) + 2.9802322e-8
        pert = bv - jnp.log(-jnp.log(u[:, :k]))  # l/T - log q, q~Exp(1)
        pv = jnp.max(pert, axis=1, keepdims=True)
        slotk = jax.lax.broadcasted_iota(jnp.int32, (tr, k), 1)
        wslot = jnp.min(
            jnp.where(pert == pv, slotk, jnp.int32(2**30)),
            axis=1, keepdims=True,
        )
        wsel = slotk == wslot
        wl = jnp.max(jnp.where(wsel, bv, -1e30), axis=1, keepdims=True)
        wi = jnp.max(jnp.where(wsel, bi, -1), axis=1, keepdims=True)
        mmax = bv[:, :1]
        lse = mmax + jnp.log(
            jnp.sum(jnp.exp(bv - mmax), axis=1, keepdims=True)
        )
        sample_ref[:, :] = wi.reshape(1, tr)
        prob_ref[:, :] = jnp.exp(wl - lse).reshape(1, tr)
        ovf_ref[:, :] = ovf.reshape(1, tr)


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "temperature", "row_tile", "vocab_chunk", "m", "sub"
    ),
)
def fused_head_topk_sample_v2(
    x: jax.Array,  # (R, D) post-ln_f tokens (any float dtype)
    w: jax.Array,  # (D, V) head kernel
    seed: jax.Array,  # () uint32/int32 — per-step seed
    k: int,
    *,
    temperature: float = 1.0,
    row_tile: int = 512,
    vocab_chunk: int = 1024,
    m: int = 14,
    sub: int = 1024,
):
    """Streaming top-k + gumbel sampling, v2 (fixed unroll + overflow
    flag). Returns (samples (R,) int32, chosen_prob (R,) fp32,
    overflow (R,) int32). `overflow[r] == 1` means row r's top-k set
    may be incomplete (some `sub`-wide vocab slice held more than `m`
    of the row's true top-k — detection is exact up to kth-value ties)
    and the caller must recompute that batch on the unfused exact path
    (ops/sampling.py:sample_topk_tokens); see
    sampler/decode.py:_sample_compact_bucket for the lax.cond wiring.

    Tunables: `sub` sets the extraction granularity (miss probability
    ~ Poisson(k*sub/V) tail past m, total extraction work m*V). The
    m=14 default keeps the whole-BATCH fallback probability <~1% of
    steps at the canonical 128f shapes (k=32, sub=1024, V=16384 →
    Poisson(2) per slice: P(>14) ~ 4e-9; 65536 rows x 16 slices →
    ~0.4%/step) — m=12 would be ~5%/step at 16384 rows and each
    fallback step pays fused + unfused serially;
    `vocab_chunk` sets the merge granularity (one rank-merge of
    k + m*vc/sub candidates per chunk — wider chunks amortize the
    per-merge unroll); `row_tile` trades VMEM footprint against W
    re-streams.

    Distribution-identical to the unfused path on non-overflowing rows
    (same top-k set, gumbel among the k, chosen_prob = filtered
    softmax prob; reference transformer.py:843-895 semantics), with
    i.i.d. Exp(1) noise from the in-kernel hardware PRNG.
    """
    R, D = x.shape
    V = w.shape[1]
    k = int(min(k, V))
    tr = min(row_tile, R)
    tr = max(128, -(-tr // 128) * 128)
    pad_r = _cdiv(R, tr) * tr - R
    if pad_r:
        x = jnp.pad(x, ((0, pad_r), (0, 0)))
    Rp = x.shape[0]
    Vp = -(-V // 128) * 128
    vc = min(vocab_chunk, Vp)
    sub = int(min(sub, vc))
    vc = (vc // sub) * sub  # merge granularity: whole sub slices
    m = int(min(m, sub))
    Vp = _cdiv(Vp, vc) * vc
    if Vp != V:
        w = jnp.pad(w, ((0, 0), (0, Vp - V)))
    w = w.astype(x.dtype)
    grid = (Rp // tr, Vp // vc)

    samples, probs, ovf = pl.pallas_call(
        functools.partial(
            _head_topk_sample_v2_kernel,
            inv_temp=1.0 / (float(temperature) + 1e-8),
            k=k,
            m=m,
            sub=sub,
            valid_v=None if Vp == V else V,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tr, D), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, vc), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        # outputs blocked by ROW TILE (index map i) so the parallel row
        # axis never revisits a shared block — on megacore chips a
        # shared (1, Rp) block written via pl.ds from every tile would
        # be a cross-core clobber hazard
        out_specs=(
            pl.BlockSpec((1, tr), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tr), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tr), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, Rp), jnp.int32),
            jax.ShapeDtypeStruct((1, Rp), jnp.float32),
            jax.ShapeDtypeStruct((1, Rp), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((tr, k), jnp.float32),  # top-k scaled logits
            pltpu.VMEM((tr, k), jnp.int32),    # their global indices
            pltpu.VMEM((tr, 1), jnp.float32),  # running non-extracted max
        ],
        # The unrolled extraction + rank-merge holds several (tr, sub)
        # fp32 temporaries live at once; the 16 MiB default scoped-vmem
        # stack rejects the kernel at production shapes (observed
        # 65.65M at tr=1024 on v5e, whose VMEM is 128 MiB). Rows are
        # independent; the vocab axis carries the running buffers.
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Rp * D * Vp,
            bytes_accessed=(Vp // vc) * Rp * D * 2 + D * Vp * 2 + Rp * 12,
            transcendentals=2 * Rp * k,
        ),
    )(jnp.asarray(seed, jnp.int32).reshape(1), x, w)
    samples = samples[0]
    probs = probs[0]
    ovf = ovf[0]
    if pad_r:
        samples = samples[:R]
        probs = probs[:R]
        ovf = ovf[:R]
    return samples, probs, ovf


@functools.partial(
    jax.jit,
    static_argnames=("k", "temperature", "row_tile", "vocab_chunk"),
)
def fused_head_topk_sample(
    x: jax.Array,  # (R, D) post-ln_f tokens (any float dtype)
    w: jax.Array,  # (D, V) head kernel
    seed: jax.Array,  # () uint32/int32 — per-step seed
    k: int,
    *,
    temperature: float = 1.0,
    row_tile: int = 1024,
    vocab_chunk: int = 512,
):
    """(samples (R,) int32, chosen_prob (R,) fp32) drawn from the
    top-k-filtered softmax(x @ w / temperature) per row — logits never
    touch HBM (reference top_k_logits + gumbel draw,
    transformer.py:843-895).

    STATUS: measured 1.2-1.5x SLOWER than the unfused
    matmul + sample_topk_tokens path at 128f shapes in a same-window
    A/B on the target chip (the data-dependent extraction while-loop
    defeats Mosaic's chunk pipelining); the decode engine therefore
    keeps top-k decoding unfused (sampler/decode.py). Kept as a
    correct, tested implementation for future revisit
    (PERFORMANCE.md "Tried and rejected")."""
    R, D = x.shape
    V = w.shape[1]
    k = int(min(k, V))
    tr = min(row_tile, R)
    tr = max(128, -(-tr // 128) * 128)
    pad_r = _cdiv(R, tr) * tr - R
    if pad_r:
        x = jnp.pad(x, ((0, pad_r), (0, 0)))
    Rp = x.shape[0]
    Vp = -(-V // 128) * 128
    vc = min(vocab_chunk, Vp)
    Vp = _cdiv(Vp, vc) * vc
    if Vp != V:
        w = jnp.pad(w, ((0, 0), (0, Vp - V)))
    w = w.astype(x.dtype)
    grid = (Rp // tr, Vp // vc)

    samples, probs = pl.pallas_call(
        functools.partial(
            _head_topk_sample_kernel,
            inv_temp=1.0 / (float(temperature) + 1e-8),
            k=k,
            valid_v=None if Vp == V else V,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tr, D), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, vc), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tr), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tr), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, Rp), jnp.int32),
            jax.ShapeDtypeStruct((1, Rp), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((tr, k), jnp.float32),  # top-k scaled logits
            pltpu.VMEM((tr, k), jnp.float32),  # their perturbed values
            pltpu.VMEM((tr, k), jnp.int32),    # their global indices
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * Rp * D * Vp,
            bytes_accessed=(Vp // vc) * Rp * D * 2 + D * Vp * 2 + Rp * 8,
            transcendentals=2 * Rp * Vp,
        ),
    )(jnp.asarray(seed, jnp.int32).reshape(1), x, w)
    samples = samples[0]
    probs = probs[0]
    if pad_r:
        samples = samples[:R]
        probs = probs[:R]
    return samples, probs


@functools.partial(
    jax.jit,
    static_argnames=("temperature", "row_tile", "vocab_chunk"),
)
def fused_head_sample(
    x: jax.Array,  # (R, D) post-ln_f tokens (any float dtype)
    w: jax.Array,  # (D, V) head kernel
    seed: jax.Array,  # () uint32/int32 — per-step seed
    *,
    temperature: float = 1.0,
    row_tile: int = 1024,
    vocab_chunk: int = 512,
):
    """Returns (samples (R,) int32, chosen_prob (R,) fp32) sampled from
    softmax(x @ w / temperature) per row, without materializing logits."""
    R, D = x.shape
    V = w.shape[1]
    tr = min(row_tile, R)
    # lane-width alignment: rows ride the lane axis of the transposed
    # tile, and sub-128 PRNG lane dims produce replicated noise
    tr = max(128, -(-tr // 128) * 128)
    pad_r = _cdiv(R, tr) * tr - R
    if pad_r:
        x = jnp.pad(x, ((0, pad_r), (0, 0)))
    Rp = x.shape[0]
    # lane-align the vocab axis and make the chunk width divide it; any
    # vocab size works — padding columns are masked to -1e30 in-kernel
    Vp = -(-V // 128) * 128
    vc = min(vocab_chunk, Vp)
    Vp = _cdiv(Vp, vc) * vc
    if Vp != V:
        w = jnp.pad(w, ((0, 0), (0, Vp - V)))
    w = w.astype(x.dtype)
    n_tiles = Rp // tr
    grid = (n_tiles, Vp // vc)

    samples, probs = pl.pallas_call(
        functools.partial(
            _head_sample_kernel,
            inv_temp=1.0 / (float(temperature) + 1e-8),
            valid_v=None if Vp == V else V,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tr, D), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, vc), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        # outputs are small lane-major vectors, blocked (1, tr) per row
        # tile (a (Rp, 1) column layout would pad every row to 128
        # lanes; a shared whole-(1, Rp) block would be revisited across
        # row tiles — a megacore clobber hazard)
        out_specs=(
            pl.BlockSpec((1, tr), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tr), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, Rp), jnp.int32),
            jax.ShapeDtypeStruct((1, Rp), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((tr, 1), jnp.float32),  # running max
            pltpu.VMEM((tr, 1), jnp.float32),  # running sumexp
            pltpu.VMEM((tr, 1), jnp.float32),  # best perturbed
            pltpu.VMEM((tr, 1), jnp.int32),    # best index
            pltpu.VMEM((tr, 1), jnp.float32),  # best logit
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * Rp * D * Vp,
            bytes_accessed=(Vp // vc) * Rp * D * 2 + D * Vp * 2 + Rp * 8,
            transcendentals=2 * Rp * Vp,
        ),
    )(jnp.asarray(seed, jnp.int32).reshape(1), x, w)
    samples = samples[0]
    probs = probs[0]
    if pad_r:
        samples = samples[:R]
        probs = probs[:R]
    return samples, probs
