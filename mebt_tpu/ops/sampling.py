"""Token sampling and confidence-based mask promotion, device-side.

Behavioural reference: mebt/transformer.py:826-910 (gumbel_sort,
sample_from_logits, top_k_logits, top_p_probs) and
mebt/mask_sampler.py:178-246 (gumbel_top_k, generate_next_mask).

Distribution-level parity notes:
  * `gumbel_sort` sampling — the reference draws Exponential(1) noise
    and takes argmax(prob / noise); this IS the Gumbel-max trick, so
    sampling a categorical by `prob / Exp(1)` argmax is reproduced
    verbatim (same math, same distribution).
  * `gumbel_top_k` promotion — perturbed confidence `p / q**ctemp`
    with q ~ Exp(1), descending sort, take the first k. We reproduce it
    with an argsort-based exact ranking so that "top k among targets"
    works with a *dynamic* k inside jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = jnp.finfo(jnp.float32).min


def sample_topk_tokens(
    rng: jax.Array,
    logits: jax.Array,
    k: int,
    temperature: float,
):
    """Sample from the top-k-filtered softmax with the minimum number of
    (..., V) memory passes.

    `lax.top_k` VALUES-only lowers to the fast single-pass TPU TopK;
    asking for indices forces a variadic full sort (~6x slower at 128f
    decode shapes, where sampling is HBM-bound). So: take the k values,
    gumbel-argmax among the k (the filtered-out entries are -inf and
    could never win), and recover the chosen token id with one
    equality-search pass over the logits. Two O(V) passes total, and
    the noise draw / logsumexp shrink from (..., V) to (..., k) —
    this removed ~95 ms/step from the 128f confidence decode.

    Distribution-identical to `top_k_logits` + full-vocab gumbel argmax
    except on exact float ties (equality recovery takes the lowest
    index; measure-zero for continuous logits).

    The three O(V) passes (matmul output write, TopK read, equality
    read) run in the INPUT dtype: pass bf16 logits (the head matmul's
    native output — logits_head's fp32 cast only upcasts these exact
    values) and the HBM traffic halves with bit-identical results,
    because bf16->fp32 is monotone and exact (top-k set, argmax index
    and selected values are all unchanged). Temperature scaling and the
    softmax among the k values always run in fp32.

    Returns (samples, chosen_prob) with chosen_prob the probability of
    the sampled token under the filtered softmax (reference
    transformer.py:843-889 semantics).
    """
    *lead, V = logits.shape
    flat = logits.reshape(-1, V)  # 3-D TopK lowers ~4x slower on TPU
    vals = jax.lax.top_k(flat, int(k))[0]  # (rows, k), values only
    valsf = vals.astype(jnp.float32) / (temperature + 1e-8)
    q = jax.random.exponential(rng, valsf.shape, dtype=jnp.float32)
    j = jnp.argmax(valsf - jnp.log(q), axis=-1)[..., None]
    chosen = jnp.take_along_axis(vals, j, axis=-1)  # (rows, 1), input dtype
    samples = jnp.argmax(flat == chosen, axis=-1).astype(jnp.int32)
    lse = jax.scipy.special.logsumexp(valsf, axis=-1)
    chosen_prob = jnp.exp(
        jnp.take_along_axis(valsf, j, axis=-1)[..., 0] - lse
    )
    return samples.reshape(lead), chosen_prob.reshape(lead)


def top_k_logits(logits: jax.Array, k: int, approx: bool = False) -> jax.Array:
    """Keep the k largest logits per row, set the rest to -inf.

    Reference: transformer.py:891-895. `k` is static.

    The threshold uses VALUES-only `lax.top_k`, which lowers to the fast
    single-pass TPU TopK (asking for indices too forces a ~6x slower
    variadic sort). `approx=True` keeps the recall-0.99 approx_max_k
    variant, which may rarely keep a few extra / drop a few boundary
    tokens. NOTE: the hot decode paths bypass this filter entirely via
    `sample_topk_tokens`, which never materializes the filtered array.
    """
    if approx:
        kth = jax.lax.approx_max_k(logits, k, recall_target=0.99)[0][..., -1:]
    else:
        kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < kth, NEG_INF, logits)


def top_p_probs(probs: jax.Array, p: float) -> jax.Array:
    """Nucleus filtering on probabilities (reference transformer.py:898-910).

    Sort descending, zero out tokens once the cumulative probability has
    reached p (the first token crossing the threshold is kept), then
    renormalize.
    """
    sorted_probs = jnp.sort(probs, axis=-1)[..., ::-1]
    cum = jnp.cumsum(sorted_probs, axis=-1)
    remove_sorted = cum >= p
    # shift right: keep the first token that crosses the threshold
    remove_sorted = jnp.concatenate(
        [jnp.zeros_like(remove_sorted[..., :1]), remove_sorted[..., :-1]],
        axis=-1,
    )
    # Value-threshold formulation: a token is removed iff its prob is
    # strictly below the smallest kept sorted prob. Equivalent to the
    # reference's scatter-back except on exact float ties (measure-zero
    # for continuous logits).
    min_kept = jnp.min(
        jnp.where(remove_sorted, jnp.inf, sorted_probs), axis=-1, keepdims=True
    )
    out = jnp.where(probs < min_kept, 0.0, probs)
    return out / jnp.sum(out, axis=-1, keepdims=True)


def sample_tokens(
    rng: jax.Array,
    logits: jax.Array,
    temperature: float = 1.0,
    top_k: int | None = None,
    top_p: float | None = None,
    need_probs: bool = False,
    approx_top_k: bool = False,
    noise: jax.Array | None = None,
):
    """Sample token ids; returns (samples, chosen_prob, probs|None).

    Fast path (no top_p, no full probs needed): the reference's
    `argmax(softmax(l)/q)` with q ~ Exp(1) equals
    `argmax(l/temp - log q)` for the SAME noise draw (log-softmax only
    shifts each row by a constant), so the (B, N, V) probability tensor
    is never materialized — at 16x1024x16384 fp32 that saves ~2 GB of
    HBM traffic per decode step. chosen_prob comes from a logsumexp.

    `noise` (optional, (..., V) Exp(1) draws) replaces the internal PRNG
    — used by the pipeline parity tests to share gumbel noise with the
    reference implementation; forces the probability-materializing path.
    """
    if noise is not None:
        scaled = logits.astype(jnp.float32) / (temperature + 1e-8)
        if top_k is not None:
            scaled = top_k_logits(scaled, int(top_k))
        probs = jax.nn.softmax(scaled, axis=-1)
        if top_p is not None:
            probs = top_p_probs(probs, float(top_p))
        perturbed = jnp.where(probs > 0, probs / noise, 0.0)
        samples = jnp.argmax(perturbed, axis=-1).astype(jnp.int32)
        chosen_prob = jnp.take_along_axis(
            probs, samples[..., None], axis=-1
        )[..., 0]
        return samples, chosen_prob, probs
    if (
        top_k is not None
        and top_p is None
        and not need_probs
        and not approx_top_k
    ):
        samples, chosen_prob = sample_topk_tokens(
            rng, logits, int(top_k), temperature
        )
        return samples, chosen_prob, None

    logits = logits.astype(jnp.float32) / (temperature + 1e-8)
    if top_k is not None:
        logits = top_k_logits(logits, int(top_k), approx=approx_top_k)

    if top_p is None and not need_probs:
        q = jax.random.exponential(rng, logits.shape, dtype=jnp.float32)
        samples = jnp.argmax(logits - jnp.log(q), axis=-1).astype(jnp.int32)
        lse = jax.scipy.special.logsumexp(logits, axis=-1)
        chosen_logit = jnp.take_along_axis(
            logits, samples[..., None], axis=-1
        )[..., 0]
        chosen_prob = jnp.exp(chosen_logit - lse)
        return samples, chosen_prob, None

    probs = jax.nn.softmax(logits, axis=-1)
    if top_p is not None:
        probs = top_p_probs(probs, float(top_p))
    q = jax.random.exponential(rng, probs.shape, dtype=jnp.float32)
    perturbed = jnp.where(probs > 0, probs / q, 0.0)
    samples = jnp.argmax(perturbed, axis=-1).astype(jnp.int32)
    chosen_prob = jnp.take_along_axis(
        probs, samples[..., None], axis=-1
    )[..., 0]
    return samples, chosen_prob, probs


def sample_from_logits(
    rng: jax.Array,
    logits: jax.Array,
    temperature: float = 1.0,
    top_k: int | None = None,
    top_p: float | None = None,
):
    """Sample token ids and return (samples, chosen_prob).

    Reference: transformer.py:843-889. Softmax in fp32; the NaN guard of
    the reference is unnecessary here (logits are finite by
    construction) but the -inf handling after top-k matches.

    Returns:
      samples: (...,) int32 token ids.
      probs: (..., V) post-filter probabilities (the reference returns
        these for confidence scoring).
    """
    logits = logits.astype(jnp.float32) / (temperature + 1e-8)
    if top_k is not None:
        logits = top_k_logits(logits, int(top_k))
    probs = jax.nn.softmax(logits, axis=-1)
    if top_p is not None:
        probs = top_p_probs(probs, float(top_p))

    # Gumbel-max via Exponential(1) division (reference gumbel_sort).
    q = jax.random.exponential(rng, probs.shape, dtype=jnp.float32)
    perturbed = jnp.where(probs > 0, probs / q, 0.0)
    samples = jnp.argmax(perturbed, axis=-1).astype(jnp.int32)
    return samples, probs


def exact_rank_desc(values: jax.Array) -> jax.Array:
    """rank[i] = position of element i in a descending sort of `values`
    (0 = largest). Ties broken by index (stable argsort). The rank array
    is the inverse permutation of the sort order — computed with ONE
    variadic sort plus an O(N) scatter (inverting a permutation needs no
    second sort; argsort lowers to a full variadic sort on TPU, the
    single most expensive op in the promotion path)."""
    order = jnp.argsort(-values, axis=-1, stable=True)
    N = values.shape[-1]
    flat_order = order.reshape(-1, N)
    rows = jnp.arange(flat_order.shape[0])[:, None]
    ranks = jnp.zeros_like(flat_order).at[rows, flat_order].set(
        jnp.broadcast_to(jnp.arange(N), flat_order.shape), mode="drop"
    )
    return ranks.reshape(order.shape)


def promote_targets(
    rng: jax.Array,
    scores: jax.Array,
    tgt_mask: jax.Array,
    n_new: jax.Array,
    context_temperature: jax.Array,
    random_scores: bool = False,
    noise: jax.Array | None = None,
):
    """Promote the n_new most-confident targets to contexts.

    Masked reformulation of reference mask_sampler.py:189-237: normalize
    scores over targets, perturb by Exp(1)**ctemp, and flip the top
    `n_new` target positions to context.

    Args:
      rng: PRNG key.
      scores: (B, N) confidence of the sampled token per position
        (ignored at non-target positions).
      tgt_mask: (B, N) bool, True at (still-masked) target positions.
      n_new: scalar int (traced ok) — number of positions to promote.
      context_temperature: scalar float (traced ok) — ctemp exponent.
      random_scores: replicates strategy='random'/'bootstrap'
        (mask_sampler.py:206-208): scores ~ N(0,1), ctemp forced to 0.
      noise: optional (B, N) draws replacing the internal PRNG — used by
        parity tests to share noise with the reference implementation.
        Interpreted as Exp(1) gumbel noise normally, or as the N(0,1)
        score draw when random_scores=True (ctemp is 0 there, so the
        exponential perturbation is inert).

    Returns:
      promote: (B, N) bool — positions to move from target to context.
    """
    B, N = scores.shape
    if random_scores:
        if noise is not None:
            scores, noise = noise, None
        else:
            scores = jax.random.normal(rng, (B, N), dtype=jnp.float32)
        context_temperature = jnp.zeros((), jnp.float32)
        rng = jax.random.fold_in(rng, 1)

    # Reference normalizes by the plain sum over targets; the scale only
    # matters relative to the Exp(1)**ctemp perturbation magnitude.
    tgtf = tgt_mask.astype(jnp.float32)
    denom = jnp.sum(scores * tgtf, axis=-1, keepdims=True)
    prob = scores / jnp.where(denom == 0, 1.0, denom)

    if noise is None:
        noise = jax.random.exponential(rng, (B, N), dtype=jnp.float32)
    perturbed = prob / (noise**context_temperature)
    perturbed = jnp.where(tgt_mask, perturbed, -jnp.inf)

    rank = exact_rank_desc(perturbed)
    return (rank < n_new) & tgt_mask
