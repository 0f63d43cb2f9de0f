"""Iterative parallel decoding engines (MaskGIT, bootstrap, draft-and-revise).

Behavioural reference: mebt/transformer.py:353-663 (sample, draft,
revise, draft_and_revise) and sample_vqgan_transformer_videos.py:22-157
(bidirect_sample / extrapolate window drivers).

TPU-first divergence: the reference drives each decode step from Python
— per-step host scheduling math, sparse-COO scatters, and a fresh CUDA
launch per forward (SURVEY.md §3.2). Here the per-step counts are
precomputed into a `DecodePlan` (mask_schedule.maskgit_plan) and the
whole decode is ONE `lax.scan` inside ONE jit: zero host round-trips,
zero recompiles, static shapes throughout.

State is a fixed-size canvas: codes (B, N), a context mask, and the
last-sampled probability per position (for score files / top-N FVD
selection, reference sample script:85-91).
"""

from __future__ import annotations

import functools

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from mebt_tpu.ops.sampling import (
    exact_rank_desc,
    promote_targets,
    sample_tokens,
    sample_topk_tokens,
)
from mebt_tpu.sampler.mask_schedule import (
    DecodePlan,
    plan_segments,
    plan_segments_joint,
)


def _use_fused_topk() -> bool:
    """Gate for the fused streaming top-k sampler (v2). ON by default
    on TPU: the same-window A/B (scripts/ab_topk.py, v5e) measured
    21.2 ms/step vs 38.2 unfused at the 128f head shapes
    (16384x1024 @ 1024x16384, k=32) with vc=1024 m=12 tr=512 sub=1024
    — 1.8x. Disable with MEBT_FUSED_TOPK=0;
    MEBT_FUSED_TOPK=force enables it on any backend (interpret tests)."""
    import os

    v = os.environ.get("MEBT_FUSED_TOPK", "")
    if v == "force":
        return True
    if v == "0":
        return False
    return jax.default_backend() == "tpu"


def _ctx_weight(cfg) -> float:
    """Per-token cost ratio of the enc phase (context tokens: K/V in
    each latent_enc block) to the dec phase (target tokens: q/proj/mlp
    in latent_dec, K/V in lt2l, vocab head) — drives the joint segment
    DP (mask_schedule.plan_segments_joint)."""
    from mebt_tpu.models.mebt import transformer_split
    from mebt_tpu.models.transformer import default_mode_list

    modes = default_mode_list(cfg.n_layer, cfg.mode)
    k = transformer_split(cfg)
    n_le = modes[:k].count("latent_enc")
    n_ld = modes[k:].count("latent_dec")
    n_l2 = modes[k:].count("lt2l")
    w_tgt = 10 * n_ld + 2 * n_l2 + cfg.vocab_size / cfg.n_embd
    return (2 * n_le) / max(w_tgt, 1e-6)


@flax.struct.dataclass
class DecodeState:
    codes: jax.Array  # (B, N) int32
    ctx_mask: jax.Array  # (B, N) bool
    chosen_prob: jax.Array  # (B, N) fp32 — prob of last sampled token
    rng: jax.Array

    @classmethod
    def create(cls, rng, B, N, codes=None, ctx_mask=None, chosen_prob=None):
        return cls(
            codes=(
                jnp.zeros((B, N), jnp.int32) if codes is None else codes
            ),
            ctx_mask=(
                jnp.zeros((B, N), bool) if ctx_mask is None else ctx_mask
            ),
            chosen_prob=(
                jnp.ones((B, N), jnp.float32)
                if chosen_prob is None else chosen_prob
            ),
            rng=rng,
        )


def _plan_arrays(plan: DecodePlan):
    return (
        jnp.asarray(plan.do_step),
        jnp.asarray(plan.n_new),
        jnp.asarray(plan.t),
        jnp.asarray(plan.ctemp_scale),
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "model",
        "temperature",
        "top_k",
        "top_p",
        "context_temperature",
        "random_scores",
        "score_mode",
        "collect_history",
        "approx_top_k",
        "with_noise",
        "all_live",
    ),
)
def _maskgit_scan(
    model,
    params,
    state: DecodeState,
    valid_mask: jax.Array,
    plan_arrays,
    *,
    temperature: float,
    top_k: int | None,
    top_p: float | None,
    context_temperature: float,
    random_scores: bool,
    score_mode: str = "prob",
    collect_history: bool = False,
    approx_top_k: bool = False,
    with_noise: bool = False,
    all_live: bool = False,
) -> DecodeState:
    def step(state: DecodeState, xs):
        if with_noise:
            do_step, n_new, _t, ctemp_scale, s_noise, p_noise = xs
        else:
            do_step, n_new, _t, ctemp_scale = xs
            s_noise = p_noise = None

        def run(state: DecodeState) -> DecodeState:
            tgt_mask = valid_mask & ~state.ctx_mask
            logits = model.apply(
                {"params": params},
                state.codes,
                state.ctx_mask,
                tgt_mask,
            )
            rng, r_sample, r_promote = jax.random.split(state.rng, 3)
            sampled, chosen_p, probs = sample_tokens(
                r_sample, logits, temperature, top_k, top_p,
                need_probs=(score_mode == "entropy"),
                approx_top_k=approx_top_k,
                noise=s_noise,
            )
            if score_mode == "entropy":
                # reference entp_sample (transformer.py:503-504):
                # s = sum(p - log(p+1e-8)); score = max_targets(s) - s,
                # promoted with ctemp forced to 0 (pure top-k)
                s = jnp.sum(probs - jnp.log(probs + 1e-8), axis=-1)
                s_max = jnp.max(
                    jnp.where(tgt_mask, s, -jnp.inf), axis=-1, keepdims=True
                )
                scores = s_max - s
                ctemp = jnp.zeros(())
            elif score_mode == "position":
                # 'ar' strategy: reveal targets in position order
                # (reference mask_sampler.py:239-246); keep scores
                # positive so promote_targets' normalization preserves
                # the ordering
                npos = chosen_p.shape[1]
                scores = jnp.broadcast_to(
                    jnp.arange(npos, 0, -1, dtype=jnp.float32) / npos,
                    chosen_p.shape,
                )
                ctemp = jnp.zeros(())
            else:
                scores = chosen_p
                ctemp = context_temperature * ctemp_scale
            codes = jnp.where(tgt_mask, sampled, state.codes)
            chosen = jnp.where(tgt_mask, chosen_p, state.chosen_prob)
            promote = promote_targets(
                r_promote,
                scores,
                tgt_mask,
                n_new,
                ctemp,
                random_scores=random_scores,
                noise=p_noise,
            )
            return DecodeState(
                codes=codes,
                ctx_mask=state.ctx_mask | promote,
                chosen_prob=chosen,
                rng=rng,
            )

        new_state = (
            run(state) if all_live
            else jax.lax.cond(do_step, run, lambda s: s, state)
        )
        ys = (
            (new_state.codes, new_state.ctx_mask)
            if collect_history
            else None
        )
        return new_state, ys

    state, history = jax.lax.scan(step, state, plan_arrays)
    if collect_history:
        return state, history
    return state


# -----------------------------------------------------------------------------
# Staged decode: dec phase + head + sampling on a compacted target bucket
# (see models/transformer.py:staged_split). The reference computes logits
# only for the NT remaining targets (transformer.py:286, shrinking per
# step); the dense scan above pays O(N) in latent_dec/lt2l/head/sampling
# on every step. Staged keeps the no-host-sync scan property while
# shrinking those terms to the bucketed target count.


def _row_idx(x):
    return jnp.arange(x.shape[0])[:, None]


def compact_indices(mask: jax.Array, M: int) -> jax.Array:
    """Pack each row's True positions (in position order) into a (B, M)
    index array; padding slots hold N (out of range — scatters with
    mode='drop' skip them, gathers clip). O(N) cumsum + one scatter, no
    sorts."""
    B, N = mask.shape
    cs = jnp.cumsum(mask, axis=-1)
    slot = jnp.where(mask, cs - 1, M)  # M = dropped
    pos = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), (B, N))
    idx = jnp.full((B, M), N, jnp.int32)
    return idx.at[_row_idx(mask), slot].set(pos, mode="drop")


def _stage_a_latents(model, params, state: DecodeState, ctx_bucket):
    """stage_a with the context compacted into a static `ctx_bucket`
    (None = dense full-canvas stage_a). The enc phase reads tokens only
    as context-masked latent_enc keys, so its K/V / attention cost
    drops from O(N) to O(ctx_bucket) — during the 128f bootstrap phase
    that is 8192 -> 128 (see models/mebt.py:stage_a_compact)."""
    if ctx_bucket is None:
        return model.apply(
            {"params": params}, state.codes, state.ctx_mask,
            method="stage_a",
        )
    cidx = compact_indices(state.ctx_mask, ctx_bucket)
    return model.apply(
        {"params": params}, state.codes, cidx,
        cidx < state.codes.shape[1], method="stage_a_compact",
    )


def _sample_compact_bucket(
    model,
    params,
    latents,
    idx,
    cvalid,
    r_sample,
    temperature,
    top_k,
    top_p,
    score_mode: str = "prob",
    approx_top_k: bool = False,
):
    """Dec phase + vocab head + token sampling on a compacted target
    bucket, on the fastest correct path for the sampling config.
    Returns (sampled, chosen_p, probs) — probs is None unless the
    entropy score path needs the full distribution.

    Paths, fastest first:
      * fused head+gumbel Pallas kernel (no top-k/top-p, prob scores,
        TPU): the (rows, vocab) logits never touch HBM
        (ops/head_sample_pallas.py:fused_head_sample).
      * fused streaming top-k v2 (top-k, prob scores, TPU — the default
        top-k path, see _use_fused_topk): fixed-unroll extraction +
        rank-merge keeps logits out of HBM; rare per-chunk buffer
        overflows flip a flag and the whole call falls back to the
        unfused exact path via lax.cond. (The v1 extraction-while-loop
        kernel measured 1.2-1.5x SLOWER and is retired —
        PERFORMANCE.md "Tried and rejected".)
      * bf16 top-k fast path (top-k with MEBT_FUSED_TOPK=0, or non-TPU):
        run the head matmul in model dtype and hand the RAW (bf16)
        logits to sample_topk_tokens — the three O(rows x V) HBM passes
        (write + TopK read + equality read) halve vs fp32, with
        bit-identical samples (bf16->fp32 is monotone and exact; see
        ops/sampling.py:sample_topk_tokens).
      * dense: stage_b_compact fp32 logits + sample_tokens.
    """
    if (
        top_k is None and top_p is None and score_mode == "prob"
        and jax.default_backend() == "tpu"
    ):
        from mebt_tpu.ops.head_sample_pallas import fused_head_sample

        tokens = model.apply(
            {"params": params}, latents, idx, cvalid,
            method="stage_b_tokens",
        )
        B, M, D = tokens.shape
        w = params["transformer"]["head"]["kernel"]
        seed = jax.random.bits(r_sample, (), jnp.uint32)
        s_flat, p_flat = fused_head_sample(
            tokens.reshape(B * M, D), w, seed, temperature=temperature
        )
        return s_flat.reshape(B, M).astype(jnp.int32), p_flat.reshape(B, M), None
    if (
        top_k is not None and top_p is None and score_mode == "prob"
        and not approx_top_k
    ):
        tokens = model.apply(
            {"params": params}, latents, idx, cvalid,
            method="stage_b_tokens",
        )
        w = params["transformer"]["head"]["kernel"]
        if _use_fused_topk():
            # Streaming fused top-k (v2, fixed unroll): logits never
            # touch HBM; the rare rows where a `sub`-wide vocab slice
            # held more than `m` of the true top-k raise an overflow
            # flag and the whole call falls back to the unfused exact
            # path (both branches compile once; the fallback runs only
            # when triggered — <~1% of steps at the kernel's m=14
            # default even at the largest 128f segment, see the
            # Poisson accounting in fused_head_topk_sample_v2).
            from mebt_tpu.ops.head_sample_pallas import (
                fused_head_topk_sample_v2,
            )

            B, M, D = tokens.shape
            seed = jax.random.bits(r_sample, (), jnp.uint32)
            xf = tokens.reshape(B * M, D)
            s_flat, p_flat, ovf = fused_head_topk_sample_v2(
                xf, w, seed, int(top_k), temperature=temperature
            )

            def _fallback(_):
                logits_raw = tokens @ w.astype(tokens.dtype)
                return sample_topk_tokens(
                    r_sample, logits_raw, int(top_k), temperature
                )

            def _accept(_):
                return (
                    s_flat.reshape(B, M).astype(jnp.int32),
                    p_flat.reshape(B, M),
                )

            sampled, chosen_p = jax.lax.cond(
                jnp.any(ovf > 0), _fallback, _accept, None
            )
            return sampled, chosen_p, None
        logits_raw = tokens @ w.astype(tokens.dtype)
        sampled, chosen_p = sample_topk_tokens(
            r_sample, logits_raw, int(top_k), temperature
        )
        return sampled, chosen_p, None
    logits = model.apply(
        {"params": params}, latents, idx, cvalid,
        method="stage_b_compact",
    )
    return sample_tokens(
        r_sample, logits, temperature, top_k, top_p,
        need_probs=(score_mode == "entropy"),
        approx_top_k=approx_top_k,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "model",
        "bucket",
        "ctx_bucket",
        "temperature",
        "top_k",
        "top_p",
        "context_temperature",
        "score_mode",
        "collect_history",
        "approx_top_k",
        "all_live",
    ),
)
def _staged_confidence_scan(
    model,
    params,
    state: DecodeState,
    plan_xs,  # (do_step, n_new, n_tgt, ctemp_scale) arrays, len = segment
    *,
    bucket: int,
    ctx_bucket: int | None,
    temperature: float,
    top_k: int | None,
    top_p: float | None,
    context_temperature: float,
    score_mode: str,
    collect_history: bool,
    approx_top_k: bool,
    all_live: bool = False,
):
    B = state.codes.shape[0]

    def step(state: DecodeState, xs):
        do_step, n_new, n_tgt, ctemp_scale = xs

        def run(state: DecodeState) -> DecodeState:
            tgt_mask = ~state.ctx_mask
            idx = compact_indices(tgt_mask, bucket)
            cvalid = jnp.broadcast_to(
                jnp.arange(bucket) < n_tgt, (B, bucket)
            )
            latents = _stage_a_latents(model, params, state, ctx_bucket)
            rng, r_sample, r_promote = jax.random.split(state.rng, 3)
            sampled, chosen_p, probs = _sample_compact_bucket(
                model, params, latents, idx, cvalid, r_sample,
                temperature, top_k, top_p,
                score_mode=score_mode, approx_top_k=approx_top_k,
            )
            if score_mode == "entropy":
                s = jnp.sum(probs - jnp.log(probs + 1e-8), axis=-1)
                s_max = jnp.max(
                    jnp.where(cvalid, s, -jnp.inf), axis=-1, keepdims=True
                )
                scores = s_max - s
                ctemp = jnp.zeros(())
            else:
                scores = chosen_p
                ctemp = context_temperature * ctemp_scale
            # padding slots carry idx == N -> dropped by every scatter
            codes = state.codes.at[_row_idx(idx), idx].set(
                sampled, mode="drop"
            )
            chosen = state.chosen_prob.at[_row_idx(idx), idx].set(
                chosen_p, mode="drop"
            )
            promote_c = promote_targets(
                r_promote, scores, cvalid, n_new, ctemp
            )
            prom = (
                jnp.zeros_like(state.ctx_mask)
                .at[_row_idx(idx), idx]
                .set(promote_c, mode="drop")
            )
            return DecodeState(
                codes=codes,
                ctx_mask=state.ctx_mask | prom,
                chosen_prob=chosen,
                rng=rng,
            )

        # all_live (static): the host knows every plan step in this
        # segment executes, so skip the lax.cond fork (the skip branch
        # exists only for the reference's n_masked > NT skip-step case)
        new_state = (
            run(state) if all_live
            else jax.lax.cond(do_step, run, lambda s: s, state)
        )
        ys = (
            (new_state.codes, new_state.ctx_mask)
            if collect_history
            else None
        )
        return new_state, ys

    return jax.lax.scan(step, state, plan_xs)


@functools.partial(
    jax.jit,
    static_argnames=(
        "model",
        "bucket",
        "ctx_bucket",
        "temperature",
        "top_k",
        "top_p",
        "collect_history",
        "approx_top_k",
        "all_live",
    ),
)
def _staged_random_scan(
    model,
    params,
    state: DecodeState,
    plan_xs,  # (do_step, n_new)
    *,
    bucket: int,  # >= max n_new over the plan
    ctx_bucket: int | None,  # >= max context count over the plan
    temperature: float,
    top_k: int | None,
    top_p: float | None,
    collect_history: bool,
    approx_top_k: bool,
    all_live: bool = False,
):
    """random/bootstrap strategies: promotion ignores confidence
    (reference mask_sampler.py:206-208), so the promoted set can be
    drawn BEFORE the forward and logits computed only at the promoted
    positions — the sampled values at non-promoted targets are never
    read (target positions embed as mask_emb regardless of their code).
    For the 128f bootstrap phase (64 steps, n_new=1) this removes
    ~99% of the dec-phase/head/sampling FLOPs per step.

    Promotion order: drawing the top n_new of FRESH i.i.d. noise among
    the remaining targets at every step (the reference's per-step
    N(0,1) scores) is distribution-identical to drawing ONE uniform
    random permutation of the initial targets and consuming it n_new
    positions at a time — sampling without replacement. The scan
    therefore ranks a single noise draw once and compares ranks against
    the plan's cumulative offsets per step, replacing a per-step O(N)
    variadic sort (the dominant bootstrap cost at N = 8192) with an
    O(N) compare."""
    B = state.codes.shape[0]

    rng_perm, rng0 = jax.random.split(state.rng)
    state = state.replace(rng=rng0)
    tgt0 = ~state.ctx_mask
    noise = jax.random.uniform(rng_perm, tgt0.shape)
    perm_rank = exact_rank_desc(jnp.where(tgt0, noise, -jnp.inf))
    do_step_arr, n_new_arr = plan_xs
    off_arr = jnp.concatenate(
        [jnp.zeros((1,), n_new_arr.dtype), jnp.cumsum(n_new_arr)[:-1]]
    )
    plan_xs = (do_step_arr, n_new_arr, off_arr)

    def step(state: DecodeState, xs):
        do_step, n_new, off = xs

        def run(state: DecodeState) -> DecodeState:
            rng, r_sample = jax.random.split(state.rng)
            promote = tgt0 & (perm_rank >= off) & (perm_rank < off + n_new)
            idx = compact_indices(promote, bucket)
            cvalid = jnp.broadcast_to(
                jnp.arange(bucket) < n_new, (B, bucket)
            )
            # forward conditions on the PRE-promotion context, exactly
            # like the dense path (sampling happens before promotion)
            latents = _stage_a_latents(model, params, state, ctx_bucket)
            logits = model.apply(
                {"params": params}, latents, idx, cvalid,
                method="stage_b_compact",
            )
            sampled, chosen_p, _ = sample_tokens(
                r_sample, logits, temperature, top_k, top_p,
                approx_top_k=approx_top_k,
            )
            codes = state.codes.at[_row_idx(idx), idx].set(
                sampled, mode="drop"
            )
            chosen = state.chosen_prob.at[_row_idx(idx), idx].set(
                chosen_p, mode="drop"
            )
            return DecodeState(
                codes=codes,
                ctx_mask=state.ctx_mask | promote,
                chosen_prob=chosen,
                rng=rng,
            )

        new_state = (
            run(state) if all_live
            else jax.lax.cond(do_step, run, lambda s: s, state)
        )
        ys = (
            (new_state.codes, new_state.ctx_mask)
            if collect_history
            else None
        )
        return new_state, ys

    return jax.lax.scan(step, state, plan_xs)


def _staged_sample(
    model,
    params,
    state: DecodeState,
    plan: DecodePlan,
    *,
    temperature: float,
    top_k: int | None,
    top_p: float | None,
    context_temperature: float,
    score_mode: str,
    random_scores: bool,
    collect_history: bool,
    approx_top_k: bool,
    n_ctx0: int | None = 0,
):
    """`n_ctx0`: host-known max initial context count (for sizing the
    compacted-context buckets); None = unknown (tracer ctx_mask on the
    random path) — stage_a then runs dense."""
    N = state.codes.shape[1]
    if random_scores:
        bucket, ctx_bucket = random_path_buckets(plan, N, n_ctx0)
        xs = (jnp.asarray(plan.do_step), jnp.asarray(plan.n_new))
        state, history = _staged_random_scan(
            model, params, state, xs,
            bucket=bucket, ctx_bucket=ctx_bucket,
            all_live=bool(np.all(plan.do_step)),
            temperature=temperature, top_k=top_k,
            top_p=top_p, collect_history=collect_history,
            approx_top_k=approx_top_k,
        )
        histories = [history]
    else:
        n_tgt = plan.n_targets_before(N)
        histories = []
        segments = plan_segments_joint(
            plan, N, ctx_weight=_ctx_weight(model.config)
        )
        if collect_history and not segments:
            empty = (
                jnp.zeros((0,) + state.codes.shape, state.codes.dtype),
                jnp.zeros((0,) + state.ctx_mask.shape, bool),
            )
            return state, empty
        for start, stop, bucket, ctx_bucket in segments:
            xs = (
                jnp.asarray(plan.do_step[start:stop]),
                jnp.asarray(plan.n_new[start:stop]),
                jnp.asarray(n_tgt[start:stop].astype(np.int32)),
                jnp.asarray(plan.ctemp_scale[start:stop]),
            )
            state, history = _staged_confidence_scan(
                model, params, state, xs,
                bucket=bucket, ctx_bucket=ctx_bucket,
                all_live=bool(np.all(plan.do_step[start:stop])),
                temperature=temperature, top_k=top_k,
                top_p=top_p, context_temperature=context_temperature,
                score_mode=score_mode, collect_history=collect_history,
                approx_top_k=approx_top_k,
            )
            histories.append(history)
    if collect_history:
        history = jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(xs, axis=0), *histories
        )
        return state, history
    return state


def maskgit_sample(
    model,
    params,
    rng: jax.Array,
    B: int,
    plan: DecodePlan,
    *,
    codes: jax.Array | None = None,
    ctx_mask: jax.Array | None = None,
    chosen_prob: jax.Array | None = None,
    valid_mask: jax.Array | None = None,
    temperature: float = 1.0,
    top_k: int | None = None,
    top_p: float | None = None,
    context_temperature: float = 4.5,
    strategy: str = "maskgit",
    return_history: bool = False,
    approx_top_k: bool = False,
    staged: bool | str = "auto",
    sample_noise: jax.Array | None = None,
    promote_noise: jax.Array | None = None,
):
    """One MaskGIT/bootstrap/random decode pass (reference sample(),
    transformer.py:353-447). `return_history=True` additionally returns
    per-step (codes, ctx_mask) — the equivalent of the reference's
    debug=True history/context_history recording
    (transformer.py:380-446).

    `staged="auto"` (default) uses the compacted two-stage forward when
    the mode list allows it (models/transformer.py:staged_split), the
    sequence has no out-of-window positions, and the strategy is
    bucketable; `staged=False` forces the dense full-canvas scan (used
    by the equivalence tests).

    `sample_noise` (S, B, N, V) / `promote_noise` (S, B, N) replace the
    internal PRNG draws per plan step — test-only hooks that let the
    pipeline parity suite share noise with the torch reference; they
    force the dense scan."""
    from mebt_tpu.models.mebt import transformer_split

    if model.config.seq_axis is not None:
        # sequence parallelism shards the forward inside shard_map,
        # where this driver's plan arithmetic and promotion counts
        # (canvas-global) would apply PER SHARD. The SP decode driver
        # with plan-global promotion is parallel/sp.py:
        # sp_maskgit_sample (bit-equal to this scan under shared noise,
        # tests/test_seq_parallel.py); pass the seq_axis=None model
        # here, or use TP decode (tests/test_multichip.py).
        raise ValueError(
            "maskgit_sample drives unsharded models; for "
            "sequence-parallel decode call parallel.sp.sp_maskgit_sample"
        )
    N = model.config.seq_len
    state = DecodeState.create(rng, B, N, codes, ctx_mask, chosen_prob)
    random_scores = strategy in ("random", "bootstrap")
    score_mode = {"entp": "entropy", "ar": "position"}.get(strategy, "prob")

    with_noise = sample_noise is not None or promote_noise is not None
    use_staged = (
        staged in (True, "auto")
        and transformer_split(model.config) is not None
        and valid_mask is None
        and strategy != "ar"
        and not with_noise
    )
    if staged is True and not use_staged:
        raise ValueError(
            "staged=True requires a stageable mode list, no valid_mask, "
            "and a non-'ar' strategy"
        )
    n_ctx_rows = None  # host copy of per-row context counts (one fetch)
    if (
        use_staged
        and ctx_mask is not None
        and not isinstance(ctx_mask, jax.core.Tracer)
    ):
        n_ctx_rows = np.asarray(jnp.sum(ctx_mask, axis=-1))
    if use_staged and not random_scores:
        # the staged confidence scan derives per-step target counts from
        # the PLAN; a ctx_mask whose context count disagrees with
        # plan.n_ctx_init would silently truncate targets in
        # compact_indices (the dense path derives counts from the live
        # mask, so the failure mode would differ between paths). Checked
        # host-side when the mask is concrete.
        if n_ctx_rows is not None:
            if not np.all(n_ctx_rows == plan.n_ctx_init):
                raise ValueError(
                    f"ctx_mask context counts {np.unique(n_ctx_rows)} != "
                    f"plan.n_ctx_init {plan.n_ctx_init}; build the plan "
                    "with matching n_ctx_init or pass staged=False"
                )
        elif ctx_mask is None and plan.n_ctx_init != 0:
            raise ValueError(
                f"plan.n_ctx_init {plan.n_ctx_init} != 0 but no ctx_mask "
                "was provided"
            )
    if use_staged:
        # host-known initial context count for the compact-ctx buckets
        if ctx_mask is None:
            n_ctx0 = 0
        elif n_ctx_rows is not None:
            n_ctx0 = int(np.max(n_ctx_rows))
        elif not random_scores:
            # validated contract: context count == plan.n_ctx_init
            n_ctx0 = int(plan.n_ctx_init)
        else:
            n_ctx0 = None  # unknown under trace -> dense stage_a
        return _staged_sample(
            model, params, state, plan,
            temperature=float(temperature),
            top_k=None if top_k is None else int(top_k),
            top_p=None if top_p is None else float(top_p),
            context_temperature=float(context_temperature),
            score_mode=score_mode,
            random_scores=random_scores,
            collect_history=bool(return_history),
            approx_top_k=bool(approx_top_k),
            n_ctx0=n_ctx0,
        )

    if valid_mask is None:
        valid_mask = jnp.ones((B, N), bool)
    plan_arrays = _plan_arrays(plan)
    if with_noise:
        if sample_noise is None or promote_noise is None:
            # a ones-default for the missing stream would silently turn
            # sampling into greedy argmax (or promotion into
            # deterministic top-confidence) — and materialize an
            # (S, B, N, V) ones tensor at real sizes
            raise ValueError(
                "sample_noise and promote_noise must be passed together"
            )
        plan_arrays = plan_arrays + (
            jnp.asarray(sample_noise, jnp.float32),
            jnp.asarray(promote_noise, jnp.float32),
        )
    return _maskgit_scan(
        model,
        params,
        state,
        valid_mask,
        plan_arrays,
        temperature=float(temperature),
        top_k=None if top_k is None else int(top_k),
        top_p=None if top_p is None else float(top_p),
        context_temperature=float(context_temperature),
        random_scores=random_scores,
        score_mode=score_mode,
        collect_history=bool(return_history),
        approx_top_k=bool(approx_top_k),
        with_noise=with_noise,
        all_live=bool(np.all(plan.do_step)),
    )


def entp_sample(model, params, rng, B, plan, **kwargs):
    """Entropy-confidence MaskGIT variant (reference entp_sample,
    transformer.py:449-542)."""
    kwargs["strategy"] = "entp"
    return maskgit_sample(model, params, rng, B, plan, **kwargs)


# -----------------------------------------------------------------------------
# Draft-and-revise (Gibbs refinement) — reference transformer.py:544-663


def _random_chunk_ids(rng, tgt_mask, n_chunks):
    """Assign each target position a chunk id in [0, n_chunks) via a
    random permutation (reference create_gibbs_*_mask,
    mask_sampler.py:318-356); non-target positions get -1. Chunk sizes
    are equal when the target count divides n_chunks (asserted upstream
    by the reference; here extra positions spill into the last chunks)."""
    B, N = tgt_mask.shape
    noise = jax.random.uniform(rng, (B, N))
    noise = jnp.where(tgt_mask, noise, jnp.inf)
    rank = exact_rank_desc(-noise)  # ascending rank among targets first
    n_tgt = jnp.sum(tgt_mask, axis=-1, keepdims=True)
    chunk_size = jnp.maximum(n_tgt // n_chunks, 1)
    ids = jnp.minimum(rank // chunk_size, n_chunks - 1)
    return jnp.where(tgt_mask, ids, -1)


@functools.partial(
    jax.jit,
    static_argnames=("model", "n_steps", "temperature", "top_k", "top_p", "mode"),
)
def _gibbs_scan(
    model,
    params,
    state: DecodeState,
    chunk_ids: jax.Array,
    base_ctx: jax.Array,
    *,
    n_steps: int,
    temperature: float,
    top_k: int | None,
    top_p: float | None,
    mode: str,  # 'draft' | 'revise'
) -> DecodeState:
    def step(state: DecodeState, i):
        if mode == "draft":
            # progressive reveal: chunks < i are fixed context, the rest
            # are re-predicted (reference draft:544-586)
            ctx = base_ctx | ((chunk_ids >= 0) & (chunk_ids < i))
            tgt = chunk_ids >= i
        else:
            # re-predict chunk i given everything else (revise:588-630)
            ctx = base_ctx | ((chunk_ids >= 0) & (chunk_ids != i))
            tgt = chunk_ids == i

        logits = model.apply({"params": params}, state.codes, ctx, tgt)
        rng, r_sample = jax.random.split(state.rng)
        sampled, scores, _ = sample_tokens(
            r_sample, logits, temperature, top_k, top_p
        )
        codes = jnp.where(tgt, sampled, state.codes)
        chosen = jnp.where(tgt, scores, state.chosen_prob)
        return (
            DecodeState(
                codes=codes, ctx_mask=state.ctx_mask, chosen_prob=chosen,
                rng=rng,
            ),
            None,
        )

    state, _ = jax.lax.scan(step, state, jnp.arange(n_steps))
    return state


@functools.partial(
    jax.jit,
    static_argnames=(
        "model", "temperature", "top_k", "top_p", "mode", "bucket",
    ),
)
def _gibbs_scan_compact(
    model,
    params,
    state: DecodeState,
    chunk_ids: jax.Array,
    base_ctx: jax.Array,
    i_steps: jax.Array,  # chunk indices to sweep in this segment
    *,
    temperature: float,
    top_k: int | None,
    top_p: float | None,
    mode: str,  # 'draft' | 'revise'
    bucket: int,  # >= max target count over the segment's steps
) -> DecodeState:
    """Staged Gibbs sweep: the re-predicted chunk is compacted into a
    (B, bucket) array so latent_dec/lt2l/head/sampling cost O(bucket)
    per step instead of O(N) — a revise sweep with n_steps chunks costs
    ~1/n_steps of the dense scan (the UCF 128f recipe uses n_revise=32)."""
    N = state.codes.shape[1]

    def step(state: DecodeState, i):
        if mode == "draft":
            ctx = base_ctx | ((chunk_ids >= 0) & (chunk_ids < i))
            tgt = chunk_ids >= i
        else:
            ctx = base_ctx | ((chunk_ids >= 0) & (chunk_ids != i))
            tgt = chunk_ids == i
        idx = compact_indices(tgt, bucket)
        cvalid = idx < N
        latents = model.apply(
            {"params": params}, state.codes, ctx, method="stage_a"
        )
        rng, r_sample = jax.random.split(state.rng)
        sampled, chosen_p, _ = _sample_compact_bucket(
            model, params, latents, idx, cvalid, r_sample,
            temperature, top_k, top_p,
        )
        codes = state.codes.at[_row_idx(idx), idx].set(sampled, mode="drop")
        chosen = state.chosen_prob.at[_row_idx(idx), idx].set(
            chosen_p, mode="drop"
        )
        return (
            DecodeState(
                codes=codes, ctx_mask=state.ctx_mask, chosen_prob=chosen,
                rng=rng,
            ),
            None,
        )

    state, _ = jax.lax.scan(step, state, i_steps)
    return state


def _round_bucket(v: int, N: int, align: int = 128) -> int:
    return int(min(N, -(-int(v) // align) * align))


def random_path_buckets(
    plan: DecodePlan, N: int, n_ctx0: int | None
) -> tuple[int, int | None]:
    """(target_bucket, ctx_bucket) of `_staged_sample`'s random/
    bootstrap branch: ONE 8-aligned target bucket sized from the max
    per-step promotion count (logits are computed only at promoted
    rows) and ONE 128-aligned compact-context bucket sized for the
    final context count (None = dense stage_a when the initial context
    count isn't host-known). Shared with utils/flops.plan_macs so the
    FLOP accounting models exactly what the scan compiles."""
    bucket = max(8, int(np.max(plan.n_new, initial=0)))
    bucket = -(-bucket // 8) * 8
    if n_ctx0 is None:
        ctx_bucket = None
    else:
        ctx_bucket = _round_bucket(
            max(1, n_ctx0 + int(np.sum(plan.n_new, initial=0))), N
        )
    return bucket, ctx_bucket


def _gibbs_chunk_counts(n_tgt_rows: np.ndarray, n_chunks: int) -> np.ndarray:
    """Per-row, per-chunk target counts under _random_chunk_ids'
    assignment (ids = min(rank // max(n_tgt_row // n, 1), n - 1)): chunks
    0..n-2 hold `chunk` targets (fewer near the tail when n_tgt_row < n)
    and the LAST chunk absorbs the spill, which is non-monotonic in
    n_tgt_row (79 targets / 8 chunks spills 16; 80 spills 10). Buckets
    must therefore be sized from the max over ROWS of these counts, not
    from the batch-max target count. Returns (B, n_chunks) int64."""
    rows = np.asarray(n_tgt_rows, dtype=np.int64).reshape(-1, 1)
    chunk = np.maximum(rows // n_chunks, 1)
    i = np.arange(n_chunks).reshape(1, -1)
    counts = np.clip(np.minimum(chunk, rows - i * chunk), 0, None)
    counts[:, -1] = np.clip(
        rows[:, 0] - (n_chunks - 1) * chunk[:, 0], 0, None
    )
    return counts


def draft_and_revise(
    model,
    params,
    rng: jax.Array,
    codes: jax.Array,
    *,
    ctx_mask: jax.Array | None = None,
    n_draft: int = 8,
    draft_t: float = 1.0,
    draft_k: int | None = None,
    draft_p: float | None = None,
    n_revise: int = 8,
    revise_t: float = 1.0,
    revise_k: int | None = None,
    revise_p: float | None = None,
    M: int = 2,
    skip_draft: bool = False,
    staged: bool | str = "auto",
) -> jax.Array:
    """Draft once, then M Gibbs revise sweeps (reference
    transformer.py:632-663). `ctx_mask` marks positions that stay fixed
    (None = regenerate everything, the unconditional path)."""
    from mebt_tpu.models.mebt import transformer_split
    from mebt_tpu.sampler.mask_schedule import segment_counts

    B, N = codes.shape
    if ctx_mask is None:
        base_ctx = jnp.zeros((B, N), bool)
    else:
        base_ctx = ctx_mask
    tgt_all = ~base_ctx

    use_staged = (
        staged in (True, "auto")
        and transformer_split(model.config) is not None
    )
    # per-ROW target counts are host-known; bucket sizing must use them
    # (a heterogeneous ctx_mask makes chunk/spill sizes row-dependent)
    n_tgt_rows = np.asarray(jnp.sum(tgt_all, axis=-1), dtype=np.int64)

    state = DecodeState.create(rng, B, N, codes, base_ctx)
    if not skip_draft:
        rng_c, rng_s = jax.random.split(state.rng)
        chunk_ids = _random_chunk_ids(rng_c, tgt_all, n_draft)
        state = state.replace(rng=rng_s)
        if use_staged:
            counts = _gibbs_chunk_counts(n_tgt_rows, n_draft)
            # draft step i re-predicts chunks >= i: suffix-sum of counts
            nt = counts[:, ::-1].cumsum(axis=1)[:, ::-1].max(axis=0)
            nt = np.maximum(nt, 1)
            for s, e, b in segment_counts(nt, N):
                state = _gibbs_scan_compact(
                    model, params, state, chunk_ids, base_ctx,
                    jnp.arange(s, e),
                    temperature=float(draft_t), top_k=draft_k,
                    top_p=draft_p, mode="draft", bucket=b,
                )
        else:
            state = _gibbs_scan(
                model, params, state, chunk_ids, base_ctx,
                n_steps=n_draft, temperature=float(draft_t),
                top_k=draft_k, top_p=draft_p, mode="draft",
            )
    for _ in range(M):
        rng_c, rng_s = jax.random.split(state.rng)
        chunk_ids = _random_chunk_ids(rng_c, tgt_all, n_revise)
        state = state.replace(rng=rng_s)
        if use_staged:
            counts = _gibbs_chunk_counts(n_tgt_rows, n_revise)
            bucket = _round_bucket(max(1, int(counts.max())), N)
            state = _gibbs_scan_compact(
                model, params, state, chunk_ids, base_ctx,
                jnp.arange(n_revise),
                temperature=float(revise_t), top_k=revise_k,
                top_p=revise_p, mode="revise", bucket=bucket,
            )
        else:
            state = _gibbs_scan(
                model, params, state, chunk_ids, base_ctx,
                n_steps=n_revise, temperature=float(revise_t),
                top_k=revise_k, top_p=revise_p, mode="revise",
            )
    return state.codes
