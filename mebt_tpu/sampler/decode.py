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
from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from mebt_tpu.ops.sampling import (
    exact_rank_desc,
    promote_targets,
    sample_tokens,
)
from mebt_tpu.sampler.mask_schedule import DecodePlan


@flax.struct.dataclass
class DecodeState:
    codes: jax.Array  # (B, N) int32
    ctx_mask: jax.Array  # (B, N) bool
    chosen_prob: jax.Array  # (B, N) fp32 — prob of last sampled token
    rng: jax.Array

    @classmethod
    def create(cls, rng, B, N, codes=None, ctx_mask=None):
        return cls(
            codes=(
                jnp.zeros((B, N), jnp.int32) if codes is None else codes
            ),
            ctx_mask=(
                jnp.zeros((B, N), bool) if ctx_mask is None else ctx_mask
            ),
            chosen_prob=jnp.ones((B, N), jnp.float32),
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
) -> DecodeState:
    def step(state: DecodeState, xs):
        do_step, n_new, _t, ctemp_scale = xs

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
            )
            return DecodeState(
                codes=codes,
                ctx_mask=state.ctx_mask | promote,
                chosen_prob=chosen,
                rng=rng,
            )

        new_state = jax.lax.cond(do_step, run, lambda s: s, state)
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


def maskgit_sample(
    model,
    params,
    rng: jax.Array,
    B: int,
    plan: DecodePlan,
    *,
    codes: jax.Array | None = None,
    ctx_mask: jax.Array | None = None,
    valid_mask: jax.Array | None = None,
    temperature: float = 1.0,
    top_k: int | None = None,
    top_p: float | None = None,
    context_temperature: float = 4.5,
    strategy: str = "maskgit",
    return_history: bool = False,
    approx_top_k: bool = False,
):
    """One MaskGIT/bootstrap/random decode pass (reference sample(),
    transformer.py:353-447). `return_history=True` additionally returns
    per-step (codes, ctx_mask) — the equivalent of the reference's
    debug=True history/context_history recording
    (transformer.py:380-446)."""
    N = model.config.seq_len
    state = DecodeState.create(rng, B, N, codes, ctx_mask)
    if valid_mask is None:
        valid_mask = jnp.ones((B, N), bool)
    random_scores = strategy in ("random", "bootstrap")
    score_mode = {"entp": "entropy", "ar": "position"}.get(strategy, "prob")
    return _maskgit_scan(
        model,
        params,
        state,
        valid_mask,
        _plan_arrays(plan),
        temperature=float(temperature),
        top_k=None if top_k is None else int(top_k),
        top_p=None if top_p is None else float(top_p),
        context_temperature=float(context_temperature),
        random_scores=random_scores,
        score_mode=score_mode,
        collect_history=bool(return_history),
        approx_top_k=bool(approx_top_k),
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
) -> jax.Array:
    """Draft once, then M Gibbs revise sweeps (reference
    transformer.py:632-663). `ctx_mask` marks positions that stay fixed
    (None = regenerate everything, the unconditional path)."""
    B, N = codes.shape
    if ctx_mask is None:
        base_ctx = jnp.zeros((B, N), bool)
    else:
        base_ctx = ctx_mask
    tgt_all = ~base_ctx

    state = DecodeState.create(rng, B, N, codes, base_ctx)
    if not skip_draft:
        rng_c, rng_s = jax.random.split(state.rng)
        chunk_ids = _random_chunk_ids(rng_c, tgt_all, n_draft)
        state = _gibbs_scan(
            model, params,
            state.replace(rng=rng_s),
            chunk_ids, base_ctx,
            n_steps=n_draft, temperature=float(draft_t),
            top_k=draft_k, top_p=draft_p, mode="draft",
        )
    for _ in range(M):
        rng_c, rng_s = jax.random.split(state.rng)
        chunk_ids = _random_chunk_ids(rng_c, tgt_all, n_revise)
        state = _gibbs_scan(
            model, params,
            state.replace(rng=rng_s),
            chunk_ids, base_ctx,
            n_steps=n_revise, temperature=float(revise_t),
            top_k=revise_k, top_p=revise_p, mode="revise",
        )
    return state.codes


# -----------------------------------------------------------------------------
# Long-video sliding-window driver — reference sample script:22-93


def sliding_window_sample(
    model,
    params,
    rng: jax.Array,
    B: int,
    *,
    total_latent_frames: int,
    window_plan: DecodePlan,
    shift_plan_fn,
    context_latent_frames: int,
    bootstrap_plan: DecodePlan | None = None,
    temperature: float = 1.0,
    top_k: int | None = None,
    top_p: float | None = None,
    context_temperature: float = 4.5,
) -> np.ndarray:
    """Generate a video longer than one window by fixing the trailing
    `context_latent_frames` latent frames and regenerating the rest.

    Returns host codes of shape (B, total_latent_frames, h, w).
    """
    T, h, w = model.config.latent_shape
    num_pos = h * w
    N = T * num_pos

    # first window: optional bootstrap warm-up, then the main plan
    state = None
    if bootstrap_plan is not None and bootstrap_plan.n_steps > 0:
        rng, r = jax.random.split(rng)
        state = maskgit_sample(
            model, params, r, B, bootstrap_plan,
            temperature=temperature, top_k=top_k, top_p=top_p,
            strategy="bootstrap",
        )
    rng, r = jax.random.split(rng)
    state = maskgit_sample(
        model, params, r, B, window_plan,
        codes=None if state is None else state.codes,
        ctx_mask=None if state is None else state.ctx_mask,
        temperature=temperature, top_k=top_k, top_p=top_p,
        context_temperature=context_temperature,
    )

    out = np.zeros((B, total_latent_frames, h, w), np.int64)
    codes_np = np.asarray(state.codes).reshape(B, T, h, w)
    out[:, :T] = codes_np
    curr_t = T

    ctx_T = context_latent_frames
    step_T = T - ctx_T
    ctx_mask_np = np.zeros((B, N), bool)
    ctx_mask_np[:, : ctx_T * num_pos] = True
    ctx_mask = jnp.asarray(ctx_mask_np)
    shift_plan = shift_plan_fn(n_ctx_init=ctx_T * num_pos)

    while curr_t < total_latent_frames:
        prev = out[:, curr_t - ctx_T : curr_t]  # last ctx_T latent frames
        codes = np.zeros((B, T, h, w), np.int64)
        codes[:, :ctx_T] = prev
        rng, r = jax.random.split(rng)
        state = maskgit_sample(
            model, params, r, B, shift_plan,
            codes=jnp.asarray(codes.reshape(B, N), jnp.int32),
            ctx_mask=ctx_mask,
            temperature=temperature, top_k=top_k, top_p=top_p,
            context_temperature=context_temperature,
        )
        codes_np = np.asarray(state.codes).reshape(B, T, h, w)
        take = min(step_T, total_latent_frames - curr_t)
        out[:, curr_t : curr_t + take] = codes_np[:, ctx_T : ctx_T + take]
        curr_t += take
    return out
