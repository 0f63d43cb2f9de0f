"""Batch video generation drivers (the L5 surface over the decode engine).

Behavioural reference: sample_vqgan_transformer_videos.py
(bidirect_sample:22-93, extrapolate:95-157) and
draft_and_revise_videos.py (sample:22-61).

All sizes arrive in *pixel frames* and are converted to latent frames by
the VQGAN's temporal downsample (the reference hardcodes ratio=0.25).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from mebt_tpu.models.mebt import MeBT
from mebt_tpu.models.vqgan import VQGAN
from mebt_tpu.sampler.decode import (
    draft_and_revise,
    maskgit_sample,
)
from mebt_tpu.sampler.mask_schedule import bootstrap_plan, maskgit_plan


@dataclass
class GenerationResult:
    samples: np.ndarray  # (B, T, H, W, C) uint8
    code_maps: np.ndarray  # (B, t, h, w) int64
    score: np.ndarray  # (B,) sum log prob over the first window


@jax.jit
def _decode_pixels_device(vqgan: VQGAN, codes_bthw: jax.Array) -> jax.Array:
    pix = vqgan.decode(codes_bthw)  # (B, C, T, H, W)
    pix = jnp.clip(pix, -0.5, 0.5) + 0.5
    # quantize to uint8 on device: 4x less host transfer, and the
    # uint8 round-trip is what the reference's npy dump applies anyway
    return jnp.round(pix * 255.0).astype(jnp.uint8)


def _decode_pixels(vqgan: VQGAN | None, codes_bthw: jax.Array) -> np.ndarray:
    """VQGAN decode + clamp + uint8 quantize (reference sample
    script:75-83 + :291). Returns (B, T, H, W, C) uint8. With no VQGAN
    (codes-only generation, e.g. the vtokens path / parity tests) a
    zero pixel stub of the right leading shape is returned."""
    if vqgan is None:
        B, T = codes_bthw.shape[:2]
        dT = 4  # reference hardcodes temporal ratio 0.25 (script:30)
        return np.zeros((B, T * dT, 1, 1, 3), np.uint8)
    pix = _decode_pixels_device(vqgan, codes_bthw)
    return np.moveaxis(np.asarray(pix), 1, -1)


def bidirect_generate(
    model: MeBT,
    params,
    vqgan: VQGAN,
    rng: jax.Array,
    batch_size: int,
    *,
    total_length: int,
    step_size: int,
    context_size: int,
    temperature: float = 1.0,
    top_k: int | None = None,
    top_p: float | None = None,
    vid_n_steps: int = 8,
    vid_c_temp: float = 4.5,
    ctemp_schedule: str = "linear",
    strategy: str = "maskgit",
    schedule: str = "cosine",
    bootstrap: int = 0,
    approx_top_k: bool = False,
    _noise_hook=None,
) -> GenerationResult:
    """MaskGIT generation with the sliding-window long-video loop.

    `_noise_hook(call_idx, plan) -> dict(sample_noise=, promote_noise=)`
    is a test-only seam: invoked once per internal maskgit_sample call
    (bootstrap phase = call 0 when enabled, then the main window, then
    each shift window) so the pipeline parity tests can share noise with
    the torch reference."""
    T, h, w = model.config.latent_shape
    ratio = 1.0 / (vqgan.config.downsample[0] if vqgan else 4)
    step_lat = int(step_size * ratio)
    ctx_lat = int(context_size * ratio)
    total_lat = int(total_length * ratio)
    assert step_lat == T, (
        f"step_size {step_size} must map to the model window ({T} latent "
        f"frames), got {step_lat}"
    )
    num_pos = h * w
    N = T * num_pos
    B = batch_size

    n_call = 0

    def noise_kw(plan):
        nonlocal n_call
        kw = {} if _noise_hook is None else _noise_hook(n_call, plan)
        n_call += 1
        return kw

    # first window
    state = None
    if bootstrap > 0:
        rng, r = jax.random.split(rng)
        bplan = bootstrap_plan(N, bootstrap)
        state = maskgit_sample(
            model, params, r, B, bplan,
            temperature=1.0, strategy="bootstrap",
            context_temperature=vid_c_temp, **noise_kw(bplan),
        )
    rng, r = jax.random.split(rng)
    plan = maskgit_plan(N, vid_n_steps, schedule, ctemp_schedule,
                        n_ctx_init=0 if state is None else bootstrap)
    state = maskgit_sample(
        model, params, r, B, plan,
        codes=None if state is None else state.codes,
        ctx_mask=None if state is None else state.ctx_mask,
        # carry the bootstrap-phase sampling probabilities: positions
        # promoted during bootstrap are never re-sampled in the main
        # phase, and the reference's score merges their bootstrap probs
        # (sample script:86-90, `final_partial_probs < 0` fallback)
        chosen_prob=None if state is None else state.chosen_prob,
        temperature=temperature, top_k=top_k, top_p=top_p,
        context_temperature=vid_c_temp, strategy=strategy,
        approx_top_k=approx_top_k, **noise_kw(plan),
    )
    # per-sample score: sum log prob of each token at its final sampling
    # (reference sample script:85-91; first window only)
    score = np.asarray(
        jnp.sum(jnp.log(state.chosen_prob), axis=-1), np.float64
    )

    codes = np.zeros((B, max(total_lat, T), h, w), np.int64)
    codes[:, :T] = np.asarray(state.codes).reshape(B, T, h, w)
    curr = T

    if total_lat > T:
        shift_plan = maskgit_plan(
            N, vid_n_steps, schedule, ctemp_schedule,
            n_ctx_init=ctx_lat * num_pos,
        )
        ctx_mask = np.zeros((B, N), bool)
        ctx_mask[:, : ctx_lat * num_pos] = True
        ctx_mask = jnp.asarray(ctx_mask)
        while curr < total_lat:
            window = np.zeros((B, T, h, w), np.int64)
            window[:, :ctx_lat] = codes[:, curr - ctx_lat : curr]
            rng, r = jax.random.split(rng)
            state = maskgit_sample(
                model, params, r, B, shift_plan,
                codes=jnp.asarray(window.reshape(B, N), jnp.int32),
                ctx_mask=ctx_mask,
                temperature=temperature, top_k=top_k, top_p=top_p,
                context_temperature=vid_c_temp, strategy=strategy,
                approx_top_k=approx_top_k, **noise_kw(shift_plan),
            )
            fresh = np.asarray(state.codes).reshape(B, T, h, w)[:, ctx_lat:]
            take = min(T - ctx_lat, total_lat - curr)
            codes[:, curr : curr + take] = fresh[:, :take]
            curr += take

    codes = codes[:, :total_lat]
    samples = _decode_pixels(vqgan, jnp.asarray(codes))[:, :total_length]
    return GenerationResult(samples=samples, code_maps=codes, score=score)


def extrapolate_generate(
    model: MeBT,
    params,
    vqgan: VQGAN,
    rng: jax.Array,
    vq_input: np.ndarray,  # (B, T_lat, h, w) seed codes
    *,
    total_length: int,
    step_size: int,
    context_size: int,
    temperature: float = 1.0,
    top_k: int | None = None,
    top_p: float | None = None,
    vid_n_steps: int = 8,
    vid_c_temp: float = 4.5,
    ctemp_schedule: str = "linear",
    schedule: str = "cosine",
    _noise_hook=None,
) -> GenerationResult:
    """Extend an existing codemap by repeated window shifts
    (reference extrapolate:95-157, the `edit=True` path: the schedule is
    computed against the editable region only). `_noise_hook` as in
    bidirect_generate (call_idx counts shift windows here)."""
    T, h, w = model.config.latent_shape
    ratio = 1.0 / (vqgan.config.downsample[0] if vqgan else 4)
    step_lat = int(step_size * ratio)
    ctx_lat = int(context_size * ratio)
    total_lat = int(total_length * ratio)
    assert vq_input.shape[1] == step_lat == T
    B = vq_input.shape[0]
    num_pos = h * w
    N = T * num_pos
    jump = step_lat - ctx_lat
    n_jumps = int(np.ceil((total_lat - step_lat) / jump))

    edit_N = (T - ctx_lat) * num_pos
    plan = maskgit_plan(
        N, vid_n_steps, schedule, ctemp_schedule,
        n_ctx_init=ctx_lat * num_pos, edit_N=edit_N,
    )
    ctx_mask = np.zeros((B, N), bool)
    ctx_mask[:, : ctx_lat * num_pos] = True
    ctx_mask = jnp.asarray(ctx_mask)

    chunks = [np.asarray(vq_input, np.int64)]
    last = np.asarray(vq_input, np.int64)
    for j in range(n_jumps):
        window = np.zeros((B, T, h, w), np.int64)
        window[:, :ctx_lat] = last[:, -ctx_lat:]
        rng, r = jax.random.split(rng)
        nkw = {} if _noise_hook is None else _noise_hook(j, plan)
        state = maskgit_sample(
            model, params, r, B, plan,
            codes=jnp.asarray(window.reshape(B, N), jnp.int32),
            ctx_mask=ctx_mask,
            temperature=temperature, top_k=top_k, top_p=top_p,
            context_temperature=vid_c_temp, **nkw,
        )
        last = np.asarray(state.codes).reshape(B, T, h, w)
        chunks.append(last[:, ctx_lat:].astype(np.int64))
    codes = np.concatenate(chunks, axis=1)[:, :total_lat]
    samples = _decode_pixels(vqgan, jnp.asarray(codes))[:, :total_length]
    return GenerationResult(
        samples=samples, code_maps=codes, score=np.zeros(B)
    )


def dnr_generate(
    model: MeBT,
    params,
    vqgan: VQGAN,
    rng: jax.Array,
    batch_size: int,
    *,
    total_length: int,
    n_draft: int = 8,
    draft_t: float = 1.0,
    draft_k: int | None = None,
    draft_p: float | None = None,
    n_revise: int = 8,
    revise_t: float = 1.0,
    revise_k: int | None = None,
    revise_p: float | None = None,
    M: int = 2,
    draft: np.ndarray | None = None,  # (B, T_lat, h, w) to skip drafting
) -> GenerationResult:
    """Draft-and-revise generation (reference dnr script sample:22-61).
    The production recipe feeds a maskgit codemap via `draft` and runs
    revise-only."""
    T, h, w = model.config.latent_shape
    N = T * h * w
    B = batch_size
    if draft is not None:
        codes = jnp.asarray(
            np.asarray(draft).reshape(B, N), jnp.int32
        )
        skip_draft = True
    else:
        codes = jnp.zeros((B, N), jnp.int32)
        skip_draft = False
    out = draft_and_revise(
        model, params, rng, codes,
        n_draft=n_draft, draft_t=draft_t, draft_k=draft_k, draft_p=draft_p,
        n_revise=n_revise, revise_t=revise_t, revise_k=revise_k,
        revise_p=revise_p, M=M, skip_draft=skip_draft,
    )
    codes = np.asarray(out).reshape(B, T, h, w).astype(np.int64)
    samples = _decode_pixels(vqgan, jnp.asarray(codes))[:, :total_length]
    return GenerationResult(
        samples=samples, code_maps=codes, score=np.zeros(B)
    )
