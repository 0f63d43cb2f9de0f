"""Mask schedule / decode plan / decode loop tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mebt_tpu.models.mebt import MeBT, MeBTConfig
from mebt_tpu.sampler.mask_schedule import (
    MaskGen,
    bootstrap_plan,
    maskgit_plan,
    schedule_fn,
)
from mebt_tpu.sampler.decode import (
    DecodeState,
    draft_and_revise,
    maskgit_sample,
)


def test_schedules_match_reference_formulas():
    t = np.linspace(0, 1, 11)
    np.testing.assert_allclose(schedule_fn("cosine")(t), np.cos(0.5 * np.pi * t))
    np.testing.assert_allclose(schedule_fn("linear")(t), 1 - t)
    np.testing.assert_allclose(schedule_fn("sqrt")(t), 1 - t**0.5)
    np.testing.assert_allclose(
        schedule_fn("cosine_plus")(t), 0.5 * (1 + np.cos(np.pi * t))
    )
    # also works on jax arrays
    jt = jnp.linspace(0, 1, 11)
    np.testing.assert_allclose(
        np.asarray(schedule_fn("cosine")(jt)), np.cos(0.5 * np.pi * t),
        rtol=1e-6, atol=1e-6,
    )


@pytest.mark.parametrize("schedule", ["cosine", "linear", "square"])
@pytest.mark.parametrize("n_steps", [8, 32])
def test_maskgit_plan_simulates_reference_loop(schedule, n_steps):
    """Direct simulation of the reference per-step arithmetic
    (transformer.py:397-401 + mask_sampler.py:210-237)."""
    N = 1024
    fn = schedule_fn(schedule)
    plan = maskgit_plan(N, n_steps, schedule)

    NC = 0
    for s, t in enumerate(np.linspace(0, 1, n_steps + 1)[1:]):
        n_masked = int(np.ceil(fn(t) * N))
        NT = N - NC
        if n_masked > NT:
            assert not plan.do_step[s]
            continue
        assert plan.do_step[s]
        n_contexts = N - n_masked
        if n_contexts > NC:
            assert plan.n_new[s] == n_contexts - NC
            NC = n_contexts
        else:
            assert plan.n_new[s] == 0
        assert plan.n_contexts[s] == NC
    # decode ends (nearly) fully revealed: float cos(pi/2) > 0 makes the
    # last cosine step keep ceil(eps*N)=1 token as target — faithfully
    # matching the reference arithmetic; the canvas itself is fully
    # sampled because every step resamples all remaining targets.
    assert plan.n_contexts[-1] >= N - 1


def test_bootstrap_plan_one_per_step():
    plan = bootstrap_plan(64, 16)
    assert plan.n_steps == 16
    assert (plan.n_new == 1).all()
    assert plan.n_contexts[-1] == 16


def _simulate_divide_indices(perm, t, start_t, T, shape, budget, schedule):
    """Independent simulation of reference divide_indices
    (mask_sampler.py:75-115) on one sample."""
    num_pos = int(np.prod(shape[1:]))
    lo, hi = start_t * num_pos, (start_t + T) * num_pos
    sliced = [p for p in perm if lo <= p < hi]
    seq_len = T * num_pos
    n_masked = int(np.ceil(schedule_fn(schedule)(t) * seq_len))
    n_contexts = seq_len - n_masked
    n_targets = min(budget, seq_len - n_contexts)
    ctx = set(sliced[:n_contexts])
    tgt = set(sliced[len(sliced) - n_targets :]) if n_targets > 0 else set()
    return ctx, tgt, seq_len, n_targets


@pytest.mark.parametrize("t", [0.0, 0.3, 0.77, 1.0])
@pytest.mark.parametrize("window", [(0, 4), (1, 2), (3, 1)])
def test_train_masks_match_reference_semantics(t, window):
    shape = (4, 4, 4)
    gen = MaskGen(schedule="linear", shape=shape, budget=24)
    rng = np.random.default_rng(0)
    B, N = 3, gen.seq_len
    perms = np.stack([rng.permutation(N) for _ in range(B)])

    start_t, T = window
    masks = gen.train_masks(perms, t, start_t, T)

    for b in range(B):
        ctx, tgt, seq_len, n_targets = _simulate_divide_indices(
            perms[b], t, start_t, T, shape, gen.budget, "linear"
        )
        assert set(np.nonzero(masks.ctx_mask[b])[0]) == ctx
        assert set(np.nonzero(masks.tgt_mask[b])[0]) == tgt
        assert masks.seq_len == seq_len
        assert masks.n_targets == n_targets
    # out-of-window positions are neither context nor target
    num_pos = 16
    out_of_window = np.ones(N, bool)
    out_of_window[start_t * num_pos : (start_t + T) * num_pos] = False
    assert not (masks.ctx_mask | masks.tgt_mask)[:, out_of_window].any()


def test_eval_masks_ignore_curriculum_and_budget():
    """Reference divide_indices with self.training=False
    (mask_sampler.py:85-111): full window, budget lifted to seq_len —
    every masked token is a target."""
    shape = (4, 4, 4)
    gen = MaskGen(schedule="linear", shape=shape, budget=8)  # tight budget
    rng = np.random.default_rng(1)
    B, N = 2, gen.seq_len
    perms = np.stack([rng.permutation(N) for _ in range(B)])

    t = 0.25  # linear: 75% masked -> 48 targets, far above budget=8
    train = gen.train_masks(perms, t, 0, 4, training=True)
    ev = gen.train_masks(perms, t, 0, 4, training=False)
    assert train.n_targets == 8
    assert ev.n_targets == N - ev.n_contexts  # uncapped
    # eval mode: context/target partition the full sequence
    assert ((ev.ctx_mask | ev.tgt_mask) == True).all()  # noqa: E712
    assert not (ev.ctx_mask & ev.tgt_mask).any()
    assert ev.masked_weight == ev.n_targets

    # eval-mode masks require the full window (the reference never
    # slices at validation)
    with pytest.raises(ValueError):
        gen.train_masks(perms, t, 1, 2, training=False)


def _tiny_model():
    cfg = MeBTConfig(
        vocab_size=32,
        block_size=48,
        n_layer=2,
        n_head=2,
        n_embd=16,
        sos_emb=4,
        mode=("latent_enc", "latent_dec"),
        latent_shape=(3, 4, 4),
    )
    model = MeBT(cfg)
    params = model.init(
        jax.random.key(0),
        jnp.zeros((1, cfg.seq_len), jnp.int32),
        jnp.zeros((1, cfg.seq_len), bool),
        jnp.zeros((1, cfg.seq_len), bool),
    )["params"]
    return model, params


def test_maskgit_decode_invariants():
    model, params = _tiny_model()
    N = model.config.seq_len
    B, n_steps = 2, 8
    plan = maskgit_plan(N, n_steps, "cosine")
    state = maskgit_sample(
        model, params, jax.random.key(1), B, plan, context_temperature=4.5
    )
    ctx = np.asarray(state.ctx_mask)
    codes = np.asarray(state.codes)
    assert ctx.sum(1).tolist() == [plan.n_contexts[-1]] * B
    assert codes.min() >= 0 and codes.max() < model.config.vocab_size
    probs = np.asarray(state.chosen_prob)
    assert (probs > 0).all() and (probs <= 1).all()


def test_maskgit_decode_respects_initial_context():
    model, params = _tiny_model()
    N = model.config.seq_len
    B = 2
    rng = np.random.default_rng(3)
    init_codes = rng.integers(0, 32, size=(B, N)).astype(np.int32)
    ctx0 = np.zeros((B, N), bool)
    ctx0[:, :16] = True  # first latent frame fixed
    plan = maskgit_plan(N, 8, "cosine", n_ctx_init=16)
    state = maskgit_sample(
        model, params, jax.random.key(2), B,
        plan,
        codes=jnp.asarray(init_codes),
        ctx_mask=jnp.asarray(ctx0),
    )
    out = np.asarray(state.codes)
    np.testing.assert_array_equal(out[:, :16], init_codes[:, :16])
    assert np.asarray(state.ctx_mask).sum(1).tolist() == [
        plan.n_contexts[-1]
    ] * B


def test_draft_and_revise_changes_only_targets():
    model, params = _tiny_model()
    N = model.config.seq_len
    B = 2
    rng = np.random.default_rng(4)
    codes = rng.integers(0, 32, size=(B, N)).astype(np.int32)
    fixed = np.zeros((B, N), bool)
    fixed[:, :8] = True
    out = draft_and_revise(
        model, params, jax.random.key(5),
        jnp.asarray(codes),
        ctx_mask=jnp.asarray(fixed),
        n_draft=4, n_revise=4, M=2,
    )
    out = np.asarray(out)
    np.testing.assert_array_equal(out[:, :8], codes[:, :8])
    assert (out[:, 8:] != codes[:, 8:]).any()


def test_revise_only_with_skip_draft():
    model, params = _tiny_model()
    N = model.config.seq_len
    B = 1
    rng = np.random.default_rng(6)
    codes = rng.integers(0, 32, size=(B, N)).astype(np.int32)
    out = draft_and_revise(
        model, params, jax.random.key(7),
        jnp.asarray(codes), n_revise=4, M=1, skip_draft=True,
    )
    assert out.shape == (B, N)


def test_entp_and_ar_strategies():
    from mebt_tpu.sampler.decode import entp_sample

    model, params = _tiny_model()
    N = model.config.seq_len
    plan = maskgit_plan(N, 6, "cosine")
    st = entp_sample(model, params, jax.random.key(8), 2, plan)
    assert np.asarray(st.ctx_mask).sum(1).tolist() == [plan.n_contexts[-1]] * 2

    # 'ar' reveals strictly in position order: after k steps the context
    # must be a prefix of the position range
    from mebt_tpu.sampler.mask_schedule import bootstrap_plan

    ar_plan = bootstrap_plan(N, 10)
    st = maskgit_sample(
        model, params, jax.random.key(9), 1, ar_plan, strategy="ar"
    )
    ctx = np.asarray(st.ctx_mask)[0]
    n = ctx.sum()
    assert n == 10
    assert ctx[:n].all() and not ctx[n:].any()


def test_decode_history():
    model, params = _tiny_model()
    N = model.config.seq_len
    plan = maskgit_plan(N, 5, "cosine")
    state, (codes_hist, ctx_hist) = maskgit_sample(
        model, params, jax.random.key(11), 2, plan, return_history=True
    )
    assert codes_hist.shape == (5, 2, N)
    assert ctx_hist.shape == (5, 2, N)
    # context counts grow monotonically step over step
    counts = np.asarray(ctx_hist).sum(-1)[:, 0]
    assert (np.diff(counts) >= 0).all()
    np.testing.assert_array_equal(
        np.asarray(codes_hist[-1]), np.asarray(state.codes)
    )
