"""Staged (compacted-target) decode vs the dense full-canvas scan.

The staged path (sampler/decode.py:_staged_sample) must be an exact
drop-in for the dense scan: the dec-phase token computation is
per-token, so gathering targets into a compact bucket changes nothing
numerically. These tests pin that equivalence:

  * stage_a + stage_b_compact logits == dense __call__ logits at target
    positions (bit-exact on CPU).
  * a full staged decode with deterministic settings (temperature -> 0,
    ctemp = 0: argmax sampling, pure top-k promotion) produces exactly
    the same codes and context mask as the dense scan.
  * the random/bootstrap fast path promotes per plan and fills the
    canvas.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mebt_tpu.models.mebt import MeBT, MeBTConfig, transformer_split
from mebt_tpu.sampler.decode import compact_indices, maskgit_sample
from mebt_tpu.sampler.mask_schedule import (
    bootstrap_plan,
    maskgit_plan,
    plan_segments,
)

pytestmark = pytest.mark.slow  # >60s wall; excluded from the fast CI path

STAGEABLE_MODES = (
    "latent_enc", "latent_self", "latent_enc", "latent_self",
    "latent_dec", "lt2l", "latent_dec", "lt2l",
)


@pytest.fixture(scope="module")
def small_model():
    cfg = MeBTConfig(
        vocab_size=64,
        block_size=48,
        n_layer=8,
        n_head=2,
        n_embd=16,
        sos_emb=8,
        latent_shape=(3, 4, 4),
        mode=STAGEABLE_MODES,
    )
    model = MeBT(cfg)
    rng = jax.random.PRNGKey(0)
    codes = jnp.zeros((2, cfg.seq_len), jnp.int32)
    masks = jnp.zeros((2, cfg.seq_len), bool)
    params = model.init(rng, codes, masks, ~masks)["params"]
    return model, params


def test_staged_split_detection():
    assert transformer_split(MeBTConfig(mode=STAGEABLE_MODES, n_layer=8)) == 4
    # canonical 24-layer routing from configs/*/mebt_*.yaml
    canonical = (
        ["latent_enc", "latent_self"] * 6
        + ["latent_enc"]
        + ["latent_dec", "lt2l"] * 5
        + ["latent_dec"]
    )
    assert transformer_split(MeBTConfig(mode=tuple(canonical))) == 13
    # maskgit fallback padding is not stageable
    assert transformer_split(MeBTConfig(mode=("latent_enc",), n_layer=4)) is None
    # latent_enc after latent_dec is not stageable
    bad = ("latent_enc", "latent_dec", "latent_enc", "latent_dec")
    assert transformer_split(MeBTConfig(mode=bad, n_layer=4)) is None


def test_compact_indices_roundtrip():
    rng = np.random.default_rng(0)
    mask = rng.random((3, 17)) < 0.4
    M = int(mask.sum(-1).max()) + 2
    idx = np.asarray(compact_indices(jnp.asarray(mask), M))
    for b in range(3):
        want = np.nonzero(mask[b])[0]
        got = idx[b][idx[b] < 17]
        np.testing.assert_array_equal(got, want)
        # padding slots point out of range
        assert np.all(idx[b][len(want):] == 17)


def test_staged_forward_matches_dense(small_model):
    model, params = small_model
    N = model.config.seq_len
    B = 2
    rng = jax.random.PRNGKey(3)
    codes = jax.random.randint(rng, (B, N), 0, model.config.vocab_size)
    ctx = jax.random.uniform(jax.random.PRNGKey(4), (B, N)) < 0.5
    tgt = ~ctx
    dense = model.apply({"params": params}, codes, ctx, tgt)

    tgt_np = np.asarray(tgt)
    M = int(tgt_np.sum(-1).max()) + 3
    idx = compact_indices(tgt, M)
    valid = idx < N
    latents = model.apply({"params": params}, codes, ctx, method="stage_a")
    compact = model.apply(
        {"params": params}, latents, idx, valid, method="stage_b_compact"
    )
    dn, cn, idx_np = np.asarray(dense), np.asarray(compact), np.asarray(idx)
    for b in range(B):
        live = idx_np[b] < N
        np.testing.assert_allclose(
            cn[b][live], dn[b][idx_np[b][live]], atol=1e-5, rtol=1e-5
        )


@pytest.mark.parametrize("n_ctx_init", [0, 8])
def test_staged_decode_matches_dense_deterministic(small_model, n_ctx_init):
    """temperature -> 0 + ctemp = 0 removes all sampling noise, so the
    staged and dense paths must produce bit-identical decodes."""
    model, params = small_model
    N = model.config.seq_len
    B = 2
    plan = maskgit_plan(N, 6, "cosine", "linear", n_ctx_init=n_ctx_init)
    ctx0 = None
    codes0 = None
    if n_ctx_init:
        ctx_np = np.zeros((B, N), bool)
        ctx_np[:, :n_ctx_init] = True
        ctx0 = jnp.asarray(ctx_np)
        codes0 = jax.random.randint(
            jax.random.PRNGKey(9), (B, N), 0, model.config.vocab_size
        )
    kw = dict(
        codes=codes0, ctx_mask=ctx0,
        temperature=0.0, context_temperature=0.0,
    )
    rng = jax.random.PRNGKey(7)
    dense = maskgit_sample(model, params, rng, B, plan, staged=False, **kw)
    stg = maskgit_sample(model, params, rng, B, plan, staged=True, **kw)
    np.testing.assert_array_equal(np.asarray(dense.ctx_mask),
                                  np.asarray(stg.ctx_mask))
    np.testing.assert_array_equal(np.asarray(dense.codes),
                                  np.asarray(stg.codes))
    np.testing.assert_allclose(np.asarray(dense.chosen_prob),
                               np.asarray(stg.chosen_prob), atol=1e-6)
    # cosine leaves ceil(cos(pi/2)*N) = 1 position unpromoted at t=1
    # (reference arithmetic); its code still holds the final-step sample
    assert (np.asarray(stg.ctx_mask).sum(-1) == plan.n_contexts[-1]).all()


def test_staged_entropy_decode_matches_dense(small_model):
    """entp strategy: scores are entropy-based and promotion is pure
    top-k (ctemp forced to 0), so greedy sampling makes it exact too."""
    model, params = small_model
    N = model.config.seq_len
    plan = maskgit_plan(N, 5, "cosine")
    rng = jax.random.PRNGKey(11)
    kw = dict(temperature=0.0, strategy="entp")
    dense = maskgit_sample(model, params, rng, 2, plan, staged=False, **kw)
    stg = maskgit_sample(model, params, rng, 2, plan, staged=True, **kw)
    np.testing.assert_array_equal(np.asarray(dense.codes),
                                  np.asarray(stg.codes))
    np.testing.assert_array_equal(np.asarray(dense.ctx_mask),
                                  np.asarray(stg.ctx_mask))


def test_staged_history_matches_dense(small_model):
    model, params = small_model
    N = model.config.seq_len
    plan = maskgit_plan(N, 5, "cosine")
    rng = jax.random.PRNGKey(13)
    kw = dict(temperature=0.0, context_temperature=0.0, return_history=True)
    _, hist_d = maskgit_sample(model, params, rng, 2, plan, staged=False, **kw)
    _, hist_s = maskgit_sample(model, params, rng, 2, plan, staged=True, **kw)
    np.testing.assert_array_equal(np.asarray(hist_d[0]), np.asarray(hist_s[0]))
    np.testing.assert_array_equal(np.asarray(hist_d[1]), np.asarray(hist_s[1]))


def test_staged_bootstrap_fast_path(small_model):
    """random/bootstrap promotion ignores confidence, so the staged path
    draws the promoted set before the forward; check plan-exact context
    growth and that promoted positions got real samples."""
    model, params = small_model
    N = model.config.seq_len
    B = 2
    plan = bootstrap_plan(N, 10)
    state = maskgit_sample(
        model, params, jax.random.PRNGKey(5), B, plan,
        strategy="bootstrap", staged=True,
    )
    ctx = np.asarray(state.ctx_mask)
    assert (ctx.sum(-1) == 10).all()
    # promoted positions must differ across rows with high probability
    # (random order); identical rows would indicate a broken fold-in
    assert not np.array_equal(ctx[0], ctx[1])
    # full pipeline: bootstrap then confidence decode to completion
    plan2 = maskgit_plan(N, 6, "cosine", n_ctx_init=10)
    state2 = maskgit_sample(
        model, params, jax.random.PRNGKey(6), B, plan2,
        codes=state.codes, ctx_mask=state.ctx_mask, staged=True,
    )
    assert (
        np.asarray(state2.ctx_mask).sum(-1) == plan2.n_contexts[-1]
    ).all()
    assert (np.asarray(state2.chosen_prob) <= 1.0 + 1e-6).all()


def test_staged_gibbs_matches_dense(small_model):
    """Draft-and-revise with compacted chunks must equal the dense scan
    under greedy sampling (chunk assignment consumes identical RNG in
    both paths; temperature -> 0 removes the sampling noise)."""
    from mebt_tpu.sampler.decode import draft_and_revise

    model, params = small_model
    N = model.config.seq_len
    B = 2
    codes0 = jax.random.randint(
        jax.random.PRNGKey(21), (B, N), 0, model.config.vocab_size
    )
    for skip_draft in (False, True):
        kw = dict(
            n_draft=4, draft_t=0.0, n_revise=6, revise_t=0.0, M=2,
            skip_draft=skip_draft,
        )
        rng = jax.random.PRNGKey(22)
        dense = draft_and_revise(
            model, params, rng, codes0, staged=False, **kw
        )
        stg = draft_and_revise(model, params, rng, codes0, staged=True, **kw)
        np.testing.assert_array_equal(np.asarray(dense), np.asarray(stg))


def test_staged_gibbs_respects_fixed_context(small_model):
    from mebt_tpu.sampler.decode import draft_and_revise

    model, params = small_model
    N = model.config.seq_len
    B = 2
    codes0 = jax.random.randint(
        jax.random.PRNGKey(31), (B, N), 0, model.config.vocab_size
    )
    ctx = np.zeros((B, N), bool)
    ctx[:, :10] = True
    out = draft_and_revise(
        model, params, jax.random.PRNGKey(32), codes0,
        ctx_mask=jnp.asarray(ctx), n_draft=3, n_revise=3, M=1, staged=True,
    )
    np.testing.assert_array_equal(
        np.asarray(out)[:, :10], np.asarray(codes0)[:, :10]
    )


def test_staged_gibbs_small_target_count(small_model):
    """n_tgt < n_revise used to compute a ZERO revise bucket
    (n_tgt - (n-1)*1 < 0 rounded to 0), silently skipping every update;
    the bucket must clamp to >= 1 and match the dense scan."""
    from mebt_tpu.sampler.decode import draft_and_revise

    model, params = small_model
    N = model.config.seq_len
    B = 2
    codes0 = jax.random.randint(
        jax.random.PRNGKey(41), (B, N), 0, model.config.vocab_size
    )
    ctx = np.ones((B, N), bool)
    ctx[:, -5:] = False  # 5 targets, n_revise=8 > 5
    rng = jax.random.PRNGKey(42)
    kw = dict(
        ctx_mask=jnp.asarray(ctx), n_revise=8, revise_t=0.0, M=1,
        skip_draft=True,
    )
    dense = draft_and_revise(model, params, rng, codes0, staged=False, **kw)
    stg = draft_and_revise(model, params, rng, codes0, staged=True, **kw)
    np.testing.assert_array_equal(np.asarray(dense), np.asarray(stg))


def test_staged_gibbs_heterogeneous_rows(small_model):
    """Per-row context counts differ -> per-row chunk/spill sizes differ;
    buckets must cover the max over ROWS (ADVICE r2 medium)."""
    from mebt_tpu.sampler.decode import draft_and_revise

    model, params = small_model
    N = model.config.seq_len  # 48
    B = 2
    codes0 = jax.random.randint(
        jax.random.PRNGKey(43), (B, N), 0, model.config.vocab_size
    )
    ctx = np.zeros((B, N), bool)
    ctx[0, :37] = True  # row 0: 11 targets
    ctx[1, :5] = True   # row 1: 43 targets
    rng = jax.random.PRNGKey(44)
    for skip_draft in (False, True):
        kw = dict(
            ctx_mask=jnp.asarray(ctx), n_draft=4, draft_t=0.0,
            n_revise=6, revise_t=0.0, M=2, skip_draft=skip_draft,
        )
        dense = draft_and_revise(
            model, params, rng, codes0, staged=False, **kw
        )
        stg = draft_and_revise(model, params, rng, codes0, staged=True, **kw)
        np.testing.assert_array_equal(np.asarray(dense), np.asarray(stg))


def test_gibbs_chunk_counts_match_assignment():
    """_gibbs_chunk_counts must agree with the live chunk assignment of
    _random_chunk_ids for heterogeneous rows, including the
    non-monotonic spill (79 tgts/8 chunks spills 16; 80 spills 10)."""
    from mebt_tpu.sampler.decode import _gibbs_chunk_counts, _random_chunk_ids

    n_chunks = 8
    n_tgts = [79, 80, 3, 0, 200]
    N = 256
    mask = np.zeros((len(n_tgts), N), bool)
    for b, nt in enumerate(n_tgts):
        mask[b, :nt] = True
    ids = np.asarray(
        _random_chunk_ids(jax.random.PRNGKey(1), jnp.asarray(mask), n_chunks)
    )
    counts = _gibbs_chunk_counts(np.asarray(n_tgts), n_chunks)
    for b in range(len(n_tgts)):
        live = np.bincount(ids[b][ids[b] >= 0], minlength=n_chunks)
        np.testing.assert_array_equal(live, counts[b])
    assert counts[0, -1] == 16 and counts[1, -1] == 10


def test_zero_step_plan_history(small_model):
    """A zero-step plan must return an empty history instead of raising
    in the tree_map concatenate (ADVICE r2 low)."""
    model, params = small_model
    N = model.config.seq_len
    plan = maskgit_plan(N, 0, "cosine")
    assert plan.do_step.shape == (0,)
    state, hist = maskgit_sample(
        model, params, jax.random.PRNGKey(51), 2, plan,
        return_history=True, staged=True,
    )
    assert hist[0].shape[0] == 0 and hist[1].shape[0] == 0
    assert np.asarray(state.ctx_mask).sum() == 0


def test_staged_plan_mask_mismatch_raises(small_model):
    """A ctx_mask whose context count disagrees with plan.n_ctx_init
    must raise instead of silently truncating targets (ADVICE r2 low)."""
    model, params = small_model
    N = model.config.seq_len
    B = 2
    plan = maskgit_plan(N, 4, "cosine", n_ctx_init=8)
    ctx = np.zeros((B, N), bool)
    ctx[:, :5] = True  # 5 != plan's 8
    with pytest.raises(ValueError, match="n_ctx_init"):
        maskgit_sample(
            model, params, jax.random.PRNGKey(52), B, plan,
            codes=jnp.zeros((B, N), jnp.int32), ctx_mask=jnp.asarray(ctx),
            staged=True,
        )
    with pytest.raises(ValueError, match="n_ctx_init"):
        maskgit_sample(
            model, params, jax.random.PRNGKey(53), B, plan, staged=True
        )


@pytest.fixture(scope="module")
def wide_model():
    """N=256 model: large enough that the 128-aligned context buckets
    are strictly smaller than N, so the compact-context stage_a path
    (stage_a_compact) runs with real partial buckets."""
    cfg = MeBTConfig(
        vocab_size=64,
        block_size=256,
        n_layer=4,
        n_head=2,
        n_embd=16,
        sos_emb=8,
        latent_shape=(4, 8, 8),
        mode=("latent_enc", "latent_self", "latent_dec", "lt2l"),
    )
    model = MeBT(cfg)
    codes = jnp.zeros((1, cfg.seq_len), jnp.int32)
    masks = jnp.zeros((1, cfg.seq_len), bool)
    params = model.init(jax.random.PRNGKey(0), codes, masks, ~masks)["params"]
    return model, params


def test_stage_a_compact_matches_dense(wide_model):
    model, params = wide_model
    N = model.config.seq_len
    B = 2
    codes = jax.random.randint(
        jax.random.PRNGKey(61), (B, N), 0, model.config.vocab_size
    )
    for n_ctx in (0, 1, 37):
        ctx = np.zeros((B, N), bool)
        if n_ctx:
            for b in range(B):
                ctx[b, np.random.default_rng(b).choice(N, n_ctx, False)] = True
        ctxj = jnp.asarray(ctx)
        dense = model.apply({"params": params}, codes, ctxj, method="stage_a")
        C = max(8, n_ctx + 3)  # bucket with padding slots
        cidx = compact_indices(ctxj, C)
        compact = model.apply(
            {"params": params}, codes, cidx, cidx < N,
            method="stage_a_compact",
        )
        np.testing.assert_allclose(
            np.asarray(compact), np.asarray(dense), atol=1e-5, rtol=1e-5
        )


def test_staged_ctx_compaction_matches_dense(wide_model):
    """Deterministic decode at N=256: segment ctx buckets (128-aligned)
    are < N for the early segments, so this pins the partial-bucket
    compact-context path against the dense scan."""
    model, params = wide_model
    N = model.config.seq_len
    B = 2
    plan = maskgit_plan(N, 6, "cosine", "linear", n_ctx_init=8)
    # sanity: at least one segment must get a ctx bucket < N
    nt = plan.n_targets_before(N)
    segs = plan_segments(plan, N)
    assert any(-(-max(1, N - int(nt[e - 1])) // 128) * 128 < N
               for s, e, b in segs)
    ctx_np = np.zeros((B, N), bool)
    ctx_np[:, :8] = True
    codes0 = jax.random.randint(
        jax.random.PRNGKey(62), (B, N), 0, model.config.vocab_size
    )
    kw = dict(
        codes=codes0, ctx_mask=jnp.asarray(ctx_np),
        temperature=0.0, context_temperature=0.0,
    )
    rng = jax.random.PRNGKey(63)
    dense = maskgit_sample(model, params, rng, B, plan, staged=False, **kw)
    stg = maskgit_sample(model, params, rng, B, plan, staged=True, **kw)
    np.testing.assert_array_equal(np.asarray(dense.codes),
                                  np.asarray(stg.codes))
    np.testing.assert_array_equal(np.asarray(dense.ctx_mask),
                                  np.asarray(stg.ctx_mask))


def test_staged_bootstrap_ctx_compaction(wide_model):
    """Bootstrap at N=256: the ctx bucket (128) is far below N; the
    plan-exact context growth and full-canvas fill must survive the
    compact-context enc phase."""
    model, params = wide_model
    N = model.config.seq_len
    plan = bootstrap_plan(N, 12)
    state = maskgit_sample(
        model, params, jax.random.PRNGKey(64), 2, plan,
        strategy="bootstrap", staged=True,
    )
    ctx = np.asarray(state.ctx_mask)
    assert (ctx.sum(-1) == 12).all()
    assert not np.array_equal(ctx[0], ctx[1])
    plan2 = maskgit_plan(N, 5, "cosine", n_ctx_init=12)
    state2 = maskgit_sample(
        model, params, jax.random.PRNGKey(65), 2, plan2,
        codes=state.codes, ctx_mask=state.ctx_mask, staged=True,
    )
    assert (
        np.asarray(state2.ctx_mask).sum(-1) == plan2.n_contexts[-1]
    ).all()


def test_plan_segments_cover_and_bound():
    plan = maskgit_plan(8192, 32, "cosine", n_ctx_init=64)
    segs = plan_segments(plan, 8192, max_segments=4, align=128)
    nt = plan.n_targets_before(8192)
    assert segs[0][0] == 0 and segs[-1][1] == plan.n_steps
    for (s, e, b), (s2, e2, b2) in zip(segs, segs[1:]):
        assert e == s2
        assert b > b2  # buckets strictly shrink after merging
    for s, e, b in segs:
        assert b >= nt[s:e].max()
        assert b <= 8192
    # the staged plan must beat the dense cost materially on cosine-32
    dense_cost = plan.n_steps * 8192
    staged_cost = sum((e - s) * b for s, e, b in segs)
    assert staged_cost < 0.85 * dense_cost


# ---------------------------------------------------------------------------
# fused streaming top-k (v2) wiring: MEBT_FUSED_TOPK routes the top-k
# sampling through ops/head_sample_pallas.fused_head_topk_sample_v2 with
# a lax.cond fallback to the unfused exact path on buffer overflow.


@pytest.mark.parametrize("top_k", [5, 16])
def test_fused_topk_decode_matches_unfused_greedy(
    small_model, monkeypatch, top_k
):
    """Greedy (temperature -> 0) makes both noise sources inert, so the
    fused-kernel decode must produce exactly the unfused codes/masks.
    top_k=5 stays under the kernel's per-slice candidate budget (accept
    branch); top_k=16 exceeds the kernel's m=14 default with the
    64-vocab single slice, so every row overflows and the lax.cond
    fallback must kick in (its output is the unfused path itself, so
    equality proves the cond wiring end to end)."""
    from jax.experimental.pallas import tpu as pltpu

    model, params = small_model
    N = model.config.seq_len
    plan = maskgit_plan(N, 4, "cosine")
    rng = jax.random.PRNGKey(21)
    kw = dict(
        temperature=0.0, context_temperature=0.0, top_k=top_k, staged=True
    )
    monkeypatch.delenv("MEBT_FUSED_TOPK", raising=False)
    base = maskgit_sample(model, params, rng, 2, plan, **kw)
    monkeypatch.setenv("MEBT_FUSED_TOPK", "force")
    jax.clear_caches()  # the env gate is read at trace time
    try:
        with pltpu.force_tpu_interpret_mode():
            fused = maskgit_sample(model, params, rng, 2, plan, **kw)
    finally:
        jax.clear_caches()  # don't leak force-gated traces to other tests
    np.testing.assert_array_equal(
        np.asarray(base.codes), np.asarray(fused.codes)
    )
    np.testing.assert_array_equal(
        np.asarray(base.ctx_mask), np.asarray(fused.ctx_mask)
    )
    np.testing.assert_allclose(
        np.asarray(base.chosen_prob), np.asarray(fused.chosen_prob),
        atol=1e-5,
    )
