"""Sampling op tests."""

import numpy as np
import jax
import jax.numpy as jnp

from mebt_tpu.ops.sampling import (
    exact_rank_desc,
    promote_targets,
    sample_tokens,
    top_k_logits,
    top_p_probs,
)


def test_fast_path_matches_slow_path_selection():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(4, 16, 64)) * 3, jnp.float32)
    key = jax.random.key(1)
    s_fast, p_fast, none = sample_tokens(key, logits, 0.9, None, None)
    assert none is None
    s_slow, p_slow, probs = sample_tokens(
        key, logits, 0.9, None, None, need_probs=True
    )
    np.testing.assert_array_equal(np.asarray(s_fast), np.asarray(s_slow))
    np.testing.assert_allclose(
        np.asarray(p_fast), np.asarray(p_slow), rtol=1e-5, atol=1e-6
    )
    assert probs.shape == logits.shape


def test_top_k_keeps_k():
    logits = jnp.asarray([[1.0, 5.0, 3.0, 2.0]])
    out = np.asarray(top_k_logits(logits, 2))
    assert np.isfinite(out[0, [1, 2]]).all()
    assert (out[0, [0, 3]] < -1e30).all()


def test_top_p_renormalizes():
    probs = jnp.asarray([[0.5, 0.3, 0.15, 0.05]])
    out = np.asarray(top_p_probs(probs, 0.7))
    # cum: 0.5, 0.8 -> keep first two (first crossing kept), rest zeroed
    assert out[0, 2] == 0 and out[0, 3] == 0
    np.testing.assert_allclose(out.sum(), 1.0, rtol=1e-6)
    np.testing.assert_allclose(out[0, 0] / out[0, 1], 0.5 / 0.3, rtol=1e-5)


def test_exact_rank_desc():
    v = jnp.asarray([[3.0, 1.0, 2.0], [0.0, -1.0, 5.0]])
    r = np.asarray(exact_rank_desc(v))
    np.testing.assert_array_equal(r, [[0, 2, 1], [1, 2, 0]])


def test_promote_targets_counts_and_mask():
    rng = jax.random.key(0)
    B, N = 3, 32
    scores = jax.random.uniform(jax.random.key(1), (B, N))
    tgt = jnp.zeros((B, N), bool).at[:, 8:].set(True)
    pr = promote_targets(rng, scores, tgt, jnp.int32(5), jnp.float32(2.0))
    pr = np.asarray(pr)
    assert (pr.sum(1) == 5).all()
    assert not pr[:, :8].any()
    # n_new = 0 promotes nothing
    pr0 = promote_targets(rng, scores, tgt, jnp.int32(0), jnp.float32(2.0))
    assert not np.asarray(pr0).any()


def test_sample_topk_tokens_matches_filtered_path():
    """The direct top-k sampler must agree with the materialized
    filter + full-vocab gumbel path: exactly under greedy decoding, and
    in chosen_prob for the sampled token."""
    from mebt_tpu.ops.sampling import (
        sample_topk_tokens,
        top_k_logits,
    )

    rng = np.random.default_rng(6)
    logits = jnp.asarray(rng.standard_normal((4, 9, 512)).astype(np.float32))

    # greedy: temperature -> 0 makes both paths argmax of the top-k set
    s_fast, p_fast = sample_topk_tokens(jax.random.PRNGKey(0), logits, 16, 0.0)
    filt = top_k_logits(logits / 1e-8, 16)
    s_ref = jnp.argmax(filt, axis=-1)
    np.testing.assert_array_equal(np.asarray(s_fast), np.asarray(s_ref))

    # chosen_prob: probability under the filtered softmax at temp 1
    s, p = sample_topk_tokens(jax.random.PRNGKey(1), logits, 16, 1.0)
    filt = top_k_logits(jnp.asarray(logits), 16)
    probs = jax.nn.softmax(filt, axis=-1)
    want = np.take_along_axis(
        np.asarray(probs), np.asarray(s)[..., None], axis=-1
    )[..., 0]
    np.testing.assert_allclose(np.asarray(p), want, rtol=1e-5, atol=1e-6)
    # sampled tokens always lie inside the top-k set
    kth = jnp.sort(logits, axis=-1)[..., -16:-15]
    chosen_logit = np.take_along_axis(
        np.asarray(logits), np.asarray(s)[..., None], axis=-1
    )[..., 0]
    assert (chosen_logit >= np.asarray(kth)[..., 0] - 1e-6).all()
