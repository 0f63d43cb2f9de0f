"""Fused head+sampling kernel vs the unfused reference semantics.

Interpret mode's in-kernel PRNG is a zeros stub, so the noise-dependent
tests (distribution, per-row independence) only run on a real TPU
backend; the greedy and chosen-prob contracts are noise-independent and
run everywhere."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jax.experimental.pallas import tpu as pltpu

from mebt_tpu.ops.head_sample_pallas import (
    fused_head_sample,
    fused_head_topk_sample,
)

pytestmark = pytest.mark.slow  # >60s wall; excluded from the fast CI path

def _setup(rng, R, D, V):
    x = jnp.asarray(rng.normal(size=(R, D)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(D, V)).astype(np.float32) * 0.05)
    return x, w


def test_greedy_matches_argmax():
    """temperature -> 0 removes the gumbel noise: the sample must be the
    argmax of the logits and chosen_prob -> 1."""
    rng = np.random.default_rng(0)
    x, w = _setup(rng, 72, 32, 256)  # R not divisible by row_tile
    with pltpu.force_tpu_interpret_mode():
        s, p = fused_head_sample(
            x, w, jnp.uint32(7), temperature=0.0,
            row_tile=16, vocab_chunk=128,
        )
    want = np.argmax(np.asarray(x) @ np.asarray(w), axis=-1)
    np.testing.assert_array_equal(np.asarray(s), want)
    np.testing.assert_allclose(np.asarray(p), 1.0, atol=1e-5)


def test_chosen_prob_is_softmax_at_sample():
    rng = np.random.default_rng(1)
    x, w = _setup(rng, 64, 32, 256)
    temp = 1.3
    with pltpu.force_tpu_interpret_mode():
        s, p = fused_head_sample(
            x, w, jnp.uint32(3), temperature=temp,
            row_tile=32, vocab_chunk=128,
        )
    logits = (np.asarray(x) @ np.asarray(w)) / temp
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    want = np.take_along_axis(probs, np.asarray(s)[:, None], axis=-1)[:, 0]
    np.testing.assert_allclose(np.asarray(p), want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("V", [96, 300, 700])
def test_greedy_non_divisible_vocab(V):
    """Vocab sizes that don't divide the chunk width are handled by
    lane-padding W and masking the padding columns in-kernel — the
    padding must never be sampled nor perturb the probabilities."""
    rng = np.random.default_rng(4)
    x, w = _setup(rng, 40, 32, V)
    with pltpu.force_tpu_interpret_mode():
        s, p = fused_head_sample(
            x, w, jnp.uint32(9), temperature=0.0,
            row_tile=16, vocab_chunk=256,
        )
    logits = np.asarray(x) @ np.asarray(w)
    want = np.argmax(logits, axis=-1)
    np.testing.assert_array_equal(np.asarray(s), want)
    assert (np.asarray(s) < V).all()
    np.testing.assert_allclose(np.asarray(p), 1.0, atol=1e-5)


def test_chosen_prob_non_divisible_vocab():
    """Padding columns must not contribute to the logsumexp."""
    rng = np.random.default_rng(5)
    V = 200
    x, w = _setup(rng, 32, 16, V)
    temp = 0.9
    with pltpu.force_tpu_interpret_mode():
        s, p = fused_head_sample(
            x, w, jnp.uint32(13), temperature=temp,
            row_tile=32, vocab_chunk=128,
        )
    logits = (np.asarray(x) @ np.asarray(w)) / temp
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    want = np.take_along_axis(probs, np.asarray(s)[:, None], axis=-1)[:, 0]
    np.testing.assert_allclose(np.asarray(p), want, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# fused top-k kernel. Interpret-mode PRNG is a zeros stub -> constant
# gumbel shift -> the winner is always the global argmax, and chosen_prob
# exercises the exact top-k buffer (threshold + logsumexp over the k set).


@pytest.mark.parametrize("k,V,vc", [(4, 256, 128), (32, 700, 256), (8, 96, 512)])
def test_topk_greedy_and_prob(k, V, vc):
    rng = np.random.default_rng(6)
    x, w = _setup(rng, 72, 32, V)
    temp = 1.1
    with pltpu.force_tpu_interpret_mode():
        s, p = fused_head_topk_sample(
            x, w, jnp.uint32(21), k, temperature=temp,
            row_tile=16, vocab_chunk=vc,
        )
    logits = (np.asarray(x) @ np.asarray(w)) / (temp + 1e-8)
    want_s = np.argmax(logits, axis=-1)
    np.testing.assert_array_equal(np.asarray(s), want_s)
    # chosen_prob under the top-k FILTERED softmax — validates the whole
    # running buffer (kth threshold + all k values via the logsumexp)
    kth = np.sort(logits, axis=-1)[:, -k:]
    lse = kth.max(-1) + np.log(np.exp(kth - kth.max(-1, keepdims=True)).sum(-1))
    want_p = np.exp(logits.max(-1) - lse)
    np.testing.assert_allclose(np.asarray(p), want_p, rtol=1e-4, atol=1e-6)


def test_topk_k_geq_vocab_matches_unfiltered():
    """k >= V degenerates to the unfiltered softmax."""
    rng = np.random.default_rng(7)
    V = 128
    x, w = _setup(rng, 32, 16, V)
    with pltpu.force_tpu_interpret_mode():
        s, p = fused_head_topk_sample(
            x, w, jnp.uint32(3), 999, temperature=1.0,
            row_tile=32, vocab_chunk=128,
        )
    logits = np.asarray(x) @ np.asarray(w)
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    np.testing.assert_array_equal(np.asarray(s), np.argmax(logits, -1))
    np.testing.assert_allclose(
        np.asarray(p), probs.max(-1), rtol=1e-4, atol=1e-6
    )


def _require_tpu():
    if jax.default_backend() != "tpu":
        pytest.skip("in-kernel PRNG is a zeros stub off-TPU")


def test_topk_sampling_distribution():
    """TPU only: empirical frequencies over identical rows must match
    the top-k-filtered softmax — tokens outside the top-k must never be
    drawn."""
    _require_tpu()
    rng = np.random.default_rng(8)
    D, V, R, k = 16, 256, 4096, 8
    xrow = rng.normal(size=(1, D)).astype(np.float32)
    x = jnp.asarray(np.repeat(xrow, R, axis=0))
    w = jnp.asarray(rng.normal(size=(D, V)).astype(np.float32) * 0.5)
    s, _ = fused_head_topk_sample(
        x, w, jnp.uint32(17), k, temperature=1.0,
        row_tile=128, vocab_chunk=128,
    )
    logits = (xrow @ np.asarray(w))[0]
    top = np.argsort(logits)[-k:]
    counts = np.bincount(np.asarray(s), minlength=V)
    assert counts[np.setdiff1d(np.arange(V), top)].sum() == 0
    probs = np.exp(logits[top] - logits[top].max())
    probs /= probs.sum()
    freq = counts[top] / R
    tol = 4 * np.sqrt(probs * (1 - probs) / R) + 1e-3
    assert (np.abs(freq - probs) < tol).all(), (freq, probs)


def test_sampling_distribution():
    """Many rows with identical logits: empirical token frequencies must
    match the softmax (chi-square-ish bound)."""
    _require_tpu()
    rng = np.random.default_rng(2)
    D, V, R = 16, 256, 4096
    xrow = rng.normal(size=(1, D)).astype(np.float32)
    x = jnp.asarray(np.repeat(xrow, R, axis=0))
    w = jnp.asarray(rng.normal(size=(D, V)).astype(np.float32) * 0.5)
    s, _ = fused_head_sample(
        x, w, jnp.uint32(11), temperature=1.0,
        row_tile=128, vocab_chunk=128,
    )
    logits = (xrow @ np.asarray(w))[0]
    probs = np.exp(logits - logits.max())
    probs /= probs.sum()
    counts = np.bincount(np.asarray(s), minlength=V) / R
    # each row uses a distinct seed-derived stream per tile; tolerance
    # ~4 sigma of a binomial at R draws
    tol = 4 * np.sqrt(probs * (1 - probs) / R) + 1e-3
    assert (np.abs(counts - probs) < tol).all(), (counts, probs)


def test_rows_get_independent_noise():
    """Identical rows must not all sample the same token (distinct noise
    per row within a tile)."""
    _require_tpu()
    rng = np.random.default_rng(3)
    x = jnp.asarray(np.ones((256, 16), np.float32))
    w = jnp.asarray(rng.normal(size=(16, 128)).astype(np.float32) * 0.1)
    s, _ = fused_head_sample(
        x, w, jnp.uint32(5), temperature=1.0,
        row_tile=256, vocab_chunk=128,
    )
    assert len(np.unique(np.asarray(s))) > 5


# ---------------------------------------------------------------------------
# fused top-k v2 (fixed unroll + overflow flag). Same zeros-stub PRNG
# caveat: off-TPU the gumbel shift is a per-call constant, so the winner
# is the argmax and the noise-dependent tests are TPU-gated.

from mebt_tpu.ops.head_sample_pallas import fused_head_topk_sample_v2


def _np_topk_overflow(logits, k, vc, m):
    """Expected overflow flags: a row overflows iff some vocab chunk
    holds more than m members of the row's top-k SET (the k largest
    values INCLUDING the kth — a chunk with m values above the kth
    plus the kth itself still misses the kth). Assumes no exact value
    ties at the kth (measure-zero for continuous logits; the kernel's
    strict > on the remaining max makes ties not flag)."""
    R, V = logits.shape
    Vp = -(-V // 128) * 128
    vcc = min(vc, Vp)
    top_idx = np.argsort(logits, axis=-1)[:, -k:]  # top-k set indices
    member = np.zeros_like(logits, dtype=bool)
    np.put_along_axis(member, top_idx, True, axis=-1)
    flags = np.zeros(R, bool)
    for c in range(0, V, vcc):
        flags |= member[:, c:c + vcc].sum(-1) > m
    return flags


@pytest.mark.parametrize("k,V,vc", [(4, 256, 128), (32, 700, 256), (8, 96, 512)])
def test_topk_v2_greedy_and_prob_exact_when_m_eq_k(k, V, vc):
    """m = k can never miss (a chunk holds at most k of the top-k), so
    the buffer is exact, overflow must never flag, and greedy winner +
    filtered-softmax chosen_prob match numpy."""
    rng = np.random.default_rng(16)
    x, w = _setup(rng, 72, 32, V)
    temp = 1.1
    with pltpu.force_tpu_interpret_mode():
        s, p, ovf = fused_head_topk_sample_v2(
            x, w, jnp.uint32(21), k, temperature=temp,
            row_tile=16, vocab_chunk=vc, m=k,
        )
    assert not np.asarray(ovf).any()
    logits = (np.asarray(x) @ np.asarray(w)) / (temp + 1e-8)
    np.testing.assert_array_equal(np.asarray(s), np.argmax(logits, -1))
    kth = np.sort(logits, axis=-1)[:, -k:]
    lse = kth.max(-1) + np.log(
        np.exp(kth - kth.max(-1, keepdims=True)).sum(-1)
    )
    want_p = np.exp(logits.max(-1) - lse)
    np.testing.assert_allclose(np.asarray(p), want_p, rtol=1e-4, atol=1e-6)


def test_topk_v2_overflow_flags_concentrated_rows():
    """Rows whose top-k concentrates >m members into one vocab chunk
    must flag overflow; spread rows must not, and their outputs stay
    exact."""
    rng = np.random.default_rng(17)
    R, V, k, m, vc = 24, 512, 8, 2, 128
    base = rng.normal(size=(R, V)).astype(np.float32)
    # rows 0..11: plant the top-k tightly inside chunk 0 (> m of them)
    base[:12, :] = np.abs(base[:12, :]) * -1.0 - 1.0  # all below 0
    for r in range(12):
        base[r, 5:5 + k] = 10.0 + np.arange(k)[::-1]
    # rows 12..: spread the top-k exactly 2 per 128-wide chunk (== m,
    # never more) across the 4 chunks
    spread = np.array([c * 128 + off for c in range(4) for off in (7, 80)])
    for r in range(12, R):
        base[r, :] = -np.abs(base[r, :]) - 1.0
        base[r, spread] = 10.0 + np.arange(k)
    x = jnp.asarray(base)  # D == V with identity head
    w = jnp.eye(V, dtype=jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        s, p, ovf = fused_head_topk_sample_v2(
            x, w, jnp.uint32(5), k, temperature=1.0,
            row_tile=8, vocab_chunk=vc, m=m,
        )
    ovf = np.asarray(ovf).astype(bool)
    want = _np_topk_overflow(base, k, vc, m)
    np.testing.assert_array_equal(ovf, want)
    assert ovf[:12].all() and not ovf[12:].any()
    # non-overflow rows are exact: greedy winner + filtered prob
    logits = base
    kth = np.sort(logits, axis=-1)[:, -k:]
    lse = kth.max(-1) + np.log(
        np.exp(kth - kth.max(-1, keepdims=True)).sum(-1)
    )
    want_p = np.exp(logits.max(-1) - lse)
    ok = ~ovf
    np.testing.assert_array_equal(np.asarray(s)[ok], np.argmax(logits, -1)[ok])
    np.testing.assert_allclose(np.asarray(p)[ok], want_p[ok], rtol=1e-4)


def test_topk_v2_non_divisible_vocab_and_rows():
    """Lane padding (rows and vocab) must never be sampled, flag
    overflow, or leak into the probabilities."""
    rng = np.random.default_rng(18)
    V, k = 300, 6
    x, w = _setup(rng, 41, 16, V)
    with pltpu.force_tpu_interpret_mode():
        s, p, ovf = fused_head_topk_sample_v2(
            x, w, jnp.uint32(9), k, temperature=0.7,
            row_tile=16, vocab_chunk=128, m=k,
        )
    assert not np.asarray(ovf).any()
    logits = (np.asarray(x) @ np.asarray(w)) / (0.7 + 1e-8)
    assert (np.asarray(s) < V).all()
    np.testing.assert_array_equal(np.asarray(s), np.argmax(logits, -1))
    kth = np.sort(logits, axis=-1)[:, -k:]
    lse = kth.max(-1) + np.log(
        np.exp(kth - kth.max(-1, keepdims=True)).sum(-1)
    )
    np.testing.assert_allclose(
        np.asarray(p), np.exp(logits.max(-1) - lse), rtol=1e-4, atol=1e-6
    )


def test_topk_v2_sampling_distribution():
    """TPU only: empirical frequencies match the top-k-filtered softmax
    and never leave the top-k set."""
    _require_tpu()
    rng = np.random.default_rng(19)
    D, V, R, k = 16, 256, 4096, 8
    xrow = rng.normal(size=(1, D)).astype(np.float32)
    x = jnp.asarray(np.repeat(xrow, R, axis=0))
    w = jnp.asarray(rng.normal(size=(D, V)).astype(np.float32) * 0.5)
    s, _, ovf = fused_head_topk_sample_v2(
        x, w, jnp.uint32(23), k, temperature=1.0,
        row_tile=128, vocab_chunk=128, m=k,
    )
    assert not np.asarray(ovf).any()
    logits = (xrow @ np.asarray(w))[0]
    top = np.argsort(logits)[-k:]
    counts = np.bincount(np.asarray(s), minlength=V)
    assert counts[np.setdiff1d(np.arange(V), top)].sum() == 0
    probs = np.exp(logits[top] - logits[top].max())
    probs /= probs.sum()
    freq = counts[top] / R
    tol = 4 * np.sqrt(probs * (1 - probs) / R) + 1e-3
    assert (np.abs(freq - probs) < tol).all(), (freq, probs)


def test_topk_v2_fuzz_against_numpy():
    """Randomized configs: non-overflow rows must reproduce the exact
    filtered-softmax probability (pins the whole buffer: top-k SET,
    kth threshold, logsumexp), the stub-noise winner is the argmax,
    and the overflow flags match the numpy oracle."""
    rng = np.random.default_rng(20)
    for trial in range(8):
        V = int(rng.choice([96, 128, 257, 384]))
        k = int(rng.choice([3, 5, 9]))
        m = int(rng.choice([2, 3, k]))
        vc = int(rng.choice([128, 256]))
        sub = int(rng.choice([128, vc]))  # extraction granularity
        R = int(rng.choice([9, 24]))
        D = 16
        temp = float(rng.uniform(0.5, 1.5))
        x = jnp.asarray(rng.normal(size=(R, D)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(D, V)).astype(np.float32) * 0.3)
        with pltpu.force_tpu_interpret_mode():
            s, p, ovf = fused_head_topk_sample_v2(
                x, w, jnp.uint32(trial), k, temperature=temp,
                row_tile=8, vocab_chunk=vc, m=m, sub=sub,
            )
        # the wrapper clamps sub to the (possibly lane-padded) chunk
        sub_eff = min(sub, min(vc, -(-V // 128) * 128))
        want_ovf = _np_topk_overflow(
            (np.asarray(x) @ np.asarray(w)) / (temp + 1e-8), k, sub_eff, m
        )
        logits = (np.asarray(x) @ np.asarray(w)) / (temp + 1e-8)
        np.testing.assert_array_equal(
            np.asarray(ovf).astype(bool), want_ovf,
            err_msg=f"trial={trial} V={V} k={k} m={m} vc={vc}",
        )
        ok = ~want_ovf
        np.testing.assert_array_equal(
            np.asarray(s)[ok], np.argmax(logits, -1)[ok]
        )
        kth = np.sort(logits, axis=-1)[:, -k:]
        lse = kth.max(-1) + np.log(
            np.exp(kth - kth.max(-1, keepdims=True)).sum(-1)
        )
        np.testing.assert_allclose(
            np.asarray(p)[ok], np.exp(logits.max(-1) - lse)[ok],
            rtol=1e-4, atol=1e-6,
            err_msg=f"trial={trial} V={V} k={k} m={m} vc={vc}",
        )
