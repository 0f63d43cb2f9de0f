"""Pallas fused attention vs XLA reference (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jax.experimental.pallas import tpu as pltpu

from mebt_tpu.ops.attention import masked_attention
from mebt_tpu.ops.attention_pallas import (
    _largeq_attention,
    _largeq_backward,
    _smallq_attention,
    _smallq_backward,
    _xla_bwd,
)

pytestmark = pytest.mark.slow  # >60s wall; excluded from the fast CI path

def _rand(rng, *shape):
    return jnp.asarray(rng.normal(size=shape).astype(np.float32))


def test_smallq_flash_matches_xla_interpret():
    rng = np.random.default_rng(0)
    G, H, NQ, NK, D = 2, 4, 8, 96, 16
    q = _rand(rng, G, H, NQ, D)
    k = _rand(rng, G, H, NK, D)
    v = _rand(rng, G, H, NK, D)
    mask = jnp.asarray(rng.random((G, NK)) > 0.4)

    with pltpu.force_tpu_interpret_mode():
        got, lse = _smallq_attention(
            q, k, v, mask.astype(jnp.int32), scale=1.0 / np.sqrt(D),
            block_k=32, heads_per_cell=2,
        )
    want = masked_attention(q, k, v, mask)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )
    # lse parity against the dense formulation
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(D)
    s = jnp.where(mask[:, None, None, :], s, -jnp.inf)
    want_lse = jax.scipy.special.logsumexp(s, axis=-1, keepdims=True)
    np.testing.assert_allclose(
        np.asarray(lse), np.asarray(want_lse), rtol=1e-5, atol=1e-5
    )


def test_largeq_matches_xla_interpret():
    rng = np.random.default_rng(1)
    G, H, NQ, NK, D = 2, 4, 64, 16, 16
    q = _rand(rng, G, H, NQ, D)
    k = _rand(rng, G, H, NK, D)
    v = _rand(rng, G, H, NK, D)
    with pltpu.force_tpu_interpret_mode():
        got = _largeq_attention(
            q, k, v, scale=1.0 / np.sqrt(D), block_q=32, heads_per_cell=2
        )
    want = masked_attention(q, k, v, None)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


def test_smallq_flash_backward_matches_xla():
    """Streaming dq/dk/dv vs the fp32 XLA recompute backward, with a key
    mask, non-divisible NK padding, and a fully-masked row."""
    rng = np.random.default_rng(2)
    G, H, NQ, NK, D = 2, 4, 8, 80, 16
    q = _rand(rng, G, H, NQ, D)
    k = _rand(rng, G, H, NK, D)
    v = _rand(rng, G, H, NK, D)
    g = _rand(rng, G, H, NQ, D)
    mask_np = rng.random((G, NK)) > 0.4
    mask_np[1, :] = False  # fully-masked batch row
    mask = jnp.asarray(mask_np)

    scale = 1.0 / np.sqrt(D)
    with pltpu.force_tpu_interpret_mode():
        out, lse = _smallq_attention(
            q, k, v, mask.astype(jnp.int32), scale=scale,
            block_k=32, heads_per_cell=2,
        )
        dq, dk, dv = _smallq_backward(
            q, k, v, mask.astype(jnp.int32), out, lse, g, scale=scale,
            block_k=32, heads_per_cell=2,
        )
    dq_w, dk_w, dv_w = _xla_bwd(q, k, v, mask, g)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_w),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_w),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(dv_w),
                               rtol=1e-4, atol=1e-4)


def test_largeq_flash_backward_matches_xla():
    rng = np.random.default_rng(3)
    G, H, NQ, NK, D = 2, 4, 72, 16, 16  # NQ not divisible by block_q
    q = _rand(rng, G, H, NQ, D)
    k = _rand(rng, G, H, NK, D)
    v = _rand(rng, G, H, NK, D)
    g = _rand(rng, G, H, NQ, D)
    scale = 1.0 / np.sqrt(D)
    with pltpu.force_tpu_interpret_mode():
        dq, dk, dv = _largeq_backward(
            q, k, v, g, scale=scale, block_q=32, heads_per_cell=2
        )
    dq_w, dk_w, dv_w = _xla_bwd(q, k, v, None, g)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_w),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_w),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(dv_w),
                               rtol=1e-4, atol=1e-4)


def test_fused_attention_vjp_dispatch():
    """End-to-end jax.grad through fused_attention on CPU hits the XLA
    fallback regimes and stays finite; shape contract holds."""
    from mebt_tpu.ops.attention_pallas import fused_attention

    rng = np.random.default_rng(4)
    q = _rand(rng, 1, 2, 8, 16)
    k = _rand(rng, 1, 2, 24, 16)
    v = _rand(rng, 1, 2, 24, 16)
    mask = jnp.asarray(rng.random((1, 24)) > 0.3)

    def loss(q, k, v):
        return jnp.sum(fused_attention(q, k, v, mask) ** 2)

    dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    assert dq.shape == q.shape and dk.shape == k.shape and dv.shape == v.shape
    for a in (dq, dk, dv):
        assert bool(jnp.isfinite(a).all())


def test_dropout_attention_xla_fallback_semantics():
    """Off-TPU the dropout attention uses the dense form: rate=0 equals
    plain attention; rate>0 is an unbiased estimator (mean over many
    draws approaches the no-dropout output) and zero-masks ~rate of the
    probability mass."""
    from mebt_tpu.ops.attention_pallas import fused_dropout_attention

    rng = np.random.default_rng(5)
    G, H, NQ, NK, D = 1, 2, 4, 24, 8
    q = _rand(rng, G, H, NQ, D)
    k = _rand(rng, G, H, NK, D)
    v = _rand(rng, G, H, NK, D)
    mask = jnp.asarray(rng.random((G, NK)) > 0.3)

    base = fused_dropout_attention(q, k, v, mask, 0.0, jax.random.PRNGKey(0))
    want = masked_attention(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(base), np.asarray(want),
                               rtol=2e-5, atol=2e-5)

    outs = []
    for i in range(300):
        outs.append(np.asarray(fused_dropout_attention(
            q, k, v, mask, 0.5, jax.random.PRNGKey(i))))
    mean = np.mean(outs, axis=0)
    np.testing.assert_allclose(mean, np.asarray(want), atol=0.15)
    # individual draws differ from the mean (dropout actually happened)
    assert np.abs(outs[0] - np.asarray(want)).max() > 1e-3


def test_dropout_attention_grads_flow():
    from mebt_tpu.ops.attention_pallas import fused_dropout_attention

    rng = np.random.default_rng(6)
    q = _rand(rng, 1, 2, 4, 8)
    k = _rand(rng, 1, 2, 16, 8)
    v = _rand(rng, 1, 2, 16, 8)

    def loss(q, k, v):
        y = fused_dropout_attention(
            q, k, v, None, 0.3, jax.random.PRNGKey(7)
        )
        return jnp.sum(y * y)

    dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for a in (dq, dk, dv):
        assert bool(jnp.isfinite(a).all())
    assert float(jnp.abs(dq).max()) > 0


@pytest.mark.parametrize("regime", ["smallq", "largeq"])
def test_dropout_kernel_fwd_bwd_mask_consistency(regime):
    """TPU-only: recover the in-kernel dropout mask with basis-vector
    probes (the output is linear in v, so out columns ARE P*M/(1-p)),
    then check the VJP against an fp64 host reference built from that
    recovered mask. This is exact modulo MXU fp32 precision — finite
    differences are unusable at bf16 matmul noise levels."""
    if jax.default_backend() != "tpu":
        pytest.skip("in-kernel PRNG requires real TPU")
    from mebt_tpu.ops.attention_pallas import _fused_dropout_op

    rng = np.random.default_rng(8)
    rate = 0.3
    if regime == "smallq":
        G, H, NQ, NK, D = 1, 2, 8, 640, 64
        mask = jnp.asarray(rng.random((G, NK)) > 0.2)
        mask_np = np.asarray(mask)
    else:
        G, H, NQ, NK, D = 1, 2, 520, 256, 64
        mask = None
        mask_np = np.ones((G, NK), bool)
    q = _rand(rng, G, H, NQ, D)
    k = _rand(rng, G, H, NK, D)
    v = _rand(rng, G, H, NK, D)
    gcot = _rand(rng, G, H, NQ, D)
    seed = jnp.int32(1234)

    # determinism across calls (the whole scheme depends on it)
    o1 = _fused_dropout_op(q, k, v, mask, seed, rate)
    o2 = _fused_dropout_op(q, k, v, mask, seed, rate)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    o3 = _fused_dropout_op(q, k, v, mask, jnp.int32(77), rate)
    assert not np.array_equal(np.asarray(o1), np.asarray(o3))

    # recover P*M/(1-rate) column-by-column
    PMk = np.zeros((G, H, NQ, NK))
    for j0 in range(0, NK, D):
        vb = np.zeros((G, H, NK, D), np.float32)
        for d in range(D):
            vb[:, :, j0 + d, d] = 1.0
        out = np.asarray(
            _fused_dropout_op(q, k, jnp.asarray(vb), mask, seed, rate)
        )
        PMk[:, :, :, j0:j0 + D] = out

    q64, k64, v64, g64 = (np.asarray(a, np.float64) for a in (q, k, v, gcot))
    s = np.einsum("bhqd,bhkd->bhqk", q64, k64) / np.sqrt(D)
    s = np.where(mask_np[:, None, None, :], s, -np.inf)
    m = s.max(-1, keepdims=True)
    e = np.exp(s - m)
    e = np.where(mask_np[:, None, None, :], e, 0.0)
    P = e / e.sum(-1, keepdims=True)
    Mk = np.where(P > 1e-12, PMk / np.maximum(P, 1e-12), 0.0)
    # the recovered mask must be two-level: 0 or 1/(1-rate)
    lvl = Mk[P > 1e-6]
    assert np.all(
        (np.abs(lvl) < 0.1) | (np.abs(lvl - 1.0 / (1.0 - rate)) < 0.1)
    )
    drop_frac = float((np.abs(lvl) < 0.1).mean())
    assert abs(drop_frac - rate) < 0.05

    dPbar = np.einsum("bhqd,bhkd->bhqk", g64, v64) * Mk
    dvec = (P * dPbar).sum(-1, keepdims=True)
    ds = P * (dPbar - dvec) / np.sqrt(D)
    dq_ref = np.einsum("bhqk,bhkd->bhqd", ds, k64)
    dk_ref = np.einsum("bhqk,bhqd->bhkd", ds, q64)
    dv_ref = np.einsum("bhqk,bhqd->bhkd", P * Mk, g64)

    def loss(q_, k_, v_):
        return jnp.vdot(
            _fused_dropout_op(q_, k_, v_, mask, seed, rate), gcot
        )

    dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for a, b in [(dq, dq_ref), (dk, dk_ref), (dv, dv_ref)]:
        sc = np.abs(b).max() + 1e-9
        assert np.abs(np.asarray(a) - b).max() / sc < 2e-2
