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
