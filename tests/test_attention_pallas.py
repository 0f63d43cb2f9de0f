"""Pallas fused attention vs XLA reference (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jax.experimental.pallas import tpu as pltpu

from mebt_tpu.ops.attention import masked_attention
from mebt_tpu.ops.attention_pallas import (
    _largeq_attention,
    _smallq_attention,
)


def _rand(rng, *shape):
    return jnp.asarray(rng.normal(size=shape).astype(np.float32))


def test_smallq_flash_matches_xla_interpret():
    rng = np.random.default_rng(0)
    G, NQ, NK, D = 2, 8, 96, 16
    q = _rand(rng, G, NQ, D)
    k = _rand(rng, G, NK, D)
    v = _rand(rng, G, NK, D)
    mask = jnp.asarray(rng.random((G, NK)) > 0.4)

    with pltpu.force_tpu_interpret_mode():
        got = _smallq_attention(
            q, k, v, mask.astype(jnp.int32), scale=1.0 / np.sqrt(D),
            block_k=32,
        )
    want = masked_attention(q[:, None], k[:, None], v[:, None],
                            key_mask=None)
    # reference via masked_attention with the mask, head dim faked
    want = masked_attention(
        q.reshape(2, 1, NQ, D), k.reshape(2, 1, NK, D),
        v.reshape(2, 1, NK, D),
        mask,
    ).reshape(G, NQ, D)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


def test_largeq_matches_xla_interpret():
    rng = np.random.default_rng(1)
    G, NQ, NK, D = 2, 64, 16, 16
    q = _rand(rng, G, NQ, D)
    k = _rand(rng, G, NK, D)
    v = _rand(rng, G, NK, D)
    with pltpu.force_tpu_interpret_mode():
        got = _largeq_attention(q, k, v, scale=1.0 / np.sqrt(D), block_q=32)
    want = masked_attention(
        q.reshape(G, 1, NQ, D), k.reshape(G, 1, NK, D),
        v.reshape(G, 1, NK, D), None,
    ).reshape(G, NQ, D)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )
