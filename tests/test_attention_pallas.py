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
    G, H, NQ, NK, D = 2, 4, 8, 96, 16
    q = _rand(rng, G, H, NQ, D)
    k = _rand(rng, G, H, NK, D)
    v = _rand(rng, G, H, NK, D)
    mask = jnp.asarray(rng.random((G, NK)) > 0.4)

    with pltpu.force_tpu_interpret_mode():
        got = _smallq_attention(
            q, k, v, mask.astype(jnp.int32), scale=1.0 / np.sqrt(D),
            block_k=32, heads_per_cell=2,
        )
    want = masked_attention(q, k, v, mask)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
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
