"""Tensor/layout helpers.

Behavioural reference: mebt/utils.py (shift_dim:30, accuracy:80) and
utils.py:3-7 (instantiate_from_config lives in mebt_tpu.config).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def shift_dim(x, src_dim: int = -1, dest_dim: int = 1):
    """Move axis `src_dim` to position `dest_dim` (reference
    mebt/utils.py:30-55). Works on numpy and jax arrays."""
    xp = jnp if isinstance(x, jax.Array) else np
    return xp.moveaxis(x, src_dim, dest_dim)


def accuracy(logits, targets, topk=(1,)):
    """Top-k accuracy in percent (reference mebt/utils.py:80-95).

    logits: (N, C); targets: (N,).
    """
    logits = jnp.asarray(logits)
    targets = jnp.asarray(targets)
    maxk = max(topk)
    top = jax.lax.top_k(logits, maxk)[1]  # (N, maxk)
    correct = top == targets[:, None]
    out = []
    for k in topk:
        acc = jnp.mean(jnp.any(correct[:, :k], axis=1).astype(jnp.float32))
        out.append(acc * 100.0)
    return out
