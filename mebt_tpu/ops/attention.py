"""Masked multi-head attention primitives.

TPU-first divergence from the reference: the reference gathers
variable-length context/target token subsets and runs dense attention on
them (reference: mebt/modules/gpt.py:119-141, CrossAttention.forward).
Variable lengths force one XLA compilation per shape; instead we keep
every token of the (static) full sequence resident and express
membership through a boolean key mask. A fully-masked key row yields a
zero attention output, which matches the reference's behaviour of
attending over an empty (B, 0, C) context tensor (matmul over a
zero-size contraction returns zeros).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def masked_softmax(scores: jax.Array, mask: jax.Array | None) -> jax.Array:
    """Softmax over the last axis with an optional boolean key mask.

    Rows whose mask is entirely False produce all-zero probabilities
    (not NaN), so downstream `probs @ v` is a zero vector.
    """
    if mask is None:
        return jax.nn.softmax(scores, axis=-1)
    neg = jnp.asarray(-jnp.inf, dtype=scores.dtype)
    scores = jnp.where(mask, scores, neg)
    m = jnp.max(scores, axis=-1, keepdims=True)
    m = jnp.where(jnp.isfinite(m), m, jnp.zeros_like(m))
    e = jnp.where(mask, jnp.exp(scores - m), jnp.zeros_like(scores))
    denom = jnp.sum(e, axis=-1, keepdims=True)
    return e / jnp.where(denom == 0, jnp.ones_like(denom), denom)


def masked_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    key_mask: jax.Array | None = None,
    *,
    scale: float | None = None,
    probs_dtype: jnp.dtype | None = None,
) -> jax.Array:
    """Multi-head attention core.

    Args:
      q: (B, H, NQ, Dh) queries.
      k: (B, H, NK, Dh) keys.
      v: (B, H, NK, Dh) values.
      key_mask: optional (B, NK) or (B, 1, NQ, NK) boolean; True = attendable.
      scale: defaults to 1/sqrt(Dh).
      probs_dtype: dtype used for the softmax (defaults to fp32 for
        numerical robustness; output is cast back to q.dtype).

    Returns:
      (B, H, NQ, Dh) attention output in q.dtype.
    """
    if scale is None:
        scale = 1.0 / (q.shape[-1] ** 0.5)
    probs_dtype = probs_dtype or jnp.float32

    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(probs_dtype) * scale
    if key_mask is not None and key_mask.ndim == 2:
        key_mask = key_mask[:, None, None, :]
    probs = masked_softmax(scores, key_mask)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v)
    return out.astype(q.dtype)


def sp_masked_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    key_mask: jax.Array | None,
    axis_name: str,
    *,
    scale: float | None = None,
) -> jax.Array:
    """Sequence-parallel (context-parallel) masked attention.

    Called INSIDE `shard_map` with the key/value sequence axis sharded
    over `axis_name`: each shard holds its (B, H, NK_local, Dh) slice of
    K/V (and the matching key_mask slice); queries are replicated.
    Exactness comes from the flash-attention partial-softmax identity —
    subtract the GLOBAL row max (one pmax), accumulate per-shard
    exp-sums and weighted values, and combine with two psums:

        m = pmax(max_local(scores))          # global row max
        l = psum(sum_local(exp(scores - m))) # global denominator
        o = psum(exp(scores - m) @ v) / l

    The reference has no sequence sharding at all (SURVEY.md §2.3 — long
    sequences are handled algorithmically); this is the TPU-native
    mechanism for scaling the 8192-token 128f canvases past one chip:
    the latent bottleneck makes only latent_enc / lt2l attention touch
    the sharded axis, and their queries (256 latents) are tiny, so the
    collectives move O(B*H*NQ*Dh) — independent of sequence length.

    Gradients: the whole expression is differentiable jax (psum
    transposes to psum under shard_map); `m` is wrapped in
    stop_gradient — the softmax value is independent of the shift, so
    this is exact and avoids a pmax transpose.
    """
    if scale is None:
        scale = 1.0 / (q.shape[-1] ** 0.5)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * scale
    if key_mask is not None:
        if key_mask.ndim == 2:
            key_mask = key_mask[:, None, None, :]
        scores = jnp.where(key_mask, scores, -jnp.inf)
    m_loc = jnp.max(scores, axis=-1, keepdims=True)
    # stop_gradient BEFORE pmax: the softmax value is shift-invariant so
    # this is exact, and pmax has no differentiation rule — a zero
    # tangent input keeps it out of the JVP trace
    m = jax.lax.pmax(jax.lax.stop_gradient(m_loc), axis_name)
    m = jnp.where(jnp.isfinite(m), m, jnp.zeros_like(m))
    e = jnp.exp(scores - m)
    if key_mask is not None:
        e = jnp.where(key_mask, e, jnp.zeros_like(e))
    l_loc = jnp.sum(e, axis=-1, keepdims=True)
    o_loc = jnp.einsum("bhqk,bhkd->bhqd", e.astype(v.dtype), v).astype(
        jnp.float32
    )
    l = jax.lax.psum(l_loc, axis_name)
    o = jax.lax.psum(o_loc, axis_name)
    out = o / jnp.where(l == 0, jnp.ones_like(l), l)
    return out.astype(q.dtype)
