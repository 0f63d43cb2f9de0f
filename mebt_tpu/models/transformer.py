"""MeBT latent-bottleneck transformer, TPU-native formulation.

Behavioural reference: mebt/modules/gpt.py (GPT:198, Block:143,
CrossAttention:98). Five block modes route all attention through a small
set of latent tokens:

  latent_enc  : latents   <- tokens restricted to *context* positions
  latent_self : latents  <-> latents
  latent_dec  : tokens    <- latents
  lt2l        : latents   <- [latents ; tokens restricted to *targets*]
  maskgit     : tokens   <-> tokens (full self-attention fallback)

TPU-first divergence: the reference materializes variable-length
(B, NC, D) context and (B, NT, D) target tensors per step
(gpt.py:159-195). Here the full (B, N, D) token array stays resident
with static shape, and context/target membership is expressed by two
boolean masks. That keeps every decode step of the MaskGIT loop inside
a single compiled `lax.scan` (no per-shape recompiles, no host syncs).

Parameter sharding (2-D `(data, model)` mesh): QKV/MLP kernels are
annotated for Megatron-style tensor parallelism over the `model` axis;
see mebt_tpu/parallel/mesh.py.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from mebt_tpu.ops.attention import masked_attention

BLOCK_MODES = ("latent_enc", "latent_self", "latent_dec", "lt2l", "maskgit")


def default_mode_list(n_layer: int, mode: Sequence[str]) -> list[str]:
    """Pad the mode list with `maskgit` like the reference (gpt.py:208-209)."""
    mode = list(mode)
    if len(mode) < n_layer:
        mode += ["maskgit"] * (n_layer - len(mode))
    if len(mode) != n_layer:
        raise ValueError(f"{len(mode)} modes for {n_layer} layers")
    for m in mode:
        if m not in BLOCK_MODES:
            raise ValueError(f"Unknown block mode: {m}")
    return mode


def staged_split(n_layer: int, mode: Sequence[str]) -> int | None:
    """Index of the first token-modifying block, or None if the mode
    list cannot be run in two stages.

    The canonical MeBT routing (configs/*/mebt_*.yaml) is an "enc phase"
    (latent_enc / latent_self — blocks that only *read* tokens and update
    latents) followed by a "dec phase" (latent_dec / lt2l — blocks whose
    token computation is per-token, with no token<->token attention).
    When that structure holds, the dec phase + vocab head can be run on a
    compacted target bucket instead of the full canvas (the reference
    computes logits only for the NT remaining targets,
    transformer.py:286); see sampler/decode.py's staged scan.

    Stageable iff: no `maskgit` block anywhere (full token<->token
    self-attention would make context tokens' transformed values matter),
    and every `latent_enc` block (which reads tokens at *context*
    positions) comes before the first `latent_dec`.
    """
    modes = default_mode_list(n_layer, mode)
    if "maskgit" in modes:
        return None
    if "latent_dec" not in modes:
        return None
    k = modes.index("latent_dec")
    if "latent_enc" in modes[k:]:
        return None
    return k



# Kernel init matching the reference: N(0, 0.02) weights, zero bias
# (gpt.py:225-232).
dense_init = nn.initializers.normal(stddev=0.02)


class HeadSplitProj(nn.Module):
    """Dense projection emitting (B, H, N, Dh) directly. The parameter
    tree matches nn.Dense ({kernel (D, H*Dh), bias (H*Dh,)}) so torch
    checkpoint import is unchanged; the head split/transpose is part of
    the einsum instead of a separate copy."""

    n_head: int
    head_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        out = self.n_head * self.head_dim
        kernel = self.param("kernel", dense_init, (C, out), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (out,), jnp.float32)
        kh = kernel.reshape(C, self.n_head, self.head_dim).astype(self.dtype)
        bh = bias.reshape(self.n_head, 1, self.head_dim).astype(self.dtype)
        return jnp.einsum("bnd,dhk->bhnk", x.astype(self.dtype), kh) + bh


class HeadMergeProj(nn.Module):
    """Output projection consuming (B, H, N, Dh) directly; parameter
    tree matches nn.Dense ({kernel (H*Dh, D), bias (D,)})."""

    n_embd: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, y):
        B, H, N, Dh = y.shape
        kernel = self.param(
            "kernel", dense_init, (H * Dh, self.n_embd), jnp.float32
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.n_embd,), jnp.float32
        )
        kh = kernel.reshape(H, Dh, self.n_embd).astype(self.dtype)
        out = jnp.einsum("bhnk,hkd->bnd", y, kh)
        return out + bias.astype(self.dtype)


class CrossAttention(nn.Module):
    """Q from `query`, K/V from `key`, boolean key mask support.

    Reference: mebt/modules/gpt.py:98-141. The reference's `attn_bias`
    argument is always 0 at runtime (transformer.py:281, 321) and is not
    reproduced.
    """

    n_embd: int
    n_head: int
    attn_pdrop: float = 0.0
    resid_pdrop: float = 0.0
    dtype: jnp.dtype = jnp.float32
    seq_axis: str | None = None
    # under sequence parallelism, dropout on the (seq-replicated) latent
    # stream must draw from a shard-invariant RNG stream — see
    # parallel/sp.py
    rng_collection: str = "dropout"

    def setup(self):
        Dh = self.n_embd // self.n_head
        # Parameters keep the torch-compatible (D, D) Dense tree layout
        # (attn/{query,key,value,proj}/{kernel,bias}); the head split +
        # (B, H, N, Dh) transpose is folded into the projection einsum
        # so XLA emits no separate layout-copy ops.
        self.query = HeadSplitProj(self.n_head, Dh, dtype=self.dtype,
                                   name="query")
        self.key = HeadSplitProj(self.n_head, Dh, dtype=self.dtype,
                                 name="key")
        self.value = HeadSplitProj(self.n_head, Dh, dtype=self.dtype,
                                   name="value")
        self.proj = HeadMergeProj(self.n_embd, dtype=self.dtype,
                                  name="proj")
        self.resid_drop = nn.Dropout(
            self.resid_pdrop, rng_collection=self.rng_collection
        )

    def project_kv(self, key):
        """K/V head projections of an (already normalized) key stream —
        exposed so decode can cache them across steps (the latent_enc
        key stream is a pure per-token function of the embedding
        canvas)."""
        return self.key(key), self.value(key)

    def attend(self, query, k, v, key_mask=None, *, deterministic=True,
               kv_sharded=False, tag_kv=False):
        """Attention given precomputed K/V; query is the normalized
        query stream. `kv_sharded=True` (inside shard_map, with
        `seq_axis` set) runs the sequence-parallel partial-softmax merge
        over the key axis (ops/attention.py:sp_masked_attention).

        `tag_kv=True` marks K/V as remat-saveable (checkpoint_name) —
        the caller asserts they are latent-sized, so the 'saved' remat
        policy can keep them instead of recomputing the projections in
        the backward. Q is always tagged (latent-sized for enc-phase
        blocks; for dec-phase blocks the 80 MB/block it costs at 128f
        buys skipping the projection + flash-forward recompute)."""
        q = checkpoint_name(self.query(query), "attn_q")
        if tag_kv:
            k = checkpoint_name(k, "attn_kv_small")
            v = checkpoint_name(v, "attn_kv_small")
        if kv_sharded:
            if self.seq_axis is None:
                raise ValueError("kv_sharded requires seq_axis")
            if self.attn_pdrop > 0.0 and not deterministic:
                raise NotImplementedError(
                    "attention-prob dropout under sequence parallelism "
                    "is not implemented; train SP models with "
                    "attn_pdrop=0 or without the seq axis"
                )
            from mebt_tpu.ops.attention import sp_masked_attention

            y = sp_masked_attention(q, k, v, key_mask, self.seq_axis)
        elif self.attn_pdrop > 0.0 and not deterministic:
            # Dropout on attention probabilities. On TPU both routed
            # regimes run fully in the flash kernels with the mask
            # generated in-kernel (ops/attention_pallas.py); elsewhere
            # the differentiable dense form is used.
            from mebt_tpu.ops.attention_pallas import (
                fused_dropout_attention,
            )

            y = fused_dropout_attention(
                q, k, v, key_mask, float(self.attn_pdrop),
                self.make_rng("dropout"),
            )
        elif jax.default_backend() == "tpu":
            # fused Pallas kernels keep scores/probs in VMEM
            # (ops/attention_pallas.py); custom VJP covers training
            from mebt_tpu.ops.attention_pallas import fused_attention

            y = fused_attention(q, k, v, key_mask)
        else:
            y = masked_attention(q, k, v, key_mask)

        y = self.proj(checkpoint_name(y, "attn_y"))
        y = self.resid_drop(y, deterministic=deterministic)
        return y.astype(query.dtype)

    def __call__(self, query, key, key_mask=None, *, deterministic=True,
                 kv_sharded=False, tag_kv=False):
        k, v = self.project_kv(key)
        return self.attend(
            query, k, v, key_mask, deterministic=deterministic,
            kv_sharded=kv_sharded, tag_kv=tag_kv,
        )


class Mlp(nn.Module):
    n_embd: int
    resid_pdrop: float = 0.0
    dtype: jnp.dtype = jnp.float32
    rng_collection: str = "dropout"

    @nn.compact
    def __call__(self, x, *, deterministic=True):
        h = nn.Dense(
            4 * self.n_embd, kernel_init=dense_init, dtype=self.dtype, name="fc"
        )(x)
        # saveable under remat_policy='saved_mlp' (pre-activation: the
        # gelu and its grad are elementwise recomputes from it)
        h = checkpoint_name(h, "mlp_fc")
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(
            self.n_embd, kernel_init=dense_init, dtype=self.dtype, name="proj"
        )(h)
        h = nn.Dropout(self.resid_pdrop, rng_collection=self.rng_collection)(
            h, deterministic=deterministic
        )
        return h


class Block(nn.Module):
    """One pre-LN transformer block with a static routing mode.

    Reference: mebt/modules/gpt.py:143-195. ln1 normalizes both the
    query and key streams (shared weights). NOTE the reference rebinds
    `query = self.ln1(query)` before `x = query + attn` (gpt.py:180-184),
    so the residual adds the *normalized* query — reproduced here
    (verified by tests/test_reference_parity.py against the actual torch
    module).
    """

    mode: str
    n_embd: int
    n_head: int
    attn_pdrop: float = 0.0
    resid_pdrop: float = 0.0
    dtype: jnp.dtype = jnp.float32
    seq_axis: str | None = None

    def setup(self):
        self.ln1 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln1")
        self.ln2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln2")
        # Under SP the residual/MLP dropout applies to this block's
        # OUTPUT stream: the latent stream (seq-replicated — must draw
        # from the shard-invariant 'dropout_lat' RNG stream so every
        # shard applies the same mask) for latent-updating modes, the
        # token stream (seq-sharded — per-shard 'dropout' stream) for
        # latent_dec. Without SP everything stays on 'dropout'.
        coll = "dropout"
        if self.seq_axis is not None and self.mode != "latent_dec":
            coll = "dropout_lat"
        self.attn = CrossAttention(
            n_embd=self.n_embd,
            n_head=self.n_head,
            attn_pdrop=self.attn_pdrop,
            resid_pdrop=self.resid_pdrop,
            dtype=self.dtype,
            seq_axis=self.seq_axis,
            rng_collection=coll,
            name="attn",
        )
        self.mlp = Mlp(
            n_embd=self.n_embd,
            resid_pdrop=self.resid_pdrop,
            dtype=self.dtype,
            rng_collection=coll,
            name="mlp",
        )

    def __call__(
        self, latents, tokens, ctx_mask, tgt_mask, deterministic=True
    ):
        # Under sequence parallelism (seq_axis set, called inside
        # shard_map) `tokens`/masks hold this shard's slice of the
        # canvas while `latents` are replicated — modes whose KEYS are
        # tokens run the partial-softmax merge; latent-keyed modes are
        # shard-local.
        sp = self.seq_axis is not None
        kv_sharded = False
        if self.mode == "latent_self":
            query, key, key_mask = latents, latents, None
        elif self.mode == "latent_enc":
            query, key, key_mask = latents, tokens, ctx_mask
            kv_sharded = sp
        elif self.mode == "latent_dec":
            query, key, key_mask = tokens, latents, None
        elif self.mode == "lt2l":
            query = latents
            key = jnp.concatenate([latents, tokens], axis=1)
            ones = jnp.ones(
                (tokens.shape[0], latents.shape[1]), dtype=jnp.bool_
            )
            if sp:
                # every shard prepends the (replicated) latents to its
                # key slice; count them exactly once in the merged
                # softmax by masking them off on all shards but 0
                ones = jnp.logical_and(
                    ones, jax.lax.axis_index(self.seq_axis) == 0
                )
            key_mask = jnp.concatenate([ones, tgt_mask], axis=1)
            kv_sharded = sp
        elif self.mode == "maskgit":
            if sp:
                raise NotImplementedError(
                    "maskgit blocks (full token<->token attention) are "
                    "not supported under sequence parallelism — the "
                    "canonical MeBT mode lists contain none"
                )
            query, key = tokens, tokens
            key_mask = jnp.logical_or(ctx_mask, tgt_mask)
        else:
            raise ValueError(self.mode)

        qn = self.ln1(query)
        kn = self.ln1(key)
        # latent-keyed modes have tiny K/V — mark them remat-saveable
        # so the 'saved' policy keeps them (token-keyed K/V would cost
        # 80 MB/block at 128f and are recomputed instead)
        tag_kv = self.mode in ("latent_self", "latent_dec")
        x = qn + self.attn(
            qn, kn, key_mask, deterministic=deterministic,
            kv_sharded=kv_sharded, tag_kv=tag_kv,
        )
        x = x + self.mlp(self.ln2(x), deterministic=deterministic)

        if self.mode in ("latent_enc", "latent_self", "lt2l"):
            latents = x
        elif self.mode == "latent_dec":
            tokens = x
        else:  # maskgit
            tokens = x
        return latents, tokens


class LatentTransformer(nn.Module):
    """Stack of routed blocks + final LN + vocab head.

    Reference: mebt/modules/gpt.py:198-253 (GPT). The head is bias-free
    (gpt.py:217). Output logits cover every token position; callers
    select target positions with `tgt_mask`.
    """

    vocab_size: int
    n_layer: int = 24
    n_head: int = 16
    n_embd: int = 1024
    mode: Sequence[str] = ()
    embd_pdrop: float = 0.0
    attn_pdrop: float = 0.0
    resid_pdrop: float = 0.0
    dtype: jnp.dtype = jnp.float32
    remat: bool = False
    remat_policy: str = "full"
    seq_axis: str | None = None

    def setup(self):
        modes = default_mode_list(self.n_layer, self.mode)
        block_cls = Block
        if self.remat:
            # deterministic is a Python bool branching on the dropout
            # path — keep it static under jax.checkpoint (arg index 5
            # counting self)
            policies = {
                # recompute everything inside the block (min memory)
                "full": None,
                # save matmul outputs; recompute elementwise + the
                # flash-attention pallas call (whose q/k/v inputs are
                # themselves saved dots) — ~2-3% recompute FLOPs vs
                # the full policy's +1 forward (~33%). At 128f this
                # saves the 320 MB/block MLP hidden too and OOMs HBM
                # at the flagship batch sizes; prefer 'saved'.
                "dots": jax.checkpoint_policies
                .dots_with_no_batch_dims_saveable,
                # save only the named attention tensors (Q, the
                # latent-sized K/V, and the pre-proj attention output
                # — ~160 MB/dec block at 128f bs5): the backward
                # recomputes just the MLP matmuls, token-keyed K/V
                # projections, layernorms, and the small-Q flash
                # forward (for its lse residual) — ~15% of a forward
                # vs the full policy's +100%
                "saved": jax.checkpoint_policies.save_only_these_names(
                    "attn_q", "attn_kv_small", "attn_y"
                ),
                # 'saved' + the pre-gelu MLP hidden (320 MB/dec block
                # at 128f bs5): near-zero matmul recompute, HBM-tight
                "saved_mlp": jax.checkpoint_policies
                .save_only_these_names(
                    "attn_q", "attn_kv_small", "attn_y", "mlp_fc"
                ),
            }
            block_cls = nn.remat(
                Block, static_argnums=(5,),
                policy=policies[self.remat_policy],
            )
        self.blocks = [
            block_cls(
                mode=m,
                n_embd=self.n_embd,
                n_head=self.n_head,
                attn_pdrop=self.attn_pdrop,
                resid_pdrop=self.resid_pdrop,
                dtype=self.dtype,
                seq_axis=self.seq_axis,
                name=f"block_{i}",
            )
            for i, m in enumerate(modes)
        ]
        self.drop = nn.Dropout(self.embd_pdrop)
        # embedding dropout on the seq-replicated latent stream must be
        # shard-invariant under SP (see Block.setup)
        self.drop_lat = nn.Dropout(
            self.embd_pdrop,
            rng_collection=(
                "dropout_lat" if self.seq_axis is not None else "dropout"
            ),
        )
        self.ln_f = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_f")
        self.head = nn.Dense(
            self.vocab_size,
            use_bias=False,
            kernel_init=dense_init,
            dtype=self.dtype,
            name="head",
        )

    def __call__(
        self, latents, tokens, ctx_mask, tgt_mask, *, deterministic=True
    ):
        latents = self.drop_lat(latents, deterministic=deterministic)
        tokens = self.drop(tokens, deterministic=deterministic)
        for block in self.blocks:
            latents, tokens = block(
                latents, tokens, ctx_mask, tgt_mask, deterministic
            )
        return self.logits_head(tokens)

    def run_blocks(
        self,
        latents,
        tokens,
        ctx_mask,
        tgt_mask,
        start: int,
        stop: int | None = None,
        *,
        deterministic=True,
    ):
        """Run blocks [start, stop) and return (latents, tokens). Used by
        the staged decode path (inference; embedding dropout is applied
        by __call__ only — staged callers run deterministic)."""
        for block in self.blocks[start:stop]:
            latents, tokens = block(
                latents, tokens, ctx_mask, tgt_mask, deterministic
            )
        return latents, tokens

    def logits_head(self, tokens):
        """Final LN + bias-free vocab head (gpt.py:216-217)."""
        x = self.ln_f(tokens)
        return self.head(x).astype(jnp.float32)
