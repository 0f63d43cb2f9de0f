"""MeBT stage-2 model: embeddings + latent transformer + MLM loss.

Behavioural reference: mebt/transformer.py (Net2NetTransformer:60).
The reference class is a LightningModule that also owns the frozen
VQGAN; here the transformer side is a pure flax module operating on
*code indices* — the VQGAN lives in mebt_tpu/models/vqgan.py and is
composed by the task-level pipeline (mebt_tpu/train, mebt_tpu/sampler).

Token construction (reference transformer.py:255-277, masked form):
    tokens[p] = tok_emb[codes[p]] + pos_emb[p]      if p is context
                mask_emb          + pos_emb[p]      otherwise
    latents   = sos_emb  (learned queries, `sos_emb: 256` in configs)

Out-of-window positions (neither context nor target) never appear as
attention keys and their logits are never read, so their embedding
content is irrelevant — this reproduces the reference's behaviour of
physically dropping them.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Mapping, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from mebt_tpu.models.transformer import (
    LatentTransformer,
    dense_init,
    staged_split,
)


def transformer_split(cfg: "MeBTConfig") -> int | None:
    """Stage boundary for the staged decode, or None if the mode list is
    not stageable (see transformer.staged_split)."""
    return staged_split(cfg.n_layer, cfg.mode)


@dataclass(frozen=True)
class MeBTConfig:
    """Model hyperparameters, schema-compatible with the reference YAML
    `model.params` block (configs/*/mebt_*.yaml)."""

    vocab_size: int = 16384
    block_size: int = 1024
    n_layer: int = 24
    n_head: int = 16
    n_embd: int = 1024
    sos_emb: int = 256
    mode: tuple[str, ...] = ()
    embd_pdrop: float = 0.0
    resid_pdrop: float = 0.0
    attn_pdrop: float = 0.0
    avg_loss: float = 0.0
    label_smoothing: float = 0.0
    t_prior: str = "longest"
    latent_shape: tuple[int, int, int] = (4, 16, 16)
    unconditional: bool = True
    dtype: Any = jnp.float32
    remat: bool = False
    # Rematerialization policy under remat=True. "full" (default)
    # recomputes the whole block forward in the backward (minimum
    # memory, +1 forward of FLOPs). "dots" saves every matmul output
    # (jax.checkpoint_policies.dots_with_no_batch_dims_saveable) and
    # recomputes only elementwise ops + the flash-attention kernel —
    # near-no-remat speed at a fraction of no-remat memory (the MLP
    # hidden is the dominant saved tensor).
    remat_policy: str = "full"
    # Sequence (context) parallelism: when set, the model must be
    # applied inside shard_map with the token axis sharded over this
    # mesh axis name — see parallel/sp.py
    seq_axis: str | None = None

    @classmethod
    def from_config(cls, params: Mapping, mask_shape: Sequence[int] | None = None,
                    **overrides) -> "MeBTConfig":
        """Build from a reference-style `model.params` mapping; extra
        reference keys (vtokens, vis_epoch, ...) are ignored here and
        consumed by the trainer."""
        known = {
            "vocab_size", "block_size", "n_layer", "n_head", "n_embd",
            "sos_emb", "mode", "embd_pdrop", "resid_pdrop", "attn_pdrop",
            "avg_loss", "label_smoothing", "t_prior", "unconditional",
        }
        kw = {k: params[k] for k in known if k in params}
        if "mode" in kw:
            kw["mode"] = tuple(kw["mode"])
        if "avg_loss" in kw:
            kw["avg_loss"] = float(kw["avg_loss"])
        if mask_shape is not None:
            kw["latent_shape"] = tuple(int(s) for s in mask_shape)
        kw.update(overrides)
        return cls(**kw)

    @property
    def seq_len(self) -> int:
        t, h, w = self.latent_shape
        return t * h * w


class MeBT(nn.Module):
    """Bidirectional masked-token transformer over VQ code indices."""

    config: MeBTConfig

    def setup(self):
        cfg = self.config
        self.tok_emb = nn.Embed(
            cfg.vocab_size,
            cfg.n_embd,
            embedding_init=dense_init,
            dtype=cfg.dtype,
            name="tok_emb",
        )
        self.mask_emb = self.param(
            "mask_emb", dense_init, (1, 1, cfg.n_embd), jnp.float32
        )
        self.pos_emb = self.param(
            "pos_emb", dense_init, (1, cfg.block_size, cfg.n_embd), jnp.float32
        )
        self.sos_emb = self.param(
            "sos_emb", dense_init, (1, cfg.sos_emb, cfg.n_embd), jnp.float32
        )
        self.transformer = LatentTransformer(
            vocab_size=cfg.vocab_size,
            n_layer=cfg.n_layer,
            n_head=cfg.n_head,
            n_embd=cfg.n_embd,
            mode=cfg.mode,
            embd_pdrop=cfg.embd_pdrop,
            attn_pdrop=cfg.attn_pdrop,
            resid_pdrop=cfg.resid_pdrop,
            dtype=cfg.dtype,
            remat=cfg.remat,
            remat_policy=cfg.remat_policy,
            seq_axis=cfg.seq_axis,
            name="transformer",
        )

    def _embed_canvas(self, codes, ctx_mask):
        """Token embeddings for the full (B, N) canvas: tok_emb at
        context positions, mask_emb elsewhere, + positional embedding
        (reference transformer.py:255-277). Under sequence parallelism
        `codes` is this shard's slice, and the positional table is
        sliced at the shard's global offset."""
        cfg = self.config
        N = codes.shape[1]
        tok = self.tok_emb(codes)
        tokens = jnp.where(
            ctx_mask[..., None], tok, self.mask_emb.astype(cfg.dtype)
        )
        if cfg.seq_axis is not None:
            shard = jax.lax.axis_index(cfg.seq_axis)
            pos = jax.lax.dynamic_slice_in_dim(
                self.pos_emb, shard * N, N, axis=1
            )
        else:
            pos = self.pos_emb[:, :N]
        return tokens + pos.astype(cfg.dtype)

    def _latent_queries(self, B):
        cfg = self.config
        return jnp.broadcast_to(
            self.sos_emb, (B, cfg.sos_emb, cfg.n_embd)
        ).astype(cfg.dtype)

    def __call__(
        self,
        codes: jax.Array,  # (B, N) int32 — VQ code per position
        ctx_mask: jax.Array,  # (B, N) bool — revealed positions
        tgt_mask: jax.Array,  # (B, N) bool — positions to predict
        *,
        deterministic: bool = True,
    ) -> jax.Array:
        tokens = self._embed_canvas(codes, ctx_mask)
        latents = self._latent_queries(codes.shape[0])
        return self.transformer(
            latents, tokens, ctx_mask, tgt_mask, deterministic=deterministic
        )

    def stage_a(
        self,
        codes: jax.Array,  # (B, N) int32
        ctx_mask: jax.Array,  # (B, N) bool
    ) -> jax.Array:
        """Enc phase of the staged decode (inference only): embed the
        full canvas and run the latent-updating blocks [0, k). Returns
        the latent stream (B, sos_emb, D).

        Valid only when `staged_split(n_layer, mode)` is not None — the
        enc-phase blocks (latent_enc/latent_self) never modify tokens,
        so the token stream entering the dec phase is exactly the
        embedding array, which stage_b rebuilds compacted."""
        cfg = self.config
        k = transformer_split(cfg)
        if k is None:
            raise ValueError("mode list is not stageable; use __call__")
        tokens = self._embed_canvas(codes, ctx_mask)
        latents = self._latent_queries(codes.shape[0])
        tgt_dummy = jnp.zeros_like(ctx_mask)  # enc blocks never read tgt
        latents, _ = self.transformer.run_blocks(
            latents, tokens, ctx_mask, tgt_dummy, 0, k
        )
        return latents

    def stage_a_compact(
        self,
        codes: jax.Array,  # (B, N) int32 — full canvas codes
        ctx_idx: jax.Array,  # (B, C) int32 canvas positions; >=N = padding
        ctx_valid: jax.Array,  # (B, C) bool — live context slots
    ) -> jax.Array:
        """Enc phase on a compacted CONTEXT bucket. The enc-phase blocks
        (latent_enc / latent_self) read tokens only as latent_enc KEYS
        masked to context positions (transformer.py Block routing), so
        gathering the context into a (B, C) bucket makes the enc phase
        O(C) in K/V projections and attention instead of O(N) — the TPU
        analogue of the reference gathering the variable-length NC
        context tensor (reference gpt.py:159-195), with a static bucket.
        During the 128f bootstrap phase C <= 128 while N = 8192.

        Exactness: every live bucket slot is a context position, so its
        embedding is tok_emb + pos_emb (mask_emb rows are never read by
        enc blocks in the dense form — they are masked out of the keys).
        Padding slots (ctx_idx >= N, gather clips) carry garbage that
        ctx_valid masks out of the latent_enc keys; an all-invalid
        bucket yields zero attention output exactly like a fully-masked
        dense key row (ops/attention.py:masked_softmax)."""
        cfg = self.config
        k = transformer_split(cfg)
        if k is None:
            raise ValueError("mode list is not stageable; use __call__")
        if cfg.seq_axis is not None:
            raise ValueError(
                "stage_a_compact is not defined under sequence "
                "parallelism; use stage_a inside shard_map"
            )
        # clip to the CANVAS bound (seq_len may be < block_size); padding
        # rows are masked out of the keys either way
        idx = jnp.minimum(ctx_idx, codes.shape[1] - 1)
        c = jnp.take_along_axis(codes, idx, axis=1)  # (B, C)
        tokens = self.tok_emb(c) + jnp.take(
            self.pos_emb[0], idx, axis=0
        ).astype(cfg.dtype)
        latents = self._latent_queries(codes.shape[0])
        tgt_dummy = jnp.zeros_like(ctx_valid)  # enc blocks never read tgt
        latents, _ = self.transformer.run_blocks(
            latents, tokens, ctx_valid, tgt_dummy, 0, k
        )
        return latents

    def stage_b_tokens(
        self,
        latents: jax.Array,  # (B, sos_emb, D) from stage_a
        tgt_idx: jax.Array,  # (B, M) int32 canvas positions; >=N = padding
        tgt_valid: jax.Array,  # (B, M) bool — which slots are live targets
    ) -> jax.Array:
        """Dec phase on the compact bucket WITHOUT the vocab head:
        returns ln_f'd tokens (B, M, D). Callers that fuse the head
        matmul with sampling (ops/head_sample_pallas.py) consume this
        plus params['transformer']['head']['kernel'] directly."""
        cfg = self.config
        k = transformer_split(cfg)
        if k is None:
            raise ValueError("mode list is not stageable; use __call__")
        idx = jnp.minimum(tgt_idx, cfg.block_size - 1)
        pos = jnp.take(self.pos_emb[0], idx, axis=0).astype(cfg.dtype)
        tokens = self.mask_emb.astype(cfg.dtype) + pos  # (B, M, D)
        ctx_dummy = jnp.zeros_like(tgt_valid)  # dec blocks never read ctx
        _, tokens = self.transformer.run_blocks(
            latents, tokens, ctx_dummy, tgt_valid, k, None
        )
        return self.transformer.ln_f(tokens)

    def stage_b_compact(
        self,
        latents: jax.Array,  # (B, sos_emb, D) from stage_a
        tgt_idx: jax.Array,  # (B, M) int32 canvas positions; >=N = padding
        tgt_valid: jax.Array,  # (B, M) bool — which slots are live targets
    ) -> jax.Array:
        """Dec phase on a compacted target bucket: gather the (static)
        masked-token embeddings at `tgt_idx`, run blocks [k, n), and
        apply the vocab head — O(M) instead of O(N) for latent_dec, lt2l
        keys, the 16384-wide head, and downstream sampling. This is the
        TPU analogue of the reference computing logits only for the NT
        remaining targets (reference transformer.py:286).

        Exactness: dec-phase token computation is per-token (latent_dec
        queries latents; lt2l reads tokens only at target positions,
        which the compact bucket contains in full), so gathered rows
        match the dense forward bit-for-bit. Padding rows (tgt_idx >= N,
        gather clips) flow garbage that is masked out of lt2l keys and
        never read by callers."""
        tokens = self.stage_b_tokens(latents, tgt_idx, tgt_valid)
        return self.transformer.head(tokens).astype(jnp.float32)


def mlm_loss(
    logits: jax.Array,  # (B, N, V) fp32
    codes: jax.Array,  # (B, N) int32 ground-truth codes
    tgt_mask: jax.Array,  # (B, N) bool
    seq_len: jax.Array,  # scalar — window token count
    masked_weight: jax.Array,  # scalar — N_window - n_contexts (NT_weight)
    avg_loss: float = 1.0,
    label_smoothing: float = 0.0,
):
    """MLM objective matching reference shared_step (transformer.py:717-732).

    loss = CE_sum(targets) / (B * seq_len * ratio**avg_loss),
    ratio = masked_weight / seq_len. With avg_loss=1 (all configs) this
    normalizes by the number of *masked* tokens rather than predicted
    ones — replicated faithfully including the budget-capped case.

    Returns (loss, metrics) where metrics has ce_sum / acc1 / acc5.
    """
    # CE via logsumexp instead of materializing the (B, N, V) fp32
    # log_softmax (another 2.7 GB HBM round-trip at the 128f recipe):
    # -log p[target] = lse(logits) - logits[target]; the smoothing term
    # mean(-logp) = lse - mean(logits). Mathematically identical, and
    # XLA fuses the row reductions into single passes over the logits.
    lse = jax.scipy.special.logsumexp(logits, axis=-1)
    tgt_logit_ = jnp.take_along_axis(
        logits, codes[..., None], axis=-1
    )[..., 0]
    if label_smoothing > 0.0:
        # torch F.cross_entropy label_smoothing semantics:
        # (1-eps)*nll + eps*mean(-logp)
        smooth = lse - jnp.mean(logits, axis=-1)
        per_tok = (1.0 - label_smoothing) * (lse - tgt_logit_) \
            + label_smoothing * smooth
    else:
        per_tok = lse - tgt_logit_

    tgtf = tgt_mask.astype(jnp.float32)
    ce_sum = jnp.sum(per_tok * tgtf)

    B = logits.shape[0]
    ratio = masked_weight / seq_len
    weight = ratio**avg_loss
    loss = ce_sum / (B * seq_len * weight)

    # top-1 / top-5 accuracy over target positions (reference utils.py
    # accuracy:80). Computed as a rank count — "how many logits beat the
    # target's" — because lax.top_k over the 16384-wide vocab lowers to
    # a full sort on TPU (~40 ms per call at flagship shapes).
    n_tgt = jnp.maximum(jnp.sum(tgtf), 1.0)
    rank = jnp.sum(logits > tgt_logit_[..., None], axis=-1)
    acc1 = jnp.sum((rank < 1) * tgtf) / n_tgt * 100.0
    acc5 = jnp.sum((rank < 5) * tgtf) / n_tgt * 100.0

    metrics = {"ce_sum": ce_sum, "acc1": acc1, "acc5": acc5, "ratio": ratio}
    return loss, metrics
