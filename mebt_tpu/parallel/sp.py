"""Sequence (context) parallelism for the MeBT forward pass.

The reference has NO sequence sharding (SURVEY.md §2.3 — long sequences
are handled algorithmically via the latent bottleneck); this module adds
the TPU-native mechanism for scaling the 8192-token 128f canvases past
one chip's HBM/FLOPs: shard the token axis over a `seq` mesh axis and
run the transformer inside `shard_map`.

Why the latent bottleneck makes this cheap (scaling-book style
accounting): only `latent_enc` and `lt2l` blocks attend INTO the token
axis, and their queries are the 256 latents — so the per-block
collective moves O(B * H * 256 * Dh) partial-softmax stats (pmax + two
psums over ICI), independent of sequence length. `latent_dec`, the
MLPs, embeddings, the vocab head, and the loss are all per-token and
shard-local. `maskgit` blocks (absent from every canonical config)
would need ring attention and are rejected.

Exactness: tests/test_seq_parallel.py pins logits and parameter
gradients against the unsharded forward on a virtual CPU mesh.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from mebt_tpu.models.mebt import MeBT, mlm_loss


def sp_model(model: MeBT) -> MeBT:
    """The same architecture bound for shard_map execution (token axis
    sharded over the mesh's 'seq' axis)."""
    return MeBT(dataclasses.replace(model.config, seq_axis="seq"))


def sp_dropout_rngs(key) -> dict:
    """Training-dropout RNG streams for the SP forward (call inside
    shard_map over a ('data', 'seq') mesh). Two streams, routed by the
    modules (models/transformer.py Block.setup — attention-prob dropout
    is rejected by the SP attend path):

      * 'dropout'     — token-stream dropout. Tokens are sharded
        (data, seq), so draws fold BOTH shard indices.
      * 'dropout_lat' — latent-stream dropout. Latents are batch-sharded
        over 'data' but REPLICATED over 'seq'; every seq shard must
        apply the SAME mask or the partial-softmax merge would sum
        attention partials of different query tensors. Folds 'data'
        only.
    """
    di = jax.lax.axis_index("data")
    si = jax.lax.axis_index("seq")
    return {
        "dropout": jax.random.fold_in(
            jax.random.fold_in(jax.random.fold_in(key, 0), di), si
        ),
        "dropout_lat": jax.random.fold_in(
            jax.random.fold_in(key, 1), di
        ),
    }


def sp_forward(
    model: MeBT,
    params,
    codes: jax.Array,  # (B, N) int32 — global canvas
    ctx_mask: jax.Array,  # (B, N) bool
    tgt_mask: jax.Array,  # (B, N) bool
    mesh: Mesh,
    *,
    deterministic: bool = True,
    rngs=None,
) -> jax.Array:
    """Full-canvas logits with the token axis sharded over 'seq'.

    Returns (B, N, V) logits, sharded P('data', 'seq', None). N must be
    divisible by the seq axis size.
    """
    msp = sp_model(model)
    pspecs = jax.tree.map(lambda _: P(), params)
    dropout = None if rngs is None else rngs.get("dropout")

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(pspecs, P("data", "seq"), P("data", "seq"),
                  P("data", "seq"), P()),
        out_specs=P("data", "seq", None),
        check_vma=False,
    )
    def fwd(params, codes, ctx, tgt, key):
        r = None if key is None else sp_dropout_rngs(key)
        return msp.apply(
            {"params": params}, codes, ctx, tgt,
            deterministic=deterministic, rngs=r,
        )

    if dropout is None:
        # shard_map requires consistent pytrees; pass a dummy key slot
        @partial(
            shard_map,
            mesh=mesh,
            in_specs=(pspecs, P("data", "seq"), P("data", "seq"),
                      P("data", "seq")),
            out_specs=P("data", "seq", None),
            check_vma=False,
        )
        def fwd_det(params, codes, ctx, tgt):
            return msp.apply(
                {"params": params}, codes, ctx, tgt,
                deterministic=deterministic,
            )

        return fwd_det(params, codes, ctx_mask, tgt_mask)
    return fwd(params, codes, ctx_mask, tgt_mask, dropout)


def sp_loss_fn(
    model: MeBT,
    mesh: Mesh,
    avg_loss: float = 1.0,
    label_smoothing: float = 0.0,
):
    """Sequence-parallel MLM training objective: the forward runs under
    shard_map; the loss reduction over the (sharded) token axis is left
    to GSPMD, which inserts the cross-shard psum."""

    def fn(params, batch, rng=None):
        rngs = None if rng is None else {"dropout": rng}
        logits = sp_forward(
            model, params, batch["codes"], batch["ctx_mask"],
            batch["tgt_mask"], mesh,
            deterministic=rng is None, rngs=rngs,
        )
        return mlm_loss(
            logits, batch["codes"], batch["tgt_mask"], batch["seq_len"],
            batch["masked_weight"], avg_loss=avg_loss,
            label_smoothing=label_smoothing,
        )

    return fn
