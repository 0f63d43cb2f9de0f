"""Pipeline parallelism (GPipe schedule) over the transformer blocks.

The reference has NO pipeline parallelism (SURVEY.md §2.3 — its only
strategy is Lightning DDP); this module adds the TPU-native mechanism
for scaling MeBT past one chip's parameter/activation memory along the
DEPTH axis: the 24 blocks are partitioned into contiguous stages over a
`pipe` mesh axis, the batch is split into microbatches, and activations
flow stage-to-stage with `jax.lax.ppermute` inside `shard_map` (the
standard SPMD pipelining recipe — every device runs the same program;
stage identity comes from `lax.axis_index`).

Design notes (TPU-first):
  * Each device holds ONLY its stage's block parameters when the state
    uses the PIPELINE LAYOUT (`to_pp_params` / `pp_param_specs`): the
    per-block trees are stacked on a leading (n_layer,) axis and
    sharded P('pipe'), so parameter AND optimizer memory scale 1/S.
    `pp_logits` also accepts the plain flax tree for convenience
    (tests, parity checks) — that path re-stacks the replicated copy
    per call and does NOT shard parameter memory. Stage compute is a
    `lax.scan` over the local blocks with `lax.switch` on the per-block
    routing mode (the five MeBT block modes share one parameter
    schema, models/transformer.py:Block).
  * The GPipe bubble is the usual (S-1)/(M+S-1) overhead; microbatch
    count M trades bubble against per-microbatch MXU utilization.
  * Both streams (latents AND token canvas) flow through the pipe —
    enc-phase stages update latents, dec-phase stages update tokens.
    Per-step traffic is O(mb * (sos + N) * D) over ICI neighbours.
  * `remat=True` wraps each stage in `jax.checkpoint`, the classic
    GPipe memory trade (activations re-materialized in backward).
  * Embeddings and the vocab head run OUTSIDE the pipeline (replicated,
    per-token cheap); a deployment that needs them sharded can fold
    them into stage 0 / S-1.

Composes with data parallelism: microbatches are sharded over 'data',
stages over 'pipe'. Exactness: tests/test_pipeline_parallel.py pins
logits, loss, and parameter gradients against the unsharded forward on
a virtual CPU mesh.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from mebt_tpu.models.mebt import MeBT, mlm_loss
from mebt_tpu.models.transformer import (
    BLOCK_MODES,
    Block,
    default_mode_list,
)


def stack_block_params(params, n_layer: int):
    """Stack the per-block parameter trees (transformer/block_{i}) along
    a leading (n_layer,) axis — the layout the pipeline shards P('pipe').
    All five block modes share one parameter schema, so one stacked tree
    covers heterogeneous mode lists."""
    blocks = [params["transformer"][f"block_{i}"] for i in range(n_layer)]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)


def unstack_block_params(stacked, n_layer: int):
    """Inverse of stack_block_params: {block_i: tree} mapping."""
    return {
        f"block_{i}": jax.tree.map(lambda x: x[i], stacked)
        for i in range(n_layer)
    }


def to_pp_params(params, n_layer: int):
    """Convert a plain flax tree to the PIPELINE LAYOUT:
    {'blocks': (n_layer, ...)-stacked block tree, 'nonpipe': the rest
    (embeddings, latent queries, ln_f, head)}. Install 'blocks' with
    P('pipe') sharding (`pp_param_specs`) so each device stores only
    its stage's parameters — the point of the depth axis."""
    tf = dict(params["transformer"])
    blocks = [tf.pop(f"block_{i}") for i in range(n_layer)]
    rest = {k: v for k, v in params.items() if k != "transformer"}
    rest["transformer"] = tf
    return {
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "nonpipe": rest,
    }


def from_pp_params(pp_params, n_layer: int):
    """Inverse of to_pp_params (gathers the blocks; for checkpointing
    or handing weights back to non-pipeline code)."""
    rest = dict(pp_params["nonpipe"])
    tf = dict(rest["transformer"])
    tf.update(unstack_block_params(pp_params["blocks"], n_layer))
    rest["transformer"] = tf
    return rest


def pp_param_specs(pp_params, tp: bool = False):
    """PartitionSpecs for the pipeline layout: stacked blocks sharded
    over 'pipe' (leading layer axis), everything else replicated. Use
    with NamedSharding to device_put the train state (and its optimizer
    mirror).

    `tp=True` additionally applies the Megatron TP rules
    (mesh.mebt_param_rules) over the 'model' axis: block leaves get
    P('pipe', *tp_entries) — the stacked layer axis prepends the
    per-block TP spec — and nonpipe leaves (embeddings/head) their
    plain TP spec. Requires pp_logits' shard_map to leave 'model' auto
    (it does)."""
    from mebt_tpu.parallel.mesh import mebt_param_rules, spec_for_tree

    if not tp:
        return {
            "blocks": jax.tree.map(lambda _: P("pipe"),
                                   pp_params["blocks"]),
            "nonpipe": jax.tree.map(lambda _: P(), pp_params["nonpipe"]),
        }
    rules = mebt_param_rules()
    # the stacked block tree keeps the per-block leaf paths
    # (attn/query/kernel, ...) so the same path-regex rules apply; each
    # leaf has one extra leading (n_layer,) dim to skip
    block_specs = spec_for_tree(
        jax.tree.map(lambda x: jax.ShapeDtypeStruct(x.shape[1:], x.dtype),
                     pp_params["blocks"]),
        rules,
    )
    return {
        "blocks": jax.tree.map(
            lambda s: P("pipe", *s), block_specs,
            is_leaf=lambda x: isinstance(x, P),
        ),
        "nonpipe": spec_for_tree(pp_params["nonpipe"], rules),
    }


def _is_pp_layout(params) -> bool:
    return isinstance(params, dict) and set(params) == {"blocks", "nonpipe"}


def _block_branches(cfg, deterministic: bool):
    """One apply-branch per routing mode for `lax.switch`. In training
    mode (deterministic=False) each branch consumes a dropout key folded
    per (global layer, microbatch) so draws are independent across
    stages, layers, and microbatches."""

    def branch(mode):
        blk = Block(
            mode=mode,
            n_embd=cfg.n_embd,
            n_head=cfg.n_head,
            attn_pdrop=0.0 if deterministic else cfg.attn_pdrop,
            resid_pdrop=0.0 if deterministic else cfg.resid_pdrop,
            dtype=cfg.dtype,
        )

        def f(bp, latents, tokens, ctx, tgt, rng):
            rngs = None if deterministic else {"dropout": rng}
            return blk.apply(
                {"params": bp}, latents, tokens, ctx, tgt, deterministic,
                rngs=rngs,
            )

        return f

    return [branch(m) for m in BLOCK_MODES]


def pp_logits(
    model: MeBT,
    params,
    codes: jax.Array,  # (B, N) int32 — full canvas
    ctx_mask: jax.Array,  # (B, N) bool
    tgt_mask: jax.Array,  # (B, N) bool
    mesh: Mesh,
    n_micro: int,
    *,
    remat: bool = False,
    rng: jax.Array | None = None,
) -> jax.Array:
    """(B, N, V) logits computed through the stage pipeline.

    Requires n_layer % pipe == 0 and B % (n_micro * data) == 0.
    `rng` enables training-mode dropout (embd/attn/resid per config),
    with draws independent across stages, layers, and microbatches.
    """
    cfg = model.config
    S = mesh.shape["pipe"]
    L = cfg.n_layer
    if L % S:
        raise ValueError(f"n_layer {L} not divisible by pipe axis {S}")
    M = int(n_micro)
    B, N = codes.shape
    if B % M:
        raise ValueError(f"batch {B} not divisible by n_micro {M}")
    mb = B // M
    deterministic = rng is None

    modes = default_mode_list(L, cfg.mode)
    mode_ids = jnp.asarray([BLOCK_MODES.index(m) for m in modes], jnp.int32)
    if _is_pp_layout(params):
        # pipeline layout: blocks arrive pre-stacked (and, when the
        # caller installed pp_param_specs shardings, P('pipe')-sharded —
        # no replicated full-parameter copy ever exists)
        stacked = params["blocks"]
        params = params["nonpipe"]
    else:
        stacked = stack_block_params(params, L)
    branches = _block_branches(cfg, deterministic)

    # embeddings + latent queries outside the pipeline (replicated params,
    # per-token cheap). tokens0/latents0: (M, mb, ...) per microbatch
    # (latent queries are broadcast, but embedding dropout must draw
    # independently per microbatch).
    tokens0 = model.apply(
        {"params": params}, codes, ctx_mask, method=MeBT._embed_canvas
    ).reshape(M, mb, N, cfg.n_embd)
    latents0 = jnp.broadcast_to(
        model.apply({"params": params}, mb, method=MeBT._latent_queries),
        (M, mb, cfg.sos_emb, cfg.n_embd),
    )
    if not deterministic and cfg.embd_pdrop > 0.0:
        k_tok, k_lat, rng = jax.random.split(rng, 3)
        keep = 1.0 - cfg.embd_pdrop
        tokens0 = tokens0 * (
            jax.random.bernoulli(k_tok, keep, tokens0.shape) / keep
        ).astype(tokens0.dtype)
        latents0 = latents0 * (
            jax.random.bernoulli(k_lat, keep, latents0.shape) / keep
        ).astype(latents0.dtype)
    if rng is None:
        # shard_map needs a consistent arg pytree; branches ignore it
        rng = jax.random.key(0)
    ctx_all = ctx_mask.reshape(M, mb, N)
    tgt_all = tgt_mask.reshape(M, mb, N)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            jax.tree.map(lambda _: P("pipe"), stacked),
            P("pipe"),
            P(None, "data"),
            P(None, "data"),
            P(None, "data"),
            P(None, "data"),
            P(),
        ),
        out_specs=P("pipe", "data"),
        # manual over data+pipe ONLY: the 'model' axis stays auto, so
        # block params additionally sharded over 'model' (Megatron TP,
        # mesh.mebt_param_rules via pp_param_specs(tp=True)) keep their
        # sharding inside the stage compute and GSPMD inserts the TP
        # collectives — this is how PP composes with TP on one mesh
        axis_names=frozenset({"data", "pipe"}),
        check_vma=False,
    )
    def pipeline(blocks, mids, tokens0, latents0, ctx_all, tgt_all, key):
        sidx = jax.lax.axis_index("pipe")
        lidx = sidx * (L // S) + jnp.arange(L // S)
        # both activation streams are batch-sharded over 'data', so
        # dropout draws must differ across data shards too
        dkey = jax.random.fold_in(key, jax.lax.axis_index("data"))

        def run_stage(latents, tokens, ctx, tgt, mb_cur):
            def body(carry, xs):
                bp, mid, li = xs
                lat, tok = carry
                # dropout draws independent per (layer, microbatch)
                rkey = jax.random.fold_in(
                    jax.random.fold_in(dkey, li), mb_cur
                )
                lat, tok = jax.lax.switch(
                    mid, branches, bp, lat, tok, ctx, tgt, rkey
                )
                return (lat, tok), None

            (latents, tokens), _ = jax.lax.scan(
                body, (latents, tokens), (blocks, mids, lidx)
            )
            return latents, tokens

        if remat:
            run_stage = jax.checkpoint(run_stage)

        T = M + S - 1
        state = (jnp.zeros_like(latents0[0]), jnp.zeros_like(tokens0[0]))
        outbuf = jnp.zeros_like(tokens0)

        def step(carry, t):
            state, outbuf = carry
            # stage 0 feeds microbatch t; later stages consume the
            # ppermute'd activations from their predecessor
            mb_in = jnp.clip(t, 0, M - 1)
            fresh = jax.tree.map(
                lambda x: jax.lax.dynamic_index_in_dim(
                    x, mb_in, 0, keepdims=False
                ),
                (latents0, tokens0),
            )
            first = sidx == 0
            lat, tok = jax.tree.map(
                lambda a, b: jnp.where(first, a, b), fresh, state
            )
            # this device is processing microbatch t - stage_index
            mb_cur = jnp.clip(t - sidx, 0, M - 1)
            ctx = jax.lax.dynamic_index_in_dim(
                ctx_all, mb_cur, 0, keepdims=False
            )
            tgt = jax.lax.dynamic_index_in_dim(
                tgt_all, mb_cur, 0, keepdims=False
            )
            out = run_stage(lat, tok, ctx, tgt, mb_cur)

            # the last stage banks the finished token stream
            oi = jnp.clip(t - (S - 1), 0, M - 1)
            write = jnp.logical_and(sidx == S - 1, t >= S - 1)
            cur = jax.lax.dynamic_index_in_dim(outbuf, oi, 0, keepdims=False)
            new = jnp.where(write, out[1], cur)
            outbuf = jax.lax.dynamic_update_index_in_dim(outbuf, new, oi, 0)

            # hand activations to the next stage (stage 0 receives zeros
            # and overwrites them with fresh input above). Both streams
            # ride ONE fused ppermute: a single larger ICI transfer per
            # step, and — since collective-permute rendezvous is global
            # across the mesh — no pair of independent permutes that an
            # out-of-order thunk executor could issue in different
            # orders on different devices (deadlocks XLA:CPU's
            # in-process communicator on the virtual-device mesh).
            fused = jnp.concatenate(
                [out[0].astype(out[1].dtype), out[1]], axis=1
            )
            fused = jax.lax.ppermute(
                fused, "pipe", [(i, i + 1) for i in range(S - 1)]
            )
            state = (
                fused[:, : cfg.sos_emb].astype(out[0].dtype),
                fused[:, cfg.sos_emb :],
            )
            return (state, outbuf), None

        (_, outbuf), _ = jax.lax.scan(step, (state, outbuf), jnp.arange(T))
        return outbuf

    # out_specs stacks every stage's buffer: (S*M, mb, N, D); only the
    # last stage's M entries carry the finished canvases
    out = pipeline(
        stacked, mode_ids, tokens0, latents0, ctx_all, tgt_all, rng
    )
    tokens = out[-M:].reshape(B, N, cfg.n_embd)
    return model.apply(
        {"params": params},
        tokens,
        method=lambda m, t: m.transformer.logits_head(t),
    )


def pp_loss_fn(
    model: MeBT,
    mesh: Mesh,
    n_micro: int,
    avg_loss: float = 1.0,
    label_smoothing: float = 0.0,
    remat: bool = False,
):
    """Pipeline-parallel MLM training objective. Pass `rng` for
    training-mode dropout (embd/attn/resid per config, independent per
    stage/layer/microbatch). Differentiating through the pipeline
    transposes each ppermute into its reverse shift, giving the
    standard GPipe backward schedule."""

    def fn(params, batch, rng=None):
        logits = pp_logits(
            model, params, batch["codes"], batch["ctx_mask"],
            batch["tgt_mask"], mesh, n_micro, remat=remat, rng=rng,
        )
        return mlm_loss(
            logits, batch["codes"], batch["tgt_mask"], batch["seq_len"],
            batch["masked_weight"], avg_loss=avg_loss,
            label_smoothing=label_smoothing,
        )

    return fn
