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


def sp_maskgit_sample(
    model: MeBT,
    params,
    rng: jax.Array,
    B: int,
    plan,
    mesh: Mesh,
    *,
    codes: jax.Array | None = None,
    ctx_mask: jax.Array | None = None,
    temperature: float = 1.0,
    top_k: int | None = None,
    top_p: float | None = None,
    context_temperature: float = 4.5,
    strategy: str = "maskgit",
    sample_noise: jax.Array | None = None,
    promote_noise: jax.Array | None = None,
):
    """MaskGIT/bootstrap decode with the token canvas sharded over the
    mesh's 'seq' axis (and the batch over 'data') — the SP serving path
    for canvases too large for one chip's HBM.

    Mechanism (plan-global promotion under shard_map): each shard runs
    the dense per-step forward + token sampling on its local canvas
    slice; the per-position confidence scores and target masks are then
    `all_gather`ed over 'seq' — O(B·N) floats, tiny next to the logits —
    so `promote_targets` ranks the GLOBAL canvas exactly like the
    unsharded scan (reference semantics: mask_sampler.py:189-237 promote
    the global top-n_new). Every shard computes the identical global
    promotion mask from the replicated promotion key and slices out its
    local span. The latent bottleneck keeps the enc-phase attention
    collectives small (see module docstring); this adds only the
    (B, N) score/mask gathers per step.

    Exactness: with the `sample_noise` (S, B, N, V) / `promote_noise`
    (S, B, N) hooks every decision reduces to argmax/ranking of
    quantities the SP forward reproduces to fp tolerance, and the
    decoded codes come out IDENTICAL to the unsharded dense scan
    (tests/test_seq_parallel.py pins this). Without hooks, sampling
    keys fold the shard indices (i.i.d. draws, different stream than
    unsharded — same distribution).

    Scope: confidence ('maskgit') and 'random'/'bootstrap' strategies;
    'entp'/'ar' scoring raise (use the unsharded or TP decode paths).
    The per-shard forward is the dense full-canvas scan (the staged
    compaction of sampler/decode.py is a single-chip throughput
    optimization; SP exists for canvases that do not fit one chip).
    """
    import numpy as np

    from mebt_tpu.ops.sampling import promote_targets, sample_tokens

    if strategy not in ("maskgit", "random", "bootstrap"):
        raise NotImplementedError(
            f"sp_maskgit_sample supports maskgit/random/bootstrap, "
            f"got {strategy!r}"
        )
    random_scores = strategy in ("random", "bootstrap")
    N = model.config.seq_len
    n_seq = mesh.shape["seq"]
    n_data = mesh.shape["data"]
    if N % n_seq or B % n_data:
        raise ValueError(
            f"N={N} must divide by seq={n_seq} and B={B} by data={n_data}"
        )
    msp = sp_model(model)
    pspecs = jax.tree.map(lambda _: P(), params)

    codes0 = jnp.zeros((B, N), jnp.int32) if codes is None else codes
    ctx0 = jnp.zeros((B, N), bool) if ctx_mask is None else ctx_mask
    chosen0 = jnp.ones((B, N), jnp.float32)
    plan_xs = (
        jnp.asarray(plan.do_step),
        jnp.asarray(plan.n_new),
        jnp.asarray(plan.ctemp_scale),
    )
    with_noise = sample_noise is not None or promote_noise is not None
    if with_noise and (sample_noise is None or promote_noise is None):
        raise ValueError(
            "sample_noise and promote_noise must be passed together"
        )
    all_live = bool(np.all(plan.do_step))

    noise_specs = (
        (P(None, "data", "seq", None), P(None, "data", None))
        if with_noise
        else ()
    )

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            pspecs, P("data", "seq"), P("data", "seq"), P("data", "seq"),
            P(), (P(), P(), P()), *noise_specs,
        ),
        out_specs=(P("data", "seq"), P("data", "seq"), P("data", "seq")),
        check_vma=False,
    )
    def run_scan(params, codes, ctx, chosen, key, plan_xs, *noises):
        si = jax.lax.axis_index("seq")
        di = jax.lax.axis_index("data")
        N_l = codes.shape[1]

        def step(carry, xs):
            codes, ctx, chosen, key = carry
            if with_noise:
                do_step, n_new, ctemp_scale, s_noise, p_noise = xs
            else:
                do_step, n_new, ctemp_scale = xs
                s_noise = p_noise = None

            def live(args):
                codes, ctx, chosen, key = args
                tgt = ~ctx
                logits = msp.apply({"params": params}, codes, ctx, tgt)
                key2, r_sample, r_promote = jax.random.split(key, 3)
                r_local = jax.random.fold_in(
                    jax.random.fold_in(r_sample, si), di
                )
                sampled, chosen_p, _ = sample_tokens(
                    r_local, logits, temperature, top_k, top_p,
                    noise=s_noise,
                )
                new_codes = jnp.where(tgt, sampled, codes)
                new_chosen = jnp.where(tgt, chosen_p, chosen)
                # plan-global promotion: gather scores + target mask over
                # 'seq', rank globally (identical on every shard from the
                # replicated r_promote), slice the local span back out
                scores_g = jax.lax.all_gather(
                    chosen_p, "seq", axis=1, tiled=True
                )
                tgt_g = jax.lax.all_gather(tgt, "seq", axis=1, tiled=True)
                r_prom = (
                    r_promote if with_noise
                    else jax.random.fold_in(r_promote, di)
                )
                promote_g = promote_targets(
                    r_prom, scores_g, tgt_g, n_new,
                    context_temperature * ctemp_scale,
                    random_scores=random_scores, noise=p_noise,
                )
                promote_l = jax.lax.dynamic_slice_in_dim(
                    promote_g, si * N_l, N_l, axis=1
                )
                return new_codes, ctx | promote_l, new_chosen, key2

            if all_live:
                carry = live((codes, ctx, chosen, key))
            else:
                carry = jax.lax.cond(
                    do_step, live, lambda a: a, (codes, ctx, chosen, key)
                )
            return carry, None

        xs_all = (*plan_xs, *noises) if with_noise else plan_xs
        (codes, ctx, chosen, _), _ = jax.lax.scan(
            step, (codes, ctx, chosen, key), xs_all
        )
        return codes, ctx, chosen

    noise_args = ()
    if with_noise:
        noise_args = (
            jnp.asarray(sample_noise, jnp.float32),
            jnp.asarray(promote_noise, jnp.float32),
        )
    return run_scan(
        params, codes0, ctx0, chosen0, rng, plan_xs, *noise_args
    )


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
