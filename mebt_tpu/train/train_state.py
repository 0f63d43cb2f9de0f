"""Optimizer, LR schedule, and the sharded MeBT training step.

Behavioural reference:
  * AdamW β=(0.9, 0.95), weight decay only on Linear kernels; biases,
    LayerNorms, and every embedding table decay-free
    (reference transformer.py:749-798 configure_optimizers)
  * manual linear warmup then optional cosine decay
    (reference transformer.py:665-681 optimizer_step; defaults
    warmup_steps=0, weight_decay=0.01, cosine_lr=False from
    train_transformer.py:55-66)
  * the train step = frozen VQGAN encode -> masked MLM forward -> loss
    (reference transformer.py:216-286 forward + :717-739 shared_step)

TPU-first divergence: the whole step (3-D conv encode, codebook search,
24-layer transformer, loss, backward, optimizer) is ONE sharded jit over
the (data, model) mesh; gradient synchronization is XLA-inserted psum,
not DDP hooks.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

from mebt_tpu.models.mebt import MeBT, mlm_loss
from mebt_tpu.models.vqgan import VQGAN


def lr_schedule(
    exact_lr: float,
    warmup_steps: int = 0,
    cosine_lr: bool = False,
    max_steps: int = 2_000_000,
):
    """lr(step) replicating reference optimizer_step (transformer.py:665-678).

    Warmup: scale = min(1, (step+1)/warmup). Cosine (when enabled):
    0.5 * (1 + cos(pi * (step-warmup)/(max_steps-warmup))).
    """

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        if warmup_steps > 0:
            warm = jnp.minimum(1.0, (step + 1.0) / warmup_steps)
        else:
            warm = jnp.ones_like(step)
        if cosine_lr:
            rad = jnp.maximum(step - warmup_steps, 0.0) / max(
                max_steps - warmup_steps, 1
            )
            decay = 0.5 * (1.0 + jnp.cos(rad * jnp.pi))
            scale = jnp.where(step < warmup_steps, warm, decay)
        else:
            scale = warm
        return exact_lr * scale

    return fn


def _decay_mask(params):
    """True (decayed) only for Dense kernels — matches the reference's
    whitelist (Linear weights) vs blacklist (LN/Embedding/bias/learned
    embeddings) split."""

    def pick(path, leaf):
        last = path[-1]
        name = getattr(last, "key", getattr(last, "name", ""))
        return name == "kernel"

    return jax.tree_util.tree_map_with_path(pick, params)


def make_optimizer(
    exact_lr: float,
    warmup_steps: int = 0,
    weight_decay: float = 0.01,
    cosine_lr: bool = False,
    max_steps: int = 2_000_000,
    accumulate_grad_batches: int = 1,
    grad_clip: float | None = None,
) -> optax.GradientTransformation:
    sched = lr_schedule(exact_lr, warmup_steps, cosine_lr, max_steps)
    parts = []
    if grad_clip:
        parts.append(optax.clip_by_global_norm(grad_clip))
    parts.append(
        optax.adamw(
            learning_rate=sched,
            b1=0.9,
            b2=0.95,
            weight_decay=weight_decay,
            mask=_decay_mask,
        )
    )
    tx = optax.chain(*parts)
    if accumulate_grad_batches > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate_grad_batches)
    return tx


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    opt_state: Any
    rng: jax.Array

    @classmethod
    def create(cls, rng, params, tx):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            rng=rng,
        )


def make_train_step(
    model: MeBT,
    tx: optax.GradientTransformation,
    vqgan: VQGAN | None = None,
    avg_loss: float | None = None,
    label_smoothing: float | None = None,
    sample_every_n_latent_frames: int = 0,
):
    """Build the jittable train step.

    Batch dict:
      either 'video' (B, T, H, W, 3) float in [-0.5, 0.5]  (vqgan given)
      or     'codes' (B, N) int32                          (vtokens path)
      plus   'ctx_mask', 'tgt_mask' (B, N) bool,
             'seq_len', 'masked_weight' scalars (host-computed by the
             mask sampler; reference computes these in forward()).
    """
    cfg = model.config
    a_loss = cfg.avg_loss if avg_loss is None else avg_loss
    l_smooth = (
        cfg.label_smoothing if label_smoothing is None else label_smoothing
    )

    def step_fn(state: TrainState, batch):
        if "codes" in batch:
            codes = batch["codes"]
        else:
            codes = jax.lax.stop_gradient(
                _encode_codes(
                    vqgan, batch["video"], sample_every_n_latent_frames
                )
            )
        ctx_mask = batch["ctx_mask"]
        tgt_mask = batch["tgt_mask"]

        rng = jax.random.fold_in(state.rng, state.step)

        def loss_fn(params):
            logits = model.apply(
                {"params": params},
                codes,
                ctx_mask,
                tgt_mask,
                deterministic=False,
                rngs={"dropout": rng},
            )
            return mlm_loss(
                logits,
                codes,
                tgt_mask,
                batch["seq_len"],
                batch["masked_weight"],
                avg_loss=a_loss,
                label_smoothing=l_smooth,
            )

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics, loss=loss)
        return (
            TrainState(
                step=state.step + 1,
                params=params,
                opt_state=opt_state,
                rng=state.rng,
            ),
            metrics,
        )

    return step_fn


def _encode_codes(
    vqgan: VQGAN,
    video_bthwc: jax.Array,
    sample_every_n_latent_frames: int = 0,
) -> jax.Array:
    """Frozen stage-1 encode to flat (B, N) codes. Matches reference
    encode_to_z (transformer.py:683-694) with channels-last input,
    including the optional latent-frame subsampling."""
    from mebt_tpu.models.vqgan import VQGANCore, codebook_quantize

    z = vqgan.core.apply(
        {"params": vqgan.params}, video_bthwc, method=VQGANCore.encode_latent
    )
    codes, _, _ = codebook_quantize(vqgan.codebook, z)
    if sample_every_n_latent_frames > 0:
        codes = codes[:, ::sample_every_n_latent_frames]
    B = codes.shape[0]
    return codes.reshape(B, -1).astype(jnp.int32)
