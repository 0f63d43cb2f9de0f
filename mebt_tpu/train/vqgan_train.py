"""VQGAN (stage 1) training: reconstruction + VQ-EMA + dual-GAN.

Behavioural reference: mebt/vqgan.py:95-210 (forward/training_step/
configure_optimizers). The reference alternates two Lightning
optimizers per batch (AE then discriminators); here both updates and
the EMA codebook update run inside ONE sharded jit step:

  recon L1*4 + commitment + perceptual(LPIPS, random frame)
    + hinge-GAN (image D on a random frame + video D) * adopt_weight
    + GAN feature matching            -> Adam(0.5, 0.9) on generator
  hinge D loss on detached recon      -> Adam(0.5, 0.9) on discriminators
  EMA codebook update (decay 0.99, Laplace smoothing, random restart)

Cross-device: gradient/statistic sums are global under the sharded jit
(replaces DDP + dist.all_reduce, SURVEY.md §2.3); discriminator batch
norms use global batch stats (sync-BN equivalent).
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from mebt_tpu.models.discriminator import (
    NLayerDiscriminator,
    NLayerDiscriminator3D,
    adopt_weight,
    hinge_d_loss,
    vanilla_d_loss,
)
from mebt_tpu.models.vqgan import (
    CodebookState,
    VQGANConfig,
    VQGANCore,
    codebook_ema_update,
    codebook_init_from_data,
    codebook_quantize,
)


@flax.struct.dataclass
class VQGANTrainState:
    step: jax.Array
    gen_params: Any
    codebook: CodebookState
    disc_params: Any
    gen_opt: Any
    disc_opt: Any
    rng: jax.Array


class VQGANTrainer:
    def __init__(
        self,
        config: VQGANConfig,
        lr: float = 3e-4,
        lpips_bundle=None,  # (LPIPS model, params) or None
        seed: int = 42,
    ):
        self.config = config
        self.core = VQGANCore(config)
        self.disc_img = NLayerDiscriminator(
            config.disc_channels, config.disc_layers
        )
        self.disc_vid = NLayerDiscriminator3D(
            config.disc_channels, config.disc_layers
        )
        self.d_loss = (
            hinge_d_loss if config.disc_loss_type == "hinge" else vanilla_d_loss
        )
        self.lpips = lpips_bundle
        self.gen_tx = optax.adam(lr, b1=0.5, b2=0.9)
        self.disc_tx = optax.adam(lr, b1=0.5, b2=0.9)
        self.seed = seed

    def init_state(self, example_video: np.ndarray) -> VQGANTrainState:
        k1, k2, k3, k4, k5 = jax.random.split(jax.random.key(self.seed), 5)
        x = jnp.asarray(example_video[:1])
        gen_params = self.core.init(k1, x)["params"]
        codebook = CodebookState.create(
            k2, self.config.n_codes, self.config.embedding_dim
        )
        disc_params = {
            "image": self.disc_img.init(k3, x[:, 0])["params"],
            "video": self.disc_vid.init(k4, x)["params"],
        }
        return VQGANTrainState(
            step=jnp.zeros((), jnp.int32),
            gen_params=gen_params,
            codebook=codebook,
            disc_params=disc_params,
            gen_opt=self.gen_tx.init(gen_params),
            disc_opt=self.disc_tx.init(disc_params),
            rng=k5,
        )

    # -- one fused step -------------------------------------------------------

    def make_step(self):
        cfg = self.config
        core, disc_img, disc_vid = self.core, self.disc_img, self.disc_vid
        d_loss_fn = self.d_loss
        lpips = self.lpips

        def forward(gen_params, codebook, video):
            z = core.apply(
                {"params": gen_params}, video, method=VQGANCore.encode_latent
            )
            codes, emb_st, aux = codebook_quantize(codebook, z)
            recon = core.apply(
                {"params": gen_params}, emb_st, method=VQGANCore.decode_latent
            )
            return z, codes, recon, aux

        def step_fn(state: VQGANTrainState, video):
            B, T = video.shape[0], video.shape[1]
            rng = jax.random.fold_in(state.rng, state.step)
            r_frame, r_restart, r_init = jax.random.split(rng, 3)
            frame_idx = jax.random.randint(r_frame, (B,), 0, T)
            take_frame = lambda v: jnp.take_along_axis(
                v, frame_idx[:, None, None, None, None], axis=1
            )[:, 0]

            disc_factor = adopt_weight(
                state.step, cfg.discriminator_iter_start
            )

            # ---- data-dependent codebook init on the first step
            # (reference codebook.py:48-51: the first training forward
            # seeds embeddings from the batch before quantizing). The
            # init branch only executes at runtime when step == 0; the
            # shared replicated r_init key makes every shard compute the
            # same init (supersedes the reference's dist.broadcast).
            def _do_init(cb):
                z0 = core.apply(
                    {"params": state.gen_params}, video,
                    method=VQGANCore.encode_latent,
                )
                return codebook_init_from_data(
                    cb, jax.lax.stop_gradient(z0), r_init
                )

            codebook_in = jax.lax.cond(
                state.step == 0, _do_init, lambda cb: cb, state.codebook
            )

            # ---- generator update
            def gen_loss_fn(gen_params):
                z, codes, recon, aux = forward(
                    gen_params, codebook_in, video
                )
                recon_loss = (
                    jnp.mean(jnp.abs(recon - video)) * cfg.l1_weight
                )
                frames = take_frame(video)
                frames_recon = take_frame(recon)

                perceptual = jnp.zeros(())
                if lpips is not None and cfg.perceptual_weight > 0:
                    lp_model, lp_params = lpips
                    perceptual = (
                        jnp.mean(
                            lp_model.apply(
                                {"params": lp_params}, frames, frames_recon
                            )
                        )
                        * cfg.perceptual_weight
                    )

                li_fake, feat_i_fake = disc_img.apply(
                    {"params": state.disc_params["image"]}, frames_recon
                )
                lv_fake, feat_v_fake = disc_vid.apply(
                    {"params": state.disc_params["video"]}, recon
                )
                g_loss = disc_factor * (
                    cfg.image_gan_weight * -jnp.mean(li_fake)
                    + cfg.video_gan_weight * -jnp.mean(lv_fake)
                )

                feat_loss = jnp.zeros(())
                feat_w = 4.0 / (3 + 1)
                if cfg.image_gan_weight > 0:
                    _, feat_i_real = disc_img.apply(
                        {"params": state.disc_params["image"]}, frames
                    )
                    for f, r in zip(feat_i_fake[:-1], feat_i_real[:-1]):
                        feat_loss += feat_w * jnp.mean(
                            jnp.abs(f - jax.lax.stop_gradient(r))
                        )
                if cfg.video_gan_weight > 0:
                    _, feat_v_real = disc_vid.apply(
                        {"params": state.disc_params["video"]}, video
                    )
                    for f, r in zip(feat_v_fake[:-1], feat_v_real[:-1]):
                        feat_loss += feat_w * jnp.mean(
                            jnp.abs(f - jax.lax.stop_gradient(r))
                        )
                feat_loss = disc_factor * cfg.gan_feat_weight * feat_loss

                total = (
                    recon_loss
                    + aux["commitment_loss"]
                    + g_loss
                    + perceptual
                    + feat_loss
                )
                metrics = {
                    "recon_loss": recon_loss,
                    "commitment_loss": aux["commitment_loss"],
                    "perplexity": aux["perplexity"],
                    "g_loss": g_loss,
                    "gan_feat_loss": feat_loss,
                    "perceptual_loss": perceptual,
                }
                return total, (metrics, z, codes, recon)

            (gen_total, (metrics, z, codes, recon)), gen_grads = (
                jax.value_and_grad(gen_loss_fn, has_aux=True)(
                    state.gen_params
                )
            )
            gen_updates, gen_opt = self.gen_tx.update(
                gen_grads, state.gen_opt, state.gen_params
            )
            gen_params = optax.apply_updates(state.gen_params, gen_updates)

            # ---- EMA codebook update (reference codebook.py:66-89)
            codebook = codebook_ema_update(
                codebook_in,
                jax.lax.stop_gradient(z),
                codes,
                r_restart,
                no_random_restart=cfg.no_random_restart,
                restart_thres=cfg.restart_thres,
            )

            # ---- discriminator update on detached recon
            recon_d = jax.lax.stop_gradient(recon)
            frames = take_frame(video)
            frames_recon_d = take_frame(recon_d)

            def disc_loss_fn(disc_params):
                li_real, _ = disc_img.apply(
                    {"params": disc_params["image"]}, frames
                )
                li_fake, _ = disc_img.apply(
                    {"params": disc_params["image"]}, frames_recon_d
                )
                lv_real, _ = disc_vid.apply(
                    {"params": disc_params["video"]}, video
                )
                lv_fake, _ = disc_vid.apply(
                    {"params": disc_params["video"]}, recon_d
                )
                d_img = d_loss_fn(li_real, li_fake)
                d_vid = d_loss_fn(lv_real, lv_fake)
                total = disc_factor * (
                    cfg.image_gan_weight * d_img + cfg.video_gan_weight * d_vid
                )
                return total, {
                    "d_image_loss": d_img,
                    "d_video_loss": d_vid,
                    "discloss": total,
                }

            (disc_total, d_metrics), disc_grads = jax.value_and_grad(
                disc_loss_fn, has_aux=True
            )(state.disc_params)
            disc_updates, disc_opt = self.disc_tx.update(
                disc_grads, state.disc_opt, state.disc_params
            )
            disc_params = optax.apply_updates(
                state.disc_params, disc_updates
            )

            metrics = dict(metrics, **d_metrics, loss=gen_total)
            new_state = VQGANTrainState(
                step=state.step + 1,
                gen_params=gen_params,
                codebook=codebook,
                disc_params=disc_params,
                gen_opt=gen_opt,
                disc_opt=disc_opt,
                rng=state.rng,
            )
            return new_state, metrics

        return step_fn

    def to_vqgan(self, state: VQGANTrainState):
        from mebt_tpu.models.vqgan import VQGAN

        return VQGAN(
            config=self.config,
            params=jax.device_get(state.gen_params),
            codebook=jax.device_get(state.codebook),
        )
