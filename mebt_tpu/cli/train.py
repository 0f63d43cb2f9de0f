"""Train a MeBT transformer (stage 2) — CLI mirror of the reference's
train_transformer.py surface:

  python -m mebt_tpu.cli.train --base configs/stl/mebt_16f.yaml \\
      [--ckpt_path CKPT] [--logdir DIR] [--max_steps N] \\
      [model.params.n_layer=24 ... dot-list overrides]

Reference: train_transformer.py:10-101 (OmegaConf merge of --base yamls
+ CLI dotlist, latent_shape wiring, exp.* LR/WD knobs, auto-resume).
"""

from __future__ import annotations

import argparse
import os


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--base", nargs="*", default=[], metavar="base_config.yaml")
    p.add_argument("--ckpt_path", default=None,
                   help="explicit checkpoint to resume from")
    p.add_argument("--logdir", default="logs/mebt",
                   help="log + checkpoint directory (auto-resume scans it)")
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument(
        "--random_vqgan", action="store_true",
        help="use a randomly initialized VQGAN instead of loading the "
        "checkpoint (smoke tests only)",
    )
    p.add_argument(
        "--multihost", action="store_true",
        help="initialize jax.distributed from the standard coordinator "
        "env vars before building the mesh (multi-host SPMD; replaces "
        "the reference's Lightning DDP launch)",
    )
    return p


def main(argv=None):
    from mebt_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    from mebt_tpu.config import load_configs
    from mebt_tpu.data.datasets import VideoData

    args, unknown = build_argparser().parse_known_args(argv)
    if args.multihost:
        import jax

        jax.distributed.initialize()
    config = load_configs(args.base, unknown)

    # wire latent shape into the data config (reference
    # train_transformer.py:29)
    mask_shape = list(config.model.mask.params.shape)
    config.data.latent_shape = mask_shape
    if args.max_steps is not None:
        if "exp" not in config:
            config.exp = {}
        config.exp.max_steps = args.max_steps

    data = VideoData(config.data.to_dict())

    vqgan = None
    if not config.model.params.get("vtokens", False):
        if args.random_vqgan:
            import jax

            from mebt_tpu.models.vqgan import VQGAN, VQGANConfig

            vq_cfg = VQGANConfig(
                n_codes=config.model.params.vocab_size,
                downsample=_downsample_from_shapes(config, mask_shape),
            )
            vqgan = VQGAN.create(jax.random.key(0), vq_cfg)
        else:
            from mebt_tpu.utils.torch_ckpt import load_vqgan

            vq = config.model.vqvae.params
            vqgan = load_vqgan(
                vq.ckpt_path, tuple(vq.get("ignore_keys", ["loss"]))
            )

    from mebt_tpu.train.trainer import MeBTTrainer

    trainer = MeBTTrainer(
        config.to_dict(), logdir=args.logdir, vqgan=vqgan, seed=args.seed
    )

    state = None
    if args.ckpt_path:
        state = trainer.init_state()
        import orbax.checkpoint as ocp

        with ocp.StandardCheckpointer() as ckptr:
            import jax

            restored = ckptr.restore(
                os.path.abspath(args.ckpt_path), jax.device_get(state)
            )
            state = restored

    trainer.fit(
        data.train_dataloader(),
        val_loader=data.val_dataloader(),
        max_steps=args.max_steps,
        state=state,
        val_every=int(config.get_path("exp.val_every", 0) or 0),
    )


def _downsample_from_shapes(config, mask_shape):
    seq = int(config.data.sequence_length)
    res = int(config.data.resolution)
    t, h, w = mask_shape
    return (seq // t, res // h, res // w)


if __name__ == "__main__":
    main()
    # skip interpreter-shutdown GC: experimental PJRT plugins (the axon
    # tunnel) can deadlock tearing down device buffers after a restored
    # run — all work (checkpoints, metrics) is flushed by this point
    import os as _os
    import sys as _sys

    _sys.stdout.flush()
    _sys.stderr.flush()
    _os._exit(0)
