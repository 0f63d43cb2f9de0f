"""Shared CLI plumbing: config -> model/params/vqgan loading.

Checkpoint sources:
  * torch `.ckpt` files (published MeBT / TATS VQGAN weights) via
    mebt_tpu.utils.torch_ckpt
  * orbax checkpoint directories produced by mebt_tpu.train.trainer
  * --random_weights for smoke runs without any checkpoint
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from mebt_tpu.config import Config, load_configs
from mebt_tpu.models.mebt import MeBT, MeBTConfig
from mebt_tpu.models.vqgan import VQGAN, VQGANConfig


def add_common_args(p):
    p.add_argument("--base", nargs="*", default=[], metavar="cfg.yaml")
    p.add_argument("--gpt_ckpt", type=str, default="")
    p.add_argument("--exp_name", type=str, default="")
    p.add_argument("--save", type=str, default="./results/mebt")
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--n_sample", type=int, default=2048)
    p.add_argument("--run", type=int, default=0)
    p.add_argument(
        "--dataset", type=str, default="mshapes",
        choices=["ucf101", "stl", "taichi", "mshapes"],
    )
    p.add_argument("--format", type=str, default="gif",
                   choices=["webp", "mp4", "gif", "avi"])
    p.add_argument("--save_videos", action="store_true")
    p.add_argument("--save_n", type=int, default=5)
    p.add_argument("--save_codemap", action="store_true")
    p.add_argument("--no_np", action="store_true")
    p.add_argument("--seed", type=int, default=None)
    p.add_argument(
        "--random_weights", action="store_true",
        help="random init instead of loading checkpoints (smoke runs)",
    )
    p.add_argument(
        "--compute_dtype", default="bfloat16",
        choices=["bfloat16", "float32"],
    )
    return p


def load_model_bundle(args, config: Config):
    """-> (model, params, vqgan). Resolves the checkpoint source."""
    dtype = jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32
    mask_shape = tuple(config.model.mask.params.shape)

    if args.random_weights:
        cfg = MeBTConfig.from_config(
            config.model.params.to_dict(), mask_shape=mask_shape, dtype=dtype
        )
        model = MeBT(cfg)
        params = _random_params(model)
        vqgan = _vqgan_from_config(config, random=True)
        return model, params, vqgan

    ckpt = args.gpt_ckpt
    if not ckpt and args.exp_name:
        ckpt = _find_exp_ckpt(args.exp_name)
    if not ckpt:
        raise SystemExit("Provide --gpt_ckpt, --exp_name, or --random_weights")

    if os.path.isdir(ckpt):
        # orbax directory (our trainer output)
        cfg = MeBTConfig.from_config(
            config.model.params.to_dict(), mask_shape=mask_shape, dtype=dtype
        )
        model = MeBT(cfg)
        params = _restore_orbax_params(model, ckpt)
        vqgan = _vqgan_from_config(config)
    else:
        from mebt_tpu.utils.torch_ckpt import load_mebt

        cfg, params, vqgan = load_mebt(ckpt, dtype=dtype)
        model = MeBT(cfg)
        if vqgan is None:
            vqgan = _vqgan_from_config(config)
    return model, params, vqgan


def _random_params(model: MeBT):
    N = model.config.seq_len
    return model.init(
        jax.random.key(0),
        jnp.zeros((1, N), jnp.int32),
        jnp.zeros((1, N), bool),
        jnp.zeros((1, N), bool),
    )["params"]


def _vqgan_from_config(config: Config, random: bool = False) -> VQGAN:
    if random:
        t, h, w = (int(s) for s in config.model.mask.params.shape)
        seq = int(config.data.sequence_length)
        res = int(config.data.resolution)
        vq_cfg = VQGANConfig(
            n_codes=int(config.model.params.vocab_size),
            downsample=(max(1, seq // t), res // h, res // w),
        )
        return VQGAN.create(jax.random.key(1), vq_cfg)
    from mebt_tpu.utils.torch_ckpt import load_vqgan

    vq = config.model.vqvae.params
    return load_vqgan(vq.ckpt_path, tuple(vq.get("ignore_keys", ["loss"])))


def _restore_orbax_params(model: MeBT, path: str):
    import orbax.checkpoint as ocp

    target = jax.tree.map(np.asarray, _random_params(model))
    path = os.path.abspath(path)
    # either a CheckpointManager root (numbered subdirs) or one step dir
    subdirs = [d for d in os.listdir(path) if d.isdigit()]
    if subdirs:
        path = os.path.join(path, str(max(int(d) for d in subdirs)))
    with ocp.StandardCheckpointer() as ckptr:
        # trainer saves the full TrainState; accept either layout
        try:
            restored = ckptr.restore(
                os.path.join(path, "default"),
                {"params": target, "step": np.zeros((), np.int32)},
            )
            return restored["params"]
        except Exception:
            restored = ckptr.restore(os.path.join(path, "default"))
            return restored["params"]


def _find_exp_ckpt(exp_name: str) -> str:
    """Newest checkpoint under logs/<exp_name>/checkpoints (analogue of
    the reference's glob over lightning_logs, sample script:205-213)."""
    root = os.path.join("logs", exp_name, "checkpoints")
    if not os.path.isdir(root):
        raise SystemExit(f"No checkpoints under {root}")
    return root


def parse_config(args, unknown) -> Config:
    return load_configs(args.base, unknown)
