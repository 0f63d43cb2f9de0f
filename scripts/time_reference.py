#!/usr/bin/env python
"""Time the REFERENCE MeBT pipeline directly on its own stack.

Run this inside the reference's environment (PyTorch >= 1.10 + CUDA,
pytorch-lightning 1.7.5, einops — README.md:13-15 of Ugness/MeBT) with
the reference repo on PYTHONPATH:

    PYTHONPATH=/path/to/MeBT python scripts/time_reference.py \
        --device cuda --recipe stl16f
    PYTHONPATH=/path/to/MeBT python scripts/time_reference.py \
        --device cuda --recipe stl128f

It builds the published flagship architecture (24L/16H/1024d, vocab
16384, 256 latents) with RANDOM weights — throughput is
weight-independent — by monkeypatching the checkpoint loader, then runs
the reference's own `bidirect_sample` driver with the exact recipe flags
from scripts/valid_dnr_config_ckpt_exp_stl_{16f,128f}.sh and prints one
JSON line compatible with bench.py's `vs_baseline` denominator.

This file only *calls* the reference as a library (read-only), the same
way tests/test_reference_parity.py does; nothing is vendored.
"""

from __future__ import annotations

import argparse
import json
import time
import types

import numpy as np


def _ns(**kw):
    return types.SimpleNamespace(**kw)


class _Conf(dict):
    """dict + attribute access — the two access styles the reference
    uses on its OmegaConf configs (utils.py:3-7 needs mapping access,
    transformer.py:113 needs `mask_config.params.t_range`). Keeps this
    harness free of an omegaconf dependency."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e


def build_model(recipe: str, device: str, toy: bool = False):
    import torch

    import mebt.download
    import mebt.vqgan as ref_vqgan

    # timing never touches the perceptual loss; avoid the torchvision
    # VGG download inside VQGAN.__init__
    class _NoLPIPS(torch.nn.Module):
        def eval(self):
            return self

    ref_vqgan.LPIPS = _NoLPIPS

    # vocab stays 16384 even for --toy: the reference's debug
    # bookkeeping hardcodes it (transformer.py:396)
    vocab = 16384
    hw = 4 if toy else 16
    vq_args = _ns(
        embedding_dim=8 if toy else 256, n_codes=vocab,
        n_hiddens=32,  # GroupNorm(32) floors the channel count
        downsample=[4, 8, 8], image_channels=3, norm_type="group",
        padding_type="replicate", no_random_restart=False,
        restart_thres=1.0, gan_feat_weight=4.0, disc_channels=64,
        disc_layers=3, disc_loss_type="hinge", image_gan_weight=1.0,
        video_gan_weight=1.0, perceptual_weight=4.0, l1_weight=4.0,
        sequence_length=16, sample_every_n_frames=1, resolution=128,
    )
    # NB: `mebt.download` the *attribute* is the re-exported download()
    # function (mebt/__init__.py), which shadows the submodule — patch
    # the module object itself
    import sys as _sys

    _sys.modules["mebt.download"].load_vqgan = (
        lambda *_a, **_k: ref_vqgan.VQGAN(vq_args)
    )

    from mebt.transformer import Net2NetTransformer

    T_lat = 4 if recipe == "stl16f" else 32
    block = T_lat * hw * hw
    mode = (
        ["latent_enc", "latent_self"] * 6
        + ["latent_enc"]
        + ["latent_dec", "lt2l"] * 5
        + ["latent_dec"]
    )
    tconf = _ns(
        vocab_size=vocab, block_size=block,
        n_layer=2 if toy else 24, n_head=2 if toy else 16,
        n_embd=16 if toy else 1024, sos_emb=8 if toy else 256,
        mode=mode[: 2 if toy else 24], unconditional=True,
        class_cond_dim=None, vtokens=False, vtokens_pos=False,
        n_unmasked=0, vis_epoch=100, avg_loss=1.0, embd_pdrop=0.0,
        resid_pdrop=0.0, attn_pdrop=0.0, sample_every_n_latent_frames=0,
        t_prior="longest",
    )
    first_stage = _ns(params=_ns(ckpt_path="<random>", ignore_keys=[]))
    mask_config = _Conf(
        target="mebt.mask_sampler.MaskGen",
        params=_Conf(
            method="mlm",
            schedule="linear",
            shape=[T_lat, hw, hw],
            budget=block,
            max_token=block,
            t_range=[0.0, 1.0],
            iid=False,
        ),
    )
    model = Net2NetTransformer(tconf, first_stage, mask_config)
    model = model.to(device).eval()
    return model


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--device", default="cuda")
    p.add_argument("--recipe", choices=["stl16f", "stl128f"],
                   default="stl16f")
    p.add_argument("--runs", type=int, default=5)
    p.add_argument(
        "--toy", action="store_true",
        help="tiny sizes for smoke-testing the harness itself",
    )
    args = p.parse_args()

    import torch

    from sample_vqgan_transformer_videos import bidirect_sample

    model = build_model(args.recipe, args.device, toy=args.toy)

    if args.recipe == "stl16f":
        # scripts/valid_dnr_config_ckpt_exp_stl_16f.sh: bs 16, 32 steps,
        # cosine, ctemp 8.0 linear
        kw = dict(
            batch_size=16, total_length=16, step_size=16, context_size=8,
            temperature=1.0, vid_n_steps=32, vid_c_temp=8.0,
            ctemp_schedule="linear", strategy="maskgit", bootstrap=0,
        )
        B = 16
    else:
        # scripts/valid_dnr_config_ckpt_exp_stl_128f.sh: bs 2, 32 steps,
        # top_k 32, ctemp 4.0, bootstrap 64
        kw = dict(
            batch_size=2, total_length=128, step_size=128, context_size=8,
            temperature=1.0, top_k=32, vid_n_steps=32, vid_c_temp=4.0,
            ctemp_schedule="linear", strategy="maskgit", bootstrap=64,
        )
        B = 2

    def run():
        with torch.no_grad():
            out = bidirect_sample(model, **kw)
        if args.device.startswith("cuda"):
            torch.cuda.synchronize()
        return out

    run()  # warmup
    times = []
    for _ in range(args.runs):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    print(
        json.dumps(
            {
                "metric": f"reference_{args.recipe}_generation_throughput",
                "value": round(B / dt, 4),
                "unit": "videos/sec/device",
                "seconds_per_batch": round(dt, 3),
                "device": args.device,
            }
        )
    )


if __name__ == "__main__":
    main()
