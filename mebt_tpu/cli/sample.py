"""MaskGIT video sampling CLI — mirror of the reference
sample_vqgan_transformer_videos.py surface (flags, save-path scheme,
npy/codemap dumps).

  python -m mebt_tpu.cli.sample --base configs/stl/mebt_16f.yaml \\
      --gpt_ckpt CKPT --n_sample 2048 --batch_size 16 \\
      --vid_n_steps 32 --vid_c_temp 8.0 --schedule cosine --save_codemap
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def build_argparser():
    from mebt_tpu.cli.common import add_common_args

    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p)
    p.add_argument("--base_np", type=str, default="",
                   help="seed codemap npy -> extrapolate mode")
    p.add_argument("--top_k", type=int, default=None)
    p.add_argument("--top_p", type=float, default=None)
    p.add_argument("--temp", type=float, default=1.0)
    p.add_argument("--vid_c_temp", type=float, default=1.0)
    p.add_argument("--vid_n_steps", type=int, default=128)
    p.add_argument("--total_length", type=int, default=32)
    p.add_argument("--context_size", type=int, default=12)
    p.add_argument("--step_size", type=int, default=16)
    p.add_argument("--bootstrap", type=int, default=0)
    p.add_argument("--schedule", type=str, default="cosine")
    p.add_argument(
        "--decoding_strategy", type=str, default="maskgit",
        choices=["maskgit", "random", "entp", "ar"],
    )
    p.add_argument(
        "--ctemp_schedule", type=str, default="linear",
        choices=["linear", "constant", "cosine"],
    )
    p.add_argument(
        "--approx_top_k", action="store_true",
        help="TPU-accelerated approximate top-k filter (recall 0.99) "
        "instead of the exact vocab-wide sort; ~2x faster 128f decode",
    )
    # reference-CLI compatibility (sample script:170-190). The
    # valid_dnr pipelines pass --no_phase (the reference asserts without
    # it) and it suffixes the output names; frame_* feed the reference's
    # dead first-frame phase and are accepted-and-ignored like upstream.
    p.add_argument("--no_phase", action="store_true")
    p.add_argument("--frame_c_temp", type=float, default=4.5)
    p.add_argument("--frame_n_steps", type=int, default=16)
    p.add_argument("--latest", action="store_true",
                   help="with --exp_name: suffix save dir with _latest "
                   "(orbax discovery already picks the newest step)")
    p.add_argument("-v", "--verbose", action="store_true")
    p.add_argument(
        "--profile", type=str, default="",
        help="dump a jax.profiler XPlane trace of the SECOND batch "
        "(post-compile) to this directory",
    )
    return p


def save_tag(args) -> str:
    tag = f"VID_n_steps{args.vid_n_steps}"
    if args.top_k is not None:
        tag += f"_k{args.top_k}"
    if args.top_p is not None:
        tag += f"_p{args.top_p}"
    tag += (
        f"_temp{args.temp}_ctemp{args.vid_c_temp}{args.ctemp_schedule}"
        f"_{args.decoding_strategy}_{args.schedule}"
    )
    if args.no_phase:
        tag += "_no_phase"  # reference naming (sample script:236-237)
    tag += f"_run{args.run}"
    return tag


def main(argv=None):
    from mebt_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    import jax

    from mebt_tpu.cli.common import load_model_bundle, parse_config
    from mebt_tpu.sampler.generation import (
        bidirect_generate,
        extrapolate_generate,
    )
    from mebt_tpu.utils.video import save_video_grid, save_video_npy

    args, unknown = build_argparser().parse_known_args(argv)
    config = parse_config(args, unknown)
    model, params, vqgan = load_model_bundle(args, config)

    if args.exp_name:
        args.save = f"results/{args.exp_name}"
        if args.latest:
            args.save += "_latest"  # reference sample script:213
    tag = save_tag(args)
    save_dir = os.path.join(
        args.save, f"videos_{args.total_length}", args.dataset, tag
    )
    save_np = os.path.join(
        args.save, f"numpy_files_{args.total_length}", args.dataset, tag
    )
    os.makedirs(save_dir, exist_ok=True)
    os.makedirs(os.path.dirname(save_np), exist_ok=True)

    seed = args.seed if args.seed is not None else args.run
    rng = jax.random.key(seed)
    base_np = np.load(args.base_np) if args.base_np else None

    n_batch = args.n_sample // args.batch_size + min(
        1, args.n_sample % args.batch_size
    )
    all_pix, all_code, all_score = [], [], []
    n_row = min(int(np.sqrt(args.batch_size)), 4)
    for i in range(n_batch):
        if args.profile and i == 1:  # batch 0 pays the compiles
            jax.profiler.start_trace(args.profile)
        rng, r = jax.random.split(rng)
        if base_np is None:
            res = bidirect_generate(
                model, params, vqgan, r, args.batch_size,
                total_length=args.total_length,
                step_size=args.step_size,
                context_size=args.context_size,
                temperature=args.temp, top_k=args.top_k, top_p=args.top_p,
                vid_n_steps=args.vid_n_steps, vid_c_temp=args.vid_c_temp,
                ctemp_schedule=args.ctemp_schedule,
                strategy=args.decoding_strategy, schedule=args.schedule,
                bootstrap=args.bootstrap,
                approx_top_k=args.approx_top_k,
            )
        else:
            seedcodes = base_np[
                i * args.batch_size : (i + 1) * args.batch_size
            ]
            res = extrapolate_generate(
                model, params, vqgan, r, seedcodes,
                total_length=args.total_length,
                step_size=args.step_size, context_size=args.context_size,
                temperature=args.temp, top_k=args.top_k, top_p=args.top_p,
                vid_n_steps=args.vid_n_steps, vid_c_temp=args.vid_c_temp,
                ctemp_schedule=args.ctemp_schedule, schedule=args.schedule,
            )
        if args.save_videos and i < args.save_n:
            save_video_grid(
                res.samples,
                os.path.join(save_dir, f"generation_{i}.{args.format}"),
                n_row,
            )
        all_pix.append(res.samples)
        all_code.append(res.code_maps)
        all_score.append(res.score)
        print(f"batch {i + 1}/{n_batch} done", flush=True)
        if args.profile and i == 1:
            jax.profiler.stop_trace()
            print(f"XPlane trace written to {args.profile}", flush=True)

    codes = np.concatenate(all_code, 0)[: args.n_sample]
    if args.save_codemap:
        np.save(save_np + "_codemap", codes)
    scores = np.concatenate(all_score, 0)[: args.n_sample]
    np.save(save_np + "_score", scores)
    if not args.no_np:
        pix = np.concatenate(all_pix, 0)
        n_total = pix.shape[0]
        sel = np.random.permutation(n_total)[: args.n_sample]
        save_video_npy(pix[sel], save_np + ".npy")
        print(f"saved {save_np}.npy", flush=True)


if __name__ == "__main__":
    main()
