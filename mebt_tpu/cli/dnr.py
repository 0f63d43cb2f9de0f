"""Draft-and-revise sampling CLI — mirror of the reference
draft_and_revise_videos.py surface. The production recipe
(scripts/valid_dnr_*.sh) feeds a maskgit codemap via --np_draft and runs
revise-only refinement.
"""

from __future__ import annotations

import argparse
import os
import re

import numpy as np


def build_argparser():
    from mebt_tpu.cli.common import add_common_args

    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p)
    p.add_argument("--n_draft", type=int, default=8)
    p.add_argument("--draft_t", type=float, default=1.0)
    p.add_argument("--draft_p", type=float, default=None)
    p.add_argument("--draft_k", type=int, default=None)
    p.add_argument("--n_revise", type=int, default=8)
    p.add_argument("--revise_t", type=float, default=1.0)
    p.add_argument("--revise_p", type=float, default=None)
    p.add_argument("--revise_k", type=int, default=None)
    p.add_argument("--M", type=int, default=2)
    p.add_argument("--np_draft", type=str, default=None)
    p.add_argument("--total_length", type=int, default=16)
    p.add_argument("--context_size", type=int, default=12)
    p.add_argument("--step_size", type=int, default=16)
    # reference-CLI compatibility (dnr script argparse)
    p.add_argument("--latest", action="store_true")
    p.add_argument("-v", "--verbose", action="store_true")
    return p


def save_tag(args) -> str:
    tag = (
        f"VID_dnr_nd{args.n_draft}_dt{args.draft_t}_nr{args.n_revise}"
        f"_rt{args.revise_t}_M{args.M}"
    )
    for name in ("draft_p", "draft_k", "revise_p", "revise_k"):
        v = getattr(args, name)
        if v is not None:
            short = name[0] + name.split("_")[1][0]
            tag += f"_{short}{v}"
    tag += f"_run{args.run}"
    return tag


def parse_draft_name(np_draft: str) -> tuple[int, str]:
    """Derive (n_draft, ctemp postfix) from a maskgit codemap filename
    (reference dnr script:119-132). The sample CLI writes
    "..._ctemp<float><schedule>_..." (e.g. ctemp12.5linear); grab the
    leading float — the reference's fixed [:3] slice breaks past one
    digit + decimal (dnr script:126)."""
    n_draft = 0
    if "n_steps" in np_draft:
        n_draft = int(np_draft.split("VID_n_steps")[-1].split("_")[0])
    postfix = ""
    if "maskgit_cosine" in np_draft:
        m = re.search(r"ctemp(\d+(?:\.\d+)?)", np_draft)
        if m:
            postfix = f"_ctemp{float(m.group(1))}"
    return n_draft, postfix


def main(argv=None):
    from mebt_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    import jax

    from mebt_tpu.cli.common import load_model_bundle, parse_config
    from mebt_tpu.sampler.generation import dnr_generate
    from mebt_tpu.utils.video import save_video_grid, save_video_npy

    args, unknown = build_argparser().parse_known_args(argv)
    config = parse_config(args, unknown)
    model, params, vqgan = load_model_bundle(args, config)

    draft = None
    postfix = ""
    if args.np_draft is not None:
        draft = np.load(args.np_draft)
        # output names line up with the valid_dnr_*.sh pipelines
        args.n_draft, postfix = parse_draft_name(args.np_draft)
        args.draft_t = 0.0
        args.draft_p = args.draft_k = None

    if args.exp_name:
        args.save = f"results/{args.exp_name}"
        if args.latest:
            args.save += "_latest"
    tag = save_tag(args).replace(f"_run{args.run}", f"{postfix}_run{args.run}")
    save_dir = os.path.join(
        args.save, f"videos_{args.total_length}", args.dataset, tag
    )
    save_np = os.path.join(
        args.save, f"numpy_files_{args.total_length}", args.dataset, tag
    )
    os.makedirs(save_dir, exist_ok=True)
    os.makedirs(os.path.dirname(save_np), exist_ok=True)

    seed = args.seed if args.seed is not None else args.run
    rng = jax.random.key(1000 + seed)
    n_batch = args.n_sample // args.batch_size + min(
        1, args.n_sample % args.batch_size
    )
    n_row = int(np.sqrt(args.batch_size))
    all_pix, all_code = [], []
    for i in range(n_batch):
        rng, r = jax.random.split(rng)
        draft_batch = (
            None
            if draft is None
            else draft[i * args.batch_size : (i + 1) * args.batch_size]
        )
        res = dnr_generate(
            model, params, vqgan, r,
            args.batch_size if draft_batch is None else len(draft_batch),
            total_length=args.total_length,
            n_draft=args.n_draft, draft_t=args.draft_t,
            draft_k=args.draft_k, draft_p=args.draft_p,
            n_revise=args.n_revise, revise_t=args.revise_t,
            revise_k=args.revise_k, revise_p=args.revise_p,
            M=args.M, draft=draft_batch,
        )
        if args.save_videos and i < args.save_n:
            save_video_grid(
                res.samples,
                os.path.join(save_dir, f"generation_{i}.{args.format}"),
                n_row,
            )
        all_pix.append(res.samples)
        all_code.append(res.code_maps)
        print(f"batch {i + 1}/{n_batch} done", flush=True)

    if args.save_codemap:
        np.save(save_np + "_codemap", np.concatenate(all_code, 0))
    if args.np_draft is not None:
        with open(save_np + ".txt", "w") as f:
            f.write(args.np_draft)
    if not args.no_np:
        pix = np.concatenate(all_pix, 0)
        sel = np.random.permutation(pix.shape[0])[: args.n_sample]
        save_video_npy(pix[sel], save_np + ".npy")
        print(f"saved {save_np}.npy", flush=True)


if __name__ == "__main__":
    main()
