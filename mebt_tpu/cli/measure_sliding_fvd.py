"""Sliding-window FVD(t) curve for long videos — mirror of the
reference measure_sliding_fvd_with_numpy.py: FVD/KVD of each
sequence_length-frame window at stride --slide over 128-frame samples
against a fixed real set; CSV of the curve.
"""

from __future__ import annotations

import argparse

import numpy as np


def build_argparser():
    from mebt_tpu.cli.measure_fvd import add_data_args

    p = argparse.ArgumentParser(description=__doc__)
    add_data_args(p)
    p.add_argument("--np_file", type=str, required=True)
    p.add_argument("--slide", type=int, default=8)
    p.add_argument("--n_sample", type=int, default=512)
    p.add_argument("--n_neighbor", type=int, default=5)
    p.add_argument(
        "--dataset", type=str, default="mshapes",
        choices=["mshapes", "ucf101", "sky", "taichi"],
    )
    p.add_argument("--train", action="store_true")
    p.add_argument("--total_length", type=int, default=128)
    p.add_argument("--i3d_ckpt", type=str,
                   default="ckpts/i3d_pretrained_400.pt")
    return p


def main(argv=None):
    from mebt_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    import pandas as pd

    from mebt_tpu.cli.measure_fvd import (
        fake_embeddings_from_npy,
        real_embeddings_from_loader,
    )
    from mebt_tpu.data.datasets import VideoData
    from mebt_tpu.eval.fvd import frechet_distance, polynomial_mmd
    from mebt_tpu.eval.i3d import load_i3d

    args = build_argparser().parse_args(argv)
    data_np = np.load(args.np_file)

    model, params = load_i3d(args.i3d_ckpt)
    vd = VideoData(vars(args))
    loader = vd.train_dataloader() if args.train else vd.val_dataloader()
    real = real_embeddings_from_loader(
        loader, model, params, args.n_sample, args.batch_size
    )

    rows = {"t": [], "fvd": [], "kvd": []}
    for t in range(0, args.total_length - args.sequence_length, args.slide):
        window = data_np[:, t : t + args.sequence_length]
        fake = fake_embeddings_from_npy(
            window, model, params, args.n_sample, args.batch_size,
            args.sequence_length,
        )
        fvd = frechet_distance(fake, real)
        kvd = polynomial_mmd(fake, real)
        print(f"t={t}: FVD = {fvd:.2f}  KVD = {kvd:.2f}")
        rows["t"].append(t)
        rows["fvd"].append(fvd)
        rows["kvd"].append(kvd)

    out = args.np_file.replace(
        ".npy",
        f"_slide{args.slide}_clip{args.sequence_length}_{args.n_neighbor}.csv",
    )
    pd.DataFrame(rows).to_csv(out)
    print(f"wrote {out}")
    return rows


if __name__ == "__main__":
    main()
