"""Same-window A/B of the 128f fused train step across remat policies
and batch sizes (VERDICT round-4 item 4: MFU 0.39 -> >=0.50 or a
speed-of-light argument).

The full-recompute policy pays +1 forward (~33% of the 3x model
FLOPs); remat_policy='dots' saves every matmul output and recomputes
only elementwise ops + the flash-attention kernel. This script times
both in one window (plus a batch-size re-sweep under the cheaper
policy) and prints tokens/s + 3x-convention MFU vs the same probe.

Usage: python scripts/ab_train.py [configs...]
  config syntax: <recipe>:<bsz>:<policy>   e.g. 128:5:dots 128:5:full
  default set: 128:5:full 128:5:dots 128:6:dots 128:8:dots
"""

import sys

sys.path.insert(0, "/root/repo")
from mebt_tpu.utils.runtime import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import numpy as np  # noqa: E402

import bench  # noqa: E402
from mebt_tpu.utils.flops import train_macs, train_tflop_per_item  # noqa: E402


def main():
    cfgs = sys.argv[1:] or ["128:5:full", "128:5:dots", "128:6:dots",
                            "128:8:dots"]
    probe = bench.chip_probe()
    print(f"probe: {probe} TFLOP/s")
    for c in cfgs:
        recipe, bsz, policy = c.split(":")
        bsz = int(bsz)
        latent = (4, 16, 16) if recipe == "16" else (32, 16, 16)
        N = int(np.prod(latent))
        remat = policy != "none"
        try:
            tok_s, extras = bench.bench_train(
                latent, bsz, "cosine", remat=remat, remat_policy=policy
                if remat else "full",
            )
        except Exception as e:
            print(f"{c:>14}: FAILED {type(e).__name__}: {str(e)[:140]}")
            continue
        fl_item = train_tflop_per_item(
            train_macs(N, D=1024, L=256, V=16384), fwd_bwd=3.0
        )
        mfu = (bsz * fl_item) / (extras["step_ms"] / 1e3) / probe
        print(f"{c:>14}: {extras['step_ms']:8.1f} ms/step  "
              f"{tok_s/1e3:8.1f}k tok/s  mfu3x={mfu:.3f}  "
              f"xla={extras['xla_tflop_per_step']} TFLOP")
    print(f"probe(post): {bench.chip_probe()} TFLOP/s")


if __name__ == "__main__":
    main()
