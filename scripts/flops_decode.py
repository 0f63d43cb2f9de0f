"""Speed-of-light report for the staged MaskGIT decode.

Counts the matmul FLOPs one generated video actually pays under the
production plan segmentation (`plan_segments_joint`), so bench numbers
can be read as MXU utilization — and the remaining headroom split into
"run the matmuls faster" vs "there are no FLOPs left to remove". The
accounting lives in mebt_tpu/utils/flops.py (bench.py emits the same
numbers as sol_videos_per_sec / mxu_utilization per line).

Usage:
  python scripts/flops_decode.py                 # 16f + 128f recipes
  python scripts/flops_decode.py --tflops 52     # SoL at a probe value
  python scripts/flops_decode.py --xla_check     # formula validation
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")

from mebt_tpu.sampler.mask_schedule import (  # noqa: E402
    bootstrap_plan,
    maskgit_plan,
)
from mebt_tpu.utils.flops import (  # noqa: E402
    CANONICAL_MODES,
    plan_macs,
    step_macs,
)


def report(name, macs, tflops, extra_ms=0.0):
    tot = sum(macs[k] for k in ("enc", "dec", "head"))
    fl = 2 * tot  # FLOPs per video (one batch item == one video)
    ideal = 2 * sum(macs["ideal"].values())
    print(f"\n== {name} ==")
    print(f"  segments (start, stop, tgt_bucket, ctx_bucket): "
          f"{macs['segments']}")
    for k in ("enc", "dec", "head"):
        print(f"  {k:5s} {2*macs[k]/1e12:7.3f} TFLOP/video "
              f"({100*macs[k]/tot:4.1f}%)")
    print(f"  total {fl/1e12:7.3f} TFLOP/video  "
          f"(bucket overhead vs exact counts: {fl/ideal:0.2f}x)")
    for eff in (1.0, 0.6, 0.4):
        v = eff * tflops * 1e12 / fl
        # add fixed non-transformer time (VQGAN pixel decode etc.)
        if extra_ms:
            v = 1.0 / (1.0 / v + extra_ms * 1e-3)
        tag = "SoL" if eff == 1.0 else f"{int(eff*100)}% MXU"
        print(f"  @ {tflops:5.0f} TFLOP/s, {tag:8s}: "
              f"{v:8.2f} videos/s/chip")


def xla_check():
    """Validate step_macs against XLA cost_analysis on a small config.
    XLA counts ~7-12% more at this tiny width (layernorm/softmax/bias
    VPU flops it also tallies); the matmul share grows with D."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from mebt_tpu.models.mebt import MeBT, MeBTConfig

    D, L, V, N = 128, 32, 512, 256
    C, M = 128, 128
    cfg = MeBTConfig(
        vocab_size=V, block_size=N, n_layer=24, n_head=4, n_embd=D,
        sos_emb=L, latent_shape=(4, 8, 8), mode=tuple(CANONICAL_MODES),
        dtype=jnp.float32,
    )
    model = MeBT(cfg)
    codes0 = jnp.zeros((1, N), jnp.int32)
    mask0 = jnp.ones((1, N), bool)
    params = model.init(
        jax.random.PRNGKey(0), codes0, mask0, mask0
    )["params"]
    codes = jnp.zeros((1, N), jnp.int32)
    cidx = jnp.arange(C, dtype=jnp.int32)[None]
    cval = jnp.ones((1, C), bool)

    def run_a(p):
        return model.apply({"params": p}, codes, cidx, cval,
                           method="stage_a_compact")

    lat = run_a(params)

    def run_b(p, lat):
        return model.apply({"params": p}, lat, cidx, cval,
                           method="stage_b_compact")

    want = step_macs(C, M, D=D, L=L, V=V)
    got_a = jax.jit(run_a).lower(params).compile().cost_analysis()["flops"]
    got_b = (
        jax.jit(run_b).lower(params, lat).compile().cost_analysis()["flops"]
    )
    print(f"stage_a: analytic {2*want['enc']/1e9:.3f} GFLOP, "
          f"XLA {got_a/1e9:.3f} GFLOP "
          f"(ratio {got_a/(2*want['enc']):.3f})")
    wb = 2 * (want["dec"] + want["head"])
    print(f"stage_b: analytic {wb/1e9:.3f} GFLOP, "
          f"XLA {got_b/1e9:.3f} GFLOP (ratio {got_b/wb:.3f})")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tflops", type=float, default=197.0,
                    help="chip bf16 TFLOP/s (v5e peak 197; pass the "
                    "bench probe value for throttled-window SoL)")
    ap.add_argument("--xla_check", action="store_true")
    args = ap.parse_args()
    if args.xla_check:
        xla_check()
        return

    D, L, V = 1024, 256, 16384

    # STL 16f: 32-step cosine MaskGIT over 1024 tokens
    N = 1024
    plan = maskgit_plan(N, 32, schedule="cosine", ctemp_schedule="linear")
    macs = plan_macs(plan, N, D=D, L=L, V=V)
    # + VQGAN pixel decode: 49 ms / bs 16 device-side = ~3.1 ms/video
    report("STL 16f (bs 16)", macs, args.tflops, extra_ms=3.1)

    # STL 128f: 64 bootstrap + 32-step MaskGIT over 8192 tokens
    N = 8192
    bplan = bootstrap_plan(N, 64)
    bmacs = plan_macs(bplan, N, D=D, L=L, V=V, promote_first=True)
    mplan = maskgit_plan(N, 32, schedule="cosine", ctemp_schedule="linear",
                         n_ctx_init=64)
    mmacs = plan_macs(mplan, N, D=D, L=L, V=V)
    comb = {k: bmacs[k] + mmacs[k] for k in ("enc", "dec", "head")}
    comb["segments"] = bmacs["segments"] + mmacs["segments"]
    comb["ideal"] = {
        k: bmacs["ideal"][k] + mmacs["ideal"][k] for k in bmacs["ideal"]
    }
    # + VQGAN pixel decode: 122 ms / bs 2 = 61 ms/video
    report("STL 128f (bootstrap 64 + 32 steps, bs 8)", comb,
           args.tflops, extra_ms=61.0)


if __name__ == "__main__":
    main()
