"""Close the late-segment accounting gap: the round-5 component profile
(scripts/profile_late_segment.py, seg -1) sums to ~42 ms/step while the
production scan step costs ~102 ms. Suspects: the fused-top-k overflow
fallback firing (runs head matmul + full-vocab top-k on top of the
kernel), the do_step lax.cond fork (all_live=False in the profiler),
and fused-kernel inefficiency at small row counts.

Usage: python scripts/probe_seg_gap.py [seg_index]
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from mebt_tpu.utils.runtime import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from bench import build, chip_probe, _key  # noqa: E402


def timeit(fn, *args, reps=3, label="", n_inner=1):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])
    dt = (time.perf_counter() - t0) / reps
    print(f"  {label:<52s} {dt * 1e3:9.2f} ms"
          + (f"  ({dt / n_inner * 1e3:7.2f} ms/it)" if n_inner > 1 else ""))
    return dt / n_inner


def main():
    from mebt_tpu.ops.head_sample_pallas import fused_head_topk_sample_v2
    from mebt_tpu.ops.sampling import sample_topk_tokens
    from mebt_tpu.sampler.decode import (
        DecodeState,
        _ctx_weight,
        _staged_confidence_scan,
        compact_indices,
    )
    from mebt_tpu.sampler.mask_schedule import (
        maskgit_plan,
        plan_segments_joint,
    )

    seg_idx = int(sys.argv[1]) if len(sys.argv) > 1 else -1
    B = 8
    model, params, _ = build((32, 16, 16))
    cfg = model.config
    N = cfg.seq_len
    plan = maskgit_plan(N, 32, "cosine", "linear", n_ctx_init=64)
    segments = plan_segments_joint(plan, N, ctx_weight=_ctx_weight(cfg))
    n_tgt = plan.n_targets_before(N)
    start, stop, bucket, ctx_bucket = segments[seg_idx]
    steps = stop - start
    n_ctx = int(N - n_tgt[start])
    print(f"probe: {chip_probe()} TFLOP/s")
    print(f"segment [{start}:{stop}) tgt_bucket={bucket} "
          f"ctx_bucket={ctx_bucket} n_ctx0={n_ctx} B={B}")

    ctx0 = np.zeros((B, N), bool)
    ctx0[:, :n_ctx] = True
    ctx0 = jnp.asarray(ctx0)
    codes0 = jnp.asarray(
        np.random.default_rng(0).integers(0, 16384, (B, N)), jnp.int32
    )
    state = DecodeState.create(_key(0), B, N, codes0, ctx0)
    xs = (
        jnp.asarray(plan.do_step[start:stop]),
        jnp.asarray(plan.n_new[start:stop]),
        jnp.asarray(n_tgt[start:stop].astype(np.int32)),
        jnp.asarray(plan.ctemp_scale[start:stop]),
    )

    def run_scan(all_live):
        def f(state, xs):
            out, _ = _staged_confidence_scan(
                model, params, state, xs,
                bucket=bucket, ctx_bucket=ctx_bucket,
                temperature=1.0, top_k=32, top_p=None,
                context_temperature=4.0, score_mode="prob",
                collect_history=False, approx_top_k=False,
                all_live=all_live,
            )
            return out.codes
        return f

    timeit(run_scan(False), state, xs, reps=3,
           label=f"production segment (all_live=False) x{steps}",
           n_inner=steps)
    timeit(run_scan(True), state, xs, reps=3,
           label=f"production segment (all_live=True)  x{steps}",
           n_inner=steps)

    # overflow rate of the fused kernel at this segment's real inputs
    tidx = compact_indices(~ctx0, bucket)
    lat = model.apply(
        {"params": params},
        codes0,
        compact_indices(ctx0, ctx_bucket),
        compact_indices(ctx0, ctx_bucket) < N,
        method="stage_a_compact",
    )
    toks = model.apply(
        {"params": params}, lat, tidx, tidx < N, method="stage_b_tokens"
    )
    w = params["transformer"]["head"]["kernel"]
    Bm, M, D = toks.shape
    xf = toks.reshape(Bm * M, D)

    @jax.jit
    def ovf_count(xf, w):
        _, _, ovf = fused_head_topk_sample_v2(
            xf, w, jnp.uint32(123), 32, temperature=1.0
        )
        return jnp.sum(ovf > 0), jnp.any(ovf > 0)

    n_ovf, any_ovf = ovf_count(xf, w)
    print(f"  fused-topk overflow rows: {int(n_ovf)}/{Bm * M} "
          f"(fallback fires: {bool(any_ovf)})")

    # unfused bf16 path at the same shapes (head matmul + topk sample)
    @jax.jit
    def unfused(toks, w):
        def body(c, i):
            logits_raw = toks @ w.astype(toks.dtype)
            s, p = sample_topk_tokens(
                jax.random.fold_in(_key(5), i), logits_raw, 32, 1.0
            )
            return c + jnp.sum(s) + jnp.sum(p), None

        s, _ = jax.lax.scan(body, 0.0, jnp.arange(8))
        return s

    timeit(unfused, toks, w, reps=2,
           label=f"unfused bf16 head+top32 ({Bm * M}x16384)", n_inner=8)

    @jax.jit
    def fused(xf, w):
        def body(c, i):
            s, p, ovf = fused_head_topk_sample_v2(
                xf, w, jnp.uint32(i), 32, temperature=1.0
            )
            return c + jnp.sum(p) + jnp.sum(s) + jnp.sum(ovf), None

        s, _ = jax.lax.scan(body, 0.0, jnp.arange(8))
        return s

    timeit(fused, xf, w, reps=2,
           label=f"fused v2 head+top32 ({Bm * M}x16384)", n_inner=8)

    print(f"probe(post): {chip_probe()} TFLOP/s")


if __name__ == "__main__":
    main()
