"""Component breakdown of ONE late 128f confidence segment step.

The round-4 per-segment table (PERFORMANCE.md) shows the late segments
(tgt bucket shrinking, ctx bucket growing toward 7808) running at
39-41% of probe while the first segment hits 54.7%. This script times
each component of a late-segment step separately (inside scans, scalar
sync) at the segment's real shapes so the slack has a name before any
kernel is touched.

Usage: python scripts/profile_late_segment.py [seg_index]
"""

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
    D = cfg.n_embd
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
    codes0 = jnp.zeros((B, N), jnp.int32)
    state = DecodeState.create(_key(0), B, N, codes0, ctx0)
    xs = (
        jnp.asarray(plan.do_step[start:stop]),
        jnp.asarray(plan.n_new[start:stop]),
        jnp.asarray(n_tgt[start:stop].astype(np.int32)),
        jnp.asarray(plan.ctemp_scale[start:stop]),
    )

    # 0) whole production segment
    def whole(state, xs):
        out, _ = _staged_confidence_scan(
            model, params, state, xs,
            bucket=bucket, ctx_bucket=ctx_bucket,
            temperature=1.0, top_k=32, top_p=None,
            context_temperature=4.0, score_mode="prob",
            collect_history=False, approx_top_k=False,
        )
        return out.codes

    t_whole = timeit(whole, state, xs, reps=3,
                     label=f"production segment x{steps}", n_inner=steps)

    R = 8  # inner iterations for component scans

    # 1) stage_a_compact (enc phase on compacted ctx bucket)
    cidx0 = compact_indices(ctx0, ctx_bucket)

    @jax.jit
    def enc_only(p, codes, cidx):
        def body(c, _):
            lat = model.apply(
                {"params": p}, codes, cidx, cidx < N,
                method="stage_a_compact",
            )
            return c + jnp.sum(lat.astype(jnp.float32)), None

        s, _ = jax.lax.scan(body, 0.0, None, length=R)
        return s

    t_enc = timeit(enc_only, params, codes0, cidx0, reps=2,
                   label=f"stage_a_compact (ctx={ctx_bucket})", n_inner=R)

    # 1b) enc phase WITHOUT the latent_enc K/V over ctx: measure the
    # embedding gather alone (tok_emb + pos gather at ctx_bucket rows)
    @jax.jit
    def gather_only(p, codes, cidx):
        def body(c, _):
            idx = jnp.minimum(cidx, N - 1)
            cg = jnp.take_along_axis(codes, idx, axis=1)
            tok = p["tok_emb"]["embedding"][cg].astype(jnp.bfloat16)
            pos = jnp.take(
                p["pos_emb"][0], idx, axis=0
            ).astype(jnp.bfloat16)
            return c + jnp.sum((tok + pos).astype(jnp.float32)), None

        s, _ = jax.lax.scan(body, 0.0, None, length=R)
        return s

    timeit(gather_only, params, codes0, cidx0, reps=2,
           label="  - ctx embedding gathers alone", n_inner=R)

    # 2) compact_indices over the full canvas (per step: tgt + ctx)
    @jax.jit
    def compact_only(ctx):
        def body(c, _):
            i1 = compact_indices(~ctx, bucket)
            i2 = compact_indices(ctx, ctx_bucket)
            return c + jnp.sum(i1) + jnp.sum(i2), None

        s, _ = jax.lax.scan(body, 0, None, length=R)
        return s

    timeit(compact_only, ctx0, reps=2,
           label="compact_indices x2 (full canvas cumsum)", n_inner=R)

    # 3) dec phase (stage_b_tokens) at the tgt bucket
    lat0 = model.apply(
        {"params": params}, codes0, cidx0, cidx0 < N,
        method="stage_a_compact",
    )
    tidx0 = compact_indices(~ctx0, bucket)

    @jax.jit
    def dec_only(p, lat, tidx):
        def body(c, _):
            toks = model.apply(
                {"params": p}, lat, tidx, tidx < N,
                method="stage_b_tokens",
            )
            return c + jnp.sum(toks.astype(jnp.float32)), None

        s, _ = jax.lax.scan(body, 0.0, None, length=R)
        return s

    timeit(dec_only, params, lat0, tidx0, reps=2,
           label=f"stage_b_tokens (tgt={bucket})", n_inner=R)

    # 4) fused top-k head+sample at the tgt bucket
    toks0 = model.apply(
        {"params": params}, lat0, tidx0, tidx0 < N, method="stage_b_tokens"
    )
    w = params["transformer"]["head"]["kernel"]

    @jax.jit
    def topk_only(toks, w):
        from mebt_tpu.ops.head_sample_pallas import fused_head_topk_sample_v2

        Bm, M, Dm = toks.shape

        def body(c, i):
            s, p, ovf = fused_head_topk_sample_v2(
                toks.reshape(Bm * M, Dm), w, jnp.uint32(i), 32,
                temperature=1.0,
            )
            return c + jnp.sum(p) + jnp.sum(s) + jnp.sum(ovf), None

        s, _ = jax.lax.scan(body, 0.0, jnp.arange(R))
        return s

    timeit(topk_only, toks0, w, reps=2,
           label=f"fused head+top32 ({B * bucket}x16384)", n_inner=R)

    # 4b) bare head matmul for reference
    @jax.jit
    def head_only(toks, w):
        Bm, M, Dm = toks.shape
        xf = toks.reshape(Bm * M, Dm)

        def body(c, _):
            l = xf @ w.astype(xf.dtype)
            return c + jnp.sum(l.astype(jnp.float32)), None

        s, _ = jax.lax.scan(body, 0.0, None, length=R)
        return s

    timeit(head_only, toks0, w, reps=2,
           label="  - bare head matmul + reduce", n_inner=R)

    # 5) promotion + canvas scatters at these shapes
    @jax.jit
    def promote_scatter(state_codes, ctx, tidx):
        from mebt_tpu.ops.sampling import promote_targets

        rows = jnp.arange(B)[:, None]
        sampled = jnp.zeros((B, bucket), jnp.int32)
        chosen = jax.random.uniform(_key(2), (B, bucket))
        cvalid = jnp.broadcast_to(jnp.arange(bucket) < bucket, (B, bucket))

        def body(c, i):
            codes = state_codes.at[rows, tidx].set(sampled, mode="drop")
            pr = promote_targets(
                jax.random.fold_in(_key(3), i), chosen, cvalid,
                128, jnp.float32(4.0),
            )
            prom = (
                jnp.zeros((B, N), bool).at[rows, tidx].set(pr, mode="drop")
            )
            return c + jnp.sum(codes) + jnp.sum(prom), None

        s, _ = jax.lax.scan(body, 0, jnp.arange(R))
        return s

    timeit(promote_scatter, codes0, ctx0, tidx0, reps=2,
           label="promotion + canvas scatters", n_inner=R)

    print(f"probe(post): {chip_probe()} TFLOP/s")
    print(f"whole-step reference: {t_whole * 1e3:.2f} ms/step")


if __name__ == "__main__":
    main()
