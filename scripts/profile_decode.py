"""Per-phase device-side breakdown of the 16f / 128f decode hot paths.

Run on the TPU (from /root/repo, plain `python scripts/profile_decode.py
[16f|128f|micro]`). All timings are wall-clock around an `np.asarray`
sync (block_until_ready does not synchronize through the tunnel) and
reported alongside a fixed-cost matmul probe so numbers from different
windows stay comparable (PERFORMANCE.md "Measurement pitfalls").
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


def timeit(fn, *args, reps=3, label=""):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])
    dt = (time.perf_counter() - t0) / reps
    print(f"  {label:<44s} {dt * 1e3:9.2f} ms")
    return dt


def profile_16f():
    from mebt_tpu.sampler.decode import (
        DecodeState, _staged_confidence_scan, compact_indices,
        maskgit_sample,
    )
    from mebt_tpu.sampler.mask_schedule import maskgit_plan, plan_segments

    B = 16
    model, params, vqgan = build((4, 16, 16))
    N = model.config.seq_len
    plan = maskgit_plan(N, 32, "cosine", "linear")
    print(f"[16f] B={B} N={N} segments={plan_segments(plan, N)}")

    full = jax.jit(
        lambda r: maskgit_sample(
            model, params, r, B, plan,
            temperature=1.0, context_temperature=8.0,
        ).codes
    )
    timeit(full, _key(1), label="full 32-step decode")

    # stage_a (enc phase over the full canvas) x 32 amortized in a scan
    @jax.jit
    def enc_scan(r):
        codes = jnp.zeros((B, N), jnp.int32)
        ctx = jnp.zeros((B, N), bool)

        def body(c, _):
            lat = model.apply({"params": params}, codes, ctx,
                              method="stage_a")
            return c + jnp.sum(lat.astype(jnp.float32)), None

        s, _ = jax.lax.scan(body, 0.0, None, length=32)
        return s

    t = timeit(enc_scan, _key(2), label="stage_a x32 (enc phase)")
    print(f"    -> per step {t / 32 * 1e3:.2f} ms")

    # dec phase + fused head at the full bucket x 32
    @jax.jit
    def dec_scan(r):
        from mebt_tpu.ops.head_sample_pallas import fused_head_sample

        codes = jnp.zeros((B, N), jnp.int32)
        ctx = jnp.zeros((B, N), bool)
        lat = model.apply({"params": params}, codes, ctx, method="stage_a")
        idx = compact_indices(~ctx, N)
        valid = idx < N
        w = params["transformer"]["head"]["kernel"]

        def body(c, i):
            toks = model.apply({"params": params}, lat, idx, valid,
                               method="stage_b_tokens")
            D = toks.shape[-1]
            s, p = fused_head_sample(
                toks.reshape(B * N, D), w, jnp.uint32(i), temperature=1.0
            )
            return c + jnp.sum(p) + jnp.sum(s), None

        s, _ = jax.lax.scan(body, 0.0, jnp.arange(32))
        return s

    t = timeit(dec_scan, _key(3), label="stage_b+fused head x32 (full bucket)")
    print(f"    -> per step {t / 32 * 1e3:.2f} ms")

    # promotion cost x 32
    @jax.jit
    def promote_scan(r):
        from mebt_tpu.ops.sampling import promote_targets

        scores = jax.random.uniform(r, (B, N))
        tgt = jnp.ones((B, N), bool)

        def body(c, i):
            pr = promote_targets(
                jax.random.fold_in(r, i), scores, tgt, 32,
                jnp.float32(4.0),
            )
            return c + jnp.sum(pr), None

        s, _ = jax.lax.scan(body, 0, jnp.arange(32))
        return s

    t = timeit(promote_scan, _key(4), label="promotion x32")
    print(f"    -> per step {t / 32 * 1e3:.2f} ms")

    dec = jax.jit(lambda c: vqgan.decode(c))
    codes = jnp.zeros((B, 4, 16, 16), jnp.int32)
    timeit(dec, codes, label="vqgan decode")


def profile_128f():
    from mebt_tpu.sampler.decode import compact_indices, maskgit_sample
    from mebt_tpu.sampler.mask_schedule import (
        bootstrap_plan, maskgit_plan, plan_segments,
    )

    B = 8
    model, params, vqgan = build((32, 16, 16))
    N = model.config.seq_len
    bplan = bootstrap_plan(N, 64)
    mplan = maskgit_plan(N, 32, "cosine", "linear", n_ctx_init=64)
    segs = plan_segments(mplan, N)
    print(f"[128f] B={B} N={N} segments={segs}")

    boot = jax.jit(
        lambda r: maskgit_sample(
            model, params, r, B, bplan,
            temperature=1.0, strategy="bootstrap", context_temperature=4.0,
        ).codes
    )
    timeit(boot, _key(1), reps=2, label="bootstrap 64 steps")

    conf = jax.jit(
        lambda r, c, m: maskgit_sample(
            model, params, r, B, mplan, codes=c, ctx_mask=m,
            temperature=1.0, top_k=32, context_temperature=4.0,
        ).codes
    )
    ctx0 = np.zeros((B, N), bool)
    ctx0[:, :64] = True
    codes0 = jnp.zeros((B, N), jnp.int32)
    timeit(conf, _key(2), jnp.asarray(codes0), jnp.asarray(ctx0), reps=2,
           label="confidence 32 steps (top_k=32)")

    conf_nok = jax.jit(
        lambda r, c, m: maskgit_sample(
            model, params, r, B, mplan, codes=c, ctx_mask=m,
            temperature=1.0, context_temperature=4.0,
        ).codes
    )
    timeit(conf_nok, _key(3), jnp.asarray(codes0), jnp.asarray(ctx0),
           reps=2, label="confidence 32 steps (no top_k, fused)")

    # per-component at the biggest bucket
    bucket = segs[0][2]
    rows = B * bucket
    D = model.config.n_embd
    V = model.config.vocab_size
    ctx = jnp.asarray(ctx0)
    codes = codes0

    @jax.jit
    def enc_scan(r):
        def body(c, _):
            lat = model.apply({"params": params}, codes, ctx,
                              method="stage_a")
            return c + jnp.sum(lat.astype(jnp.float32)), None

        s, _ = jax.lax.scan(body, 0.0, None, length=8)
        return s

    t = timeit(enc_scan, _key(4), reps=2, label="stage_a x8")
    print(f"    -> per step {t / 8 * 1e3:.2f} ms")

    @jax.jit
    def head_topk_scan(r):
        from mebt_tpu.ops.sampling import sample_topk_tokens

        lat = model.apply({"params": params}, codes, ctx, method="stage_a")
        idx = compact_indices(~ctx, bucket)
        valid = idx < N

        def body(c, i):
            logits = model.apply({"params": params}, lat, idx, valid,
                                 method="stage_b_compact")
            s, p = sample_topk_tokens(
                jax.random.fold_in(r, i), logits, 32, 1.0
            )
            return c + jnp.sum(p) + jnp.sum(s), None

        s, _ = jax.lax.scan(body, 0.0, jnp.arange(8))
        return s

    t = timeit(head_topk_scan, _key(5), reps=2,
               label=f"stage_b+head+top32 x8 (bucket {bucket})")
    print(f"    -> per step {t / 8 * 1e3:.2f} ms")

    @jax.jit
    def head_fused_scan(r):
        from mebt_tpu.ops.head_sample_pallas import fused_head_sample

        lat = model.apply({"params": params}, codes, ctx, method="stage_a")
        idx = compact_indices(~ctx, bucket)
        valid = idx < N
        w = params["transformer"]["head"]["kernel"]

        def body(c, i):
            toks = model.apply({"params": params}, lat, idx, valid,
                               method="stage_b_tokens")
            s, p = fused_head_sample(
                toks.reshape(rows, D), w, jnp.uint32(i), temperature=1.0
            )
            return c + jnp.sum(p) + jnp.sum(s), None

        s, _ = jax.lax.scan(body, 0.0, jnp.arange(8))
        return s

    t = timeit(head_fused_scan, _key(6), reps=2,
               label=f"stage_b+fused head x8 (bucket {bucket})")
    print(f"    -> per step {t / 8 * 1e3:.2f} ms")

    # raw logits materialization cost (matmul + HBM write + 1 read)
    x = jax.random.normal(_key(7), (rows, D), jnp.bfloat16)
    w = params["transformer"]["head"]["kernel"].astype(jnp.bfloat16)

    @jax.jit
    def logits_only(x, w):
        l = (x @ w).astype(jnp.float32)
        return jnp.sum(l) + jnp.max(l)

    timeit(logits_only, x, w, reps=2,
           label=f"head matmul fp32 logits + 1 reduce ({rows}x{V})")

    @jax.jit
    def topk_only(x, w):
        from mebt_tpu.ops.sampling import sample_topk_tokens

        l = (x @ w).astype(jnp.float32)
        s, p = sample_topk_tokens(_key(8), l, 32, 1.0)
        return jnp.sum(p) + jnp.sum(s)

    timeit(topk_only, x, w, reps=2,
           label="head matmul + exact top32 sample")

    dec = jax.jit(lambda c: vqgan.decode(c))
    codes_l = jnp.zeros((B, 32, 16, 16), jnp.int32)
    timeit(dec, codes_l, reps=2, label="vqgan decode")


def profile_util(recipe: str, probe: float):
    """Per-SEGMENT utilization of the production staged scan: time each
    joint segment at its real (ctx_bucket, tgt_bucket), convert to
    achieved TFLOP/s via utils/flops.py, and report the fraction of the
    same-window probe. This is the 'where does the non-matmul time go'
    view the 16f/128f attacks steer by."""
    from mebt_tpu.sampler.decode import DecodeState, _staged_confidence_scan
    from mebt_tpu.sampler.decode import _ctx_weight
    from mebt_tpu.sampler.mask_schedule import (
        maskgit_plan, plan_segments_joint,
    )
    from mebt_tpu.utils.flops import step_macs

    if recipe == "16f":
        B, shape, top_k, ctemp = 16, (4, 16, 16), None, 8.0
        plan_kw = {}
    else:
        B, shape, top_k, ctemp = 8, (32, 16, 16), 32, 4.0
        plan_kw = {"n_ctx_init": 64}
    model, params, _ = build(shape)
    N = model.config.seq_len
    D, L, V = model.config.n_embd, model.config.sos_emb, (
        model.config.vocab_size
    )
    plan = maskgit_plan(N, 32, "cosine", "linear", **plan_kw)
    segments = plan_segments_joint(
        plan, N, ctx_weight=_ctx_weight(model.config)
    )
    n_tgt = plan.n_targets_before(N)
    print(f"[{recipe} util] B={B} N={N} probe={probe} TFLOP/s")
    total_t, total_fl = 0.0, 0.0
    for start, stop, bucket, ctx_bucket in segments:
        n_ctx = int(N - n_tgt[start])
        ctx0 = np.zeros((B, N), bool)
        ctx0[:, :n_ctx] = True
        state = DecodeState.create(
            _key(start), B, N, jnp.zeros((B, N), jnp.int32),
            jnp.asarray(ctx0),
        )
        xs = (
            jnp.asarray(plan.do_step[start:stop]),
            jnp.asarray(plan.n_new[start:stop]),
            jnp.asarray(n_tgt[start:stop].astype(np.int32)),
            jnp.asarray(plan.ctemp_scale[start:stop]),
        )

        def run(state, xs):
            out, _ = _staged_confidence_scan(
                model, params, state, xs,
                bucket=bucket, ctx_bucket=ctx_bucket,
                temperature=1.0, top_k=top_k, top_p=None,
                context_temperature=ctemp, score_mode="prob",
                collect_history=False, approx_top_k=False,
            )
            return out.codes

        steps = stop - start
        dt = timeit(
            run, state, xs, reps=3,
            label=f"seg[{start}:{stop}) tgt={bucket} ctx={ctx_bucket}",
        )
        fl = 2 * B * steps * sum(
            step_macs(ctx_bucket, bucket, D=D, L=L, V=V).values()
        )
        ach = fl / dt / 1e12
        total_t += dt
        total_fl += fl
        print(f"    -> {dt/steps*1e3:7.2f} ms/step, {ach:6.1f} TFLOP/s "
              f"achieved = {100*ach/probe:4.1f}% of probe")
    ach = total_fl / total_t / 1e12
    print(f"  all segments: {total_t*1e3:,.0f} ms, {ach:.1f} TFLOP/s "
          f"= {100*ach/probe:.1f}% of probe, "
          f"{B/total_t:.2f} videos/s (sampling only)")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    probe = chip_probe()
    print(f"probe: {probe} TFLOP/s bf16")
    if which in ("16f", "both"):
        profile_16f()
    if which in ("128f", "both"):
        profile_128f()
    if which in ("util16f", "util"):
        profile_util("16f", probe)
    if which in ("util128f", "util"):
        profile_util("128f", probe)
    print(f"probe(post): {chip_probe()} TFLOP/s bf16")
