"""Headline benchmarks: STL-16f and STL-128f generation throughput.

Recipes mirror the reference eval harness (BASELINE.md /
scripts/valid_dnr_config_ckpt_exp_stl_{16f,128f}.sh):

  16f : MaskGIT 32 steps, cosine, ctemp 8.0 linear, batch 16, then
        VQGAN decode of (4,16,16) codes to 16x128x128 pixels.
  128f: bootstrap 64 steps + MaskGIT 32 steps, top_k 32, ctemp 4.0,
        batch 2, then VQGAN decode of (32,16,16) codes to 128 frames —
        the north-star workload (BASELINE.json: ">5x faster per chip
        ... generating 128-frame videos").

Weights are random (throughput is weight-independent); model size is the
published flagship: 24L/16H/1024d, vocab 16384, 256 latents.

vs_baseline: the reference repo publishes no throughput numbers
(BASELINE.md). Denominators are engineering estimates of the reference
pipeline on one A100 — 16f: 32 Python-driven forwards of the ~200M
gathered-attention model at bs16 plus Conv3d decode ~ 3.0 videos/s;
128f: 96 Python-driven forwards over up-to-8192 gathered tokens at bs2
with per-step host schedule math + sparse-COO scatters, plus the
32-latent-frame Conv3d decode ~ 0.1 videos/s. Measure directly with
scripts/time_reference.py on a CUDA machine before quoting ratios.

Prints one JSON line per metric; the LAST line is the north-star 128f
metric. Each line also carries: `baseline_estimated` (vs_baseline's
denominator is an estimate until scripts/time_reference.py runs on
CUDA), `chip_probe_tflops_bf16` (fixed-cost matmul probe in the same
window — the tunnel chip throttles over time, so ratios against the
probe are comparable across rounds when absolutes are not), and
per-phase wall timings (`phases`).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

from mebt_tpu.utils.runtime import enable_compilation_cache

enable_compilation_cache()
import numpy as np

BASELINE_16F_VIDEOS_PER_SEC = 3.0  # estimated reference A100 throughput
BASELINE_128F_VIDEOS_PER_SEC = 0.1  # estimated reference A100 throughput

# Estimated reference TRAIN throughput (tokens/s on one A100): the
# dense fwd+bwd costs train_tflop_per_item (utils/flops.py) per batch
# item; granting the torch stack a generous 40% MFU of A100 bf16 peak
# (312 TFLOP/s) gives N * 312 * 0.4 / tflop_item. Generous because the
# reference's gathered attention + unfused softmax/LN run well below
# that — measure with scripts/time_reference.py --train on CUDA before
# quoting ratios.
BASELINE_16F_TRAIN_TOKENS_PER_SEC = 123_000.0
BASELINE_128F_TRAIN_TOKENS_PER_SEC = 172_000.0


def chip_probe():
    """Fixed-cost matmul probe: the tunnel chip throttles/shares over
    time (PERFORMANCE.md "Measurement pitfalls"), so every BENCH line
    carries the chip's measured bf16 TFLOP/s in the same window —
    cross-round deltas can then separate throttle from regression."""
    x = jax.random.normal(jax.random.key(0), (4096, 4096), jnp.bfloat16)

    # 128 chained matmuls = 17.6 TFLOP per call: big enough that the
    # ~30 ms tunnel dispatch + scalar fetch is <5% of the measurement
    # even on a healthy chip (a 16-iteration probe was itself
    # dispatch-dominated and under-read the chip by ~1.7x)
    @jax.jit
    def probe_fn(x):
        def body(y, _):
            return (y @ x) * (1.0 / 64.0), None

        y, _ = jax.lax.scan(body, x, None, length=128)
        return jnp.sum(y.astype(jnp.float32))

    np.asarray(probe_fn(x))  # compile + warm
    reps = 2
    t0 = time.perf_counter()
    for _ in range(reps):
        np.asarray(probe_fn(x))
    dt = (time.perf_counter() - t0) / reps
    flops = 128 * 2 * 4096**3
    return round(flops / dt / 1e12, 1)


def _random_params(model, cfg):
    rng = jax.random.key(0)
    shapes = jax.eval_shape(
        lambda r: model.init(
            r,
            jnp.zeros((1, cfg.seq_len), jnp.int32),
            jnp.zeros((1, cfg.seq_len), bool),
            jnp.zeros((1, cfg.seq_len), bool),
        ),
        rng,
    )["params"]
    keys = iter(
        jax.random.split(jax.random.key(1), len(jax.tree.leaves(shapes)))
    )
    return jax.tree.map(
        lambda s: (jax.random.normal(next(keys), s.shape, jnp.float32) * 0.02),
        shapes,
    )


def build(latent_shape=(4, 16, 16), remat=False, remat_policy="full"):
    from mebt_tpu.models.mebt import MeBT, MeBTConfig
    from mebt_tpu.models.vqgan import VQGAN, VQGANConfig
    from __graft_entry__ import _canonical_mode

    cfg = MeBTConfig(
        vocab_size=16384,
        block_size=int(np.prod(latent_shape)),
        n_layer=24,
        n_head=16,
        n_embd=1024,
        sos_emb=256,
        mode=_canonical_mode(),
        latent_shape=tuple(latent_shape),
        dtype=jnp.bfloat16,
        remat=remat,
        remat_policy=remat_policy,
    )
    model = MeBT(cfg)
    params = _random_params(model, cfg)

    vq_cfg = VQGANConfig(
        embedding_dim=256, n_codes=16384, n_hiddens=32, downsample=(4, 8, 8),
        dtype=jnp.bfloat16,
    )
    vqgan = VQGAN.create(
        jax.random.key(2), vq_cfg, example_shape=(1, 4, 32, 32, 3)
    )
    return model, params, vqgan


def _key(i):
    # rbg PRNG for the sampling noise draws; i.i.d. uniforms either way
    # (the reference uses torch's Philox — PRNG choice is not part of
    # the algorithm)
    return jax.random.key(i, impl="rbg")


def _timed(generate, runs=5, depth=2):
    """Median steady-state wall time per batch with up to `depth`
    batches in flight: the host fetch of batch i overlaps the device
    compute of batches i+1..i+depth. Round 4's 1-deep pipelining left
    ~16% of the 128f wall in unhidden d2h (BENCH_r04: headline 7605 vs
    device_sum 6420 ms) because one batch of compute didn't cover the
    transport's serialized fraction; two batches do. The pipeline-fill
    interval (first fetch waits through `depth` batches of compute) and
    the drain tail (fetch-only, no compute left to hide behind) are
    excluded — the metric is continuous-serving steady state, matching
    how the reference evaluates long generation sweeps. np.asarray
    forces full execution (block_until_ready does not synchronize
    through the tunnel)."""
    from collections import deque

    np.asarray(generate(_key(10)))  # compile + warm
    pending = deque()
    times = []
    t0 = time.perf_counter()
    for i in range(runs):
        pending.append(generate(_key(100 + i)))
        if len(pending) > depth:
            np.asarray(pending.popleft())
            t1 = time.perf_counter()
            times.append(t1 - t0)
            t0 = t1
    while pending:
        np.asarray(pending.popleft())
        t1 = time.perf_counter()
        times.append(t1 - t0)
        t0 = t1
    core = (
        times[1 : -(depth - 1)]
        if depth > 1 and len(times) > depth
        else times
    )
    return float(np.median(core))


_SYNC = None


def _dev_timed(fn, runs=3):
    """Device-side wall time: dispatch, then force execution with a
    4-byte scalar fetch instead of the bulk output fetch — isolates
    compute from host-transfer time in the phase breakdown. `fn` must
    already be warm (compiled)."""
    global _SYNC
    if _SYNC is None:
        _SYNC = jax.jit(lambda x: jnp.sum(x.astype(jnp.uint32)))
    float(np.asarray(_SYNC(fn(_key(10)))))  # warm _SYNC for this dtype
    times = []
    for i in range(runs):
        t0 = time.perf_counter()
        float(np.asarray(_SYNC(fn(_key(100 + i)))))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def _fetch_timed(bufs):
    """Host-fetch wall time for precomputed device buffers (the wire
    cost of the uint8 pixels through the tunnel)."""
    t0 = time.perf_counter()
    for b in bufs:
        np.asarray(b)
    return (time.perf_counter() - t0) / len(bufs)


def bench_16f():
    from mebt_tpu.sampler.decode import maskgit_sample
    from mebt_tpu.sampler.mask_schedule import maskgit_plan

    B = 16
    model, params, vqgan = build((4, 16, 16))
    N = model.config.seq_len
    plan = maskgit_plan(N, 32, schedule="cosine", ctemp_schedule="linear")

    decode_pixels = jax.jit(
        lambda codes: jnp.round(
            (jnp.clip(vqgan.decode(codes), -0.5, 0.5) + 0.5) * 255.0
        ).astype(jnp.uint8)
    )

    def sample_codes(rng):
        state = maskgit_sample(
            model, params, rng, B, plan,
            temperature=1.0, context_temperature=8.0,
        )
        return state.codes

    def generate(rng):
        codes = sample_codes(rng).reshape(B, *model.config.latent_shape)
        return decode_pixels(codes)

    dt = _timed(generate, runs=5)
    # Phase breakdown measured immediately after the headline (same
    # throttle window), serially, with device time split from the host
    # fetch so the phases reconcile with the pipelined headline:
    # headline ~= sum(device phases) + max(0, fetch - hidden-by-overlap).
    codes0 = sample_codes(_key(0)).reshape(B, *model.config.latent_shape)
    t_sample = _dev_timed(sample_codes, runs=3)
    t_dec = _dev_timed(lambda r: decode_pixels(codes0), runs=3)
    bufs = [decode_pixels(codes0) for _ in range(3)]
    float(np.asarray(_SYNC(bufs[-1])))
    t_fetch = _fetch_timed(bufs)
    phases = {
        "sample_ms": round(t_sample * 1e3, 1),
        "decode_device_ms": round(t_dec * 1e3, 1),
        "fetch_ms": round(t_fetch * 1e3, 1),
        "device_sum_ms": round((t_sample + t_dec) * 1e3, 1),
        "headline_batch_ms": round(dt * 1e3, 1),
    }
    return B / dt, phases


def bench_128f():
    from mebt_tpu.sampler.decode import maskgit_sample
    from mebt_tpu.sampler.mask_schedule import bootstrap_plan, maskgit_plan

    # The reference script runs bs 2 (its memory ceiling); per-sample
    # math is batch-independent, so per-chip throughput legitimately
    # uses a larger batch (+18% at bs 8 in same-window A/B).
    B = 8
    model, params, vqgan = build((32, 16, 16))
    N = model.config.seq_len
    bplan = bootstrap_plan(N, 64)
    mplan = maskgit_plan(
        N, 32, schedule="cosine", ctemp_schedule="linear", n_ctx_init=64
    )

    decode_pixels = jax.jit(
        lambda codes: jnp.round(
            (jnp.clip(vqgan.decode(codes), -0.5, 0.5) + 0.5) * 255.0
        ).astype(jnp.uint8)
    )

    def bootstrap_codes(rng):
        state = maskgit_sample(
            model, params, rng, B, bplan,
            temperature=1.0, strategy="bootstrap", context_temperature=4.0,
        )
        return state.codes, state.ctx_mask

    def confidence_codes(rng, codes, ctx_mask):
        state = maskgit_sample(
            model, params, rng, B, mplan,
            codes=codes, ctx_mask=ctx_mask,
            temperature=1.0, top_k=32, context_temperature=4.0,
        )
        return state.codes

    def generate(rng):
        r1, r2 = jax.random.split(rng)
        codes, ctx = bootstrap_codes(r1)
        codes = confidence_codes(r2, codes, ctx)
        return decode_pixels(codes.reshape(B, *model.config.latent_shape))

    dt = _timed(generate, runs=4)
    # Same-window serial phase breakdown (device time split from the
    # host fetch — see bench_16f). The confidence phase is also timed
    # with MEBT_FUSED_TOPK's unfused bf16-pass path so the fused
    # streaming top-k v2 kernel's win stays on the record every round
    # (PERFORMANCE.md "fused streaming top-k v2").
    t_bs = _dev_timed(lambda r: bootstrap_codes(r)[0], runs=2)
    codes0, ctx0 = bootstrap_codes(_key(0))
    t_conf = _dev_timed(
        lambda r: confidence_codes(r, codes0, ctx0), runs=2
    )
    import os as _os

    # The fused gate (_use_fused_topk) is read at TRACE time, so the
    # compiled fused executable must be dropped for the env flip to
    # take effect; the persistent compilation cache (utils/runtime.py)
    # makes the re-traces cheap after the first ever run on a machine.
    global _SYNC
    from mebt_tpu.sampler.decode import _use_fused_topk

    headline_fused = _use_fused_topk()
    jax.clear_caches()
    _SYNC = None
    saved_flag = _os.environ.get("MEBT_FUSED_TOPK")
    _os.environ["MEBT_FUSED_TOPK"] = "0"
    try:
        t_conf_unfused = _dev_timed(
            lambda r: confidence_codes(r, codes0, ctx0), runs=2
        )
    finally:
        # restore the user's env exactly (a launch-time
        # MEBT_FUSED_TOPK=0/force must survive this A/B so the decode
        # re-traces below keep the user's configuration)
        if saved_flag is None:
            del _os.environ["MEBT_FUSED_TOPK"]
        else:
            _os.environ["MEBT_FUSED_TOPK"] = saved_flag
        jax.clear_caches()
        _SYNC = None
    pix0 = confidence_codes(_key(1), codes0, ctx0).reshape(
        B, *model.config.latent_shape
    )
    t_dec = _dev_timed(lambda r: decode_pixels(pix0), runs=2)
    bufs = [decode_pixels(pix0) for _ in range(2)]
    float(np.asarray(_SYNC(bufs[-1])))
    t_fetch = _fetch_timed(bufs)
    phases = {
        "bootstrap_ms": round(t_bs * 1e3, 1),
        "confidence_ms": round(t_conf * 1e3, 1),
        # A/B is meaningful only when the headline itself ran fused;
        # with a launch-time MEBT_FUSED_TOPK=0 both timings are the
        # unfused path and the flag below says so
        "confidence_unfused_topk_ms": round(t_conf_unfused * 1e3, 1),
        "headline_topk_was_fused": headline_fused,
        "decode_device_ms": round(t_dec * 1e3, 1),
        "fetch_ms": round(t_fetch * 1e3, 1),
        "device_sum_ms": round((t_bs + t_conf + t_dec) * 1e3, 1),
        "headline_batch_ms": round(dt * 1e3, 1),
    }
    return B / dt, phases


def bench_train(latent_shape, B, mask_schedule, *,
                remat=False, remat_policy="full", n_steps=6):
    """One fused train step — frozen VQGAN encode + dense MeBT
    forward/backward + AdamW, exactly make_train_step's jit — on a
    synthetic device-resident video batch at the published recipe's
    per-GPU batch size (configs/stl/mebt_{16,128}f.yaml data.batch_size;
    the reference's 2M-step loop, train_transformer.py:97-101).

    The batch lives on device: host->device transfer is the prefetch
    pipeline's job (data/loader.py) and is excluded, as is host mask
    construction (~1 ms of numpy per step, overlapped by prefetch).
    Returns (tokens/s/chip, extras) where tokens = canvas positions the
    dense step processes (B * N per step)."""
    from mebt_tpu.sampler.mask_schedule import MaskGen
    from mebt_tpu.train.train_state import (
        TrainState,
        make_optimizer,
        make_train_step,
    )
    from mebt_tpu.utils.runtime import donation_argnums

    model, params, vqgan = build(latent_shape, remat=remat,
                                 remat_policy=remat_policy)
    cfg = model.config
    N = cfg.seq_len

    # pixel geometry from the stage-1 downsample so the encode lands
    # exactly on the model's latent canvas (flagship: (4,8,8) -> 128px)
    dt_, dh, dw = vqgan.config.downsample
    video = jax.random.uniform(
        jax.random.key(5),
        (B, cfg.latent_shape[0] * dt_, cfg.latent_shape[1] * dh,
         cfg.latent_shape[2] * dw, 3),
        jnp.float32, -0.5, 0.5,
    )
    mg = MaskGen(
        schedule=mask_schedule, max_token=N, method="mlm",
        shape=cfg.latent_shape, budget=N,
    )
    host_rng = np.random.default_rng(0)
    perms = np.stack([host_rng.permutation(N) for _ in range(B)])
    masks = mg.train_masks(perms, 0.5, 0, cfg.latent_shape[0])
    batch = {
        "video": video,
        "ctx_mask": jnp.asarray(masks.ctx_mask),
        "tgt_mask": jnp.asarray(masks.tgt_mask),
        "seq_len": jnp.float32(masks.seq_len),
        "masked_weight": jnp.float32(masks.masked_weight),
    }
    tx = make_optimizer(
        exact_lr=1e-5, warmup_steps=0, weight_decay=0.01,
        cosine_lr=False, max_steps=1_000_000,
    )
    state = TrainState.create(jax.random.key(7, impl="rbg"), params, tx)
    del params
    step = jax.jit(
        make_train_step(model, tx, vqgan=vqgan),
        donate_argnums=donation_argnums((0,)),
    )

    state, metrics = step(state, batch)  # compile + warm
    float(metrics["loss"])

    # XLA's own whole-step FLOP count (fwd+bwd+encode+optimizer, VPU
    # included) as a cross-check on the analytic transformer-only
    # model. Runs AFTER the warm step so this AOT compile is a
    # persistent-compilation-cache hit, not a second cold compile.
    try:
        cost = step.lower(state, batch).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        xla_tflop = float(cost["flops"]) / 1e12
    except Exception:
        xla_tflop = None
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, metrics = step(state, batch)
    loss = float(metrics["loss"])  # one sync drains the queued steps
    dt = (time.perf_counter() - t0) / n_steps
    assert np.isfinite(loss)
    return B * N / dt, {
        "step_ms": round(dt * 1e3, 1),
        "batch_size": B,
        "remat": remat,
        "remat_policy": remat_policy if remat else None,
        "xla_tflop_per_step": (
            float(f"{xla_tflop:.4g}") if xla_tflop is not None else None
        ),
    }


def main():
    import os
    import signal

    # Watchdog: the axon tunnel occasionally wedges (compiles that never
    # return, exit-time GC deadlocks). Emit whatever JSON lines finished
    # and die loudly instead of hanging the driver.
    def _die(signum, frame):
        print(
            json.dumps(
                {
                    "metric": "bench_watchdog_timeout",
                    "value": 0,
                    "unit": "videos/sec/chip",
                    "vs_baseline": 0,
                    "note": "tunnel wedged; partial lines above are valid",
                }
            ),
            flush=True,
        )
        os._exit(7)

    signal.signal(signal.SIGALRM, _die)
    signal.alarm(int(os.environ.get("MEBT_BENCH_TIMEOUT", "3300")))

    from mebt_tpu.sampler.mask_schedule import bootstrap_plan, maskgit_plan
    from mebt_tpu.utils.flops import (
        plan_macs,
        tflop_per_video,
        vqgan_decode_macs,
    )

    # matmul TFLOP one video pays under the production segmentation
    # (mebt_tpu/utils/flops.py; full report: scripts/flops_decode.py)
    # PLUS the VQGAN pixel-decode convs — both are timed MXU work, so
    # value / (probe / tflop_per_video) = MXU utilization relative to
    # what the chip demonstrably sustains in the same window
    fl16_dec = 2 * vqgan_decode_macs((4, 16, 16)) / 1e12
    fl16 = fl16_dec + tflop_per_video(
        plan_macs(
            maskgit_plan(1024, 32, schedule="cosine",
                         ctemp_schedule="linear"),
            1024, D=1024, L=256, V=16384,
        )
    )
    b = plan_macs(bootstrap_plan(8192, 64), 8192, D=1024, L=256, V=16384,
                  promote_first=True)
    m = plan_macs(
        maskgit_plan(8192, 32, schedule="cosine", ctemp_schedule="linear",
                     n_ctx_init=64),
        8192, D=1024, L=256, V=16384,
    )
    fl128_dec = 2 * vqgan_decode_macs((32, 16, 16)) / 1e12
    fl128 = tflop_per_video(b) + tflop_per_video(m) + fl128_dec

    probe = chip_probe()
    v16, p16 = bench_16f()
    sol16 = probe / fl16
    print(
        json.dumps(
            {
                "metric": "stl16f_generation_throughput",
                "value": round(v16, 3),
                "unit": "videos/sec/chip",
                "vs_baseline": round(v16 / BASELINE_16F_VIDEOS_PER_SEC, 3),
                "baseline_estimated": True,
                "chip_probe_tflops_bf16": probe,
                "tflop_per_video": round(fl16, 2),
                "tflop_pixel_decode": round(fl16_dec, 2),
                "sol_videos_per_sec_at_probe": round(sol16, 2),
                "mxu_utilization_vs_probe": round(v16 / sol16, 3),
                "phases": p16,
            }
        ),
        flush=True,
    )
    from mebt_tpu.utils.flops import train_macs, train_tflop_per_item

    # training throughput at the published recipe's per-GPU batch size
    # (reference 2M-step loop, train_transformer.py:97-101); MFU counts
    # the analytic transformer fwd+bwd matmuls only (standard model-FLOP
    # convention — the frozen VQGAN encode and optimizer are extra work
    # the step also pays, visible in xla_tflop_per_step)
    for name, shape, bsz, sched, remat, nst, base in (
        ("stl16f_train_throughput", (4, 16, 16), 6, "cosine",
         False, 8, BASELINE_16F_TRAIN_TOKENS_PER_SEC),
        ("stl128f_train_throughput", (32, 16, 16), 5, "linear",
         True, 4, BASELINE_128F_TRAIN_TOKENS_PER_SEC),
    ):
        tps, extras = bench_train(
            shape, bsz, sched, remat=remat, n_steps=nst
        )
        N = int(np.prod(shape))
        # MFU uses the standard model-FLOP convention (fwd+bwd = 3x
        # forward) regardless of remat; the remat recompute forward is
        # hardware work, reported separately as hfu_vs_probe (4x)
        fl_item = train_tflop_per_item(
            train_macs(N, D=1024, L=256, V=16384), fwd_bwd=3.0
        )
        probe_t = chip_probe()
        step_s = extras["step_ms"] / 1e3
        mfu = (bsz * fl_item) / step_s / probe_t
        line = {
            "metric": name,
            "value": round(tps, 1),
            "unit": "tokens/sec/chip",
            "vs_baseline": round(tps / base, 3),
            "baseline_estimated": True,
            "chip_probe_tflops_bf16": probe_t,
            "tflop_per_step_analytic": round(bsz * fl_item, 2),
            "mfu_vs_probe": round(mfu, 3),
            "phases": extras,
        }
        if remat:
            fl_hw = train_tflop_per_item(
                train_macs(N, D=1024, L=256, V=16384), fwd_bwd=4.0
            )
            line["hfu_vs_probe"] = round(
                (bsz * fl_hw) / step_s / probe_t, 3
            )
        print(json.dumps(line), flush=True)

    v128, p128 = bench_128f()
    sol128 = probe / fl128
    print(
        json.dumps(
            {
                "metric": "stl128f_generation_throughput",
                "value": round(v128, 3),
                "unit": "videos/sec/chip",
                "vs_baseline": round(v128 / BASELINE_128F_VIDEOS_PER_SEC, 3),
                "baseline_estimated": True,
                "chip_probe_tflops_bf16": probe,
                "chip_probe_tflops_bf16_post": chip_probe(),
                "tflop_per_video": round(fl128, 2),
                "tflop_pixel_decode": round(fl128_dec, 2),
                "sol_videos_per_sec_at_probe": round(sol128, 2),
                "mxu_utilization_vs_probe": round(v128 / sol128, 3),
                "phases": p128,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
    # skip interpreter-shutdown GC (tunnel teardown can deadlock there;
    # all output is flushed per line)
    import os as _os
    import sys as _sys

    _sys.stdout.flush()
    _sys.stderr.flush()
    _os._exit(0)
