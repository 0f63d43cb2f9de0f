"""Headline benchmark: STL-16f generation throughput (videos/sec/chip).

Recipe mirrors the reference eval harness (BASELINE.md row 1 /
scripts/valid_dnr_config_ckpt_exp_stl_16f.sh): MaskGIT sampling with 32
steps, cosine schedule, ctemp 8.0 linear decay, batch 16, followed by
VQGAN decode of the (4,16,16) latent codes to 16x128x128 pixels.
Weights are random (throughput is weight-independent); model size is the
published flagship: 24L/16H/1024d, vocab 16384, 256 latents.

vs_baseline: the reference repo publishes no throughput numbers
(BASELINE.md). The denominator below is an engineering estimate of the
reference pipeline on one A100: 32 Python-driven forwards of the ~200M
gathered-attention model at bs16 (fp32/TF32, per-step host sync +
schedule math) plus the Conv3d decode — ~5.3 s/batch => ~3.0 videos/s.
Treat vs_baseline as indicative until the reference is timed directly.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

from mebt_tpu.utils.runtime import enable_compilation_cache

enable_compilation_cache()
import numpy as np

BASELINE_VIDEOS_PER_SEC = 3.0  # estimated reference A100 throughput


def build():
    from mebt_tpu.models.mebt import MeBT, MeBTConfig
    from mebt_tpu.models.vqgan import VQGAN, VQGANConfig
    from __graft_entry__ import _canonical_mode

    cfg = MeBTConfig(
        vocab_size=16384,
        block_size=1024,
        n_layer=24,
        n_head=16,
        n_embd=1024,
        sos_emb=256,
        mode=_canonical_mode(),
        latent_shape=(4, 16, 16),
        dtype=jnp.bfloat16,
    )
    model = MeBT(cfg)

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
    params = jax.tree.map(
        lambda s: (jax.random.normal(next(keys), s.shape, jnp.float32) * 0.02),
        shapes,
    )

    vq_cfg = VQGANConfig(
        embedding_dim=256, n_codes=16384, n_hiddens=32, downsample=(4, 8, 8),
        dtype=jnp.bfloat16,
    )
    vqgan = VQGAN.create(
        jax.random.key(2), vq_cfg, example_shape=(1, 4, 32, 32, 3)
    )
    return model, params, vqgan


def main():
    from mebt_tpu.sampler.decode import maskgit_sample
    from mebt_tpu.sampler.mask_schedule import maskgit_plan

    B = 16
    n_steps = 32
    model, params, vqgan = build()
    N = model.config.seq_len
    plan = maskgit_plan(N, n_steps, schedule="cosine", ctemp_schedule="linear")

    decode_pixels = jax.jit(
        lambda codes: jnp.round(
            (jnp.clip(vqgan.decode(codes), -0.5, 0.5) + 0.5) * 255.0
        ).astype(jnp.uint8)
    )

    def generate(rng):
        state = maskgit_sample(
            model, params, rng, B, plan,
            temperature=1.0, context_temperature=8.0,
        )
        codes = state.codes.reshape(B, *model.config.latent_shape)
        return decode_pixels(codes)

    # rbg PRNG: ~5% faster than threefry for the vocab-sized gumbel
    # draws; i.i.d. uniforms either way (the reference uses torch's
    # Philox — PRNG choice is not part of the algorithm)
    def key(i):
        return jax.random.key(i, impl="rbg")

    # warmup / compile
    out = generate(key(10))
    np.asarray(out)  # force full execution (block_until_ready does not
    # synchronize through the remote device tunnel)

    # median of 5 runs: the remote-tunnel environment adds ~10% run-to-run
    # noise on top of stable device time
    runs = 5
    times = []
    pending = None
    t0 = time.perf_counter()
    for i in range(runs):
        out = generate(key(100 + i))  # queue batch i (async dispatch)
        if pending is not None:
            np.asarray(pending)  # fetch batch i-1 while i computes
            t1 = time.perf_counter()
            times.append(t1 - t0)
            t0 = t1
        pending = out
    np.asarray(pending)
    times.append(time.perf_counter() - t0)
    dt = float(np.median(times))

    videos_per_sec = B / dt
    print(
        json.dumps(
            {
                "metric": "stl16f_generation_throughput",
                "value": round(videos_per_sec, 3),
                "unit": "videos/sec/chip",
                "vs_baseline": round(videos_per_sec / BASELINE_VIDEOS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
