"""Same-window A/B: unfused exact top-k sampling vs the fused streaming
top-k kernel (v2) at production 128f head shapes.

The tunnel chip throttles over time (PERFORMANCE.md "Measurement
pitfalls"), so this script interleaves a fixed-cost matmul probe and
times everything device-side inside lax.scan with varying operands
(loop-invariant bodies get hoisted; identical-input repeats
underestimate).

Run on TPU from /root/repo:  python scripts/ab_topk.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from mebt_tpu.utils.runtime import enable_compilation_cache

enable_compilation_cache()

from mebt_tpu.ops.sampling import sample_topk_tokens  # noqa: E402
from mebt_tpu.ops.head_sample_pallas import (  # noqa: E402
    fused_head_sample,
    fused_head_topk_sample_v2,
)

K = 32
STEPS = 8


def probe():
    x = jax.random.normal(jax.random.key(0), (4096, 4096), jnp.bfloat16)

    @jax.jit
    def chain(x):
        def body(c, _):
            return c @ x, None

        y, _ = jax.lax.scan(body, x, None, length=128)
        return jnp.float32(jnp.sum(y.astype(jnp.float32)))

    chain(x).block_until_ready()
    t0 = time.perf_counter()
    np.asarray(chain(x))
    dt = time.perf_counter() - t0
    tf = 128 * 2 * 4096**3 / dt / 1e12
    print(f"  [probe] {tf:.1f} TFLOP/s bf16")
    return tf


def timeit(fn, *args, label=""):
    # a config can fail device compile (e.g. VMEM overflow at wide
    # vocab_chunk x row_tile products) — survive and keep sweeping
    try:
        np.asarray(fn(*args))  # compile + warm
    except Exception as e:
        print(f"  {label}: FAILED ({type(e).__name__}: {str(e)[:120]})")
        return None
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        best = min(best, time.perf_counter() - t0)
    per = best / STEPS * 1e3
    print(f"  {label}: {per:.2f} ms/step  ({best*1e3:.1f} ms /{STEPS})")
    return per


def main():
    # default shapes: the historical A/B point (16384) and a small
    # segment; pass row counts as argv to probe others (the 128f big
    # segment at bs 8 is 65536 rows)
    rows_list = [int(a) for a in sys.argv[1:]] or [16384, 4096]
    D, V = 1024, 16384
    key = jax.random.key(42)
    w = jax.random.normal(jax.random.fold_in(key, 1), (D, V), jnp.bfloat16) * 0.02

    for rows in rows_list:
        x = jax.random.normal(jax.random.fold_in(key, 2), (rows, D), jnp.bfloat16)
        print(f"== rows={rows} D={D} V={V} k={K} ==")
        probe()

        @jax.jit
        def unfused(x, w, r):
            def body(c, i):
                l = x @ w  # bf16 logits (the production fast path)
                s, p = sample_topk_tokens(jax.random.fold_in(r, i), l, K, 1.0)
                return c + jnp.sum(p) + jnp.sum(s), None

            s, _ = jax.lax.scan(body, 0.0, jnp.arange(STEPS))
            return s

        timeit(unfused, x, w, key, label="unfused matmul+top32 (baseline)")

        @jax.jit
        def fused_nok(x, w):
            def body(c, i):
                s, p = fused_head_sample(x, w, jnp.uint32(i), temperature=1.0)
                return c + jnp.sum(p) + jnp.sum(s.astype(jnp.float32)), None

            s, _ = jax.lax.scan(body, 0.0, jnp.arange(STEPS))
            return s

        timeit(fused_nok, x, w, label="fused no-top-k (reference point)")

        # (vocab_chunk, m, row_tile, sub): sub < vc decouples extraction
        # granularity (miss probability, m*V total work) from merge
        # granularity (rank-merge count)
        for vc, m, tr, sub in [
            (1024, 14, 512, 1024),
            (1024, 12, 512, 1024),
            (2048, 14, 512, 1024),
            (1024, 14, 256, 1024),
            (1024, 10, 512, 512),
            (512, 10, 1024, 512),
        ]:

            @jax.jit
            def fused_v2(x, w):
                def body(c, i):
                    s, p, o = fused_head_topk_sample_v2(
                        x, w, jnp.uint32(i), K, temperature=1.0,
                        row_tile=tr, vocab_chunk=vc, m=m, sub=sub,
                    )
                    return (
                        c
                        + jnp.sum(p)
                        + jnp.sum(s.astype(jnp.float32))
                        + jnp.sum(o.astype(jnp.float32)),
                        None,
                    )

                s, _ = jax.lax.scan(body, 0.0, jnp.arange(STEPS))
                return s

            timeit(fused_v2, x, w, label=f"fused v2 vc={vc} m={m} tr={tr} sub={sub}")

        # overflow (fallback) rate at random weights
        _, _, ovf = fused_head_topk_sample_v2(
            x, w, jnp.uint32(7), K, temperature=1.0,
            row_tile=1024, vocab_chunk=512, m=10,
        )
        n = int(np.asarray(jnp.sum(ovf)))
        print(f"  overflow rows at m=10/vc=512: {n}/{rows}")
        probe()


if __name__ == "__main__":
    main()
