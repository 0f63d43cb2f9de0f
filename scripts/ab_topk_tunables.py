"""Tunable sweep for fused_head_topk_sample_v2 at the production 128f
segment row counts. The kernel's per-row cost (~1.4 us/row) is ~6x the
bare head matmul, so the extraction/merge constants — row_tile,
vocab_chunk, sub (extraction slice width), m (per-slice top-m) — are
the lever. Overflow safety: keep the per-step whole-batch fallback
probability under ~1% — Poisson(k*sub/V) tail past m per slice, times
rows * V/sub slices (see the kernel docstring's accounting).

Usage: python scripts/ab_topk_tunables.py [R ...]   (default 65536 13312)
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from mebt_tpu.utils.runtime import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from bench import chip_probe, _key  # noqa: E402
from mebt_tpu.ops.head_sample_pallas import (  # noqa: E402
    fused_head_topk_sample_v2,
)


def timed(fn, *args, reps=2, R_inner=8):
    @jax.jit
    def run(*a):
        def body(c, i):
            s, p, ovf = fn(*a, jnp.uint32(i))
            return c + jnp.sum(p) + jnp.sum(s) + jnp.sum(ovf), None

        s, _ = jax.lax.scan(body, 0.0, jnp.arange(R_inner))
        return s

    np.asarray(run(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        np.asarray(run(*args))
    return (time.perf_counter() - t0) / reps / R_inner


def main():
    rows_list = [int(a) for a in sys.argv[1:]] or [65536, 13312]
    D, V, k = 1024, 16384, 32
    print(f"probe: {chip_probe()} TFLOP/s")
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(D, V)) * 0.02, jnp.bfloat16)

    # (row_tile, vocab_chunk, sub, m) — m sized so the fallback stays
    # <~1%/step at 65536 rows: lam = k*sub/V; P(Poisson(lam) > m) *
    # rows * V/sub <= 0.01
    cfgs = [
        (512, 1024, 1024, 14),   # current default
        (256, 1024, 1024, 14),
        (1024, 1024, 1024, 14),
        (512, 2048, 1024, 14),
        (512, 4096, 1024, 14),
        (512, 16384, 1024, 14),
        (512, 2048, 2048, 21),
        (512, 4096, 4096, 33),
        (512, 1024, 512, 11),
        (512, 4096, 2048, 21),
        (1024, 4096, 1024, 14),
        (1024, 16384, 1024, 14),
    ]
    for R in rows_list:
        x = jnp.asarray(rng.normal(size=(R, D)), jnp.bfloat16)
        print(f"rows={R}:")
        for rt, vc, sub, m in cfgs:
            try:
                fn = lambda x, w, s: fused_head_topk_sample_v2(  # noqa: E731
                    x, w, s, k, temperature=1.0,
                    row_tile=rt, vocab_chunk=vc, sub=sub, m=m,
                )
                dt = timed(fn, x, w)
                # overflow rate at these inputs
                _, _, ovf = jax.jit(fn)(x, w, jnp.uint32(99))
                print(f"  rt={rt:5d} vc={vc:6d} sub={sub:5d} m={m:3d}: "
                      f"{dt * 1e3:8.2f} ms  ({dt / R * 1e9:6.1f} ns/row)  "
                      f"ovf={int(jnp.sum(ovf > 0))}")
            except Exception as e:
                print(f"  rt={rt:5d} vc={vc:6d} sub={sub:5d} m={m:3d}: "
                      f"FAILED {type(e).__name__}: {str(e)[:90]}")
    print(f"probe(post): {chip_probe()} TFLOP/s")


if __name__ == "__main__":
    main()
