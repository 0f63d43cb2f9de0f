"""Same-window A/B of the flash-attention backward kernels at the
flagship 128f training shapes: bf16 single-pass matmuls (input-dtype
keyed fast path) vs the fp32/HIGHEST upcast path, plus a grad-quality
check of the bf16 path against a float64 host reference.

The XPlane trace of the 128f train step showed the backward kernels
(_largeq_backward 8192qx256k, _smallq_backward 256qx8192k) eating
~130 ms/step at ~10-20 TFLOP/s — HIGHEST on fp32-upcast operands is a
6-pass MXU decomposition that buys nothing on bf16-sourced values.

Usage: python scripts/ab_attn_bwd.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from mebt_tpu.utils.runtime import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from bench import chip_probe  # noqa: E402
from mebt_tpu.ops.attention_pallas import (  # noqa: E402
    _largeq_backward,
    _smallq_attention,
    _smallq_backward,
)


def timed_scan(fn, args, reps=3, R=8):
    @jax.jit
    def run(*a):
        def body(c, _):
            out = fn(*a)
            return c + sum(
                jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(out)
            ), None

        s, _ = jax.lax.scan(body, 0.0, None, length=R)
        return s

    out = run(*args)
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        np.asarray(run(*args))
    return (time.perf_counter() - t0) / reps / R


def main():
    print(f"probe: {chip_probe()} TFLOP/s")
    rng = np.random.default_rng(0)
    B, H, D = 5, 16, 64
    scale = 1.0 / np.sqrt(D)

    for name, NQ, NK in [("largeq (dec blocks)", 8192, 256),
                         ("smallq (enc blocks)", 256, 8192)]:
        shapes = dict(q=(B, H, NQ, D), k=(B, H, NK, D), v=(B, H, NK, D),
                      g=(B, H, NQ, D))
        arrs = {k: rng.normal(size=v).astype(np.float32)
                for k, v in shapes.items()}
        # matmul FLOPs in the bwd: ~5 matmuls of 2*NQ*NK*D each
        tflop = 5 * 2 * B * H * NQ * NK * D / 1e12
        from mebt_tpu.ops.attention_pallas import _smallq_params

        for dt in (jnp.bfloat16, jnp.float32):
            for p_drop in (0.0, 0.1):
                if dt == jnp.float32 and p_drop:
                    continue
                a = {k: jnp.asarray(v, dt) for k, v in arrs.items()}
                seed = jnp.int32(7)
                if NQ <= 512:
                    bk, hcc = _smallq_params(NK)
                    if dt == jnp.float32:
                        bk = 512  # fp32 bwd at bk=1024 overflows VMEM
                    out, lse = _smallq_attention(
                        a["q"], a["k"], a["v"], None, seed, scale=scale,
                        block_k=bk, heads_per_cell=hcc, p_drop=p_drop,
                    )
                    t = timed_scan(
                        lambda q, k, v, o, l, g: _smallq_backward(
                            q, k, v, None, o, l, g, seed, scale=scale,
                            block_k=bk, heads_per_cell=hcc, p_drop=p_drop,
                        ),
                        (a["q"], a["k"], a["v"], out, lse, a["g"]),
                    )
                else:
                    t = timed_scan(
                        lambda q, k, v, g: _largeq_backward(
                            q, k, v, g, seed, scale=scale, p_drop=p_drop
                        ),
                        (a["q"], a["k"], a["v"], a["g"]),
                    )
                print(f"  {name:22s} {str(dt.__name__):9s} drop={p_drop} "
                      f"{t * 1e3:7.2f} ms/call  {tflop / t:6.1f} TFLOP/s")

    # grad quality: bf16 fast path vs float64 host reference at a
    # small shape (and fp32/HIGHEST for comparison)
    G, Hh, NQ, NK, Dd = 1, 2, 128, 256, 64
    q = rng.normal(size=(G, Hh, NQ, Dd)).astype(np.float32)
    k = rng.normal(size=(G, Hh, NK, Dd)).astype(np.float32)
    v = rng.normal(size=(G, Hh, NK, Dd)).astype(np.float32)
    g = rng.normal(size=(G, Hh, NQ, Dd)).astype(np.float32)
    sc = 1.0 / np.sqrt(Dd)

    q64, k64, v64, g64 = (a.astype(np.float64) for a in (q, k, v, g))
    s = np.einsum("bhqd,bhkd->bhqk", q64, k64) * sc
    e = np.exp(s - s.max(-1, keepdims=True))
    P = e / e.sum(-1, keepdims=True)
    dP = np.einsum("bhqd,bhkd->bhqk", g64, v64)
    dvec = (P * dP).sum(-1, keepdims=True)
    ds = P * (dP - dvec) * sc
    dq_ref = np.einsum("bhqk,bhkd->bhqd", ds, k64)

    for dt in (jnp.bfloat16, jnp.float32):
        dq, dk, dv = _largeq_backward(
            jnp.asarray(q, dt), jnp.asarray(k, dt), jnp.asarray(v, dt),
            jnp.asarray(g, dt), scale=sc,
        )
        err = np.abs(np.asarray(dq, np.float64) - dq_ref).max()
        rel = err / np.abs(dq_ref).max()
        print(f"  dq max rel err vs float64 ref ({dt.__name__}): {rel:.2e}")
    print(f"probe(post): {chip_probe()} TFLOP/s")


if __name__ == "__main__":
    main()
