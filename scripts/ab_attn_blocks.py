"""Block-size sweep for the flash-attention kernels at the flagship
128f training shapes (bf16, dropout on — the production regime).

Usage: python scripts/ab_attn_blocks.py
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
    _largeq_attention,
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

    np.asarray(run(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        np.asarray(run(*args))
    return (time.perf_counter() - t0) / reps / R


def main():
    print(f"probe: {chip_probe()} TFLOP/s")
    rng = np.random.default_rng(0)
    B, H, D = 5, 16, 64
    scale = 1.0 / np.sqrt(D)
    seed = jnp.int32(7)
    p_drop = 0.1

    # large-Q backward: NQ=8192, NK=256
    NQ, NK = 8192, 256
    q = jnp.asarray(rng.normal(size=(B, H, NQ, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, H, NK, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, H, NK, D)), jnp.bfloat16)
    g = jnp.asarray(rng.normal(size=(B, H, NQ, D)), jnp.bfloat16)
    tflop = 5 * 2 * B * H * NQ * NK * D / 1e12
    for bq in (512, 1024, 2048):
        for hc in (2, 4, 8):
            try:
                t = timed_scan(
                    lambda q_, k_, v_, g_: _largeq_backward(
                        q_, k_, v_, g_, seed, scale=scale, block_q=bq,
                        heads_per_cell=hc, p_drop=p_drop,
                    ),
                    (q, k, v, g),
                )
                print(f"  largeq bwd bq={bq:4d} hc={hc}: {t*1e3:7.2f} ms "
                      f"{tflop/t:6.1f} TFLOP/s")
            except Exception as e:
                print(f"  largeq bwd bq={bq:4d} hc={hc}: FAILED "
                      f"{str(e)[:80]}")
    # large-Q forward
    tflop_f = 2 * 2 * B * H * NQ * NK * D / 1e12
    for bq in (512, 1024, 2048):
        for hc in (4, 8):
            try:
                t = timed_scan(
                    lambda q_, k_, v_: _largeq_attention(
                        q_, k_, v_, seed, scale=scale, block_q=bq,
                        heads_per_cell=hc, p_drop=p_drop,
                    ),
                    (q, k, v),
                )
                print(f"  largeq fwd bq={bq:4d} hc={hc}: {t*1e3:7.2f} ms "
                      f"{tflop_f/t:6.1f} TFLOP/s")
            except Exception as e:
                print(f"  largeq fwd bq={bq:4d} hc={hc}: FAILED "
                      f"{str(e)[:80]}")

    # small-Q: NQ=256, NK=8192
    NQ, NK = 256, 8192
    q = jnp.asarray(rng.normal(size=(B, H, NQ, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, H, NK, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, H, NK, D)), jnp.bfloat16)
    g = jnp.asarray(rng.normal(size=(B, H, NQ, D)), jnp.bfloat16)
    tflop = 5 * 2 * B * H * NQ * NK * D / 1e12
    for bk in (512, 1024, 2048):
        for hc in (2, 4, 8):
            try:
                out, lse = _smallq_attention(
                    q, k, v, None, seed, scale=scale, block_k=bk,
                    heads_per_cell=hc, p_drop=p_drop,
                )
                t = timed_scan(
                    lambda q_, k_, v_, o_, l_, g_: _smallq_backward(
                        q_, k_, v_, None, o_, l_, g_, seed, scale=scale,
                        block_k=bk, heads_per_cell=hc, p_drop=p_drop,
                    ),
                    (q, k, v, out, lse, g),
                )
                print(f"  smallq bwd bk={bk:4d} hc={hc}: {t*1e3:7.2f} ms "
                      f"{tflop/t:6.1f} TFLOP/s")
            except Exception as e:
                print(f"  smallq bwd bk={bk:4d} hc={hc}: FAILED "
                      f"{str(e)[:80]}")
    tflop_f = 2 * 2 * B * H * NQ * NK * D / 1e12
    for bk in (1024, 2048):
        for hc in (4, 8):
            try:
                t = timed_scan(
                    lambda q_, k_, v_: _smallq_attention(
                        q_, k_, v_, None, seed, scale=scale, block_k=bk,
                        heads_per_cell=hc, p_drop=p_drop,
                    ),
                    (q, k, v),
                )
                print(f"  smallq fwd bk={bk:4d} hc={hc}: {t*1e3:7.2f} ms "
                      f"{tflop_f/t:6.1f} TFLOP/s")
            except Exception as e:
                print(f"  smallq fwd bk={bk:4d} hc={hc}: FAILED "
                      f"{str(e)[:80]}")
    print(f"probe(post): {chip_probe()} TFLOP/s")


if __name__ == "__main__":
    main()
