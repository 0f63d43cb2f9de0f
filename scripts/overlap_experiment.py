"""Does the host fetch of generated pixels overlap device compute
through the axon tunnel?

The 128f bench fetches ~50 MB of uint8 pixels per batch through a
~30 MB/s tunnel (~1.7 s). bench._timed dispatches batch i+1's compute
BEFORE fetching batch i's pixels, which overlaps them IF the tunnel
can serve a d2h read concurrently with execution. This script measures
that directly in one window:

  A. sampling+decode only, no fetch (device-side, scalar sync)
  B. fetch only (pre-computed pixels, repeated np.asarray)
  C. current bench pipelining (dispatch next, then fetch previous)
  D. C + fetch on a worker thread (main thread keeps dispatching)

overlap works  -> C ~= max(A, B) + eps
transport serializes -> C ~= A + B
"""

import sys
import time
from concurrent.futures import ThreadPoolExecutor

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from mebt_tpu.utils.runtime import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from bench import _key, build, chip_probe  # noqa: E402


def main():
    from mebt_tpu.sampler.decode import maskgit_sample
    from mebt_tpu.sampler.mask_schedule import bootstrap_plan, maskgit_plan

    B = 8
    model, params, vqgan = build((32, 16, 16))
    N = model.config.seq_len
    bplan = bootstrap_plan(N, 64)
    mplan = maskgit_plan(N, 32, "cosine", "linear", n_ctx_init=64)

    decode_pixels = jax.jit(
        lambda codes: jnp.round(
            (jnp.clip(vqgan.decode(codes), -0.5, 0.5) + 0.5) * 255.0
        ).astype(jnp.uint8)
    )

    def sample_codes(rng):
        r1, r2 = jax.random.split(rng)
        st = maskgit_sample(
            model, params, r1, B, bplan,
            temperature=1.0, strategy="bootstrap", context_temperature=4.0,
        )
        st2 = maskgit_sample(
            model, params, r2, B, mplan,
            codes=st.codes, ctx_mask=st.ctx_mask,
            temperature=1.0, top_k=32, context_temperature=4.0,
        )
        return st2.codes

    def generate(rng):
        codes = sample_codes(rng).reshape(B, *model.config.latent_shape)
        return decode_pixels(codes)

    print(f"probe: {chip_probe()} TFLOP/s")

    # warm all compiles
    px = generate(_key(0))
    np.asarray(px)
    csum = jax.jit(lambda c: jnp.sum(c))

    # A: compute only (tiny scalar fetch to sync)
    reps = 3
    t0 = time.perf_counter()
    for i in range(reps):
        out = generate(_key(10 + i))
        float(np.asarray(csum(out)))  # scalar sync, no bulk fetch
    a = (time.perf_counter() - t0) / reps
    print(f"A compute-only        : {a*1e3:8.0f} ms/batch")

    # B: fetch only (the same ~50 MB buffer, fresh each rep to defeat
    # any caching)
    bufs = [generate(_key(50 + i)) for i in range(reps)]
    for b_ in bufs:
        float(np.asarray(csum(b_)))  # ensure computed before timing
    t0 = time.perf_counter()
    for b_ in bufs:
        np.asarray(b_)
    b = (time.perf_counter() - t0) / reps
    mb = np.prod(px.shape) / 1e6
    print(f"B fetch-only          : {b*1e3:8.0f} ms/batch "
          f"({mb:.0f} MB -> {mb/b:.1f} MB/s)")

    # C: current bench pipelining
    t0 = time.perf_counter()
    pending = None
    for i in range(reps):
        out = generate(_key(100 + i))
        if pending is not None:
            np.asarray(pending)
        pending = out
    np.asarray(pending)
    c = (time.perf_counter() - t0) / reps
    print(f"C pipelined (1 deep)  : {c*1e3:8.0f} ms/batch")

    # D: fetch on a worker thread
    with ThreadPoolExecutor(1) as pool:
        t0 = time.perf_counter()
        fut = None
        for i in range(reps):
            out = generate(_key(200 + i))
            if fut is not None:
                fut.result()
            fut = pool.submit(np.asarray, out)
        fut.result()
        d = (time.perf_counter() - t0) / reps
    print(f"D fetch thread        : {d*1e3:8.0f} ms/batch")

    print(f"\nserial sum A+B = {1e3*(a+b):8.0f} ms; "
          f"overlap verdict: C {'overlaps' if c < a + 0.5*b else 'is serial'}"
          )
    print(f"probe(post): {chip_probe()} TFLOP/s")


if __name__ == "__main__":
    main()
