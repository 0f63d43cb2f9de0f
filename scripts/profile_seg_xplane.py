"""XPlane op-level profile of ONE production 128f confidence segment.

The component profile (scripts/profile_late_segment.py) sums to ~42
ms/step while the production scan step costs ~100 ms; this captures the
real scan and prints per-op self time so the gap has a name.

Usage: python scripts/profile_seg_xplane.py [seg_index]
"""

import os
import sys

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
from mebt_tpu.utils.runtime import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from bench import build, _key  # noqa: E402
from profile_train import summarize  # noqa: E402


def main():
    from mebt_tpu.sampler.decode import (
        DecodeState,
        _ctx_weight,
        _staged_confidence_scan,
    )
    from mebt_tpu.sampler.mask_schedule import (
        maskgit_plan,
        plan_segments_joint,
    )

    seg_idx = int(sys.argv[1]) if len(sys.argv) > 1 else -1
    B = 8
    model, params, _ = build((32, 16, 16))
    N = model.config.seq_len
    plan = maskgit_plan(N, 32, "cosine", "linear", n_ctx_init=64)
    segments = plan_segments_joint(plan, N, ctx_weight=_ctx_weight(model.config))
    n_tgt = plan.n_targets_before(N)
    start, stop, bucket, ctx_bucket = segments[seg_idx]
    n_ctx = int(N - n_tgt[start])
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

    def f(state):
        out, _ = _staged_confidence_scan(
            model, params, state, xs,
            bucket=bucket, ctx_bucket=ctx_bucket,
            temperature=1.0, top_k=32, top_p=None,
            context_temperature=4.0, score_mode="prob",
            collect_history=False, approx_top_k=False, all_live=True,
        )
        return out.codes

    np.asarray(f(state))  # compile + warm
    trace_dir = "/tmp/mebt_seg_trace"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        np.asarray(f(state))
    n_steps = stop - start
    print(f"(trace covers {n_steps} scan steps)")
    summarize(trace_dir, top=30)


if __name__ == "__main__":
    main()
