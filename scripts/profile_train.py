"""XPlane op-level profile of the flagship train steps.

Captures a jax.profiler trace of a few fused train steps (bench.py's
exact jit: frozen VQGAN encode + dense MeBT fwd/bwd + AdamW) and
prints the top device ops by self time, split into matmul (MXU) vs
everything else — the "name the top-3 non-matmul consumers" record
the MFU work keys off (VERDICT round-4 item 4).

Usage: python scripts/profile_train.py [16|128] [batch_size]
Writes the raw trace under /tmp/mebt_train_trace/.
"""

import glob
import os
import sys

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

import jax
import numpy as np

sys.path.insert(0, "/root/repo")
from mebt_tpu.utils.runtime import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import bench  # noqa: E402


def capture(recipe: str, bsz: int | None):
    from mebt_tpu.sampler.mask_schedule import MaskGen
    from mebt_tpu.train.train_state import (
        TrainState,
        make_optimizer,
        make_train_step,
    )
    from mebt_tpu.utils.runtime import donation_argnums
    import jax.numpy as jnp

    if recipe == "16":
        latent_shape, B, remat = (4, 16, 16), bsz or 6, False
    else:
        latent_shape, B, remat = (32, 16, 16), bsz or 5, True
    model, params, vqgan = bench.build(latent_shape, remat=remat)
    cfg = model.config
    N = cfg.seq_len
    dt_, dh, dw = vqgan.config.downsample
    video = jax.random.uniform(
        jax.random.key(5),
        (B, cfg.latent_shape[0] * dt_, cfg.latent_shape[1] * dh,
         cfg.latent_shape[2] * dw, 3),
        jnp.float32, -0.5, 0.5,
    )
    mg = MaskGen(schedule="cosine", max_token=N, method="mlm",
                 shape=cfg.latent_shape, budget=N)
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
    tx = make_optimizer(exact_lr=1e-5, warmup_steps=0, weight_decay=0.01,
                        cosine_lr=False, max_steps=1_000_000)
    state = TrainState.create(jax.random.key(7, impl="rbg"), params, tx)
    del params
    step = jax.jit(
        make_train_step(model, tx, vqgan=vqgan),
        donate_argnums=donation_argnums((0,)),
    )
    state, metrics = step(state, batch)
    float(metrics["loss"])  # sync

    trace_dir = "/tmp/mebt_train_trace"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            state, metrics = step(state, batch)
        float(metrics["loss"])
    return trace_dir


def summarize(trace_dir: str, top: int = 25):
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    paths = glob.glob(
        os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True
    )
    assert paths, f"no xplane under {trace_dir}"
    # hlo_op_stats^: per-HLO-op table with self time; csv for parsing
    data, _ = rtd.xspace_to_tool_data(paths, "hlo_op_stats^", {})
    if isinstance(data, bytes):
        data = data.decode()
    import csv
    import io

    rows = list(csv.DictReader(io.StringIO(data)))
    if not rows:
        print("empty op stats"); return
    # column names vary across versions; find them
    cols = rows[0].keys()

    def col(*cands):
        for c in cands:
            for k in cols:
                if k.lower().replace(" ", "_") == c:
                    return k
        return None

    c_name = col("op_name", "name")
    c_cat = col("category", "op_category")
    c_self = col("total_self_time_(us)", "self_time_(us)", "self_time_us",
                 "total_self_time_us", "self-time_(us)")
    if c_self is None:
        print("columns:", list(cols)); return
    for r in rows:
        r["_self"] = float(r[c_self] or 0)
    rows.sort(key=lambda r: -r["_self"])
    tot = sum(r["_self"] for r in rows)
    mm_cats = ("convolution", "matmul", "dot", "conv")
    mm = sum(r["_self"] for r in rows
             if any(m in (r.get(c_cat) or "").lower() for m in mm_cats))
    print(f"total device self time: {tot/1e3:.1f} ms "
          f"(3 steps) | matmul/conv share: {mm/tot:.3f}")
    print(f"{'self ms':>9} {'%':>6}  {'category':<22} op")
    for r in rows[:top]:
        print(f"{r['_self']/1e3:9.2f} {r['_self']/tot*100:6.2f}  "
              f"{(r.get(c_cat) or ''):<22} {r[c_name][:90]}")
    # non-matmul top-3 rollup by category
    from collections import defaultdict
    by_cat = defaultdict(float)
    for r in rows:
        by_cat[r.get(c_cat) or "?"] += r["_self"]
    print("\nby category:")
    for k, v in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"  {v/1e3:9.2f} ms {v/tot*100:6.2f}%  {k}")


if __name__ == "__main__":
    recipe = sys.argv[1] if len(sys.argv) > 1 else "128"
    bsz = int(sys.argv[2]) if len(sys.argv) > 2 else None
    d = capture(recipe, bsz)
    summarize(d)
