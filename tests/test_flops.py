"""Sanity checks for the decode FLOP accounting (utils/flops.py) that
bench.py uses to emit MXU-utilization ratios."""

import numpy as np

from mebt_tpu.sampler.mask_schedule import bootstrap_plan, maskgit_plan
from mebt_tpu.utils.flops import (
    CANONICAL_MODES,
    plan_macs,
    step_macs,
    tflop_per_video,
)


def test_canonical_modes_shape():
    assert len(CANONICAL_MODES) == 24
    assert CANONICAL_MODES.count("latent_enc") == 7
    assert CANONICAL_MODES.count("latent_self") == 6
    assert CANONICAL_MODES.count("latent_dec") == 6
    assert CANONICAL_MODES.count("lt2l") == 5


def test_step_macs_monotone_in_buckets():
    a = step_macs(128, 128, D=1024, L=256, V=16384)
    b = step_macs(256, 128, D=1024, L=256, V=16384)
    c = step_macs(128, 256, D=1024, L=256, V=16384)
    assert b["enc"] > a["enc"] and b["dec"] == a["dec"]
    assert c["dec"] > a["dec"] and c["head"] == 2 * a["head"]


def test_plan_macs_bucket_overhead_bounded():
    plan = maskgit_plan(1024, 32, schedule="cosine",
                        ctemp_schedule="linear")
    macs = plan_macs(plan, 1024, D=1024, L=256, V=16384)
    total = sum(macs[k] for k in ("enc", "dec", "head"))
    ideal = sum(macs["ideal"].values())
    assert ideal <= total <= 1.3 * ideal  # alignment waste is bounded
    # flagship numbers stay in a plausible band (regression guard for
    # the segmentation: a planner change that blows up bucket waste
    # shows up here before it shows up in the bench)
    assert 7.0 < tflop_per_video(macs) < 10.0


def test_promote_first_is_much_cheaper():
    bplan = bootstrap_plan(8192, 64)
    fast = plan_macs(bplan, 8192, D=1024, L=256, V=16384,
                     promote_first=True)
    slow = plan_macs(bplan, 8192, D=1024, L=256, V=16384)
    assert tflop_per_video(fast) < 0.25 * tflop_per_video(slow)


def test_segments_cover_all_steps():
    plan = maskgit_plan(8192, 32, schedule="cosine",
                        ctemp_schedule="linear", n_ctx_init=64)
    macs = plan_macs(plan, 8192, D=1024, L=256, V=16384)
    segs = macs["segments"]
    assert segs[0][0] == 0 and segs[-1][1] == 32
    covered = sum(e - s for s, e, _, _ in segs)
    assert covered == 32
    nt = np.asarray(plan.n_targets_before(8192))
    for s, e, tb, cb in segs:
        assert tb >= nt[s:e].max()
        assert cb >= (8192 - nt[s:e]).max() or cb == 8192


def test_promote_first_models_actual_buckets():
    """The random/bootstrap accounting must use the decode scan's real
    buckets (one 8-aligned target bucket + one 128-aligned context
    bucket), not the confidence path's joint segmentation — the first
    draft modeled a 128-wide target bucket and overstated the 128f
    bootstrap head FLOPs 16x."""
    from mebt_tpu.sampler.decode import random_path_buckets

    bplan = bootstrap_plan(8192, 64)
    macs = plan_macs(bplan, 8192, D=1024, L=256, V=16384,
                     promote_first=True)
    tb, cb = random_path_buckets(bplan, 8192, bplan.n_ctx_init)
    assert (tb, cb) == (8, 128)
    assert macs["segments"] == [(0, 64, tb, cb)]
    got = step_macs(cb, tb, D=1024, L=256, V=16384)
    for k in ("enc", "dec", "head"):
        assert macs[k] == 64 * got[k]


def test_vqgan_decode_macs_matches_xla():
    """The analytic conv model must track XLA's own FLOP count for the
    decode graph (tiny geometry so the CPU compile stays cheap; the
    analytic model is pure arithmetic in the channel/stride structure,
    so agreement here validates it at the flagship sizes too)."""
    import jax
    import jax.numpy as jnp

    from mebt_tpu.models.vqgan import VQGAN, VQGANConfig
    from mebt_tpu.utils.flops import vqgan_decode_macs

    cfg = VQGANConfig(
        embedding_dim=8, n_codes=32, n_hiddens=4, downsample=(2, 4, 4),
    )
    vq = VQGAN.create(jax.random.key(0), cfg, example_shape=(1, 2, 8, 8, 3))
    codes = jnp.zeros((1, 1, 2, 2), jnp.int32)
    c = jax.jit(vq.decode).lower(codes).compile().cost_analysis()
    if isinstance(c, (list, tuple)):
        c = c[0]
    xla_flops = float(c["flops"])
    analytic = 2 * vqgan_decode_macs(
        (1, 2, 2), n_hiddens=4, downsample=(2, 4, 4), embedding_dim=8
    )
    # XLA also counts the norm/SiLU/embedding VPU mass the conv model
    # ignores; at these tiny channel counts that overhead is larger
    # relatively than at the flagship's, so allow 25%.
    assert analytic <= xla_flops * 1.05
    assert analytic > 0.75 * xla_flops


def test_vqgan_decode_macs_flagship_values():
    """Flagship geometries (bench.build): the pixel decode is real MXU
    work in the timed path — 128f pays ~5.6 TFLOP/video, 16f ~0.7."""
    from mebt_tpu.utils.flops import vqgan_decode_macs

    t128 = 2 * vqgan_decode_macs((32, 16, 16)) / 1e12
    t16 = 2 * vqgan_decode_macs((4, 16, 16)) / 1e12
    assert 5.0 < t128 < 6.5
    assert abs(t128 / t16 - 8.0) < 1e-6  # pure T-axis scaling
