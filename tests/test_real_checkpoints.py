"""Real published-checkpoint smoke tests — skipped until the blobs land.

The published MeBT/TATS/I3D weights are not present in this image
(`/root/reference/.MISSING_LARGE_BLOBS`). These tests activate the
moment the files appear under `ckpts/` (the reference README's layout)
or `$MEBT_CKPT_DIR`, and close the loop the importers are structurally
tested for: load the STL-16f MeBT checkpoint + sky VQGAN, generate
real samples, embed them with the imported I3D, and compute an FVD
against itself (must be ~0) — exercising every import path end-to-end
with real tensors.

Run explicitly with:  pytest tests/test_real_checkpoints.py -m slow
"""

import glob
import os

import numpy as np
import pytest

CKPT_DIR = os.environ.get("MEBT_CKPT_DIR", "ckpts")


def _find(pattern):
    hits = sorted(glob.glob(os.path.join(CKPT_DIR, pattern)))
    return hits[0] if hits else None


def _require(pattern):
    path = _find(pattern)
    if path is None:
        pytest.skip(f"published blob {pattern!r} not present in {CKPT_DIR}/")
    return path


@pytest.mark.slow
def test_real_vqgan_roundtrip():
    path = _require("vqgan_sky_128_488*.ckpt")
    import jax.numpy as jnp

    from mebt_tpu.utils.torch_ckpt import load_vqgan

    vqgan = load_vqgan(path, ignore_keys=("loss",))
    assert vqgan.codebook.embeddings.shape[0] == 16384
    video = jnp.zeros((1, 3, 16, 128, 128), jnp.float32)
    codes = vqgan.encode(video)
    assert codes.shape == (1, 4, 16, 16)
    recon = vqgan.decode(codes)
    assert recon.shape == video.shape
    assert bool(jnp.isfinite(recon).all())


@pytest.mark.slow
def test_real_mebt_sample_and_fvd():
    mebt_path = _find("*stl*16*.ckpt") or _find("mebt_stl_16f*.ckpt")
    if mebt_path is None:
        pytest.skip(f"published STL-16f MeBT ckpt not present in {CKPT_DIR}/")
    vq_path = _find("vqgan_sky_128_488*.ckpt")
    i3d_path = _find("i3d_pretrained_400.pt")

    import jax

    from mebt_tpu.models.mebt import MeBT
    from mebt_tpu.sampler.generation import bidirect_generate
    from mebt_tpu.utils.torch_ckpt import load_mebt, load_vqgan

    config, params, vqgan = load_mebt(mebt_path)
    if vqgan is None:
        if vq_path is None:
            pytest.skip("no embedded or standalone VQGAN ckpt present")
        vqgan = load_vqgan(vq_path, ignore_keys=("loss",))
    model = MeBT(config)

    res = bidirect_generate(
        model, params, vqgan, jax.random.PRNGKey(0), batch_size=4,
        total_length=16, step_size=16, context_size=8,
        vid_n_steps=32, vid_c_temp=8.0,
    )
    assert res.samples.shape == (4, 16, 128, 128, 3)
    assert res.samples.dtype == np.uint8
    # real weights must not produce a constant canvas
    assert res.samples.std() > 1.0

    if i3d_path is None:
        pytest.skip("i3d_pretrained_400.pt absent — FVD leg skipped")
    from mebt_tpu.eval.fvd import frechet_distance, get_fvd_logits
    from mebt_tpu.eval.i3d import load_i3d

    i3d_model, i3d_params = load_i3d(i3d_path)
    emb = np.asarray(get_fvd_logits(res.samples, i3d_model, i3d_params))
    assert emb.shape[0] == 4
    self_fvd = frechet_distance(emb, emb)
    assert abs(self_fvd) < 1e-3
