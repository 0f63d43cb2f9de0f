"""Missing LPIPS weights must be a hard error in VQGAN training.

The reference always trains its VQGAN with the perceptual term
(mebt/vqgan.py:186-189); silently dropping it produces a different
model. cli/train_vqgan exits loudly when perceptual_weight > 0 and the
VGG weights can't be loaded, unless --no_perceptual explicitly opts
out.
"""

import pytest

from mebt_tpu.cli import train_vqgan


BASE = [
    "--data_path", "/nonexistent/dataset/path",
    "--image_folder",
    "--perceptual_weight", "4.0",
    "--vgg_path", "/nonexistent/vgg16.pth",
]


def test_missing_lpips_is_a_hard_error():
    with pytest.raises(SystemExit) as e:
        train_vqgan.main(BASE)
    assert "LPIPS" in str(e.value)
    assert "--no_perceptual" in str(e.value)


def test_no_perceptual_opts_out(capsys):
    # With the explicit opt-out the LPIPS gate is passed; the run then
    # fails later on the bogus data path — any non-LPIPS error proves
    # the gate released.
    with pytest.raises(BaseException) as e:
        train_vqgan.main(BASE + ["--no_perceptual"])
    assert "LPIPS" not in str(e.value)
    assert "--no_perceptual: training with perceptual_weight=0" in (
        capsys.readouterr().out
    )
