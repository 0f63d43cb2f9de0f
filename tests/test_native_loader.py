"""Native C++ frame decoder vs PIL reference path."""

import numpy as np
import pytest

from mebt_tpu.data import native


@pytest.fixture
def image_files(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(0)
    paths = []
    # non-square so the center-crop path is exercised; jpeg + png
    img = rng.integers(0, 255, size=(24, 32, 3), dtype=np.uint8)
    p_png = tmp_path / "a.png"
    Image.fromarray(img).save(p_png)
    p_jpg = tmp_path / "b.jpg"
    Image.fromarray(img).save(p_jpg, quality=95)
    return [str(p_png), str(p_jpg)], img


def _pil_reference(path, resolution):
    from PIL import Image

    img = Image.open(path)
    h, w = img.height, img.width
    if h > w:
        half = (h - w) // 2
        img = img.crop((0, half, w, half + w))
    elif w > h:
        half = (w - h) // 2
        img = img.crop((half, 0, half + h, h))
    if img.size != (resolution, resolution):
        img = img.resize((resolution, resolution), Image.BILINEAR)
    return np.asarray(img.convert("RGB"), np.float32) / 255.0 - 0.5


def test_native_matches_pil(image_files):
    if not native.available():
        pytest.skip("native loader not built")
    paths, _ = image_files
    out = native.decode_clip(paths, resolution=16)
    assert out is not None
    assert out.shape == (2, 16, 16, 3)
    assert out.dtype == np.float32
    for i, p in enumerate(paths):
        want = _pil_reference(p, 16)
        # triangle-filter resampling approximates PIL's bilinear; jpeg
        # adds its own decode differences
        diff = np.abs(out[i] - want)
        assert diff.mean() < 0.02, f"{p}: mean diff {diff.mean()}"


def test_native_identity_resolution(image_files, tmp_path):
    if not native.available():
        pytest.skip("native loader not built")
    from PIL import Image

    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, size=(16, 16, 3), dtype=np.uint8)
    p = tmp_path / "sq.png"
    Image.fromarray(img).save(p)
    out = native.decode_clip([str(p)], resolution=16)
    # square input at target resolution: exact round-trip
    np.testing.assert_allclose(
        out[0], img.astype(np.float32) / 255.0 - 0.5, atol=1e-6
    )


def test_native_missing_file_returns_none():
    if not native.available():
        pytest.skip("native loader not built")
    assert native.decode_clip(["/nonexistent/x.png"], 16) is None
