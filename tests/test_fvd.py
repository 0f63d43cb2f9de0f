"""FVD stack tests: I3D parity vs the reference torch implementation
(imported read-only from /root/reference for comparison), and metric
math checks."""

import sys

import numpy as np
import pytest

from mebt_tpu.eval.fvd import (
    frechet_distance,
    polynomial_mmd,
    preprocess,
)

pytestmark = pytest.mark.slow  # >60s wall; excluded from the fast CI path

torch = pytest.importorskip("torch")


@pytest.mark.slow
def test_i3d_matches_reference_torch():
    # load the reference file directly (its package __init__ needs
    # pytorch_lightning, which this image doesn't ship)
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_pytorch_i3d", "/root/reference/mebt/fvd/pytorch_i3d.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    TorchI3d = mod.InceptionI3d

    torch.manual_seed(0)
    ref = TorchI3d(400, in_channels=3).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    from mebt_tpu.eval.i3d import InceptionI3d, import_i3d_params

    model = InceptionI3d(400)
    params = import_i3d_params(sd)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 16, 224, 224, 3)).astype(np.float32)

    with torch.no_grad():
        want = ref(torch.from_numpy(np.transpose(x, (0, 4, 1, 2, 3)))).numpy()
    got = np.asarray(model.apply({"params": params}, x))
    assert got.shape == want.shape == (1, 400)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_preprocess_shape_and_range():
    v = np.random.default_rng(1).integers(
        0, 255, size=(2, 4, 32, 32, 3), dtype=np.uint8
    )
    out = preprocess(v)
    assert out.shape == (2, 4, 224, 224, 3)
    assert out.min() >= -1.0 and out.max() <= 1.0


def test_frechet_distance_properties():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(500, 16))
    assert frechet_distance(x, x.copy()) == pytest.approx(0.0, abs=1e-6)
    y = rng.normal(loc=2.0, size=(500, 16))
    d = frechet_distance(x, y)
    assert d > 16 * 3.0  # mean shift alone contributes ~16 * 4

    # cross-check the matrix sqrt against scipy on SPD matrices
    from scipy.linalg import sqrtm

    a = rng.normal(size=(16, 16))
    spd = a @ a.T + 16 * np.eye(16)
    from mebt_tpu.eval.fvd import _symmetric_matrix_square_root

    np.testing.assert_allclose(
        _symmetric_matrix_square_root(spd), sqrtm(spd), rtol=1e-6, atol=1e-8
    )


def test_polynomial_mmd_matches_sklearn_formula():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(40, 8))
    y = rng.normal(size=(30, 8))
    got = polynomial_mmd(x, y)

    # independent direct computation with sklearn-default kernel params
    gamma = 1.0 / 8
    kxx = (gamma * x @ x.T + 1.0) ** 3
    kyy = (gamma * y @ y.T + 1.0) ** 3
    kxy = (gamma * x @ y.T + 1.0) ** 3
    m, n = 40, 30
    want = (
        (kxx.sum() - np.diag(kxx).sum()) / (m * (m - 1))
        + (kyy.sum() - np.diag(kyy).sum()) / (n * (n - 1))
        - 2 * kxy.mean()
    )
    assert got == pytest.approx(want, rel=1e-10)
    assert polynomial_mmd(x, x.copy()) < polynomial_mmd(x, y + 3.0)
