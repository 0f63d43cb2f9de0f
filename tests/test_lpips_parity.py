"""LPIPS parity vs the reference module (mebt/modules/lpips.py).

The reference ships its five learned lin-layer tensors in-repo
(mebt/modules/cache/vgg.pth); the VGG16 *backbone* weights come from
torchvision's model zoo, which this image cannot reach. The parity
test therefore shares one randomly-initialized VGG16 backbone between
the torch reference and the flax port: that pins the architecture,
the scaling layer, the normalize/diff/lin/spatial-average math, and
the real lin weights — everything except the backbone blob itself.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from _reference import _stub_module, load_reference_module  # noqa: E402

from mebt_tpu.models.lpips import (  # noqa: E402
    LPIPS,
    VGG_SLICES,
    import_lpips_params,
)

LIN_PATH = "/root/reference/mebt/modules/cache/vgg.pth"

pytestmark = [
    pytest.mark.skipif(
        not os.path.exists(LIN_PATH), reason="reference lin weights absent"
    ),
    pytest.mark.slow,  # >60s wall; excluded from the fast CI path
]


def _random_torch_vgg16(seed: int = 0):
    """torchvision-layout vgg16 `.features` stack with random weights
    (torchvision vgg16 features numbering, indices 0..30)."""
    import torch.nn as nn

    torch.manual_seed(seed)
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512, "M"]
    layers, c_in = [], 3
    for v in cfg:
        if v == "M":
            layers.append(nn.MaxPool2d(kernel_size=2, stride=2))
        else:
            layers.append(nn.Conv2d(c_in, v, kernel_size=3, padding=1))
            layers.append(nn.ReLU(inplace=False))
            c_in = v
    net = nn.Module()
    net.features = nn.Sequential(*layers)
    return net


def _reference_lpips(backbone):
    """Reference LPIPS with the torchvision zoo call routed to the
    shared random backbone; lin weights load from the in-repo blob."""
    _stub_module("torchvision")
    _stub_module("torchvision.models")
    import sys

    sys.modules["torchvision.models"].vgg16 = lambda **kw: backbone
    sys.modules["torchvision"].models = sys.modules["torchvision.models"]
    ref_lpips = load_reference_module("modules.lpips")
    return ref_lpips.LPIPS().eval()


def test_lpips_matches_reference_with_real_lin_weights():
    backbone = _random_torch_vgg16(seed=3)
    ref = _reference_lpips(backbone)

    vgg_sd = {
        f"features.{k}": v.detach().numpy()
        for k, v in backbone.features.state_dict().items()
    }
    lin_sd = {
        k: v.numpy()
        for k, v in torch.load(LIN_PATH, map_location="cpu").items()
    }
    params = import_lpips_params(vgg_sd, lin_sd)

    rng = np.random.default_rng(7)
    x = rng.uniform(-1, 1, size=(2, 3, 64, 64)).astype(np.float32)
    y = rng.uniform(-1, 1, size=(2, 3, 64, 64)).astype(np.float32)

    with torch.no_grad():
        want = ref(torch.from_numpy(x), torch.from_numpy(y))
    want = want.numpy().reshape(-1)

    got = LPIPS().apply(
        {"params": params},
        np.transpose(x, (0, 2, 3, 1)),
        np.transpose(y, (0, 2, 3, 1)),
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)


def test_lpips_zero_for_identical_inputs():
    backbone = _random_torch_vgg16(seed=5)
    vgg_sd = {
        f"features.{k}": v.detach().numpy()
        for k, v in backbone.features.state_dict().items()
    }
    lin_sd = {
        k: v.numpy()
        for k, v in torch.load(LIN_PATH, map_location="cpu").items()
    }
    params = import_lpips_params(vgg_sd, lin_sd)
    x = np.random.default_rng(0).uniform(
        -1, 1, size=(1, 32, 32, 3)
    ).astype(np.float32)
    got = np.asarray(LPIPS().apply({"params": params}, x, x))
    np.testing.assert_allclose(got, 0.0, atol=1e-7)


def test_real_lin_weights_are_nonnegative_and_shaped():
    """The published LPIPS lin weights are nonneg (the metric is a sum
    of weighted squared distances); guards the importer's reshape."""
    lin_sd = {
        k: v.numpy()
        for k, v in torch.load(LIN_PATH, map_location="cpu").items()
    }
    chans = [64, 128, 256, 512, 512]
    for i, c in enumerate(chans):
        w = lin_sd[f"lin{i}.model.1.weight"]
        assert w.shape == (1, c, 1, 1)
        assert (w >= 0).all()


def test_vgg_slices_cover_torchvision_numbering():
    """VGG_SLICES must enumerate exactly the 13 conv indices of
    torchvision vgg16 .features."""
    want = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    got = [i for convs in VGG_SLICES for i in convs]
    assert got == want
