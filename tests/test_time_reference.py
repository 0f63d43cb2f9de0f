"""Smoke-test scripts/time_reference.py against the in-image reference
copy (torch-cpu + dependency stubs, --toy sizes). On the real CUDA
environment the script runs unmodified; this test pins that the harness
still drives the reference's own bidirect_sample end-to-end."""

import json
import sys

import pytest

from tests._reference import _stub_module

pytestmark = pytest.mark.slow  # >60s wall; excluded from the fast CI path

@pytest.fixture()
def reference_on_path(monkeypatch):
    import torch.nn as nn

    class _LightningModule(nn.Module):
        # the two Lightning surfaces the reference's __init__/sampling
        # paths touch
        def save_hyperparameters(self, *a, **k):
            pass

        def log(self, *a, **k):
            pass

        @property
        def device(self):
            import torch

            p = next(self.parameters(), None)
            return p.device if p is not None else torch.device("cpu")

    _stub_module(
        "pytorch_lightning",
        LightningModule=_LightningModule,
        LightningDataModule=object,
        Callback=object,
    )
    # _stub_module no-ops if an earlier test (e.g. reference-parity)
    # already registered a barer pytorch_lightning stub — force the
    # richer LightningModule in either case (class bases bind at the
    # `import mebt` below, which only this test performs)
    monkeypatch.setattr(
        sys.modules["pytorch_lightning"], "LightningModule",
        _LightningModule, raising=False,
    )
    _stub_module("pytorch_lightning.callbacks", ModelCheckpoint=object)
    _stub_module("torchvision")
    _stub_module("torchvision.models")
    _stub_module("torchvision.datasets")
    _stub_module("torchvision.datasets.video_utils", VideoClips=object)
    _stub_module("torchvision.io", read_video=None)
    _stub_module("skvideo")
    _stub_module("skvideo.io")
    _stub_module("omegaconf", OmegaConf=object)
    monkeypatch.syspath_prepend("/root/reference")
    monkeypatch.syspath_prepend("scripts")
    pytest.importorskip("mebt", reason="reference copy not importable")
    yield


def test_time_reference_toy_recipe(reference_on_path, monkeypatch, capsys):
    import time_reference

    monkeypatch.setattr(
        sys, "argv",
        ["time_reference.py", "--device", "cpu", "--recipe", "stl16f",
         "--toy", "--runs", "1"],
    )
    time_reference.main()
    line = capsys.readouterr().out.strip().splitlines()[-1]
    out = json.loads(line)
    assert out["metric"] == "reference_stl16f_generation_throughput"
    assert out["value"] > 0
    assert out["unit"] == "videos/sec/device"


@pytest.mark.slow
def test_time_reference_toy_128f_recipe(reference_on_path, monkeypatch,
                                        capsys):
    """Toy 128f recipe: exercises the bootstrap + top-k path of the
    reference driver through the harness."""
    import time_reference

    monkeypatch.setattr(
        sys, "argv",
        ["time_reference.py", "--device", "cpu", "--recipe", "stl128f",
         "--toy", "--runs", "1"],
    )
    time_reference.main()
    line = capsys.readouterr().out.strip().splitlines()[-1]
    out = json.loads(line)
    assert out["metric"] == "reference_stl128f_generation_throughput"
    assert out["value"] > 0
