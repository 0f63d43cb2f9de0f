"""Import the reference implementation (/root/reference/mebt) read-only
as a parity oracle.

The reference package `__init__` pulls pytorch_lightning / torchvision /
skvideo, none of which ship in this image — so we register the package
manually (bypassing `mebt/__init__.py`) and stub the missing modules.
Only class *definitions* are exercised; nothing that would download
weights is constructed.

Nothing from the reference is vendored; modules are executed from
/root/reference at test time only.
"""

from __future__ import annotations

import sys
import types

REF_ROOT = "/root/reference/mebt"


def _stub_module(name: str, **attrs) -> None:
    if name in sys.modules:
        return
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    if "." in name:
        parent, child = name.rsplit(".", 1)
        if parent in sys.modules:
            setattr(sys.modules[parent], child, mod)


def load_reference_module(name: str):
    """Import `refmebt.<name>` (e.g. 'modules.gpt', 'vqgan',
    'mask_sampler') with dependency stubs in place."""
    import importlib

    import torch.nn as nn

    _stub_module(
        "pytorch_lightning",
        LightningModule=nn.Module,
        LightningDataModule=object,
        Callback=object,
    )
    _stub_module("torchvision")
    _stub_module("torchvision.models")
    _stub_module("skvideo")
    _stub_module("skvideo.io")

    if "refmebt" not in sys.modules:
        pkg = types.ModuleType("refmebt")
        pkg.__path__ = [REF_ROOT]
        pkg.__package__ = "refmebt"
        sys.modules["refmebt"] = pkg

    return importlib.import_module(f"refmebt.{name}")
