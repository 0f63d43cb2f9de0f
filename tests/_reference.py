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


def _ref_instantiate_from_config(config):
    """Stub for the reference's top-level `utils.instantiate_from_config`
    (reference utils.py:3-14): resolves `mebt.*` targets against the
    refmebt package so Net2NetTransformer can build its MaskGen."""
    target = config["target"]
    modname, cls = target.rsplit(".", 1)
    modname = modname.replace("tats.", "mebt.")
    assert modname.startswith("mebt."), target
    mod = load_reference_module(modname[len("mebt."):])
    return getattr(mod, cls)(**dict(config.get("params", {})))


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
    _stub_module("pytorch_lightning.callbacks", ModelCheckpoint=object)
    _stub_module("torchvision")
    _stub_module("torchvision.models")
    _stub_module("skvideo")
    _stub_module("skvideo.io")
    _stub_module("utils", instantiate_from_config=_ref_instantiate_from_config)

    if "refmebt" not in sys.modules:
        pkg = types.ModuleType("refmebt")
        pkg.__path__ = [REF_ROOT]
        pkg.__package__ = "refmebt"
        sys.modules["refmebt"] = pkg

    return importlib.import_module(f"refmebt.{name}")


def load_reference_script(filename: str):
    """Execute a top-level reference script (e.g.
    'sample_vqgan_transformer_videos.py') as a module, with its heavy
    imports stubbed, so its in-file decode loops (bidirect_sample,
    extrapolate) can be driven directly as the parity oracle."""
    import importlib.util

    # the scripts import the aggregate `mebt` package, matplotlib, and
    # imageio; none of those symbols are touched by the loop functions.
    # The stubs are TRANSIENT — other tests (test_time_reference) import
    # the real `mebt` package and must not see these.
    load_reference_module("transformer")  # installs shared stubs
    modname = "refscript_" + filename.replace(".py", "")
    if modname in sys.modules:
        return sys.modules[modname]

    names = {
        "mebt": dict(VideoData=None, Net2NetTransformer=None,
                     load_vqgan=None, load_transformer=None,
                     download=None),
        "mebt.utils": dict(save_video_grid=None, shift_dim=None),
        "mebt.data": dict(preprocess=None),
        "matplotlib": {},
        "matplotlib.pyplot": {},
        "imageio": {},
        "omegaconf": dict(OmegaConf=None),
    }
    added = []
    for name, attrs in names.items():
        if name not in sys.modules:
            _stub_module(name, **attrs)
            added.append(name)
    try:
        spec = importlib.util.spec_from_file_location(
            modname, f"/root/reference/{filename}"
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[modname] = mod
        spec.loader.exec_module(mod)
    finally:
        for name in added:
            sys.modules.pop(name, None)
    return mod


def make_reference_net2net(
    *,
    vocab_size: int,
    block_size: int,
    n_layer: int,
    n_head: int,
    n_embd: int,
    sos_emb: int,
    mode: list,
    shape: tuple,
    budget: int | None = None,
    schedule: str = "cosine",
    avg_loss: float = 1.0,
    label_smoothing: float = 0.0,
    t_prior: str = "longest",
    seed: int = 0,
):
    """Build a tiny reference Net2NetTransformer (transformer.py:60-146)
    on the vtokens path (no VQGAN checkpoint required) with a test shim
    supplying the Lightning affordances the stubbed base class lacks."""
    import argparse

    import torch

    ref_tr = load_reference_module("transformer")

    class _RefNet(ref_tr.Net2NetTransformer):
        # shim the Lightning surface the nn.Module stub base lacks;
        # everything algorithmic runs the genuine reference code
        global_step = 0

        def save_hyperparameters(self):
            pass

        @property
        def device(self):
            return torch.device("cpu")

        def init_first_stage_from_ckpt(self, config):
            # vtokens path minus the hardcoded 16384 vocab
            # (transformer.py:193-195) so tiny vocabs are testable
            self.first_stage_model = None
            self.first_stage_vocab_size = self.config.vocab_size

    N = block_size

    class _P:  # attribute+mapping view for mask_config
        def __init__(self, d):
            self.__dict__.update(d)
            self._d = d

        def __getitem__(self, k):
            return self._d[k]

        def get(self, k, default=None):
            return self._d.get(k, default)

        def __contains__(self, k):
            return k in self._d

        def keys(self):
            return self._d.keys()

    tcfg = argparse.Namespace(
        vocab_size=vocab_size, block_size=N, n_layer=n_layer,
        n_head=n_head, n_embd=n_embd, sos_emb=sos_emb, mode=list(mode),
        class_cond_dim=None, unconditional=True, vtokens=True,
        vtokens_pos=False, n_unmasked=0, vis_epoch=1000,
        embd_pdrop=0.0, resid_pdrop=0.0, attn_pdrop=0.0,
        avg_loss=avg_loss, label_smoothing=label_smoothing,
        t_prior=t_prior,
    )
    mask_params = dict(
        method="mlm", schedule=schedule, shape=list(shape),
        budget=N if budget is None else budget, max_token=N,
        t_range=[0.0, 1.0], iid=False,
    )
    mask_cfg = _P(
        {"target": "mebt.mask_sampler.MaskGen", "params": _P(mask_params)}
    )
    torch.manual_seed(seed)
    model = _RefNet(tcfg, None, mask_cfg)
    model.eval()
    return model
