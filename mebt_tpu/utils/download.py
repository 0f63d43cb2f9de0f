"""Checkpoint acquisition helpers.

Behavioural reference: mebt/download.py — Google-Drive `download()` for
published checkpoints plus `load_vqgan` / `load_transformer` /
`load_i3d_pretrained` wrappers. The loaders live in
mebt_tpu.utils.torch_ckpt (load_vqgan, load_mebt) and
mebt_tpu.eval.i3d (load_i3d); this module keeps the download surface.

Note: zero-egress environments cannot fetch; `download` raises with the
manual instructions in that case.
"""

from __future__ import annotations

import os

# Published checkpoint ids from the reference README (gdrive file ids)
_GDRIVE_URL = "https://docs.google.com/uc?export=download&id={id}"


def download(file_id: str, dest: str, chunk: int = 1 << 20) -> str:
    """Fetch a Google-Drive-hosted checkpoint (reference download.py:30).

    Returns the destination path; raises RuntimeError with manual
    instructions when the network is unreachable.
    """
    if os.path.exists(dest):
        return dest
    os.makedirs(os.path.dirname(os.path.abspath(dest)), exist_ok=True)
    import urllib.request

    url = _GDRIVE_URL.format(id=file_id)
    try:
        with urllib.request.urlopen(url, timeout=30) as r, open(
            dest, "wb"
        ) as f:
            while True:
                buf = r.read(chunk)
                if not buf:
                    break
                f.write(buf)
    except Exception as e:
        raise RuntimeError(
            f"Could not download {url} ({e}). Fetch the checkpoint "
            f"manually (see the reference README) and place it at {dest}."
        ) from e
    return dest


def load_vqgan(path: str, **kw):
    from mebt_tpu.utils.torch_ckpt import load_vqgan as _load

    return _load(path, **kw)


def load_transformer(path: str, **kw):
    from mebt_tpu.utils.torch_ckpt import load_mebt as _load

    return _load(path, **kw)


def load_i3d_pretrained(path: str = "ckpts/i3d_pretrained_400.pt"):
    from mebt_tpu.eval.i3d import load_i3d as _load

    return _load(path)
