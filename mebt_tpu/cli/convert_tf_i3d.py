"""Convert the DeepMind TF-Hub I3D (Kinetics-400) weights to this
framework's flax param tree.

Equivalent of the reference's one-off mebt/fvd/convert_tf_pretrained.py
(which converts TF-Hub -> torch; our eval.i3d.load_i3d already ingests
that torch file). This script goes TF -> flax directly. Requires
tensorflow_hub, which is NOT in this image — the script is gated and
documents the name mapping for reproducibility.

  python -m mebt_tpu.cli.convert_tf_i3d --out i3d_400.msgpack
"""

from __future__ import annotations

import argparse

import numpy as np

# flax path -> TF-Hub variable name templates
# (RGB/inception_i3d/<Block>/<unit>/{conv_3d/{w,b}, batch_norm/{beta,
#  moving_mean,moving_variance}})
_BRANCH_NAMES = {
    "b0": "Branch_0/Conv3d_0a_1x1",
    "b1a": "Branch_1/Conv3d_0a_1x1",
    "b1b": "Branch_1/Conv3d_0b_3x3",
    "b2a": "Branch_2/Conv3d_0a_1x1",
    "b2b": "Branch_2/Conv3d_0b_3x3",
    "b3b": "Branch_3/Conv3d_0b_1x1",
}


def _tf_unit(prefix: str, var: dict) -> dict:
    out = {
        # TF conv kernels are already (kd, kh, kw, in, out) = DHWIO
        "kernel": np.asarray(var[f"{prefix}/conv_3d/w"], np.float32),
    }
    if f"{prefix}/conv_3d/b" in var:
        out["bias"] = np.asarray(var[f"{prefix}/conv_3d/b"], np.float32)
    bn = f"{prefix}/batch_norm"
    if f"{bn}/beta" in var:
        c = out["kernel"].shape[-1]
        out["bn_bias"] = np.asarray(var[f"{bn}/beta"], np.float32).reshape(c)
        # TF I3D batch norms have no learned scale (gamma == 1)
        out["bn_scale"] = np.ones(c, np.float32)
        out["bn_mean"] = np.asarray(
            var[f"{bn}/moving_mean"], np.float32
        ).reshape(c)
        out["bn_var"] = np.asarray(
            var[f"{bn}/moving_variance"], np.float32
        ).reshape(c)
    return out


def convert_tf_variables(var: dict) -> dict:
    """var: flat {tf_name: ndarray} from the TF-Hub module."""
    from mebt_tpu.eval.i3d import I3D_STEM

    root = "RGB/inception_i3d"
    params: dict = {}
    for name, kind, _ in I3D_STEM:
        if kind == "conv":
            params[name] = _tf_unit(f"{root}/{name}", var)
        elif kind == "mixed":
            params[name] = {
                ours: _tf_unit(f"{root}/{name}/{tf}", var)
                for ours, tf in _BRANCH_NAMES.items()
            }
    params["logits"] = _tf_unit(f"{root}/Logits/Conv3d_0c_1x1", var)
    return params


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument(
        "--hub_url",
        default="https://tfhub.dev/deepmind/i3d-kinetics-400/1",
    )
    p.add_argument("--out", required=True)
    args = p.parse_args(argv)

    try:
        import tensorflow as tf  # noqa: F401
        import tensorflow_hub as hub
    except ImportError as e:
        raise SystemExit(
            f"tensorflow_hub unavailable ({e}). Run this converter in an "
            "environment with TF, or use eval.i3d.load_i3d on the torch "
            "i3d_pretrained_400.pt file instead."
        )

    module = hub.KerasLayer(args.hub_url)
    var = {v.name.split(":")[0]: v.numpy() for v in module.weights}
    params = convert_tf_variables(var)

    from flax.serialization import msgpack_serialize

    with open(args.out, "wb") as f:
        f.write(msgpack_serialize(params))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
