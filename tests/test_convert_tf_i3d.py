"""Pin the TF-Hub -> flax I3D name/tensor mapping without TensorFlow.

`cli/convert_tf_i3d.convert_tf_variables` is a pure function over a
flat {tf_variable_name: ndarray} dict (the reference's equivalent
one-off converter: mebt/fvd/convert_tf_pretrained.py:9-63). The test
synthesizes a TF-style variable dict with the exact TF-Hub naming
scheme and shapes derived from the flax model's own init tree, converts
it, and asserts the result is structurally identical to the model's
params with values passed through verbatim.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mebt_tpu.cli.convert_tf_i3d import _BRANCH_NAMES, convert_tf_variables
from mebt_tpu.eval.i3d import I3D_STEM, InceptionI3d

ROOT = "RGB/inception_i3d"


def _init_shapes():
    model = InceptionI3d(400)
    tree = jax.eval_shape(
        lambda r: model.init(r, jnp.zeros((1, 16, 224, 224, 3))),
        jax.random.key(0),
    )["params"]
    return jax.tree.map(lambda s: s.shape, tree)


def _fill(shape, counter):
    n = int(np.prod(shape))
    a = (np.arange(counter[0], counter[0] + n, dtype=np.float32) % 97) / 97.0
    counter[0] += n
    return a.reshape(shape)


def _tf_unit_vars(prefix, unit_shapes, counter, var):
    """Emit TF-Hub-style variables for one Unit3D from its flax shapes."""
    var[f"{prefix}/conv_3d/w"] = _fill(unit_shapes["kernel"], counter)
    if "bias" in unit_shapes:
        var[f"{prefix}/conv_3d/b"] = _fill(unit_shapes["bias"], counter)
    if "bn_bias" in unit_shapes:
        c = unit_shapes["kernel"][-1]
        # TF stores BN stats as (1, 1, 1, 1, C); the converter must
        # reshape them to (C,)
        var[f"{prefix}/batch_norm/beta"] = _fill((1, 1, 1, 1, c), counter)
        var[f"{prefix}/batch_norm/moving_mean"] = _fill(
            (1, 1, 1, 1, c), counter
        )
        var[f"{prefix}/batch_norm/moving_variance"] = (
            np.abs(_fill((1, 1, 1, 1, c), counter)) + 0.5
        )


def _synthetic_tf_vars(shapes):
    var: dict = {}
    counter = [0]
    for name, kind, _ in I3D_STEM:
        if kind == "conv":
            _tf_unit_vars(f"{ROOT}/{name}", shapes[name], counter, var)
        elif kind == "mixed":
            for ours, tf in _BRANCH_NAMES.items():
                _tf_unit_vars(
                    f"{ROOT}/{name}/{tf}", shapes[name][ours], counter, var
                )
    _tf_unit_vars(f"{ROOT}/Logits/Conv3d_0c_1x1", shapes["logits"], counter,
                  var)
    return var


def test_convert_tf_variables_matches_model_tree():
    shapes = _init_shapes()
    var = _synthetic_tf_vars(shapes)
    params = convert_tf_variables(var)

    got = jax.tree.map(lambda a: np.asarray(a).shape, params)
    assert got == shapes, "converted tree != model init tree"

    # value passthrough: conv kernels land verbatim (TF is already DHWIO)
    np.testing.assert_array_equal(
        params["Conv3d_1a_7x7"]["kernel"],
        var[f"{ROOT}/Conv3d_1a_7x7/conv_3d/w"],
    )
    np.testing.assert_array_equal(
        params["Mixed_4d"]["b2b"]["kernel"],
        var[f"{ROOT}/Mixed_4d/Branch_2/Conv3d_0b_3x3/conv_3d/w"],
    )
    # BN stats are reshaped (1,1,1,1,C) -> (C,); TF I3D has no learned
    # gamma, so bn_scale must come out as ones
    bn = f"{ROOT}/Mixed_3b/Branch_0/Conv3d_0a_1x1/batch_norm"
    np.testing.assert_array_equal(
        params["Mixed_3b"]["b0"]["bn_bias"], var[f"{bn}/beta"].reshape(-1)
    )
    np.testing.assert_array_equal(
        params["Mixed_3b"]["b0"]["bn_mean"],
        var[f"{bn}/moving_mean"].reshape(-1),
    )
    np.testing.assert_array_equal(
        params["Mixed_3b"]["b0"]["bn_var"],
        var[f"{bn}/moving_variance"].reshape(-1),
    )
    np.testing.assert_array_equal(
        params["Mixed_3b"]["b0"]["bn_scale"],
        np.ones_like(params["Mixed_3b"]["b0"]["bn_bias"]),
    )
    # logits head: bias present, no BN entries
    assert "bias" in params["logits"]
    assert "bn_bias" not in params["logits"]


def test_converted_params_drive_the_model():
    """The converted tree is accepted by InceptionI3d.apply (shape-level
    check via eval_shape — no heavyweight 224px forward needed)."""
    shapes = _init_shapes()
    params = convert_tf_variables(_synthetic_tf_vars(shapes))
    model = InceptionI3d(400)
    out = jax.eval_shape(
        lambda p, x: model.apply({"params": p}, x),
        params,
        jnp.zeros((2, 16, 224, 224, 3)),
    )
    assert out.shape == (2, 400)


def test_missing_variable_is_loud():
    shapes = _init_shapes()
    var = _synthetic_tf_vars(shapes)
    del var[f"{ROOT}/Mixed_5c/Branch_1/Conv3d_0b_3x3/conv_3d/w"]
    with pytest.raises(KeyError):
        convert_tf_variables(var)
