"""I3D `final_endpoint` truncation (reference pytorch_i3d.py:200-228):
building the network up to a named stem layer returns that layer's
globally average-pooled features instead of logits."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mebt_tpu.eval.i3d import I3D_STEM, InceptionI3d


def _channels_at(endpoint: str) -> int:
    ch = 3
    for name, kind, spec in I3D_STEM:
        if kind == "conv":
            ch = spec[0]
        elif kind == "mixed":
            ch = spec[0] + spec[2] + spec[4] + spec[5]
        if name == endpoint:
            return ch
    raise AssertionError(endpoint)


@pytest.mark.parametrize("endpoint", ["Conv3d_2c_3x3", "Mixed_3c"])
def test_truncated_endpoint_shape(endpoint):
    # truncated nets don't need 224x224: Mixed_3c only downsamples x8
    model = InceptionI3d(400, final_endpoint=endpoint)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 8, 32, 32, 3)), jnp.float32
    )
    params = model.init(jax.random.key(0), x)["params"]
    out = model.apply({"params": params}, x)
    assert out.shape == (2, _channels_at(endpoint))
    assert np.isfinite(np.asarray(out)).all()
    # no params are created past the endpoint
    assert "logits" not in params
    assert "Mixed_4b" not in params


def test_unknown_endpoint_raises():
    model = InceptionI3d(400, final_endpoint="Mixed_9z")
    x = jnp.zeros((1, 8, 32, 32, 3))
    with pytest.raises(ValueError, match="Unknown final endpoint"):
        model.init(jax.random.key(0), x)
