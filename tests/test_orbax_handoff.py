"""Trainer orbax checkpoint -> sampling CLI param restore handoff."""

import numpy as np
import jax
import jax.numpy as jnp

from mebt_tpu.models.mebt import MeBT, MeBTConfig
from mebt_tpu.models.vqgan import VQGAN, VQGANConfig
from mebt_tpu.train.trainer import MeBTTrainer

import pytest

pytestmark = pytest.mark.slow  # >60s wall; excluded from the fast CI path

def test_restore_orbax_params_roundtrip(tmp_path):
    config = {
        "model": {
            "params": {
                "vocab_size": 64, "block_size": 32, "n_layer": 2,
                "n_head": 2, "n_embd": 16, "sos_emb": 4,
                "mode": ["latent_enc", "latent_dec"],
            },
            "mask": {"params": {"schedule": "linear", "shape": [2, 4, 4],
                                "budget": 32}},
        },
        "exp": {"exact_lr": 1e-3},
    }
    vq = VQGAN.create(
        jax.random.key(0),
        VQGANConfig(embedding_dim=8, n_codes=64, n_hiddens=4,
                    downsample=(2, 2, 2)),
        example_shape=(1, 2, 8, 8, 3),
    )
    tr = MeBTTrainer(config, logdir=str(tmp_path), vqgan=vq, seed=0)
    state = tr._shard(tr.init_state())
    rng = np.random.default_rng(0)
    batch = {
        "video": rng.uniform(-0.5, 0.5, size=(2, 4, 8, 8, 3)).astype(
            np.float32
        ),
        "indices": np.stack([rng.permutation(32) for _ in range(2)]),
    }
    db = tr.prepare_batch(batch, 0)
    state, _ = tr._jit_step(state, db)
    tr.save(state)

    from mebt_tpu.cli.common import _restore_orbax_params

    model = MeBT(tr.model_cfg)
    params = _restore_orbax_params(model, str(tmp_path / "checkpoints"))
    want = jax.device_get(state.params)
    got_leaves = jax.tree.leaves(params)
    want_leaves = jax.tree.leaves(want)
    assert len(got_leaves) == len(want_leaves)
    for a, b in zip(got_leaves, want_leaves):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
