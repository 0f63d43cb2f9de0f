"""Sharded execution tests on the 8-virtual-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mebt_tpu.models.mebt import MeBT, MeBTConfig
from mebt_tpu.parallel.mesh import make_mesh, shard_pytree, batch_sharding
from mebt_tpu.sampler.decode import maskgit_sample
from mebt_tpu.sampler.mask_schedule import maskgit_plan

pytestmark = pytest.mark.slow  # >60s wall; excluded from the fast CI path

@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(model=2)


def test_sharded_decode(mesh):
    cfg = MeBTConfig(
        vocab_size=32, block_size=48, n_layer=2, n_head=2, n_embd=16,
        sos_emb=4, mode=("latent_enc", "latent_dec"), latent_shape=(3, 4, 4),
    )
    model = MeBT(cfg)
    N = cfg.seq_len
    params = model.init(
        jax.random.key(0),
        jnp.zeros((1, N), jnp.int32),
        jnp.zeros((1, N), bool),
        jnp.zeros((1, N), bool),
    )["params"]

    plan = maskgit_plan(N, 6, "cosine")
    B = 8  # divisible by the 4-wide data axis

    # single-device reference
    st_ref = maskgit_sample(model, params, jax.random.key(1), B, plan)

    # sharded: params TP over 'model', batch over 'data'
    sharded_params = shard_pytree(params, mesh)
    st = maskgit_sample(model, sharded_params, jax.random.key(1), B, plan)
    np.testing.assert_array_equal(
        np.asarray(st.codes), np.asarray(st_ref.codes)
    )
    assert np.asarray(st.ctx_mask).sum() == np.asarray(st_ref.ctx_mask).sum()


def test_sharded_params_forward_matches(mesh):
    cfg = MeBTConfig(
        vocab_size=32, block_size=48, n_layer=2, n_head=2, n_embd=16,
        sos_emb=4, mode=("latent_enc", "lt2l"), latent_shape=(3, 4, 4),
    )
    model = MeBT(cfg)
    N = cfg.seq_len
    rng = np.random.default_rng(0)
    codes = jnp.asarray(rng.integers(0, 32, size=(8, N)), jnp.int32)
    ctx = jnp.zeros((8, N), bool).at[:, :16].set(True)

    params = model.init(jax.random.key(0), codes, ctx, ~ctx)["params"]
    want = model.apply({"params": params}, codes, ctx, ~ctx)

    sp = shard_pytree(params, mesh)
    sc = jax.device_put(codes, batch_sharding(mesh))
    got = jax.jit(
        lambda p, c, m1, m2: model.apply({"params": p}, c, m1, m2)
    )(sp, sc, ctx, ~ctx)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5
    )


def test_sharded_staged_vs_dense_decode(mesh):
    """The staged compaction path (gathers/scatters + two-stage apply)
    must compose with TP+DP sharding identically to the dense scan."""
    cfg = MeBTConfig(
        vocab_size=32, block_size=48, n_layer=4, n_head=2, n_embd=16,
        sos_emb=4, mode=("latent_enc", "latent_self", "latent_dec", "lt2l"),
        latent_shape=(3, 4, 4),
    )
    model = MeBT(cfg)
    N = cfg.seq_len
    params = model.init(
        jax.random.key(0),
        jnp.zeros((1, N), jnp.int32),
        jnp.zeros((1, N), bool),
        jnp.zeros((1, N), bool),
    )["params"]
    plan = maskgit_plan(N, 5, "cosine")
    B = 8
    sharded_params = shard_pytree(params, mesh)
    kw = dict(temperature=0.0, context_temperature=0.0)  # deterministic
    st_staged = maskgit_sample(
        model, sharded_params, jax.random.key(2), B, plan, staged=True, **kw
    )
    st_dense = maskgit_sample(
        model, sharded_params, jax.random.key(2), B, plan, staged=False, **kw
    )
    np.testing.assert_array_equal(
        np.asarray(st_staged.codes), np.asarray(st_dense.codes)
    )


def test_zero1_training_matches_replicated(mesh):
    """ZeRO-1 (optimizer moments sharded over the data axis,
    parallel/mesh.py:zero1_specs) must not change the training
    trajectory, and must actually shard the AdamW moments."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mebt_tpu.parallel.mesh import (
        mebt_param_rules, spec_for_tree, zero1_specs,
    )
    from mebt_tpu.train.train_state import (
        TrainState, make_optimizer, make_train_step,
    )

    cfg = MeBTConfig(
        vocab_size=32, block_size=48, n_layer=2, n_head=2, n_embd=16,
        sos_emb=4, mode=("latent_enc", "latent_dec"), latent_shape=(3, 4, 4),
    )
    model = MeBT(cfg)
    N = cfg.seq_len
    params = model.init(
        jax.random.key(0),
        jnp.zeros((1, N), jnp.int32),
        jnp.zeros((1, N), bool),
        jnp.zeros((1, N), bool),
    )["params"]
    tx = make_optimizer(exact_lr=1e-3)
    step_fn = make_train_step(model, tx)

    rng = np.random.default_rng(0)
    B = 8
    batch = {
        "codes": jnp.asarray(rng.integers(0, 32, size=(B, N)), jnp.int32),
        "ctx_mask": jnp.zeros((B, N), bool).at[:, :16].set(True),
        "tgt_mask": jnp.zeros((B, N), bool).at[:, 16:].set(True),
        "seq_len": jnp.float32(N),
        "masked_weight": jnp.float32(N - 16),
    }

    def run(zero1):
        state = TrainState.create(
            jax.random.key(7, impl="threefry2x32"), params, tx
        )
        specs = spec_for_tree(state, mebt_param_rules())
        if zero1:
            specs = zero1_specs(state, specs, mesh, min_size=8)
        shardings = jax.tree.map(
            lambda s: NamedSharding(mesh, s), specs,
            is_leaf=lambda x: isinstance(x, P),
        )
        state = jax.device_put(state, shardings)
        jit_step = jax.jit(
            step_fn, in_shardings=(shardings, None),
            out_shardings=(shardings, None),
        )
        losses = []
        for _ in range(3):
            state, metrics = jit_step(state, batch)
            losses.append(float(metrics["loss"]))
        return losses, state

    losses_ref, _ = run(zero1=False)
    losses_z, state_z = run(zero1=True)
    np.testing.assert_allclose(losses_z, losses_ref, rtol=1e-5)

    # the AdamW mu moment for a Dense kernel must be sharded over 'data'
    mu_specs = [
        s.spec
        for leaf, s in zip(
            jax.tree.leaves(state_z.opt_state),
            jax.tree.leaves(
                jax.tree.map(
                    lambda x: x.sharding, state_z.opt_state
                )
            ),
        )
        if getattr(leaf, "ndim", 0) >= 2 and leaf.size >= 8
    ]
    assert any("data" in [a for a in sp if a] for sp in mu_specs), mu_specs


def test_sharded_gibbs_revise(mesh):
    from mebt_tpu.sampler.decode import draft_and_revise

    cfg = MeBTConfig(
        vocab_size=32, block_size=48, n_layer=2, n_head=2, n_embd=16,
        sos_emb=4, mode=("latent_enc", "latent_dec"), latent_shape=(3, 4, 4),
    )
    model = MeBT(cfg)
    N = cfg.seq_len
    params = model.init(
        jax.random.key(0),
        jnp.zeros((1, N), jnp.int32),
        jnp.zeros((1, N), bool),
        jnp.zeros((1, N), bool),
    )["params"]
    codes0 = jax.random.randint(jax.random.key(3), (8, N), 0, 32)
    sharded_params = shard_pytree(params, mesh)
    out_ref = draft_and_revise(
        model, params, jax.random.key(4), codes0,
        n_revise=4, revise_t=0.0, M=1, skip_draft=True,
    )
    out = draft_and_revise(
        model, sharded_params, jax.random.key(4), codes0,
        n_revise=4, revise_t=0.0, M=1, skip_draft=True,
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out_ref))
