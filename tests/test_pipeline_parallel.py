"""Pipeline parallelism (parallel/pp.py) must reproduce the unsharded
forward/backward exactly: logits, loss, and parameter gradients pinned
against the dense model on a virtual CPU mesh (2 data x 4 pipe)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mebt_tpu.models.mebt import MeBT, MeBTConfig, mlm_loss
from mebt_tpu.parallel.mesh import make_mesh
from mebt_tpu.parallel.pp import pp_logits, pp_loss_fn

pytestmark = pytest.mark.slow  # >60s wall; excluded from the fast CI path

@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(data=2, model=1, pipe=4)


def _setup(mode):
    cfg = MeBTConfig(
        vocab_size=32,
        block_size=48,
        n_layer=4,
        n_head=2,
        n_embd=16,
        sos_emb=4,
        mode=mode,
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
    rng = np.random.default_rng(3)
    B = 8
    codes = jnp.asarray(rng.integers(0, 32, size=(B, N)), jnp.int32)
    # per-row heterogeneous context/target split
    ctx = np.zeros((B, N), bool)
    for b in range(B):
        ctx[b, rng.permutation(N)[: 8 + b]] = True
    tgt = ~ctx
    return model, params, codes, jnp.asarray(ctx), jnp.asarray(tgt)


def test_pp_logits_match_dense(mesh):
    model, params, codes, ctx, tgt = _setup(
        ("latent_enc", "latent_self", "latent_dec", "lt2l")
    )
    dense = model.apply({"params": params}, codes, ctx, tgt)
    pp = jax.jit(
        lambda p: pp_logits(model, p, codes, ctx, tgt, mesh, n_micro=4)
    )(params)
    np.testing.assert_allclose(np.asarray(pp), np.asarray(dense), atol=1e-5)


def test_pp_supports_maskgit_blocks(mesh):
    # mode list shorter than n_layer pads with maskgit (full token
    # self-attention) — shard-local per microbatch, so PP supports it
    # (unlike SP, which rejects it)
    model, params, codes, ctx, tgt = _setup(("latent_enc", "latent_dec"))
    dense = model.apply({"params": params}, codes, ctx, tgt)
    pp = jax.jit(
        lambda p: pp_logits(model, p, codes, ctx, tgt, mesh, n_micro=2)
    )(params)
    np.testing.assert_allclose(np.asarray(pp), np.asarray(dense), atol=1e-5)


def test_pp_training_dropout(mesh):
    """Training-mode dropout through the pipeline: deterministic in the
    key, varying across keys, and gradients stay finite."""
    import dataclasses

    model, params, codes, ctx, tgt = _setup(
        ("latent_enc", "latent_self", "latent_dec", "lt2l")
    )
    model = MeBT(
        dataclasses.replace(
            model.config, embd_pdrop=0.1, attn_pdrop=0.1, resid_pdrop=0.1
        )
    )
    N = codes.shape[1]
    batch = {
        "codes": codes,
        "ctx_mask": ctx,
        "tgt_mask": tgt,
        "seq_len": jnp.float32(N),
        "masked_weight": jnp.float32(N - 8),
    }
    loss_fn = pp_loss_fn(model, mesh, n_micro=4, avg_loss=1.0)
    step = jax.jit(
        jax.value_and_grad(
            lambda p, b, r: loss_fn(p, b, r), has_aux=True
        )
    )
    (l1, _), g1 = step(params, batch, jax.random.key(1))
    (l1b, _), _ = step(params, batch, jax.random.key(1))
    (l2, _), _ = step(params, batch, jax.random.key(2))
    assert float(l1) == float(l1b)
    assert float(l1) != float(l2)
    for leaf in jax.tree.leaves(g1):
        assert np.isfinite(np.asarray(leaf, dtype=np.float32)).all()


@pytest.mark.parametrize("remat", [False, True])
def test_pp_loss_and_grads_match_dense(mesh, remat):
    model, params, codes, ctx, tgt = _setup(
        ("latent_enc", "latent_self", "latent_dec", "lt2l")
    )
    N = codes.shape[1]
    batch = {
        "codes": codes,
        "ctx_mask": ctx,
        "tgt_mask": tgt,
        "seq_len": jnp.float32(N),
        "masked_weight": jnp.float32(N - 8),
    }

    def dense_loss(p):
        logits = model.apply({"params": p}, codes, ctx, tgt)
        return mlm_loss(
            logits, codes, tgt, batch["seq_len"], batch["masked_weight"],
            avg_loss=1.0,
        )[0]

    loss_fn = pp_loss_fn(model, mesh, n_micro=4, avg_loss=1.0, remat=remat)
    (loss_pp, _), grads_pp = jax.jit(
        jax.value_and_grad(lambda p, b: loss_fn(p, b), has_aux=True)
    )(params, batch)
    loss_d, grads_d = jax.value_and_grad(dense_loss)(params)

    np.testing.assert_allclose(float(loss_pp), float(loss_d), rtol=1e-6)
    flat_pp = jax.tree_util.tree_leaves_with_path(grads_pp)
    flat_d = {
        jax.tree_util.keystr(k): v
        for k, v in jax.tree_util.tree_leaves_with_path(grads_d)
    }
    assert len(flat_pp) == len(flat_d)
    for key, g in flat_pp:
        np.testing.assert_allclose(
            np.asarray(g),
            np.asarray(flat_d[jax.tree_util.keystr(key)]),
            atol=1e-5,
            err_msg=jax.tree_util.keystr(key),
        )


def test_pp_pipeline_layout_shards_param_memory(mesh):
    """The pipeline layout (to_pp_params + pp_param_specs) must (a)
    round-trip exactly, (b) reproduce the replicated-layout logits and
    gradients, and (c) actually shard the block parameters: each device
    stores 1/pipe of the stacked block tree (the module's 1/S parameter
    memory claim)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mebt_tpu.parallel.pp import (
        from_pp_params,
        pp_param_specs,
        to_pp_params,
    )

    model, params, codes, ctx, tgt = _setup(
        ("latent_enc", "latent_self", "latent_dec", "lt2l")
    )
    L = model.config.n_layer
    pp_params = to_pp_params(params, L)
    rt = from_pp_params(pp_params, L)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        params, rt,
    )
    specs = pp_param_specs(pp_params)
    pp_sharded = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        pp_params, specs,
    )
    # (c): each device holds exactly L/pipe of every stacked leaf
    S = mesh.shape["pipe"]
    leaf = jax.tree.leaves(pp_sharded["blocks"])[0]
    assert leaf.shape[0] == L
    shard_shapes = {tuple(s.data.shape) for s in leaf.addressable_shards}
    assert shard_shapes == {(L // S,) + leaf.shape[1:]}

    dense = model.apply({"params": params}, codes, ctx, tgt)
    out = jax.jit(
        lambda p: pp_logits(model, p, codes, ctx, tgt, mesh, n_micro=4)
    )(pp_sharded)
    np.testing.assert_allclose(np.asarray(out), np.asarray(dense), atol=1e-5)

    # gradients flow in the pipeline layout (what a 1/S train state sees)
    N = codes.shape[1]
    batch = {
        "codes": codes,
        "ctx_mask": ctx,
        "tgt_mask": tgt,
        "seq_len": jnp.float32(N),
        "masked_weight": jnp.float32(N - 8),
    }
    loss_fn = pp_loss_fn(model, mesh, n_micro=4, avg_loss=1.0)
    (loss_pp, _), grads_pp = jax.jit(
        jax.value_and_grad(lambda p, b: loss_fn(p, b), has_aux=True)
    )(pp_sharded, batch)
    (loss_ref, _), grads_ref = jax.jit(
        jax.value_and_grad(lambda p, b: loss_fn(p, b), has_aux=True)
    )(params, batch)
    np.testing.assert_allclose(float(loss_pp), float(loss_ref), rtol=1e-6)
    grads_ref_pp = to_pp_params(grads_ref, L)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5
        ),
        grads_pp, grads_ref_pp,
    )


def test_pp_composes_with_tp_and_zero1():
    """Combined-axes training step: DP x TP x PP on one (2,2,2) mesh,
    ZeRO-1 sharded optimizer state. Loss and updated params must match
    the dense single-device step (the three strategies are individually
    pinned elsewhere; this composes them)."""
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mebt_tpu.parallel.mesh import zero1_specs
    from mebt_tpu.parallel.pp import (
        pp_param_specs,
        to_pp_params,
    )

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh_c = make_mesh(data=2, model=2, pipe=2)

    model, params, codes, ctx, tgt = _setup(
        ("latent_enc", "latent_self", "latent_dec", "lt2l")
    )
    L = model.config.n_layer
    N = codes.shape[1]
    batch = {
        "codes": codes,
        "ctx_mask": ctx,
        "tgt_mask": tgt,
        "seq_len": jnp.float32(N),
        "masked_weight": jnp.float32(N - 8),
    }

    tx = optax.adamw(1e-3)
    loss_fn = pp_loss_fn(model, mesh_c, n_micro=2, avg_loss=1.0)

    def train_step(p, opt, b):
        (loss, _), grads = jax.value_and_grad(
            lambda q: loss_fn(q, b), has_aux=True
        )(p)
        updates, opt = tx.update(grads, opt, p)
        return optax.apply_updates(p, updates), opt, loss

    # combined layout: blocks P('pipe', *tp), nonpipe TP, opt state
    # additionally ZeRO-1-sharded over 'data'
    pp_params = to_pp_params(params, L)
    pspecs = pp_param_specs(pp_params, tp=True)
    opt0 = tx.init(pp_params)
    ospecs = jax.tree.map(lambda _: P(), opt0)
    ospecs = zero1_specs(
        {"opt_state": opt0}, {"opt_state": ospecs}, mesh_c, min_size=64
    )["opt_state"]
    p_sh = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh_c, s)),
        pp_params, pspecs,
    )
    o_sh = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh_c, s)),
        opt0, ospecs,
    )
    # ZeRO actually sharded something
    zshards = [
        s for s in jax.tree.leaves(
            ospecs, is_leaf=lambda x: isinstance(x, P)
        ) if "data" in [a for a in s if isinstance(a, str)]
    ]
    assert zshards, "zero1_specs sharded no optimizer leaf"

    p1, o1, loss_c = jax.jit(train_step)(p_sh, o_sh, batch)

    # dense single-logical-device step for comparison
    def dense_loss(q, b):
        logits = model.apply({"params": q}, b["codes"], b["ctx_mask"],
                             b["tgt_mask"])
        return mlm_loss(
            logits, b["codes"], b["tgt_mask"], b["seq_len"],
            b["masked_weight"], avg_loss=1.0,
        )[0]

    def dense_step(q, opt, b):
        loss, grads = jax.value_and_grad(dense_loss)(q, b)
        updates, opt = tx.update(grads, opt, q)
        return optax.apply_updates(q, updates), opt, loss

    d1, _, loss_d = jax.jit(dense_step)(params, tx.init(params), batch)
    np.testing.assert_allclose(float(loss_c), float(loss_d), rtol=1e-6)
    d1_pp = to_pp_params(d1, L)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5
        ),
        p1, d1_pp,
    )
