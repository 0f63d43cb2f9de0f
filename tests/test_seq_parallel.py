"""Sequence (context) parallelism exactness on a virtual CPU mesh.

The token canvas is sharded over a 'seq' mesh axis and the forward runs
inside shard_map with flash-style partial-softmax merges for the
token-keyed attention modes (parallel/sp.py, ops/attention.py
sp_masked_attention). These tests pin bit-level behaviour against the
unsharded forward: logits, loss, and parameter gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mebt_tpu.models.mebt import MeBT, MeBTConfig, mlm_loss
from mebt_tpu.parallel.mesh import make_mesh
from mebt_tpu.parallel.sp import sp_forward, sp_loss_fn

pytestmark = pytest.mark.slow  # >60s wall; excluded from the fast CI path

MODES = (
    "latent_enc", "latent_self", "latent_enc",
    "latent_dec", "lt2l", "latent_dec",
)


@pytest.fixture(scope="module")
def setup():
    cfg = MeBTConfig(
        vocab_size=64,
        block_size=48,
        n_layer=len(MODES),
        n_head=2,
        n_embd=16,
        sos_emb=8,
        latent_shape=(3, 4, 4),
        mode=MODES,
    )
    model = MeBT(cfg)
    N = cfg.seq_len
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((2, N), jnp.int32),
        jnp.zeros((2, N), bool),
        jnp.zeros((2, N), bool),
    )["params"]
    rng = np.random.default_rng(1)
    B = 2
    codes = jnp.asarray(rng.integers(0, 64, size=(B, N)), jnp.int32)
    ctx = jnp.asarray(rng.random((B, N)) < 0.4)
    tgt = ~ctx
    return model, params, codes, ctx, tgt


@pytest.mark.parametrize("seq", [2, 4])
def test_sp_logits_match_dense(setup, seq):
    model, params, codes, ctx, tgt = setup
    mesh = make_mesh(data=2, model=1, seq=seq,
                     devices=jax.devices()[: 2 * seq])
    dense = model.apply({"params": params}, codes, ctx, tgt)
    sp = sp_forward(model, params, codes, ctx, tgt, mesh)
    np.testing.assert_allclose(
        np.asarray(sp), np.asarray(dense), atol=2e-5, rtol=2e-5
    )


def test_sp_grads_match_dense(setup):
    model, params, codes, ctx, tgt = setup
    N = model.config.seq_len
    mesh = make_mesh(data=2, model=1, seq=4)
    batch = {
        "codes": codes, "ctx_mask": ctx, "tgt_mask": tgt,
        "seq_len": jnp.float32(N),
        "masked_weight": jnp.float32(int(np.asarray(tgt).sum(-1)[0])),
    }

    def dense_loss(p):
        logits = model.apply({"params": p}, batch["codes"],
                             batch["ctx_mask"], batch["tgt_mask"])
        return mlm_loss(
            logits, batch["codes"], batch["tgt_mask"], batch["seq_len"],
            batch["masked_weight"], avg_loss=1.0,
        )[0]

    sp_fn = sp_loss_fn(model, mesh, avg_loss=1.0)
    l_d, g_d = jax.value_and_grad(dense_loss)(params)
    l_s, g_s = jax.value_and_grad(lambda p: sp_fn(p, batch)[0])(params)
    np.testing.assert_allclose(float(l_s), float(l_d), rtol=1e-6)
    flat_d = jax.tree_util.tree_leaves_with_path(g_d)
    flat_s = dict(jax.tree_util.tree_leaves_with_path(g_s))
    for path, gd in flat_d:
        gs = flat_s[path]
        np.testing.assert_allclose(
            np.asarray(gs), np.asarray(gd), atol=3e-6, rtol=3e-5,
            err_msg=str(path),
        )


@pytest.mark.parametrize("strategy,top_k", [
    ("maskgit", None), ("maskgit", 8), ("bootstrap", None),
])
def test_sp_decode_matches_dense(setup, strategy, top_k):
    """SP decode with plan-global promotion: under shared noise the
    decoded codes and context masks equal the unsharded dense scan."""
    from mebt_tpu.parallel.sp import sp_maskgit_sample
    from mebt_tpu.sampler.decode import maskgit_sample
    from mebt_tpu.sampler.mask_schedule import maskgit_plan

    model, params, codes, ctx, tgt = setup
    N = model.config.seq_len
    B = codes.shape[0]
    S = 6
    plan = maskgit_plan(N, S, schedule="cosine", ctemp_schedule="linear")
    rng = np.random.default_rng(7)
    # Exp(1) sampling noise / promotion noise (interpreted as N(0,1)
    # scores on the bootstrap path — inert distinction for equality)
    s_noise = rng.exponential(size=(S, B, N, 64)).astype(np.float32)
    p_noise = rng.exponential(size=(S, B, N)).astype(np.float32)

    dense = maskgit_sample(
        model, params, jax.random.PRNGKey(3), B, plan,
        temperature=1.0, top_k=top_k, context_temperature=4.0,
        strategy=strategy, staged=False,
        sample_noise=s_noise, promote_noise=p_noise,
    )
    mesh = make_mesh(data=2, model=1, seq=4)
    sp_codes, sp_ctx, sp_chosen = sp_maskgit_sample(
        model, params, jax.random.PRNGKey(3), B, plan, mesh,
        temperature=1.0, top_k=top_k, context_temperature=4.0,
        strategy=strategy,
        sample_noise=s_noise, promote_noise=p_noise,
    )
    np.testing.assert_array_equal(np.asarray(sp_codes),
                                  np.asarray(dense.codes))
    np.testing.assert_array_equal(np.asarray(sp_ctx),
                                  np.asarray(dense.ctx_mask))
    np.testing.assert_allclose(
        np.asarray(sp_chosen), np.asarray(dense.chosen_prob),
        atol=1e-4, rtol=1e-3,
    )


def test_sp_decode_production_path_runs(setup):
    """No-hook production path: internal per-shard-folded PRNG streams;
    asserts every row promotes exactly the plan's global total (the
    plan-global promotion is not applied per shard) with in-range
    codes."""
    from mebt_tpu.parallel.sp import sp_maskgit_sample
    from mebt_tpu.sampler.mask_schedule import maskgit_plan

    model, params, *_ = setup
    N = model.config.seq_len
    B = 4
    plan = maskgit_plan(N, 4, schedule="cosine", ctemp_schedule="linear")
    mesh = make_mesh(data=2, model=1, seq=4)
    sp_codes, sp_ctx, _ = sp_maskgit_sample(
        model, params, jax.random.PRNGKey(11), B, plan, mesh,
        temperature=1.0, top_k=8, context_temperature=4.0,
    )
    np.testing.assert_array_equal(
        np.asarray(sp_ctx).sum(-1), int(np.asarray(plan.n_new).sum())
    )
    c = np.asarray(sp_codes)
    assert ((c >= 0) & (c < model.config.vocab_size)).all()


def test_sp_decode_rejects_entp(setup):
    from mebt_tpu.parallel.sp import sp_maskgit_sample
    from mebt_tpu.sampler.mask_schedule import maskgit_plan

    model, params, *_ = setup
    plan = maskgit_plan(model.config.seq_len, 4)
    mesh = make_mesh(data=2, model=1, seq=4)
    with pytest.raises(NotImplementedError, match="maskgit/random"):
        sp_maskgit_sample(
            model, params, jax.random.PRNGKey(0), 2, plan, mesh,
            strategy="entp",
        )


def test_sp_rejects_maskgit(setup):
    model, params, codes, ctx, tgt = setup
    cfg = MeBTConfig(
        vocab_size=64, block_size=48, n_layer=2, n_head=2, n_embd=16,
        sos_emb=8, latent_shape=(3, 4, 4), mode=("maskgit", "maskgit"),
    )
    m2 = MeBT(cfg)
    p2 = m2.init(jax.random.PRNGKey(0), codes, ctx, tgt)["params"]
    mesh = make_mesh(data=2, model=1, seq=4)
    with pytest.raises(Exception, match="sequence parallelism"):
        np.asarray(sp_forward(m2, p2, codes, ctx, tgt, mesh))


def test_sp_dropout_runs_and_differs_across_shards(setup):
    """Training-mode embd/resid dropout under SP: per-shard folded keys
    produce a valid forward whose expectation path differs from the
    deterministic one (smoke; exactness is meaningless under dropout)."""
    model, params, codes, ctx, tgt = setup
    import dataclasses

    cfg = dataclasses.replace(model.config, resid_pdrop=0.3)
    m2 = MeBT(cfg)
    mesh = make_mesh(data=2, model=1, seq=4)
    out = sp_forward(
        m2, params, codes, ctx, tgt, mesh, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(5)},
    )
    det = sp_forward(m2, params, codes, ctx, tgt, mesh)
    assert np.isfinite(np.asarray(out)).all()
    assert not np.allclose(np.asarray(out), np.asarray(det))


def test_sp_dropout_latent_stream_coherent_across_shards(setup):
    """The latent stream is replicated over 'seq'; under training
    dropout every seq shard must apply IDENTICAL masks to it (the
    'dropout_lat' stream folds only the data index) or the
    partial-softmax merge sums attention partials belonging to
    different query tensors. Asserts the final latent-updating block's
    output is bit-identical on all seq shards."""
    import dataclasses
    from functools import partial

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from mebt_tpu.parallel.sp import sp_dropout_rngs, sp_model

    model, params, codes, ctx, tgt = setup
    cfg = dataclasses.replace(
        model.config, resid_pdrop=0.5, embd_pdrop=0.5
    )
    msp = sp_model(MeBT(cfg))
    mesh = make_mesh(data=2, model=1, seq=4)
    pspecs = jax.tree.map(lambda _: P(), params)
    key = jax.random.PRNGKey(11)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(pspecs, P("data", "seq"), P("data", "seq"),
                  P("data", "seq")),
        out_specs=P("seq", "data"),
        check_vma=False,
    )
    def latents_per_shard(params, codes, c, t):
        _, inter = msp.apply(
            {"params": params}, codes, c, t,
            deterministic=False, rngs=sp_dropout_rngs(key),
            capture_intermediates=True, mutable=["intermediates"],
        )
        # block_4 is lt2l — the last latent-updating block in MODES;
        # its __call__ output is (latents, tokens)
        lat = inter["intermediates"]["transformer"]["block_4"][
            "__call__"
        ][0][0]
        return lat[None]

    out = np.asarray(latents_per_shard(params, codes, ctx, tgt))
    assert out.shape[0] == 4
    for s in range(1, 4):
        np.testing.assert_array_equal(out[s], out[0])
