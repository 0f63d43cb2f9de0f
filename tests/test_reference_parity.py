"""Numerical parity against the ACTUAL reference torch modules.

The reference implementation at /root/reference is imported read-only
(tests/_reference.py) and driven with random weights; its state dicts
flow through the production importers (mebt_tpu/utils/torch_ckpt.py) so
these tests prove both (a) the flax modules compute the same function
and (b) the checkpoint name/layout mapping is correct end-to-end —
no published weight blobs required.

Covered (VERDICT round-1 item 1):
  * GPT (gpt.py:198-253) logits parity per block-mode list, incl. the
    canonical 24-layer routing and the NC=0 all-masked case.
  * VQGAN Encoder/Decoder/SamePadConv/Codebook (vqgan.py:263-413,
    codebook.py:48-97): exact code-index equality + decode parity.
  * Codebook EMA training update (codebook.py:66-89) buffer parity.
  * Codebook data-dependent init (codebook.py:34-51) with a shared
    permutation.
  * gumbel_top_k / generate_next_mask (mask_sampler.py:178-237) with
    shared Exp(1) noise -> identical promoted sets.
  * mask-ratio schedules (mask_sampler.py:34-67).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tests._reference import load_reference_module  # noqa: E402

B = 2


def _sd_numpy(module) -> dict:
    return {k: v.detach().numpy().copy() for k, v in module.state_dict().items()}


# =============================================================================
# GPT


MODE_LISTS = {
    "enc_self_dec": ["latent_enc", "latent_self", "latent_dec"],
    "lt2l_dec": ["latent_enc", "lt2l", "latent_dec"],
    "maskgit_only": ["maskgit", "maskgit"],
    "pad_default": ["latent_enc", "latent_dec"],  # padded with maskgit
    "mixed": ["latent_enc", "latent_self", "maskgit", "lt2l", "latent_dec"],
}


def _gpt_parity(modes, NC, NT, n_layer=None, pad_modes=True):
    ref_gpt = load_reference_module("modules.gpt")
    V, C, NS, H = 96, 64, 8, 4
    n_layer = n_layer if n_layer is not None else len(modes)
    N = NC + NT

    torch.manual_seed(0)
    ref = ref_gpt.GPT(
        vocab_size=V, block_size=N, n_layer=n_layer, n_head=H, n_embd=C,
        embd_pdrop=0.0, resid_pdrop=0.0, attn_pdrop=0.0, mode=list(modes),
    ).eval()

    rng = np.random.default_rng(1)
    sos = rng.normal(size=(B, NS, C)).astype(np.float32)
    ctx = rng.normal(size=(B, NC, C)).astype(np.float32)
    tgt = rng.normal(size=(B, NT, C)).astype(np.float32)

    with torch.no_grad():
        want, _ = ref(
            torch.from_numpy(sos),
            torch.from_numpy(ctx),
            torch.from_numpy(tgt),
            torch.zeros(1, 1, C),
        )
    want = want.numpy()  # (B, NT, V)

    # route the real state dict through the production importer
    sd = {f"transformer.{k}": v for k, v in _sd_numpy(ref).items()}
    sd["tok_emb.weight"] = rng.normal(size=(V, C)).astype(np.float32)
    sd["mask_emb"] = rng.normal(size=(1, 1, C)).astype(np.float32)
    sd["sos_emb"] = rng.normal(size=(1, NS, C)).astype(np.float32)
    sd["pos_emb"] = rng.normal(size=(1, N, C)).astype(np.float32)

    from mebt_tpu.models.mebt import MeBTConfig
    from mebt_tpu.models.transformer import LatentTransformer
    from mebt_tpu.utils.torch_ckpt import import_mebt_params

    cfg = MeBTConfig(
        vocab_size=V, block_size=N, n_layer=n_layer, n_head=H, n_embd=C,
        sos_emb=NS, mode=tuple(modes),
    )
    params = import_mebt_params(sd, cfg)

    model = LatentTransformer(
        vocab_size=V, n_layer=n_layer, n_head=H, n_embd=C, mode=tuple(modes)
    )
    tokens = jnp.asarray(np.concatenate([ctx, tgt], axis=1))
    ctx_mask = jnp.asarray(
        np.arange(N)[None, :].repeat(B, 0) < NC
    )
    tgt_mask = ~ctx_mask
    got = model.apply(
        {"params": params["transformer"]},
        jnp.asarray(sos), tokens, ctx_mask, tgt_mask,
    )
    got = np.asarray(got)[:, NC:, :]

    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


@pytest.mark.parametrize("name", sorted(MODE_LISTS))
def test_gpt_logits_match_reference(name):
    modes = MODE_LISTS[name]
    n_layer = len(modes) + (1 if name == "pad_default" else 0)
    _gpt_parity(modes, NC=20, NT=12, n_layer=n_layer)


def test_gpt_logits_match_reference_no_context():
    _gpt_parity(MODE_LISTS["enc_self_dec"], NC=0, NT=16)


def test_gpt_logits_match_reference_canonical_routing():
    """The 24-layer mode list from configs/stl/mebt_16f.yaml at reduced
    width (value-identical mode sequence)."""
    from mebt_tpu.config import load_yaml

    cfg = load_yaml("configs/stl/mebt_16f.yaml")
    modes = list(cfg.model.params.mode)
    assert len(modes) == 24
    _gpt_parity(modes, NC=18, NT=14)


# =============================================================================
# VQGAN encoder / decoder / codebook


def _build_ref_vqgan_parts(n_hiddens=32, downsample=(4, 8, 8),
                           embedding_dim=8, n_codes=64):
    ref_vq = load_reference_module("vqgan")
    ref_cb = load_reference_module("modules.codebook")
    torch.manual_seed(0)
    enc = ref_vq.Encoder(n_hiddens, list(downsample), 3, "group", "replicate")
    dec = ref_vq.Decoder(n_hiddens, list(downsample), 3, "group")
    pre = ref_vq.SamePadConv3d(enc.out_channels, embedding_dim, 1,
                               padding_type="replicate")
    post = ref_vq.SamePadConv3d(embedding_dim, enc.out_channels, 1)
    cb = ref_cb.Codebook(n_codes, embedding_dim)
    cb._need_init = False
    for m in (enc, dec, pre, post, cb):
        m.eval()

    sd = {}
    for prefix, mod in (
        ("encoder", enc), ("decoder", dec),
        ("pre_vq_conv", pre), ("post_vq_conv", post), ("codebook", cb),
    ):
        for k, v in _sd_numpy(mod).items():
            sd[f"{prefix}.{k}"] = v
    return (enc, dec, pre, post, cb), sd


def _import_vqgan(sd, **cfg_kw):
    from mebt_tpu.models.vqgan import VQGAN, VQGANConfig
    from mebt_tpu.utils.torch_ckpt import import_vqgan_params

    cfg = VQGANConfig(**cfg_kw)
    params, codebook = import_vqgan_params(sd, cfg)
    params = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), params)
    return VQGAN(config=cfg, params=params, codebook=codebook)


def test_vqgan_encode_decode_match_reference():
    (enc, dec, pre, post, cb), sd = _build_ref_vqgan_parts()
    vq = _import_vqgan(
        sd, embedding_dim=8, n_codes=64, n_hiddens=32, downsample=(4, 8, 8)
    )

    rng = np.random.default_rng(2)
    x = (rng.random(size=(B, 3, 4, 16, 16)).astype(np.float32) - 0.5)

    with torch.no_grad():
        h = pre(enc(torch.from_numpy(x)))
        out = cb(h)
        want_codes = out["encodings"].numpy()
        want_recon = dec(post(out["embeddings"])).numpy()

    got_codes = np.asarray(vq.encode(jnp.asarray(x)))
    # exact nearest-code equality (codebook.py:53-57)
    np.testing.assert_array_equal(got_codes, want_codes)

    got_recon = np.asarray(vq.decode(jnp.asarray(got_codes)))
    np.testing.assert_allclose(got_recon, want_recon, atol=2e-4, rtol=1e-4)

    # commitment loss (codebook.py:64)
    from mebt_tpu.models.vqgan import codebook_quantize

    z = jnp.moveaxis(
        jnp.asarray(h.detach().numpy()), 1, -1
    )
    _, _, aux = codebook_quantize(vq.codebook, z)
    np.testing.assert_allclose(
        float(aux["commitment_loss"]),
        float(out["commitment_loss"]),
        atol=1e-6, rtol=1e-5,
    )
    np.testing.assert_allclose(
        float(aux["perplexity"]), float(out["perplexity"]),
        atol=1e-4, rtol=1e-5,
    )


def test_codebook_ema_update_matches_reference():
    """One training-mode forward: EMA buffers N / z_avg / embeddings
    (codebook.py:66-80), restart disabled to keep it deterministic."""
    ref_cb = load_reference_module("modules.codebook")
    torch.manual_seed(3)
    cb = ref_cb.Codebook(32, 8, no_random_restart=True)
    cb._need_init = False
    cb.train()

    z = torch.randn(B, 8, 1, 3, 3)
    before = {k: v.clone() for k, v in cb.state_dict().items()}
    with torch.no_grad():
        out = cb(z)

    from mebt_tpu.models.vqgan import (
        CodebookState,
        codebook_ema_update,
        codebook_quantize,
    )

    state = CodebookState(
        embeddings=jnp.asarray(before["embeddings"].numpy()),
        cluster_size=jnp.asarray(before["N"].numpy()),
        z_avg=jnp.asarray(before["z_avg"].numpy()),
    )
    zj = jnp.moveaxis(jnp.asarray(z.numpy()), 1, -1)
    codes, _, _ = codebook_quantize(state, zj)
    np.testing.assert_array_equal(
        np.asarray(codes), out["encodings"].numpy()
    )
    new = codebook_ema_update(
        state, zj, codes, jax.random.key(0), no_random_restart=True
    )
    np.testing.assert_allclose(
        np.asarray(new.cluster_size), cb.N.numpy(), atol=1e-6, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(new.z_avg), cb.z_avg.numpy(), atol=1e-6, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(new.embeddings), cb.embeddings.numpy(),
        atol=1e-5, rtol=1e-5,
    )


def test_codebook_data_init_matches_reference(monkeypatch):
    """_init_embeddings (codebook.py:34-51) with a shared (identity)
    permutation; d >= n_codes so no tiling noise is involved."""
    ref_cb = load_reference_module("modules.codebook")
    torch.manual_seed(4)
    cb = ref_cb.Codebook(16, 8)
    cb.train()

    monkeypatch.setattr(
        ref_cb.torch, "randperm", lambda n, **kw: torch.arange(n)
    )
    z = torch.randn(B, 8, 2, 3, 3)  # 36 flat rows >= 16 codes
    with torch.no_grad():
        cb._init_embeddings(z)

    from mebt_tpu.models.vqgan import CodebookState, codebook_init_from_data

    state = CodebookState.create(jax.random.key(0), 16, 8)
    zj = jnp.moveaxis(jnp.asarray(z.numpy()), 1, -1)
    new = codebook_init_from_data(
        state, zj, perm=jnp.arange(zj.reshape(-1, 8).shape[0])
    )
    np.testing.assert_allclose(
        np.asarray(new.embeddings), cb.embeddings.numpy(), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(new.z_avg), cb.z_avg.numpy(), atol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(new.cluster_size), np.ones(16, np.float32)
    )


# =============================================================================
# Mask sampler: gumbel_top_k / generate_next_mask


class _FixedNoise:
    def __init__(self, q):
        self.q = q

    def exponential_(self):
        return self.q.clone()


def test_generate_next_mask_matches_reference(monkeypatch):
    """Shared Exp(1) noise -> identical promoted target sets
    (mask_sampler.py:178-237 vs ops/sampling.py promote_targets)."""
    ref_ms = load_reference_module("mask_sampler")
    NC, NT = 5, 11
    N = NC + NT
    n_masked = 8  # n_new = (N - n_masked) - NC = 3
    ctemp = 4.5

    rng = np.random.default_rng(5)
    perms = np.stack([rng.permutation(N) for _ in range(B)])
    ctx_idx = perms[:, :NC]
    tgt_idx = perms[:, NC:]
    score = rng.random((B, NT)).astype(np.float32) + 1e-3
    q = rng.exponential(size=(B, NT)).astype(np.float32)

    monkeypatch.setattr(
        ref_ms.torch, "empty_like",
        lambda x: _FixedNoise(torch.from_numpy(q)),
    )
    gen = ref_ms.MaskGen(shape=(1, 4, 4), budget=N)
    next_ctx, next_tgt = gen.generate_next_mask(
        torch.from_numpy(ctx_idx), torch.from_numpy(tgt_idx),
        torch.from_numpy(score), t=0.5,
        context_temperature=ctemp,
        n_masked_toks=torch.full((B,), n_masked),
    )
    want_promoted = [
        set(next_ctx[b, NC:].numpy().tolist()) for b in range(B)
    ]
    # sanity: promoted + remaining targets partition the old target set
    for b in range(B):
        assert want_promoted[b] | set(
            next_tgt[b].numpy().tolist()
        ) == set(tgt_idx[b].tolist())

    from mebt_tpu.ops.sampling import promote_targets

    scores_full = np.zeros((B, N), np.float32)
    noise_full = np.ones((B, N), np.float32)
    tgt_mask = np.zeros((B, N), bool)
    for b in range(B):
        scores_full[b, tgt_idx[b]] = score[b]
        noise_full[b, tgt_idx[b]] = q[b]
        tgt_mask[b, tgt_idx[b]] = True

    promote = promote_targets(
        jax.random.key(0),
        jnp.asarray(scores_full),
        jnp.asarray(tgt_mask),
        jnp.asarray(N - n_masked - NC),
        jnp.asarray(ctemp, jnp.float32),
        noise=jnp.asarray(noise_full),
    )
    got_promoted = [
        set(np.nonzero(np.asarray(promote)[b])[0].tolist()) for b in range(B)
    ]
    assert got_promoted == want_promoted


def test_schedules_match_reference():
    ref_ms = load_reference_module("mask_sampler")
    from mebt_tpu.sampler.mask_schedule import schedule_fn

    t = np.linspace(0.0, 1.0, 21, dtype=np.float32)
    for name in ("cosine", "cosine_plus", "linear", "quadratic",
                 "square", "cube", "sqrt", "convex"):
        want = getattr(ref_ms.MaskGen, name)(torch.from_numpy(t)).numpy()
        got = np.asarray(schedule_fn(name)(t), np.float32)
        np.testing.assert_allclose(got, want, atol=1e-6)
