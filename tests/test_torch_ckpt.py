"""Checkpoint importer structural tests: synthetic state dicts with the
reference's exact key naming map onto our param trees with the right
shapes and layout conversions."""

import numpy as np
import jax.numpy as jnp
import pytest

from mebt_tpu.models.mebt import MeBT, MeBTConfig
from mebt_tpu.models.vqgan import VQGANConfig
from mebt_tpu.utils.torch_ckpt import (
    import_mebt_params,
    import_vqgan_params,
    strip_ignored,
)


def _mebt_state_dict(cfg: MeBTConfig, rng):
    """Reference parameter names: transformer.py:126-140, gpt.py:198-232."""
    D, V = cfg.n_embd, cfg.vocab_size
    sd = {
        "tok_emb.weight": rng.normal(size=(V, D)).astype(np.float32),
        "mask_emb": rng.normal(size=(1, 1, D)).astype(np.float32),
        "sos_emb": rng.normal(size=(1, cfg.sos_emb, D)).astype(np.float32),
        "pos_emb": rng.normal(size=(1, cfg.block_size, D)).astype(np.float32),
        "transformer.ln_f.weight": np.ones(D, np.float32),
        "transformer.ln_f.bias": np.zeros(D, np.float32),
        "transformer.head.weight": rng.normal(size=(V, D)).astype(np.float32),
    }
    for i in range(cfg.n_layer):
        b = f"transformer.blocks.{i}"
        for ln in ("ln1", "ln2"):
            sd[f"{b}.{ln}.weight"] = np.ones(D, np.float32)
            sd[f"{b}.{ln}.bias"] = np.zeros(D, np.float32)
        for proj in ("query", "key", "value", "proj"):
            sd[f"{b}.attn.{proj}.weight"] = rng.normal(size=(D, D)).astype(
                np.float32
            )
            sd[f"{b}.attn.{proj}.bias"] = np.zeros(D, np.float32)
        sd[f"{b}.mlp.0.weight"] = rng.normal(size=(4 * D, D)).astype(
            np.float32
        )
        sd[f"{b}.mlp.0.bias"] = np.zeros(4 * D, np.float32)
        sd[f"{b}.mlp.2.weight"] = rng.normal(size=(D, 4 * D)).astype(
            np.float32
        )
        sd[f"{b}.mlp.2.bias"] = np.zeros(D, np.float32)
    return sd


def test_import_mebt_params_maps_and_runs():
    cfg = MeBTConfig(
        vocab_size=32, block_size=16, n_layer=2, n_head=2, n_embd=8,
        sos_emb=4, mode=("latent_enc", "latent_dec"), latent_shape=(1, 4, 4),
    )
    rng = np.random.default_rng(0)
    sd = _mebt_state_dict(cfg, rng)
    params = import_mebt_params(sd, cfg)

    # layout conversions: torch Linear (out,in) -> flax (in,out)
    np.testing.assert_array_equal(
        params["transformer"]["block_0"]["attn"]["query"]["kernel"],
        sd["transformer.blocks.0.attn.query.weight"].T,
    )
    np.testing.assert_array_equal(
        params["transformer"]["head"]["kernel"],
        sd["transformer.head.weight"].T,
    )
    np.testing.assert_array_equal(
        params["tok_emb"]["embedding"], sd["tok_emb.weight"]
    )

    # the imported tree is exactly what MeBT.apply expects
    model = MeBT(cfg)
    N = cfg.seq_len
    codes = jnp.zeros((1, N), jnp.int32)
    ctx = jnp.zeros((1, N), bool).at[:, :8].set(True)
    logits = model.apply({"params": params}, codes, ctx, ~ctx)
    assert logits.shape == (1, N, cfg.vocab_size)
    assert bool(jnp.isfinite(logits).all())


def _vqgan_state_dict(cfg: VQGANConfig, rng):
    """Reference parameter names: vqgan.py Encoder/Decoder/ResBlock +
    codebook.py buffers, for downsample (2, 4, 4) -> 2 stages."""
    import math

    n = cfg.n_hiddens
    sd = {}

    def conv(key, cin, cout, k):
        sd[f"{key}.conv.weight"] = rng.normal(
            size=(cout, cin, k, k, k)
        ).astype(np.float32)
        sd[f"{key}.conv.bias"] = np.zeros(cout, np.float32)

    def convt(key, cin, cout, k):
        sd[f"{key}.convt.weight"] = rng.normal(
            size=(cin, cout, k, k, k)
        ).astype(np.float32)
        sd[f"{key}.convt.bias"] = np.zeros(cout, np.float32)

    def norm(key, c):
        sd[f"{key}.weight"] = np.ones(c, np.float32)
        sd[f"{key}.bias"] = np.zeros(c, np.float32)

    def res(key, c):
        norm(f"{key}.norm1", c)
        conv(f"{key}.conv1", c, c, 3)
        norm(f"{key}.norm2", c)
        conv(f"{key}.conv2", c, c, 3)

    stages = max(int(math.log2(d)) for d in cfg.downsample)
    conv("encoder.conv_first", 3, n, 3)
    for i in range(stages):
        conv(f"encoder.conv_blocks.{i}.down", n * 2**i, n * 2 ** (i + 1), 4)
        res(f"encoder.conv_blocks.{i}.res", n * 2 ** (i + 1))
    top = n * 2**stages
    norm("encoder.final_block.0", top)

    norm("decoder.final_block.0", top)
    for i in range(stages):
        cin = top if i == 0 else n * 2 ** (stages - i + 1)
        cout = n * 2 ** (stages - i)
        convt(f"decoder.conv_blocks.{i}.up", cin, cout, 4)
        res(f"decoder.conv_blocks.{i}.res1", cout)
        res(f"decoder.conv_blocks.{i}.res2", cout)
    conv("decoder.conv_last", n * 2, 3, 3)

    conv("pre_vq_conv", top, cfg.embedding_dim, 1)
    conv("post_vq_conv", cfg.embedding_dim, top, 1)
    sd["codebook.embeddings"] = rng.normal(
        size=(cfg.n_codes, cfg.embedding_dim)
    ).astype(np.float32)
    sd["codebook.N"] = np.ones(cfg.n_codes, np.float32)
    sd["codebook.z_avg"] = sd["codebook.embeddings"].copy()
    # extra loss.* keys must be strippable (reference ignore_keys)
    sd["loss.discriminator.weight"] = np.zeros(3, np.float32)
    return sd


def test_import_vqgan_params_maps_and_runs():
    import jax

    cfg = VQGANConfig(
        embedding_dim=4, n_codes=16, n_hiddens=2, downsample=(2, 4, 4)
    )
    rng = np.random.default_rng(1)
    sd = _vqgan_state_dict(cfg, rng)
    sd = strip_ignored(sd, ("loss",))
    assert not any(k.startswith("loss") for k in sd)

    params, codebook = import_vqgan_params(sd, cfg)
    # conv layout: torch (out,in,k,k,k) -> DHWIO
    got = params["encoder"]["conv_first"]["kernel"]
    want = np.transpose(sd["encoder.conv_first.conv.weight"], (2, 3, 4, 1, 0))
    np.testing.assert_array_equal(got, want)

    from mebt_tpu.models.vqgan import VQGAN

    vq = VQGAN(config=cfg, params=params, codebook=codebook)
    video = jnp.zeros((1, 3, 4, 16, 16), jnp.float32)
    codes = vq.encode(video)
    assert codes.shape == (1, 2, 4, 4)
    recon = vq.decode(codes)
    assert recon.shape == video.shape
    assert bool(jnp.isfinite(recon).all())


def test_downsample_consistency_check():
    from mebt_tpu.utils.torch_ckpt import _check_downsample_consistency

    cfg = VQGANConfig(
        embedding_dim=4, n_codes=16, n_hiddens=2, downsample=(2, 4, 4)
    )
    sd = _vqgan_state_dict(cfg, np.random.default_rng(2))
    _check_downsample_consistency(sd, (2, 4, 4))  # 2 stages, ok
    _check_downsample_consistency(sd, (4, 4, 4))  # also 2 stages
    with pytest.raises(ValueError):
        _check_downsample_consistency(sd, (4, 8, 8))  # needs 3 stages


def test_dnr_draft_name_parse():
    """Reference dnr script:119-132 filename parsing, hardened for
    multi-digit / decimal ctemps (the reference's [:3] slice breaks on
    'ctemp12.5linear')."""
    from mebt_tpu.cli.dnr import parse_draft_name

    for name, want in [
        ("VID_n_steps32_temp1.0_ctemp8.0linear_maskgit_cosine_run0.npy",
         (32, "_ctemp8.0")),
        ("VID_n_steps64_temp1.0_ctemp12.5linear_maskgit_cosine_run3.npy",
         (64, "_ctemp12.5")),
        ("VID_n_steps128_temp1.0_ctemp6.0linear_maskgit_cosine_run1.npy",
         (128, "_ctemp6.0")),
        ("some_codemap.npy", (0, "")),
    ]:
        assert parse_draft_name(name) == want
