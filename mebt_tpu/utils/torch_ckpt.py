"""PyTorch/Lightning checkpoint ingestion (no GPU, torch-cpu only).

Reference checkpoint surfaces we must read (SURVEY.md §5 checkpoint row):
  * TATS VQGAN checkpoints (frozen stage 1), loaded with
    ignore_keys=['loss'] (reference transformer.py:170-192,
    configs/*/mebt_*.yaml `vqvae.params`)
  * published MeBT Lightning checkpoints (reference download.py:50-61)

Weight-layout conversions:
  * torch Linear (out, in)            -> flax Dense kernel (in, out)
  * torch Conv3d (out, in, kd,kh,kw)  -> DHWIO kernel (kd,kh,kw,in,out)
  * torch ConvTranspose3d (in, out, kd,kh,kw) -> (kd,kh,kw,in,out)
    (spatial flip happens at apply time, see ops/conv3d.py)
  * torch {Layer,Group}Norm weight/bias -> flax scale/bias
"""

from __future__ import annotations

import logging
import math
from typing import Any, Mapping, Sequence

import numpy as np

from mebt_tpu.models.mebt import MeBTConfig
from mebt_tpu.models.vqgan import CodebookState, VQGAN, VQGANConfig

logger = logging.getLogger(__name__)


def load_lightning_ckpt(path: str):
    """Returns (state_dict, hparams) as numpy/python objects."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    out = {}
    for k, v in sd.items():
        if hasattr(v, "numpy"):
            out[k] = v.detach().to(torch.float32).numpy() if v.is_floating_point() else v.numpy()
        else:
            out[k] = v
    hparams = ckpt.get("hyper_parameters", {})
    return out, hparams


def strip_ignored(sd: Mapping[str, Any], ignore_keys=()) -> dict:
    """Prefix-based key removal (reference transformer.py:170-178)."""
    return {
        k: v
        for k, v in sd.items()
        if not any(k.startswith(ik) for ik in ignore_keys)
    }


def _linear(sd, key):
    out = {"kernel": np.ascontiguousarray(sd[f"{key}.weight"].T)}
    if f"{key}.bias" in sd:
        out["bias"] = sd[f"{key}.bias"]
    return out


def _norm(sd, key):
    return {"scale": sd[f"{key}.weight"], "bias": sd[f"{key}.bias"]}


def _conv3d(sd, key):
    w = sd[f"{key}.conv.weight"]  # (out, in, kd, kh, kw)
    out = {"kernel": np.ascontiguousarray(np.transpose(w, (2, 3, 4, 1, 0)))}
    if f"{key}.conv.bias" in sd:
        out["bias"] = sd[f"{key}.conv.bias"]
    return out


def _convt3d(sd, key):
    w = sd[f"{key}.convt.weight"]  # (in, out, kd, kh, kw)
    out = {"kernel": np.ascontiguousarray(np.transpose(w, (2, 3, 4, 0, 1)))}
    if f"{key}.convt.bias" in sd:
        out["bias"] = sd[f"{key}.convt.bias"]
    return out


def _groupnorm_mod(sd, key):
    # our Normalize module nests a single nn.GroupNorm
    return {"GroupNorm_0": _norm(sd, key)}


def _resblock(sd, key):
    out = {
        "norm1": _groupnorm_mod(sd, f"{key}.norm1"),
        "conv1": _conv3d(sd, f"{key}.conv1"),
        "norm2": _groupnorm_mod(sd, f"{key}.norm2"),
        "conv2": _conv3d(sd, f"{key}.conv2"),
    }
    if f"{key}.conv_shortcut.conv.weight" in sd:
        out["conv_shortcut"] = _conv3d(sd, f"{key}.conv_shortcut")
    return out


# -----------------------------------------------------------------------------
# VQGAN


def vqgan_config_from_hparams(hparams: Mapping, **overrides) -> VQGANConfig:
    """TATS checkpoints store an argparse Namespace under
    hyper_parameters['args']."""
    hp = hparams.get("args", hparams)
    if not isinstance(hp, Mapping):
        hp = vars(hp)
    return VQGANConfig.from_hparams(hp, **overrides)


def import_vqgan_params(sd: Mapping[str, np.ndarray], config: VQGANConfig,
                        prefix: str = ""):
    """Map a TATS VQGAN state dict onto (flax params, CodebookState)."""
    p = prefix
    n_stages = max(int(math.log2(d)) for d in config.downsample)

    enc = {"conv_first": _conv3d(sd, f"{p}encoder.conv_first")}
    for i in range(n_stages):
        enc[f"down_{i}"] = _conv3d(sd, f"{p}encoder.conv_blocks.{i}.down")
        enc[f"res_{i}"] = _resblock(sd, f"{p}encoder.conv_blocks.{i}.res")
    enc["final_norm"] = _groupnorm_mod(sd, f"{p}encoder.final_block.0")

    dec = {"final_norm": _groupnorm_mod(sd, f"{p}decoder.final_block.0")}
    for i in range(n_stages):
        dec[f"up_{i}"] = _convt3d(sd, f"{p}decoder.conv_blocks.{i}.up")
        dec[f"res_{i}_1"] = _resblock(sd, f"{p}decoder.conv_blocks.{i}.res1")
        dec[f"res_{i}_2"] = _resblock(sd, f"{p}decoder.conv_blocks.{i}.res2")
    dec["conv_last"] = _conv3d(sd, f"{p}decoder.conv_last")

    params = {
        "encoder": enc,
        "decoder": dec,
        "pre_vq_conv": _conv3d(sd, f"{p}pre_vq_conv"),
        "post_vq_conv": _conv3d(sd, f"{p}post_vq_conv"),
    }
    codebook = CodebookState(
        embeddings=np.asarray(sd[f"{p}codebook.embeddings"], np.float32),
        cluster_size=np.asarray(sd[f"{p}codebook.N"], np.float32),
        z_avg=np.asarray(sd[f"{p}codebook.z_avg"], np.float32),
    )
    return params, codebook


def load_vqgan(path: str, ignore_keys=("loss",), **config_overrides) -> VQGAN:
    """Reference-equivalent `load_vqgan` (download.py:50-54)."""
    sd, hparams = load_lightning_ckpt(path)
    sd = strip_ignored(sd, ignore_keys)
    config = vqgan_config_from_hparams(hparams, **config_overrides)
    params, codebook = import_vqgan_params(sd, config)
    import jax

    params = jax.tree.map(lambda x: np.asarray(x, np.float32), params)
    return VQGAN(config=config, params=params, codebook=codebook)


# -----------------------------------------------------------------------------
# MeBT transformer


def import_mebt_params(sd: Mapping[str, np.ndarray], config: MeBTConfig):
    """Map a MeBT Lightning state dict (transformer side) onto flax params.

    Reference parameter names: transformer.py:126-140 (tok/mask/sos/pos
    embeddings) and gpt.py:198-232 (blocks/ln_f/head). The frozen
    first_stage_model.* entries are handled by import_vqgan_params with
    prefix='first_stage_model.'.
    """
    tp = {}
    for i in range(config.n_layer):
        b = f"transformer.blocks.{i}"
        tp[f"block_{i}"] = {
            "ln1": _norm(sd, f"{b}.ln1"),
            "ln2": _norm(sd, f"{b}.ln2"),
            "attn": {
                "query": _linear(sd, f"{b}.attn.query"),
                "key": _linear(sd, f"{b}.attn.key"),
                "value": _linear(sd, f"{b}.attn.value"),
                "proj": _linear(sd, f"{b}.attn.proj"),
            },
            "mlp": {
                "fc": _linear(sd, f"{b}.mlp.0"),
                "proj": _linear(sd, f"{b}.mlp.2"),
            },
        }
    tp["ln_f"] = _norm(sd, "transformer.ln_f")
    tp["head"] = {"kernel": np.ascontiguousarray(sd["transformer.head.weight"].T)}

    params = {
        "tok_emb": {"embedding": sd["tok_emb.weight"]},
        "mask_emb": sd["mask_emb"],
        "sos_emb": sd["sos_emb"],
        "pos_emb": sd["pos_emb"],
        "transformer": tp,
    }
    import jax

    return jax.tree.map(lambda x: np.asarray(x, np.float32), params)


def mebt_config_from_hparams(hparams: Mapping, **overrides) -> MeBTConfig:
    """Lightning `save_hyperparameters` round-trip: the reference stores
    transformer_config/mask_config dicts (transformer.py:146)."""
    tcfg = hparams.get("transformer_config", hparams)
    mask_cfg = hparams.get("mask_config", {})
    mask_shape = None
    if mask_cfg:
        mask_shape = (mask_cfg.get("params", {}) or {}).get("shape")
    return MeBTConfig.from_config(tcfg, mask_shape=mask_shape, **overrides)


def load_mebt(
    path: str,
    vq_downsample: tuple[int, int, int] | None = None,
    **config_overrides,
):
    """Load a published MeBT checkpoint -> (MeBTConfig, params, VQGAN|None).

    Reference-equivalent `load_transformer` (download.py:56-61).
    `vq_downsample` overrides the embedded first stage's per-axis
    downsample factors, which are NOT recoverable from weight shapes
    (every encoder stage uses kernel 4 regardless of stride,
    reference vqgan.py:272-280) — pass it for non-(4,8,8) tokenizers.
    """
    sd, hparams = load_lightning_ckpt(path)
    config = mebt_config_from_hparams(dict(hparams), **config_overrides)
    params = import_mebt_params(sd, config)

    vqgan = None
    if any(k.startswith("first_stage_model.") for k in sd):
        fs_cfg = hparams.get("first_stage_config", {})
        vq_hp = {}
        # hparams may not round-trip the VQGAN args; infer from weights
        n_codes, dim = sd["first_stage_model.codebook.embeddings"].shape
        vq_hp.update({"n_codes": int(n_codes), "embedding_dim": int(dim)})
        w = sd["first_stage_model.encoder.conv_first.conv.weight"]
        vq_hp["n_hiddens"] = int(w.shape[0])
        fs_params = (fs_cfg.get("params", fs_cfg) or {}) if fs_cfg else {}
        if vq_downsample is not None:
            vq_hp["downsample"] = tuple(int(d) for d in vq_downsample)
        elif "downsample" in fs_params:
            vq_hp["downsample"] = tuple(
                int(d) for d in fs_params["downsample"]
            )
        else:
            vq_hp["downsample"] = _infer_downsample(sd)
            logger.warning(
                "MeBT ckpt %s embeds a VQGAN whose per-axis downsample is "
                "not stored; assuming %s from the %d-stage encoder. Pass "
                "vq_downsample=... if the tokenizer differs.",
                path, vq_hp["downsample"],
                max(int(math.log2(d)) for d in vq_hp["downsample"]),
            )
        _check_downsample_consistency(sd, vq_hp["downsample"])
        vq_cfg = VQGANConfig.from_hparams(vq_hp)
        vparams, codebook = import_vqgan_params(
            sd, vq_cfg, prefix="first_stage_model."
        )
        import jax

        vparams = jax.tree.map(lambda x: np.asarray(x, np.float32), vparams)
        vqgan = VQGAN(config=vq_cfg, params=vparams, codebook=codebook)
    return config, params, vqgan


def _check_downsample_consistency(
    sd: Mapping[str, np.ndarray], downsample: Sequence[int]
) -> None:
    """The one property of `downsample` that IS recoverable from weights:
    the encoder stage count equals max(log2(d)) (reference
    vqgan.py:272-280). A mismatched override/inference fails loudly here
    instead of producing a silently-wrong tokenizer."""
    n_stages = 0
    while f"encoder.conv_blocks.{n_stages}.down.conv.weight" in sd or (
        f"first_stage_model.encoder.conv_blocks.{n_stages}.down.conv.weight"
        in sd
    ):
        n_stages += 1
    want = max(int(math.log2(d)) for d in downsample)
    if n_stages and n_stages != want:
        raise ValueError(
            f"downsample {tuple(downsample)} implies "
            f"{want} encoder stages but the checkpoint has {n_stages}"
        )


def _infer_downsample(sd: Mapping[str, np.ndarray]) -> tuple[int, int, int]:
    """Infer the per-axis downsample factors from the encoder stage count
    and each stage's stride signature is not recoverable from weights, so
    count stages and assume the canonical (4, 8, 8) when 3 stages exist
    with a time-stride skip; callers can override via config."""
    n_stages = 0
    while f"encoder.conv_blocks.{n_stages}.down.conv.weight" in sd or (
        f"first_stage_model.encoder.conv_blocks.{n_stages}.down.conv.weight"
        in sd
    ):
        n_stages += 1
    if n_stages == 3:
        return (4, 8, 8)
    if n_stages == 2:
        return (4, 4, 4)
    return (2 ** n_stages,) * 3
