"""Layered YAML configuration, schema-compatible with the reference configs.

The reference merges a list of ``--base`` YAML files with CLI dot-list
overrides through OmegaConf (reference: train_transformer.py:25-27). This
module re-implements that surface without the OmegaConf dependency:
attribute-style access, deep merge, dot-list overrides, and
``target``/``params`` reflective instantiation (reference: utils.py:3-7).
"""

from __future__ import annotations

import copy
import importlib
from typing import Any, Iterable, Mapping

import yaml


class Config(dict):
    """Dict with attribute access and deep conversion of nested mappings."""

    def __init__(self, data: Mapping | None = None, **kwargs):
        super().__init__()
        merged = dict(data or {})
        merged.update(kwargs)
        for k, v in merged.items():
            self[k] = _convert(v)

    # -- attribute protocol --------------------------------------------------
    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = _convert(value)

    def __delattr__(self, name: str) -> None:
        try:
            del self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __deepcopy__(self, memo):
        return Config({k: copy.deepcopy(v, memo) for k, v in self.items()})

    # -- helpers -------------------------------------------------------------
    def get_path(self, dotted: str, default: Any = None) -> Any:
        node: Any = self
        for part in dotted.split("."):
            if isinstance(node, Mapping) and part in node:
                node = node[part]
            else:
                return default
        return node

    def to_dict(self) -> dict:
        def rec(v):
            if isinstance(v, Config):
                return {k: rec(x) for k, x in v.items()}
            if isinstance(v, list):
                return [rec(x) for x in v]
            return v

        return rec(self)


def _convert(v: Any) -> Any:
    if isinstance(v, Config):
        return v
    if isinstance(v, Mapping):
        return Config(v)
    if isinstance(v, list):
        return [_convert(x) for x in v]
    return v


def load_yaml(path: str) -> Config:
    with open(path) as f:
        return Config(yaml.safe_load(f) or {})


def merge(*configs: Mapping) -> Config:
    """Deep merge; later configs win. Lists are replaced, not concatenated
    (matches OmegaConf.merge semantics used by the reference)."""
    out = Config()
    for cfg in configs:
        _merge_into(out, cfg)
    return out


def _merge_into(dst: Config, src: Mapping) -> None:
    for k, v in src.items():
        if k in dst and isinstance(dst[k], Config) and isinstance(v, Mapping):
            _merge_into(dst[k], v)
        else:
            dst[k] = _convert(v)


def _parse_value(text: str) -> Any:
    """Parse a CLI override value with YAML scalar rules."""
    return yaml.safe_load(text)


def from_dotlist(items: Iterable[str]) -> Config:
    """Build a Config from ``a.b.c=value`` strings (OmegaConf dot-list)."""
    out = Config()
    for item in items:
        if "=" not in item:
            raise ValueError(f"dotlist item must be key=value, got: {item!r}")
        key, raw = item.split("=", 1)
        node = out
        parts = key.split(".")
        for part in parts[:-1]:
            if part not in node or not isinstance(node[part], Config):
                node[part] = Config()
            node = node[part]
        node[parts[-1]] = _parse_value(raw)
    return out


def load_configs(bases: Iterable[str], overrides: Iterable[str] = ()) -> Config:
    """Reference-equivalent entry: merge base YAMLs then dot-list overrides."""
    cfgs = [load_yaml(p) for p in bases]
    cfgs.append(from_dotlist(overrides))
    return merge(*cfgs)


# -- reflective instantiation -------------------------------------------------

# The reference instantiates model/mask classes from `target` strings like
# `mebt.mask_sampler.MaskGen` (utils.py:3-7, with a tats.->mebt. rewrite).
# We map those legacy module paths onto mebt_tpu equivalents so the original
# YAML files work unchanged.
_TARGET_ALIASES = {
    "mebt.mask_sampler.MaskGen": "mebt_tpu.sampler.mask_schedule.MaskGen",
    "tats.mask_sampler.MaskGen": "mebt_tpu.sampler.mask_schedule.MaskGen",
    "mebt.transformer.Net2NetTransformer": "mebt_tpu.models.mebt.MeBT",
    "tats.transformer.Net2NetTransformer": "mebt_tpu.models.mebt.MeBT",
}


def resolve_target(target: str):
    target = _TARGET_ALIASES.get(target, target)
    module, _, name = target.rpartition(".")
    return getattr(importlib.import_module(module), name)


def instantiate_from_config(config: Mapping, **extra) -> Any:
    if "target" not in config:
        raise KeyError("Expected key `target` to instantiate.")
    cls = resolve_target(config["target"])
    params = dict(config.get("params", {}) or {})
    params.update(extra)
    return cls(**params)
