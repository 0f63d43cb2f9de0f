"""Device mesh + sharding rules (SPMD over `jax.sharding.Mesh`).

This replaces the reference's distributed stack — Lightning DDPStrategy
over NCCL, DistributedSampler, and explicit all_reduce/broadcast calls
(SURVEY.md §2.3) — with sharded jit over a 2-D `(data, model)` mesh:

  * data axis  : batch (data parallelism; gradient psum inserted by XLA)
  * model axis : Megatron-style tensor parallelism on the transformer's
    QKV/MLP/head matmuls (column-parallel in, row-parallel out), plus
    vocab-sharded token embedding and logits

The codebook EMA all_reduce (reference codebook.py:71-72) needs no
explicit collective here: the scatter-add statistics are global sums
under the sharded jit, so XLA emits the cross-device reduction. The
`dist.broadcast` of restart candidates disappears — every host computes
the same candidates from a shared deterministic PRNG key.
"""

from __future__ import annotations

import re
from typing import Any, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Rule = tuple[str, P]


def make_mesh(
    data: int | None = None,
    model: int = 1,
    seq: int = 1,
    pipe: int = 1,
    devices: Sequence | None = None,
) -> Mesh:
    """Build a (data, model[, seq][, pipe]) mesh. data=None -> use all
    remaining devices. The `seq` axis (context parallelism over the token
    canvas, parallel/sp.py) and the `pipe` axis (GPipe pipeline over the
    transformer blocks, parallel/pp.py) are only materialized when > 1 so
    existing 2-axis consumers see an unchanged mesh."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        if n % (model * seq * pipe):
            raise ValueError(
                f"{n} devices not divisible by model*seq*pipe="
                f"{model * seq * pipe}"
            )
        data = n // (model * seq * pipe)
    if data * model * seq * pipe != n:
        raise ValueError(f"mesh {data}x{model}x{seq}x{pipe} != {n} devices")
    shape, names = [data, model], ["data", "model"]
    if seq > 1:
        shape.append(seq)
        names.append("seq")
    if pipe > 1:
        shape.append(pipe)
        names.append("pipe")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, tuple(names))


def mebt_param_rules() -> list[Rule]:
    """Path-regex -> PartitionSpec for MeBT parameters and their mirrored
    optimizer moments. First match wins; default is replicated."""
    return [
        # column-parallel projections: split output features
        (r"attn/(query|key|value)/kernel$", P(None, "model")),
        (r"attn/(query|key|value)/bias$", P("model")),
        (r"mlp/fc/kernel$", P(None, "model")),
        (r"mlp/fc/bias$", P("model")),
        # row-parallel projections: split input features
        (r"attn/proj/kernel$", P("model", None)),
        (r"mlp/proj/kernel$", P("model", None)),
        # vocab-sharded head and token embedding
        (r"head/kernel$", P(None, "model")),
        (r"tok_emb/embedding$", P("model", None)),
        # large positional table: shard positions
        (r"pos_emb$", P(None, "model", None)),
    ]


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "name"):
            parts.append(str(p.name))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def spec_for_tree(tree: Any, rules: list[Rule]) -> Any:
    """Build a PartitionSpec tree by matching each leaf's path against the
    rules (searched as substrings anchored at path end via regex)."""

    def pick(path, leaf) -> P:
        s = _path_str(path)
        for pattern, spec in rules:
            if re.search(pattern, s):
                if getattr(leaf, "ndim", 0) >= len([a for a in spec if a]):
                    return spec
        return P()

    return jax.tree_util.tree_map_with_path(pick, tree)


def shard_pytree(tree: Any, mesh: Mesh, rules: list[Rule] | None = None):
    """Device-put a pytree with rule-derived NamedShardings."""
    rules = rules if rules is not None else mebt_param_rules()
    specs = spec_for_tree(tree, rules)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), tree, specs
    )


def sharding_tree(tree: Any, mesh: Mesh, rules: list[Rule] | None = None):
    rules = rules if rules is not None else mebt_param_rules()
    specs = spec_for_tree(tree, rules)
    return jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                        is_leaf=lambda x: isinstance(x, P))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Inputs: batch split over the data axis, everything else local."""
    return NamedSharding(mesh, P("data"))


def zero1_specs(
    state: Any,
    specs: Any,
    mesh: Mesh,
    axis: str = "data",
    min_size: int = 1024,
) -> Any:
    """ZeRO-1: shard the optimizer state over the data axis.

    The reference has no ZeRO (its DeepSpeed plugin line is commented
    out, train_transformer.py:40); this is the TPU-native equivalent —
    no wrapper module, just PartitionSpecs. Every replicated array leaf
    under `opt_state` (AdamW mu/nu moments, MultiSteps grad
    accumulators) gets its largest `axis`-divisible dimension sharded;
    params/logits stay replicated (per-shard moment update + XLA-chosen
    reduce-scatter/all-gather replace the plain gradient all-reduce).
    Cuts optimizer memory from 2x params to 2x params / n_data per
    device. Leaves already sharded by TP rules keep their spec.
    """
    n = mesh.shape[axis]

    def pick(path, leaf, spec):
        if n <= 1 or "opt_state" not in _path_str(path):
            return spec
        shape = getattr(leaf, "shape", ())
        if len(shape) == 0 or np.prod(shape) < min_size:
            return spec
        entries = list(spec) + [None] * (len(shape) - len(spec))
        used: set[str] = set()
        for e in entries:
            if isinstance(e, str):
                used.add(e)
            elif e is not None:
                used.update(e)
        if axis in used:
            return spec
        best = None
        for d, size in enumerate(shape):
            if (
                entries[d] is None
                and size % n == 0
                and (best is None or size > shape[best])
            ):
                best = d
        if best is None:
            return spec
        entries[best] = axis
        return P(*entries)

    return jax.tree_util.tree_map_with_path(pick, state, specs)
