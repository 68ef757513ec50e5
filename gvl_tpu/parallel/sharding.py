"""Rule-based partition specs: map parameter paths to shardings.

Megatron-style tensor-parallel layout expressed as ``(regex, spec)`` rules
matched against ``/``-joined parameter paths.  Column-parallel kernels
(qkv, MLP up/gate) shard their *output* feature dim over ``model``;
row-parallel kernels (attention out, MLP down) shard their *input* dim, so
each boundary needs exactly one collective and XLA/GSPMD inserts it.
"""

from __future__ import annotations

import logging
import re
from typing import Any, Optional, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger(__name__)


def named_sharding(mesh: Mesh, *axes: Optional[str]) -> NamedSharding:
    """``named_sharding(mesh, None, "model")`` → shard dim 1 over model."""
    return NamedSharding(mesh, P(*axes))


class ShardingRules:
    """Ordered (regex, PartitionSpec) rules; first match wins.

    >>> rules = ShardingRules([
    ...     (r"attention/(q|k|v)_proj/kernel", P(None, "model")),
    ...     (r"attention/o_proj/kernel",       P("model", None)),
    ...     (r".*",                            P()),
    ... ])
    """

    def __init__(self, rules: Sequence[tuple[str, P]]):
        self.rules = [(re.compile(pattern), spec) for pattern, spec in rules]

    def spec(self, path: str) -> P:
        for pattern, spec in self.rules:
            if pattern.search(path):
                return spec
        return P()

    def __add__(self, other: "ShardingRules") -> "ShardingRules":
        merged = ShardingRules([])
        merged.rules = self.rules + other.rules
        return merged


# Default layout for the decoder-only reasoning core (Qwen3-class) and the
# ViT-family encoders.  Dense kernels are [in, out].
LLM_RULES = ShardingRules([
    # token embedding: shard the hidden dim (all-gather activations once)
    (r"embed_tokens/embedding$", P(None, "model")),
    (r"lm_head/kernel(_q)?$", P(None, "model")),
    (r"lm_head/scale$", P("model")),
    # attention projections (plain Dense, LoRADense "base", or the
    # int8 "base/kernel_q" weight-only layout — scales follow the
    # output dim of their kernel)
    (r"(self_)?att(ention|n)?/(q|k|v)_proj/(base/)?kernel(_q)?$",
     P(None, "model")),
    (r"(self_)?att(ention|n)?/(q|k|v)_proj/base/scale$", P("model")),
    (r"(self_)?att(ention|n)?/o_proj/(base/)?kernel(_q)?$",
     P("model", None)),
    (r"(self_)?att(ention|n)?/o_proj/base/scale$", P()),
    # MLP
    (r"mlp/(gate|up)_proj/(base/)?kernel(_q)?$", P(None, "model")),
    (r"mlp/(gate|up)_proj/base/scale$", P("model")),
    (r"mlp/down_proj/(base/)?kernel(_q)?$", P("model", None)),
    (r"mlp/down_proj/base/scale$", P()),
    # LoRA: B follows the column-parallel output dim; A of row-parallel
    # layers shards its input dim; everything else replicated
    (r"(q|k|v|gate|up)_proj/lora_b$", P(None, "model")),
    (r"(o|down)_proj/lora_a$", P("model", None)),
    # biases on column-parallel layers follow their kernel's output dim
    (r"(q|k|v|gate|up)_proj/(base/)?bias$", P("model")),
    # everything else (norms, row-parallel biases, remaining lora) replicated
    (r".*", P()),
])

VIT_RULES = ShardingRules([
    (r"att(ention|n)?/(q|k|v)_proj/kernel$", P(None, "model")),
    (r"att(ention|n)?/o_proj/kernel$", P("model", None)),
    (r"mlp/(fc1|up_proj|gate_proj)/kernel$", P(None, "model")),
    (r"mlp/(fc2|down_proj)/kernel$", P("model", None)),
    (r".*", P()),
])


def _flatten_with_paths(tree: Any):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    for keypath, leaf in flat:
        path = "/".join(_key_str(k) for k in keypath)
        yield path, keypath, leaf


def _key_str(key) -> str:
    if hasattr(key, "key"):
        return str(key.key)
    if hasattr(key, "idx"):
        return str(key.idx)
    return str(key)


def spec_for_path(path: str, rules: ShardingRules) -> P:
    return rules.spec(path)


def tree_paths(tree: Any) -> list[str]:
    return [path for path, _, _ in _flatten_with_paths(tree)]


def sharding_tree(tree: Any, mesh: Mesh, rules: ShardingRules) -> Any:
    """Pytree of NamedShardings matching ``tree``'s structure."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    shardings = []
    for keypath, leaf in flat:
        path = "/".join(_key_str(k) for k in keypath)
        spec = rules.spec(path)
        # drop specs that don't divide or over-rank the leaf
        ndim = getattr(leaf, "ndim", 0)
        clean = _sanitize_spec(spec, getattr(leaf, "shape", ()), mesh)
        shardings.append(NamedSharding(mesh, clean))
        del ndim
    return jax.tree_util.tree_unflatten(treedef, shardings)


def _sanitize_spec(spec: P, shape: tuple, mesh: Mesh) -> P:
    """Fit a spec to the leaf: right-align (extra leading dims — e.g. a
    scan-stacked layer axis — stay replicated), trim to rank, and drop
    axes that don't divide the dimension."""
    axes = list(spec)
    if len(shape) > len(axes):
        axes = [None] * (len(shape) - len(axes)) + axes
    axes = axes[: len(shape)]
    out = []
    for dim, ax in enumerate(axes):
        if ax is None:
            out.append(None)
            continue
        size = mesh.shape[ax] if isinstance(ax, str) else 1
        if dim < len(shape) and shape[dim] % size == 0:
            out.append(ax)
        else:
            logger.debug(
                "dropping axis %s on dim %d (shape %s not divisible)",
                ax, dim, shape,
            )
            out.append(None)
    while out and out[-1] is None:  # canonical form: no trailing Nones
        out.pop()
    return P(*out)


def shard_pytree(tree: Any, mesh: Mesh, rules: ShardingRules) -> Any:
    """Place every leaf on the mesh according to the rules (device_put)."""
    shardings = sharding_tree(tree, mesh, rules)
    return jax.device_put(tree, shardings)
