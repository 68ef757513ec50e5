"""Pallas TPU kernels and compute primitives for the hot ops."""

from gvl_tpu.ops.attention import (
    attention_reference,
    dot_product_attention,
    flash_attention,
)
from gvl_tpu.ops.ring_attention import ring_attention
from gvl_tpu.ops.rope import apply_rope, rope_angles

__all__ = [
    "dot_product_attention",
    "flash_attention",
    "attention_reference",
    "ring_attention",
    "apply_rope",
    "rope_angles",
]
