"""Shared Flax building blocks used by every model family."""

from gvl_tpu.nn.layers import (
    Attention,
    MlpGelu,
    MlpSwiGLU,
    RMSNorm,
    TransformerBlock,
    TransformerStack,
)

__all__ = [
    "RMSNorm",
    "Attention",
    "MlpGelu",
    "MlpSwiGLU",
    "TransformerBlock",
    "TransformerStack",
]
