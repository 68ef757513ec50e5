"""Temporal processing: hierarchical token compression + context hierarchy."""

from gvl_tpu.temporal.hico import (
    CompressionLevel,
    HiCoConfig,
    HierarchicalCompressor,
    TemporalCompressionModule,
    TemporalToken,
    create_hico_module,
)
from gvl_tpu.temporal.context_manager import ContextLevel, TemporalContextManager

__all__ = [
    "CompressionLevel",
    "TemporalToken",
    "HiCoConfig",
    "HierarchicalCompressor",
    "TemporalCompressionModule",
    "create_hico_module",
    "ContextLevel",
    "TemporalContextManager",
]
