"""Visual perception: open-vocabulary segmentation/tracking, region
semantics, OCR."""

from gvl_tpu.perception.semantic import (
    NaFlexConfig,
    SemanticEmbedding,
    SigLIPSemanticEncoder,
    create_siglip_encoder,
)

__all__ = [
    "NaFlexConfig",
    "SemanticEmbedding",
    "SigLIPSemanticEncoder",
    "create_siglip_encoder",
]
