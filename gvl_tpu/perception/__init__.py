"""Visual perception: open-vocabulary segmentation/tracking, region
semantics, OCR."""

from gvl_tpu.perception.segmenter import (
    BoundingBox,
    EntityState,
    SAMConceptSegmenter,
    SAMConfig,
    SegmentationMask,
    TrackedEntity,
    create_sam_segmenter,
)
from gvl_tpu.perception.ocr import (
    OCRConfig,
    OCRFrame,
    OCRPipeline,
    TextCategorizer,
    TextDetection,
    create_ocr_pipeline,
)
from gvl_tpu.perception.semantic import (
    NaFlexConfig,
    SemanticEmbedding,
    SigLIPSemanticEncoder,
    create_siglip_encoder,
)
from gvl_tpu.perception.open_vocab import (
    OpenVocabSamBackend,
    create_open_vocab_segmenter,
)
from gvl_tpu.perception.batch import (
    build_perception_stack,
    build_segmenter,
    build_siglip_encoder,
    run_batched_perception,
)

__all__ = [
    "EntityState",
    "BoundingBox",
    "SegmentationMask",
    "TrackedEntity",
    "SAMConfig",
    "SAMConceptSegmenter",
    "create_sam_segmenter",
    "OCRConfig",
    "OCRFrame",
    "OCRPipeline",
    "TextCategorizer",
    "TextDetection",
    "create_ocr_pipeline",
    "NaFlexConfig",
    "SemanticEmbedding",
    "SigLIPSemanticEncoder",
    "create_siglip_encoder",
    "build_perception_stack",
    "build_segmenter",
    "build_siglip_encoder",
    "run_batched_perception",
    "OpenVocabSamBackend",
    "create_open_vocab_segmenter",
]
