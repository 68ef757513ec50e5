"""gvl_tpu — a TPU-native gameplay-video understanding framework.

A cascaded multimodal perception → fusion → reasoning pipeline for
long-horizon gameplay-video question answering, built from scratch for TPU
hardware on JAX / XLA / Pallas / pjit.

Capability parity target: chasemetoyer/gameplay-vision-llm (see SURVEY.md).
The architecture is NOT a port — compute paths are batched XLA programs with
Pallas kernels, distribution is a `jax.sharding.Mesh` with GSPMD partition
specs, and the host runtime (video/audio decode, prefetch) is native C++.

Subpackage map
--------------
- ``gvl_tpu.config``     hardware-aware presets (light/standard/full)
- ``gvl_tpu.fusion``     timeline indexer + entity knowledge base (external memory)
- ``gvl_tpu.agent``      reasoning core: retrieval, prompts, tools, conversation
- ``gvl_tpu.models``     JAX/Flax model definitions (SigLIP, VideoMAE, Wav2Vec2,
                         Whisper, Qwen3-VL, SAM-style segmenter, projectors)
- ``gvl_tpu.ops``        Pallas TPU kernels (flash attention, patchify, ...)
- ``gvl_tpu.nn``         shared Flax building blocks
- ``gvl_tpu.parallel``   mesh manager + sharding registry + pipeline stages
- ``gvl_tpu.perception`` segmentation/tracking, region semantics, OCR
- ``gvl_tpu.audio``      audio decode, mel, ASR, event detection
- ``gvl_tpu.temporal``   hierarchical token compression + context hierarchy
- ``gvl_tpu.cache``      content-hash feature caches
- ``gvl_tpu.runtime``    native host IO: frame/audio decoders, prefetch
- ``gvl_tpu.training``   projector alignment + LoRA SFT under pjit
- ``gvl_tpu.serving``    HTTP serving API
"""

__version__ = "0.1.0"
