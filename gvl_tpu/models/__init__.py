"""JAX/Flax model definitions for every family the framework ships."""

from gvl_tpu.models.projector import MultiModalProjector, ProjectorBank

__all__ = ["MultiModalProjector", "ProjectorBank"]

# heavier model families import lazily:
#   gvl_tpu.models.siglip / videomae / wav2vec2 / whisper / qwen3 /
#   qwen3vl / sam / speculative
