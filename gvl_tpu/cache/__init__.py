"""Content-hash feature caches (idempotent resume)."""

from gvl_tpu.cache.feature_cache import FeatureCache, video_content_hash

__all__ = ["FeatureCache", "video_content_hash"]
