"""Host IO: video frame sources and audio extraction."""

from gvl_tpu.io.video import (
    SyntheticVideo,
    Y4MReader,
    extract_frames,
    probe_video,
)

__all__ = ["Y4MReader", "SyntheticVideo", "extract_frames", "probe_video"]
