"""Host IO: video frame sources, ingestion ladders, audio extraction."""

from gvl_tpu.io.video import (
    SyntheticVideo,
    Y4MReader,
    extract_frames,
    probe_video,
)
from gvl_tpu.io.ingest import (
    decode_codec_video,
    download_youtube,
    is_youtube_url,
    resolve_video_source,
)

__all__ = [
    "Y4MReader",
    "SyntheticVideo",
    "extract_frames",
    "probe_video",
    "is_youtube_url",
    "download_youtube",
    "decode_codec_video",
    "resolve_video_source",
]
