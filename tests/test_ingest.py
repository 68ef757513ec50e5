"""Ingestion ladders: YouTube URL detection, codec-decode fallbacks."""

import numpy as np
import pytest

from gvl_tpu.io.ingest import (
    decode_codec_video,
    download_youtube,
    have_ffmpeg,
    have_ytdlp,
    is_youtube_url,
    resolve_video_source,
)


class TestYouTubeURL:
    @pytest.mark.parametrize("url", [
        "https://www.youtube.com/watch?v=abc123",
        "http://youtube.com/watch?v=abc123&t=5",
        "https://youtu.be/abc123",
        "https://m.youtube.com/watch?v=abc",
        "https://www.youtube.com/shorts/xyz",
        "youtube.com/watch?v=noscheme",
    ])
    def test_positive(self, url):
        assert is_youtube_url(url)

    @pytest.mark.parametrize("url", [
        "https://vimeo.com/12345",
        "/data/videos/game.mp4",
        "synthetic://boss_fight",
        "https://yewtu.be/watch?v=abc",
        "notaurl",
    ])
    def test_negative(self, url):
        assert not is_youtube_url(url)

    def test_download_without_ytdlp_raises_actionable(self, tmp_path):
        if have_ytdlp():
            pytest.skip("yt-dlp present in this environment")
        with pytest.raises(RuntimeError, match="yt-dlp"):
            download_youtube("https://youtu.be/abc", tmp_path)


def _write_y4m(path, frames, fps=2):
    """Minimal 420 y4m writer for tests."""
    h, w = frames[0].shape[:2]
    with open(path, "wb") as f:
        f.write(f"YUV4MPEG2 W{w} H{h} F{fps}:1 Ip A1:1 C420\n".encode())
        for frame in frames:
            f.write(b"FRAME\n")
            r = frame[:, :, 0].astype(np.float32)
            g = frame[:, :, 1].astype(np.float32)
            b = frame[:, :, 2].astype(np.float32)
            y = (0.299 * r + 0.587 * g + 0.114 * b)
            u = (-0.169 * r - 0.331 * g + 0.5 * b + 128)[::2, ::2]
            v = (0.5 * r - 0.419 * g - 0.081 * b + 128)[::2, ::2]
            for plane in (y, u, v):
                f.write(np.clip(plane, 0, 255).astype(np.uint8).tobytes())


class TestResolveSource:
    def test_synthetic_passthrough(self):
        frames = resolve_video_source(
            "synthetic://t?duration=4&fps=2", fps=2, max_frames=4)
        assert len(frames) == 4
        assert frames[0][1].shape == (240, 320, 3)

    def test_y4m_passthrough(self, tmp_path):
        rgb = [np.full((32, 48, 3), c, np.uint8) for c in (10, 120, 240)]
        path = tmp_path / "clip.y4m"
        _write_y4m(path, rgb)
        frames = resolve_video_source(str(path), fps=2)
        assert len(frames) == 3

    def test_codec_without_decoders_raises_ladder_report(self, tmp_path):
        fake_mp4 = tmp_path / "clip.mp4"
        fake_mp4.write_bytes(b"\x00\x00\x00\x18ftypmp42 not a real file")
        try:
            decode_codec_video(fake_mp4, fps=1)
        except RuntimeError as exc:
            # the error reports every rung it tried
            msg = str(exc)
            assert "ffmpeg" in msg or "cv2" in msg or "imageio" in msg
        else:
            pytest.fail("decoding garbage mp4 should fail")

    @pytest.mark.skipif(not have_ffmpeg(), reason="no ffmpeg")
    def test_ffmpeg_roundtrip(self, tmp_path):
        from gvl_tpu.io.ingest import ffmpeg_to_y4m

        rgb = [np.full((32, 48, 3), c, np.uint8) for c in (10, 120)]
        src = tmp_path / "src.y4m"
        _write_y4m(src, rgb)
        out = ffmpeg_to_y4m(src, fps=2)
        assert out.exists()

    def test_real_mp4_decode(self, tmp_path):
        """Encode a real mp4 (cv2 VideoWriter) and decode it back
        through the ladder — checks frame count and pixel content."""
        cv2 = pytest.importorskip("cv2")

        path = str(tmp_path / "clip.mp4")
        writer = cv2.VideoWriter(
            path, cv2.VideoWriter_fourcc(*"mp4v"), 4.0, (64, 48))
        if not writer.isOpened():
            pytest.skip("no mp4 encoder in this cv2 build")
        shades = [30, 120, 210, 60, 150, 240, 90, 180]
        for c in shades:
            writer.write(np.full((48, 64, 3), c, np.uint8))
        writer.release()

        frames = decode_codec_video(path, fps=4)
        assert len(frames) == len(shades)
        for (_, frame), c in zip(frames, shades):
            assert frame.shape == (48, 64, 3)
            assert abs(float(frame.mean()) - c) < 12  # lossy codec slack

        # fps subsampling halves the count
        half = decode_codec_video(path, fps=2)
        assert len(half) == len(shades) // 2
