"""Synthetic-clip audio track + event-gated transcription.

`synthetic://scene?audio=1` renders a deterministic procedural
soundtrack with known ground truth (speech text, impact, UI chime), so
the audio stack is exercisable end-to-end through process_video —
previously synthetic clips were silent.  Transcription is gated on
speech-classified spans when a trained event backend is present
(reference dual-mode split: `/root/reference/src/audio/
qwen_audio_processor.py:474-548`).
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from gvl_tpu.audio.processor import (
    AudioConfig,
    AudioEventType,
    AudioProcessor,
)
from gvl_tpu.io.video import SyntheticVideo


class TestSyntheticAudioTrack:
    def test_deterministic_and_aligned(self):
        sv = SyntheticVideo.from_url(
            "synthetic://audio_demo?duration=10&fps=2&audio=1")
        assert sv.with_audio
        truth = sv.audio_ground_truth()
        kinds = {k for _, k, _ in truth}
        assert kinds == {"speech", "impact", "ui"}
        wav1, sr = sv.audio()
        wav2, _ = sv.audio()
        assert wav1.shape == (int(10 * sr),)
        np.testing.assert_array_equal(wav1, wav2)
        # sound is actually present at each scheduled time
        for t, _, _ in truth:
            s = int(t * sr)
            assert np.abs(wav1[s: s + sr]).max() > 0.01

    def test_audio_off_by_default(self):
        sv = SyntheticVideo.from_url("synthetic://plain?duration=10")
        assert not sv.with_audio

    def test_shared_prefix_scenes_differ(self):
        """Scene names sharing an 8-byte prefix (every concept_demo_*)
        must draw distinct soundtracks — the audio-grounded QA family
        is only a real MCQ if the spoken line varies across clips."""
        lines = set()
        for i in range(8):
            sv = SyntheticVideo(f"concept_demo_scene_{i}", duration=20,
                                with_audio=True)
            lines.add(next(p for _, k, p in sv.audio_ground_truth()
                           if k == "speech"))
        assert len(lines) >= 3

    def test_short_clips_drop_unfittable_events(self):
        sv = SyntheticVideo("s", duration=3.5, with_audio=True)
        kinds = {k for _, k, _ in sv.audio_ground_truth()}
        assert "speech" not in kinds  # needs >= 6 s
        assert "impact" in kinds


class _SpanRecordingASR:
    """Records the NONZERO seconds per call (chunk_audio zero-pads to
    its 30 s chunk, so raw lengths don't discriminate gating)."""

    def __init__(self):
        self.calls = []

    def __call__(self, chunk, sample_rate):
        self.calls.append(
            float((np.abs(chunk) > 1e-6).sum()) / sample_rate)
        return "hello", 0.9


class _StubEventBackend:
    """Labels windows 2-3 as speech, everything else music."""

    def __call__(self, audio, sample_rate):
        n = len(audio) // sample_rate
        return [("speech" if i in (2, 3) else "music", 0.9)
                for i in range(n)]


class TestEventGatedTranscription:
    def _processor(self):
        proc = AudioProcessor(AudioConfig())
        proc.asr = _SpanRecordingASR()
        proc.event_backend = _StubEventBackend()
        return proc

    def test_transcribes_only_speech_spans(self):
        proc = self._processor()
        rng = np.random.default_rng(0)
        audio = rng.normal(0, 0.2, 10 * 16000).astype(np.float32)
        result = proc.analyze_audio(audio, 16000)
        # speech span = windows [2, 4) padded 0.5 s → ~3 s of real
        # samples reach the ASR, not the whole 10 s clip
        assert proc.asr.calls, "ASR never ran"
        assert sum(proc.asr.calls) < 5.0, proc.asr.calls
        assert any(seg.text for seg in result.transcriptions)
        # speech events surfaced too
        assert any(ev.event_type is AudioEventType.SPEECH
                   for ev in result.events)

    def test_no_speech_windows_means_no_asr_calls(self):
        proc = self._processor()

        class _AllMusic:
            def __call__(self, audio, sample_rate):
                n = len(audio) // sample_rate
                return [("music", 0.9)] * n

        proc.event_backend = _AllMusic()
        rng = np.random.default_rng(1)
        audio = rng.normal(0, 0.2, 8 * 16000).astype(np.float32)
        result = proc.analyze_audio(audio, 16000)
        assert proc.asr.calls == []
        assert result.transcriptions == []

    def test_no_event_backend_falls_back_to_full_chunking(self):
        proc = AudioProcessor(AudioConfig())
        proc.asr = _SpanRecordingASR()
        proc.event_backend = None
        rng = np.random.default_rng(2)
        audio = rng.normal(0, 0.2, 8 * 16000).astype(np.float32)
        proc.analyze_audio(audio, 16000)
        assert sum(proc.asr.calls) >= 7.0  # whole clip chunked
