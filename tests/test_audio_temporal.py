"""Audio subsystem (mel, chunking, events, ASR fakes) + temporal HiCo +
context hierarchy."""

import jax
import numpy as np
import pytest

from gvl_tpu.audio import (
    AudioConfig,
    AudioEventType,
    AudioPreprocessor,
    AudioProcessor,
    log_mel_spectrogram,
    mel_filterbank,
)
from gvl_tpu.temporal import (
    CompressionLevel,
    ContextLevel,
    HiCoConfig,
    TemporalCompressionModule,
    TemporalContextManager,
)


def tone(freq, dur=2.0, rate=16000, amp=0.5):
    t = np.arange(int(dur * rate)) / rate
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


class TestMel:
    def test_filterbank_matches_librosa_shape_and_sum(self):
        fb = mel_filterbank()
        assert fb.shape == (80, 201)
        assert (fb >= 0).all()
        # every mel filter has some support
        assert (fb.sum(axis=1) > 0).all()

    def test_log_mel_shape_whisper_convention(self):
        wav = tone(440, dur=1.0)
        mel = np.asarray(log_mel_spectrogram(wav))
        assert mel.shape == (100, 80)  # 1s @ hop 160 → 100 frames (last dropped)
        assert mel.min() >= -10 and mel.max() <= 10

    def test_tone_has_energy_at_expected_mel(self):
        mel = np.asarray(log_mel_spectrogram(tone(440)))
        hot = mel.mean(axis=0).argmax()
        assert 5 <= hot <= 25  # 440 Hz lands low in the mel range

    def test_batched(self):
        wavs = np.stack([tone(440, 1.0), tone(2000, 1.0)])
        mel = np.asarray(log_mel_spectrogram(wavs))
        assert mel.shape == (2, 100, 80)
        assert mel[0].mean(axis=0).argmax() < mel[1].mean(axis=0).argmax()


class TestPreprocessor:
    def test_wav_roundtrip(self, tmp_path):
        import wave as wave_mod

        wav = tone(440, 0.5)
        path = tmp_path / "t.wav"
        with wave_mod.open(str(path), "wb") as wf:
            wf.setnchannels(1)
            wf.setsampwidth(2)
            wf.setframerate(16000)
            wf.writeframes((wav * 32767).astype(np.int16).tobytes())
        pre = AudioPreprocessor()
        loaded, rate = pre.load_audio(path)
        assert rate == 16000
        np.testing.assert_allclose(loaded[:100], wav[:100], atol=1e-3)

    def test_missing_file_returns_silence(self):
        pre = AudioPreprocessor()
        audio, rate = pre.load_audio("/nonexistent/x.wav")
        assert audio.sum() == 0 and rate == 16000

    def test_resample(self):
        pre = AudioPreprocessor()
        out = pre.resample(tone(440, 1.0, rate=8000), 8000)
        assert abs(len(out) - 16000) <= 2

    def test_chunking_overlap_and_padding(self):
        pre = AudioPreprocessor(AudioConfig(max_audio_length=2.0, chunk_overlap=0.5))
        audio = np.ones(int(3.0 * 16000), np.float32)
        chunks = pre.chunk_audio(audio, 16000)
        assert chunks[0][1:] == (0.0, 2.0)
        assert chunks[1][1] == pytest.approx(1.5)
        assert all(len(c[0]) == 32000 for c in chunks)


class TestAudioProcessor:
    def test_analyze_detects_loud_effect(self):
        rng = np.random.default_rng(0)
        quiet = rng.standard_normal(16000 * 4).astype(np.float32) * 0.01
        quiet[2 * 16000: 3 * 16000] *= 60  # loud burst in second 2
        proc = AudioProcessor(AudioConfig(enable_transcription=False))
        result = proc.analyze_audio(quiet, 16000)
        assert any(
            e.event_type is AudioEventType.EFFECT
            and 2.0 <= e.start_time < 3.0
            for e in result.events
        )

    def test_silence_yields_nothing(self):
        proc = AudioProcessor()
        result = proc.analyze_audio(np.zeros(16000 * 2, np.float32), 16000)
        assert not result.has_speech and not result.has_events
        assert result.dominant_type is AudioEventType.SILENCE

    def test_fake_asr_deterministic(self):
        proc = AudioProcessor()
        audio = tone(300, 3.0)
        a = proc.transcribe(audio, 16000)
        b = proc.transcribe(audio, 16000)
        assert [s.text for s in a] == [s.text for s in b]
        assert a and a[0].text

    def test_timeline_adapter_compatible(self):
        """Result plugs into TimelineIndexer.add_from_audio_result."""
        from gvl_tpu.fusion import ModalityType, TimelineIndexer

        proc = AudioProcessor()
        result = proc.analyze_audio(tone(440, 2.0), 16000)
        idx = TimelineIndexer()
        idx.add_from_audio_result(result)
        stats = idx.get_statistics()
        assert stats["total_events"] >= 1

    def test_event_parser_keywords(self):
        from gvl_tpu.audio import AudioEventParser

        parser = AudioEventParser()
        events = parser.parse_description("an explosion and background music", 1.0, 2.0)
        types = {e.event_type for e in events}
        assert AudioEventType.EFFECT in types and AudioEventType.MUSIC in types
        assert parser.parse_description("silence", 0, 1) == []


class TestHiCo:
    def frames(self, n=24):
        rng = np.random.default_rng(0)
        return rng.integers(0, 255, (n, 32, 32, 3), dtype=np.uint8)

    def module(self):
        return TemporalCompressionModule(
            HiCoConfig(hidden_dim=64, frames_per_clip=4, clip_duration_sec=4.0,
                       clip_overlap_sec=1.0, max_positions=64))

    def test_segment_video_overlap(self):
        mod = self.module()
        clips = mod.segment_video(self.frames(24), fps=2.0)
        # clip=8 frames, stride=6
        assert clips[0][1:] == (0.0, 4.0)
        assert clips[1][1] == pytest.approx(3.0)

    def test_clip_tokens(self):
        mod = self.module()
        tokens = mod.segment_and_compress(self.frames(24), fps=2.0)
        assert all(t.compression_level is CompressionLevel.CLIP for t in tokens)
        assert tokens[0].embedding.shape == (64,)
        assert tokens[0].start_time == 0.0

    def test_frame_level(self):
        mod = self.module()
        tokens = mod.segment_and_compress(
            self.frames(8), fps=2.0, target_level=CompressionLevel.FRAME)
        assert all(t.compression_level is CompressionLevel.FRAME for t in tokens)

    def test_video_level_ratio(self):
        mod = self.module()
        frames = self.frames(96)
        tokens = mod.segment_and_compress(
            frames, fps=2.0, target_level=CompressionLevel.VIDEO)
        assert all(t.compression_level is CompressionLevel.VIDEO for t in tokens)
        n_clips = len(mod.segment_video(frames, fps=2.0))
        assert len(tokens) == max(1, n_clips // 8)

    def test_rolling_context_window(self):
        mod = self.module()
        mod.segment_and_compress(self.frames(24), fps=2.0)
        ctx = mod.get_rolling_context(current_time=6.0, window_sec=4.0)
        assert ctx and all(t.end_time >= 2.0 for t in ctx)

    def test_timeline_adapter(self):
        from gvl_tpu.fusion import TimelineIndexer

        mod = self.module()
        tokens = mod.segment_and_compress(self.frames(24), fps=2.0)
        idx = TimelineIndexer()
        idx.add_from_hico_tokens(tokens)
        assert idx.get_statistics()["total_events"] == len(tokens)


class TestContextHierarchy:
    def test_observations_cascade_upward(self):
        mgr = TemporalContextManager()
        for i in range(60):
            mgr.add_observation(float(i), i + 1.0, f"event number {i}")
        stats = mgr.get_statistics()
        assert stats["entries_per_level"]["FINE"] <= 20
        assert stats["entries_per_level"]["CLIP"] >= 1
        assert stats["total_observations"] == 60

    def test_context_respects_budget(self):
        mgr = TemporalContextManager()
        for i in range(100):
            mgr.add_observation(float(i), i + 1.0, "x" * 50)
        ctx = mgr.get_context_for_llm(max_chars=500)
        assert len(ctx) <= 500
        # most recent fine detail survives trimming
        assert ctx.splitlines()[-1].startswith("[01:39]")

    def test_render_formats(self):
        mgr = TemporalContextManager()
        mgr.add_observation(83.0, 84.0, "boss appears")
        assert mgr.get_context_for_llm() == "[01:23] boss appears"

    def test_clear(self):
        mgr = TemporalContextManager()
        mgr.add_observation(0.0, 1.0, "a")
        mgr.clear()
        assert mgr.get_context_for_llm() == ""


class TestHicoTraining:
    def test_tiny_training_beats_chance(self):
        """Short self-supervised run: clip tokens retrieve their own
        sequences above chance; checkpoint round-trips; module loads it."""
        import logging

        import numpy as np

        from gvl_tpu.temporal.hico import (
            HiCoConfig,
            TemporalCompressionModule,
            load_hico_npz,
            save_hico_npz,
        )
        from gvl_tpu.training.hico_train import (
            HicoTrainConfig,
            evaluate_hico,
            train_hico,
        )

        mc = HiCoConfig(hidden_dim=32, num_heads=2)
        tc = HicoTrainConfig(steps=30, batch_size=8, frames_per_clip=8,
                             log_every=0)
        variables = train_hico(mc, tc)
        metrics = evaluate_hico(variables, mc, tc, n_batches=2)
        assert metrics["retrieval_acc"] >= metrics["chance"]

        import tempfile
        from pathlib import Path

        with tempfile.TemporaryDirectory() as d:
            path = Path(d) / "hico.npz"
            save_hico_npz(variables, path)
            loaded = load_hico_npz(path)
            leaves_a = jax.tree_util.tree_leaves(variables)
            leaves_b = jax.tree_util.tree_leaves(loaded)
            assert all(np.allclose(a, b)
                       for a, b in zip(leaves_a, leaves_b))

            module = TemporalCompressionModule(mc, checkpoint=str(path))
            got = jax.tree_util.tree_leaves(module.variables)
            assert all(np.allclose(a, b) for a, b in zip(leaves_a, got))

    def test_missing_checkpoint_falls_back_to_init(self):
        from gvl_tpu.temporal.hico import HiCoConfig, TemporalCompressionModule

        mc = HiCoConfig(hidden_dim=32, num_heads=2)
        module = TemporalCompressionModule(
            mc, checkpoint="nonexistent/hico.npz")
        assert module.variables is not None
