"""Self-trained byte ASR: speech synthesis, training, serving wiring.

Reference parity surface: the speech-transcription rung
(`/root/reference/scripts/realtime_inference.py:525-602`,
`/root/reference/src/audio/qwen_audio_processor.py:301-380`) — there a
downloaded whisper model; here the repo's own WhisperModel trained from
scratch on procedural speech, sitting in the ASR ladder below a real HF
Whisper checkpoint and above the deterministic fake.
"""

import numpy as np
import pytest

from gvl_tpu.models.byte_tokenizer import BOS_ID, EOS_ID
from gvl_tpu.training.asr_train import (
    ALPHABET,
    ASRTrainConfig,
    SpeakerProfile,
    TrainedByteASR,
    asr_config,
    character_error_rate,
    encode_text,
    evaluate_asr,
    is_trained_asr_checkpoint,
    load_asr,
    sample_utterance,
    save_asr,
    synth_speech,
    train_asr,
    word_error_rate,
)

# micro geometry: 1.6 s windows (160 mel frames → 80 source positions)
MICRO = asr_config(d_model=64, encoder_layers=1, decoder_layers=1,
                   num_heads=2, ffn_dim=128, max_source_positions=80,
                   max_target_positions=24)


@pytest.fixture(scope="module")
def micro_trained():
    cfg = ASRTrainConfig(steps=30, batch_size=8, audio_seconds=1.6,
                         model=MICRO, log_every=0, render_workers=0)
    return train_asr(cfg)


class TestSynthesis:
    def test_waveform_shape_and_finite(self):
        rng = np.random.default_rng(0)
        wav = synth_speech(rng, "boss incoming", total_seconds=3.0)
        assert wav.shape == (48000,)
        assert wav.dtype == np.float32
        assert np.isfinite(wav).all()
        assert np.abs(wav).max() <= 1.0 + 1e-6

    def test_distinct_chars_distinct_spectra(self):
        # same speaker, different characters → different mel signatures
        rng = np.random.default_rng(1)
        prof = SpeakerProfile()
        from gvl_tpu.audio.mel import log_mel_numpy

        mels = []
        for ch in ("a", "k", "7"):
            wav = synth_speech(np.random.default_rng(2), ch * 8,
                               profile=prof, total_seconds=1.6)
            mels.append(log_mel_numpy(wav).mean(axis=0))
        assert np.abs(mels[0] - mels[1]).max() > 0.05
        assert np.abs(mels[0] - mels[2]).max() > 0.05
        del rng

    def test_holdout_speakers_extrapolate(self):
        """Every holdout dimension lies outside the (v2, widened)
        TRAINING ranges — the transfer eval stays an extrapolation."""
        rng = np.random.default_rng(3)
        for _ in range(16):
            p = SpeakerProfile.sample_holdout(rng)
            t = SpeakerProfile.sample(rng)
            assert p.f0 > 225.0 or p.f0 < 85.0
            assert not (0.89 <= p.formant_scale <= 1.13)
            assert not (0.054 <= p.char_dur <= 0.097)
            assert p.noise_db > -17.5
            assert 85.0 <= t.f0 <= 225.0
            assert t.noise_db <= -17.5

    def test_utterances_speakable(self):
        rng = np.random.default_rng(4)
        for _ in range(32):
            text = sample_utterance(rng)
            assert 0 < len(text) <= 44
            assert all(c in ALPHABET or c == " " for c in text)


class TestMelParity:
    def test_numpy_matches_jax(self):
        from gvl_tpu.audio.mel import log_mel_numpy, log_mel_spectrogram

        rng = np.random.default_rng(5)
        wav = synth_speech(rng, "mana potion", total_seconds=2.0)
        a = log_mel_numpy(wav)
        b = np.asarray(log_mel_spectrogram(wav))
        assert a.shape == b.shape
        assert np.abs(a - b).max() < 5e-3

    def test_batched(self):
        from gvl_tpu.audio.mel import log_mel_numpy

        wavs = np.random.default_rng(6).normal(
            0, 0.1, (3, 16000)).astype(np.float32)
        out = log_mel_numpy(wavs)
        assert out.shape[0] == 3


class TestTokens:
    def test_encode_roundtrip(self):
        tokens, mask = encode_text("boss at 50", 24)
        assert tokens[0] == BOS_ID
        body = bytes(int(t) for t in tokens[1:] if t < 256)
        assert body.decode() == "boss at 50"
        # mask covers bytes + first EOS
        assert mask.sum() == len("boss at 50") + 2
        assert tokens[-1] == EOS_ID

    def test_truncation(self):
        tokens, _ = encode_text("x" * 100, 24)
        assert len(tokens) == 24
        assert tokens[-1] == EOS_ID

    def test_error_rates(self):
        assert character_error_rate("abc", "abc") == 0.0
        assert character_error_rate("abc", "axc") == pytest.approx(1 / 3)
        assert word_error_rate("a b c", "a b c") == 0.0
        assert word_error_rate("a b c", "a x c") == pytest.approx(1 / 3)
        assert word_error_rate("", "x") == 1.0


class TestTraining:
    def test_micro_training_reduces_loss(self):
        # measure loss directly: untrained vs micro-trained params on a
        # fixed batch
        import jax
        import jax.numpy as jnp
        import optax

        from gvl_tpu.models.whisper import WhisperModel
        from gvl_tpu.training.asr_train import _render_batch

        cfg = ASRTrainConfig(steps=120, batch_size=8, audio_seconds=1.6,
                             model=MICRO, log_every=0, render_workers=0)
        model = WhisperModel(MICRO)
        rng = np.random.default_rng(7)
        mel, tokens, mask = _render_batch(rng, cfg)

        def loss(params):
            logits = model.apply({"params": params},
                                 jnp.asarray(mel, jnp.float32),
                                 jnp.asarray(tokens))
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits[:, :-1].astype(jnp.float32),
                jnp.asarray(tokens)[:, 1:])
            m = jnp.asarray(mask)[:, 1:]
            return float((ce * m).sum() / m.sum())

        init = model.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 160, 80)),
                          jnp.zeros((1, 4), jnp.int32))["params"]
        trained = train_asr(cfg)
        assert loss(trained) < loss(init) * 0.8

    def test_evaluate_runs(self, micro_trained):
        m = evaluate_asr(micro_trained, MICRO, n_utterances=2,
                         audio_seconds=1.6, batch_size=2)
        assert set(m) >= {"exact_match", "cer", "wer", "n"}
        assert 0.0 <= m["exact_match"] <= 1.0
        assert m["cer"] >= 0.0


class TestCheckpointAndServing:
    def test_save_load_roundtrip(self, micro_trained, tmp_path):
        import jax

        out = tmp_path / "asr"
        save_asr(micro_trained, out, config=MICRO,
                 metrics={"base": {"cer": 1.0}})
        assert is_trained_asr_checkpoint(out)
        assert not is_trained_asr_checkpoint(tmp_path / "missing")
        cfg, params = load_asr(out)
        assert cfg == MICRO
        # structure must survive exactly — whisper param names contain
        # "/" (conv1/kernel), which the flat-npz escaping must preserve
        from flax.traverse_util import flatten_dict

        a = flatten_dict(micro_trained)
        b = flatten_dict(params)
        assert set(a) == set(b)
        assert all(np.allclose(a[k], b[k]) for k in a)
        del jax

    def test_backend_protocol(self, micro_trained):
        asr = TrainedByteASR(MICRO, micro_trained, audio_seconds=1.6)
        rng = np.random.default_rng(8)
        wav = synth_speech(rng, "gold", total_seconds=1.6)
        text, conf = asr(wav, 16000)
        assert isinstance(text, str)
        assert 0.0 <= conf <= 1.0

    def test_backend_silence_and_resample(self, micro_trained):
        asr = TrainedByteASR(MICRO, micro_trained, audio_seconds=1.6)
        text, conf = asr(np.zeros(16000, np.float32), 16000)
        assert text == "" and conf == 0.0
        # 8 kHz input resamples through the same compiled program
        rng = np.random.default_rng(9)
        wav = synth_speech(rng, "key", total_seconds=1.6)[::2]
        text, _ = asr(wav, 8000)
        assert isinstance(text, str)

    def test_long_chunk_splits_into_windows(self, micro_trained):
        asr = TrainedByteASR(MICRO, micro_trained, audio_seconds=1.6)
        rng = np.random.default_rng(10)
        wav = np.concatenate([
            synth_speech(rng, "wave", total_seconds=1.6),
            synth_speech(rng, "stun", total_seconds=1.6),
        ])
        text, _ = asr(wav, 16000)
        assert isinstance(text, str)

    def test_factory_ladder(self, micro_trained, tmp_path):
        from gvl_tpu.audio.processor import create_audio_processor

        out = tmp_path / "asr"
        save_asr(micro_trained, out, config=MICRO)
        proc = create_audio_processor(asr_checkpoint=str(out))
        assert isinstance(proc.asr, TrainedByteASR)
        fake = create_audio_processor(
            asr_checkpoint=str(tmp_path / "nope"))
        assert not isinstance(fake.asr, TrainedByteASR)

    def test_processor_transcribes_through_backend(self, micro_trained):
        from gvl_tpu.audio.processor import AudioProcessor

        asr = TrainedByteASR(MICRO, micro_trained, audio_seconds=1.6)
        proc = AudioProcessor(asr_backend=asr)
        rng = np.random.default_rng(11)
        wav = synth_speech(rng, "boss", total_seconds=1.6)
        segments = proc.transcribe(wav, 16000)
        assert isinstance(segments, list)


@pytest.mark.skipif(
    not is_trained_asr_checkpoint("outputs/asr"),
    reason="shipped ASR artifact not present")
class TestShippedArtifact:
    """Capability gate on the SHIPPED checkpoint: the preset ladder must
    produce a processor that actually transcribes synthesized speech."""

    def test_preset_stack_transcribes_speech(self):
        from gvl_tpu.audio.processor import build_audio_stack
        from gvl_tpu.config.presets import load_preset

        preset = load_preset("light")
        proc, _ = build_audio_stack(preset.audio)
        assert isinstance(proc.asr, TrainedByteASR)

        rng = np.random.default_rng(123)
        total_cer = 0.0
        texts = [sample_utterance(rng) for _ in range(4)]
        for text in texts:
            wav = synth_speech(rng, text, total_seconds=6.0,
                               profile=SpeakerProfile.sample(rng))
            segs = proc.transcribe(wav, 16000)
            got = " ".join(s.text for s in segs)
            total_cer += character_error_rate(text, got)
        assert total_cer / len(texts) < 0.15, texts
