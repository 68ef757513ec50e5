"""Preset checkpoint ladders for VideoMAE / wav2vec2 / Whisper.

VERDICT round-2 item: the main pipeline must consume the JAX towers when
a local checkpoint resolves — with zero code edits — and the fakes only
otherwise (the same auto-ladder the SAM/SigLIP/OCR stacks already have).
Reference extraction path: `/root/reference/scripts/realtime_inference.py:
339-441, 525-602`.
"""

import json

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from gvl_tpu.config import load_preset


def _frames(n=20, h=48, w=64):
    rng = np.random.default_rng(0)
    return [(float(i), rng.integers(0, 255, (h, w, 3), dtype=np.uint8))
            for i in range(n)]


@pytest.fixture(scope="module")
def tiny_videomae_dir(tmp_path_factory):
    import torch
    from transformers import VideoMAEConfig as HFCfg, VideoMAEModel

    d = tmp_path_factory.mktemp("videomae")
    hf_cfg = HFCfg(hidden_size=32, intermediate_size=64,
                   num_hidden_layers=1, num_attention_heads=2,
                   image_size=32, patch_size=16, num_frames=4,
                   tubelet_size=2)
    torch.manual_seed(0)
    VideoMAEModel(hf_cfg).save_pretrained(d)
    return str(d)


@pytest.fixture(scope="module")
def tiny_wav2vec2_dir(tmp_path_factory):
    import torch
    from transformers import Wav2Vec2Config as HFCfg, Wav2Vec2Model

    d = tmp_path_factory.mktemp("wav2vec2")
    hf_cfg = HFCfg(
        hidden_size=32, intermediate_size=64, num_hidden_layers=1,
        num_attention_heads=2, conv_dim=(16, 16), conv_stride=(5, 2),
        conv_kernel=(10, 3), num_feat_extract_layers=2, conv_bias=False,
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
        do_stable_layer_norm=False, feat_extract_norm="group",
    )
    torch.manual_seed(0)
    Wav2Vec2Model(hf_cfg).save_pretrained(d)
    return str(d)


@pytest.fixture(scope="module")
def tiny_whisper_dir(tmp_path_factory):
    import torch
    from transformers import (
        WhisperConfig as HFCfg,
        WhisperModel,
        WhisperTokenizer,
    )

    d = tmp_path_factory.mktemp("whisper")
    specials = ["<|endoftext|>", "<|startoftranscript|>", "<|en|>",
                "<|transcribe|>", "<|notimestamps|>"]
    vocab = {}
    for ch in "abcdefghijklmnopqrstuvwxyz":
        vocab[ch] = len(vocab)
    vocab["Ġ"] = len(vocab)
    for s in specials:
        vocab[s] = len(vocab)
    (d / "vocab.json").write_text(json.dumps(vocab))
    (d / "merges.txt").write_text("#version: 0.2\n")
    tok = WhisperTokenizer(vocab_file=str(d / "vocab.json"),
                           merges_file=str(d / "merges.txt"))
    tok.add_special_tokens({"additional_special_tokens": specials})
    tok.save_pretrained(d)
    sot = vocab["<|startoftranscript|>"]
    eot = vocab["<|endoftext|>"]
    hf_cfg = HFCfg(d_model=32, encoder_layers=1, decoder_layers=1,
                   encoder_attention_heads=2, decoder_attention_heads=2,
                   encoder_ffn_dim=64, decoder_ffn_dim=64,
                   num_mel_bins=80, max_source_positions=1500,
                   max_target_positions=96, vocab_size=len(vocab),
                   decoder_start_token_id=sot, eos_token_id=eot,
                   bos_token_id=eot, pad_token_id=eot)
    torch.manual_seed(0)
    WhisperModel(hf_cfg).save_pretrained(d)
    return str(d)


class TestVideoMAELadder:
    def test_no_checkpoint_uses_hash_fake(self):
        from gvl_tpu.temporal.clip_encoder import (
            HashClipEncoder,
            build_clip_encoder,
        )

        config = load_preset("light")
        config.perception.videomae_checkpoint = None  # below trained rung
        enc = build_clip_encoder(config)
        assert isinstance(enc, HashClipEncoder)
        emb = enc.encode_clip(np.zeros((4, 32, 32, 3), np.uint8))
        assert emb.shape == (768,)

    def test_default_preset_picks_shipped_tower(self):
        from gvl_tpu.temporal.clip_encoder import build_clip_encoder
        from gvl_tpu.training.videomae_train import (
            TrainedClipEncoder,
            is_trained_clip_checkpoint,
        )

        if not is_trained_clip_checkpoint("outputs/videomae"):
            pytest.skip("shipped clip-encoder artifact not present")
        config = load_preset("light")
        enc = build_clip_encoder(config)
        assert isinstance(enc, TrainedClipEncoder)

    def test_checkpoint_loads_jax_tower(self, tiny_videomae_dir):
        from gvl_tpu.temporal.clip_encoder import (
            JaxVideoMAEClipEncoder,
            build_clip_encoder,
        )

        config = load_preset("light")
        config.perception.videomae_checkpoint = tiny_videomae_dir
        enc = build_clip_encoder(config)
        assert isinstance(enc, JaxVideoMAEClipEncoder)
        clip = np.random.default_rng(1).integers(
            0, 255, (16, 48, 64, 3), dtype=np.uint8)
        emb = enc.encode_clip(clip)
        assert emb.shape == (32,)
        assert np.isfinite(emb).all()
        # deterministic + content-sensitive
        np.testing.assert_allclose(enc.encode_clip(clip), emb, atol=1e-5)
        other = enc.encode_clip(np.zeros_like(clip))
        assert not np.allclose(other, emb)

    def test_main_path_consumes_ladder(self, tiny_videomae_dir):
        """extract_videomae_embeddings routes through the JAX tower when
        the preset carries a checkpoint — zero code edits."""
        import scripts.realtime_inference as ri

        config = load_preset("light")
        config.perception.videomae_checkpoint = None  # pin the fake rung
        frames = _frames(20)
        fake = ri.extract_videomae_embeddings(frames, config)
        config.perception.videomae_checkpoint = tiny_videomae_dir
        real = ri.extract_videomae_embeddings(frames, config)
        assert len(real) == len(fake) > 0
        assert real[0][1].shape == (32,)   # model dim, not hash-fake 768
        assert fake[0][1].shape == (768,)

    def test_short_clip_pads_by_repeat(self, tiny_videomae_dir):
        from gvl_tpu.temporal.clip_encoder import build_clip_encoder

        config = load_preset("light")
        config.perception.videomae_checkpoint = tiny_videomae_dir
        enc = build_clip_encoder(config)
        short = np.random.default_rng(2).integers(
            0, 255, (3, 32, 32, 3), dtype=np.uint8)
        emb = enc.encode_clip(short)
        assert emb.shape == (32,) and np.isfinite(emb).all()


class TestAudioLadder:
    def test_no_checkpoints_use_fakes(self):
        from gvl_tpu.audio import (
            DeterministicFakeASR,
            HashAudioEmbedder,
            build_audio_stack,
        )

        config = load_preset("light")
        config.audio.asr_checkpoint = None   # below the trained rung
        proc, embedder = build_audio_stack(config.audio)
        assert isinstance(embedder, HashAudioEmbedder)
        assert isinstance(proc.asr, DeterministicFakeASR)

    def test_default_preset_picks_shipped_asr(self):
        import pytest

        from gvl_tpu.audio import build_audio_stack
        from gvl_tpu.training.asr_train import (
            TrainedByteASR,
            is_trained_asr_checkpoint,
        )

        if not is_trained_asr_checkpoint("outputs/asr"):
            pytest.skip("shipped ASR artifact not present")
        config = load_preset("light")
        proc, _ = build_audio_stack(config.audio)
        assert isinstance(proc.asr, TrainedByteASR)

    def test_event_features_are_trained_embedder_rung(self):
        """Below the HF wav2vec2 tower, the shipped event classifier's
        penultimate features are the audio chunk embedder — and they
        separate event classes (same-class windows closer than
        cross-class)."""
        from pathlib import Path

        import pytest

        from gvl_tpu.audio import build_audio_stack
        from gvl_tpu.audio.event_model import (
            EventModelConfig,
            TrainedAudioEmbedder,
            synth_event,
        )

        if not Path("outputs/audio_event_params.npz").exists():
            pytest.skip("shipped event artifact not present")
        config = load_preset("standard")  # light disables use_wav2vec
        config.audio.wav2vec2_checkpoint = None
        _, embedder = build_audio_stack(config.audio)
        assert isinstance(embedder, TrainedAudioEmbedder)

        cfg = EventModelConfig()
        rng = np.random.default_rng(0)

        def emb(cls):
            wav = synth_event(rng, cls, cfg)
            return embedder(np.asarray(wav, np.float32), cfg.sample_rate)

        e1 = emb("impact")
        assert e1.shape == (cfg.hidden,)
        cos = lambda a, b: float(
            (a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b)))
        same = np.mean([cos(emb("impact"), emb("impact"))
                        for _ in range(3)])
        cross = np.mean([cos(emb("impact"), emb("music"))
                         for _ in range(3)])
        assert same > cross

    def test_wav2vec2_checkpoint_loads_jax_embedder(
        self, tiny_wav2vec2_dir
    ):
        from gvl_tpu.audio import Wav2Vec2JaxEmbedder, build_audio_stack

        config = load_preset("standard")
        config.audio.wav2vec2_checkpoint = tiny_wav2vec2_dir
        config.audio.wav2vec2_chunk_seconds = 0.05   # keep CI fast
        _, embedder = build_audio_stack(config.audio)
        assert isinstance(embedder, Wav2Vec2JaxEmbedder)
        chunk = np.random.default_rng(0).standard_normal(
            800).astype(np.float32)
        emb = embedder(chunk, 16000)
        assert emb.shape == (32,)
        assert np.isfinite(emb).all()

    def test_use_wav2vec_off_keeps_fake(self, tiny_wav2vec2_dir):
        from gvl_tpu.audio import HashAudioEmbedder, build_audio_stack

        config = load_preset("light")     # use_wav2vec=False
        config.audio.wav2vec2_checkpoint = tiny_wav2vec2_dir
        _, embedder = build_audio_stack(config.audio)
        assert isinstance(embedder, HashAudioEmbedder)

    def test_whisper_checkpoint_loads_jax_asr(self, tiny_whisper_dir):
        from gvl_tpu.audio import build_audio_stack
        from gvl_tpu.audio.processor import WhisperJaxASR

        config = load_preset("light")
        config.audio.whisper_checkpoint = tiny_whisper_dir
        proc, _ = build_audio_stack(config.audio)
        assert isinstance(proc.asr, WhisperJaxASR)
        # one real chunk through mel → encoder → cached greedy decode
        wav = np.sin(np.linspace(0, 440 * 2 * np.pi, 16000)
                     ).astype(np.float32)
        text, conf = proc.asr(wav, 16000)
        assert isinstance(text, str)      # random weights → any string
        assert conf > 0

    def test_main_path_consumes_audio_ladder(self, tiny_wav2vec2_dir,
                                             tmp_path):
        """run_audio_analysis embeds with the JAX wav2vec2 when the
        preset carries a checkpoint."""
        import wave

        import scripts.realtime_inference as ri
        from gvl_tpu.fusion import TimelineIndexer

        wav_path = tmp_path / "clip.wav"
        data = (np.sin(np.linspace(0, 100, 32000)) * 2e4).astype(np.int16)
        with wave.open(str(wav_path), "wb") as wf:
            wf.setnchannels(1)
            wf.setsampwidth(2)
            wf.setframerate(16000)
            wf.writeframes(data.tobytes())
        video_path = str(tmp_path / "clip.mp4")   # sibling .wav resolves

        config = load_preset("standard")
        config.audio.wav2vec2_checkpoint = tiny_wav2vec2_dir
        config.audio.wav2vec2_chunk_seconds = 0.05
        _, embs = ri.run_audio_analysis(video_path, TimelineIndexer(),
                                        config)
        assert len(embs) > 0
        assert embs[0][1].shape == (32,)   # model dim, not hash-fake 1024
