"""Self-trained temporal clip encoder (the VideoMAE-class trained rung).

Covers the procedural clip generator's label contracts, a tiny
end-to-end train→save→load→infer cycle, the preset ladder resolution
order (HF dir > trained dir > hash fake), and the textual motion-event
emission into the timeline — the capability the reference's
embedding-only VideoMAE path (`/root/reference/scripts/
realtime_inference.py:339-381`) never had.
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from gvl_tpu.config import load_preset
from gvl_tpu.training.videomae_train import (
    CONCEPTS,
    DIRECTION_NAMES,
    EVENTS,
    ClipTrainConfig,
    TrainedClipEncoder,
    evaluate_clip_encoder,
    is_trained_clip_checkpoint,
    load_clip_encoder,
    make_clip,
    mini_videomae_config,
    save_clip_encoder,
    train_clip_encoder,
)


def _tiny_cfg():
    return mini_videomae_config(
        hidden_size=32, intermediate_size=64, num_layers=1, num_heads=2,
        image_size=48, patch_size=16, num_frames=8, tubelet_size=2)


class TestClipGenerator:
    def test_shapes_and_labels(self):
        rng = np.random.default_rng(0)
        for style in ("base", "aug", "holdout"):
            clip, lab = make_clip(rng, size=64, n_frames=8, style=style)
            assert clip.shape == (8, 64, 64, 3)
            assert clip.dtype == np.uint8
            assert 0 <= lab["direction"] < len(DIRECTION_NAMES)
            assert 0 <= lab["kind"] < len(CONCEPTS)
            assert 0 <= lab["event"] < len(EVENTS)

    def test_motion_is_temporal_not_static(self):
        """A moving entity must change position across frames; a static
        one must not — the direction label is unreadable from any single
        frame."""
        rng = np.random.default_rng(1)
        moved, static_found = False, False
        for _ in range(60):
            if moved and static_found:
                break
            clip, lab = make_clip(rng, size=64, n_frames=8, style="base")
            if lab["event"] != 0:
                continue
            diff = float(np.abs(clip[-1].astype(int)
                                - clip[0].astype(int)).mean())
            if lab["direction"] == 0:
                static_found = True
            else:
                moved = True
                assert diff > 0.5  # entity translated across the canvas
        assert moved and static_found

    def test_appear_vanish_events_render(self):
        rng = np.random.default_rng(2)
        seen = set()
        for _ in range(40):
            clip, lab = make_clip(rng, size=64, n_frames=8, style="base")
            seen.add(lab["event"])
        assert seen == {0, 1, 2}


class TestTrainSaveLoad:
    @pytest.fixture(scope="class")
    def trained(self, tmp_path_factory):
        cfg = ClipTrainConfig(steps=6, batch_size=4, pool_batches=3,
                              model=_tiny_cfg())
        params = train_clip_encoder(cfg)
        out = tmp_path_factory.mktemp("vmae_ckpt")
        save_clip_encoder(params, out, model_cfg=cfg.model,
                          metrics={"smoke": True})
        return str(out)

    def test_checkpoint_roundtrip(self, trained):
        assert is_trained_clip_checkpoint(trained)
        cfg, params = load_clip_encoder(trained)
        assert cfg.hidden_size == 32
        m = evaluate_clip_encoder(params, cfg, n_clips=8)
        assert set(m) >= {"direction_acc", "kind_acc", "event_acc",
                          "direction_acc_moving"}

    def test_encoder_interface(self, trained):
        enc = TrainedClipEncoder.from_dir(trained)
        rng = np.random.default_rng(3)
        clip, _ = make_clip(rng, size=64, n_frames=8)
        embs = enc.encode_clips([clip, clip])
        assert embs.shape == (2, 32)
        assert np.isfinite(embs).all()
        np.testing.assert_allclose(embs[0], embs[1], atol=1e-5)
        # short clips pad by repeating the last frame
        short = enc.encode_clip(clip[:3])
        assert short.shape == (32,)
        labels = enc.classify_clips([clip])
        assert len(labels) == 1
        assert labels[0]["direction"][0] in DIRECTION_NAMES
        assert labels[0]["kind"][0] in CONCEPTS
        assert labels[0]["event"][0] in EVENTS

    def test_ladder_prefers_trained_dir(self, trained):
        from gvl_tpu.temporal.clip_encoder import build_clip_encoder

        config = load_preset("light")
        config.perception.videomae_checkpoint = trained
        enc = build_clip_encoder(config)
        assert isinstance(enc, TrainedClipEncoder)

    def test_cached_dims_win_over_ladder(self, trained, tmp_path):
        """A feature cache written under one tower (hash 768) must not
        crash projection when reloaded under another (trained mini
        width): the projector head sizes off the DATA."""
        import scripts.realtime_inference as ri

        video = "synthetic://dimtest?duration=8&fps=2"
        config = load_preset("light")
        config.perception.use_videomae = True
        config.perception.videomae_checkpoint = None   # hash fake: 768
        config.inference.cache_dir = str(tmp_path)
        config.inference.use_feature_cache = True
        r1 = ri.process_video(video, config, use_cache=True)
        assert r1.videomae_embeddings[0][1].shape[-1] == 768

        config2 = load_preset("light")
        config2.perception.use_videomae = True
        config2.perception.videomae_checkpoint = trained  # 32-dim tower
        config2.inference.cache_dir = str(tmp_path)
        config2.inference.use_feature_cache = True
        r2 = ri.process_video(video, config2, use_cache=True)
        # cache hit serves the 768-d embeddings; the loop must size to
        # them, not to the resolved checkpoint
        assert r2.videomae_embeddings[0][1].shape[-1] == 768
        assert r2.loop.config.videomae_dim == 768


class _StubClassifierEncoder:
    """Deterministic classify_clips for the event-emission contract."""

    dim = 16

    def encode_clips(self, clips):
        return np.zeros((len(clips), self.dim), np.float32)

    def classify_clips(self, clips):
        out = []
        for i in range(len(clips)):
            if i == 0:   # confident mover → event expected
                out.append({"direction": ("E", 0.9),
                            "kind": ("player", 0.8),
                            "event": ("appears", 0.7)})
            elif i == 1:  # static → suppressed
                out.append({"direction": ("static", 0.95),
                            "kind": ("enemy", 0.9),
                            "event": ("none", 0.9)})
            else:         # low confidence → suppressed
                out.append({"direction": ("W", 0.3),
                            "kind": ("boss", 0.2),
                            "event": ("none", 0.5)})
        return out


class TestMotionEventEmission:
    def test_confident_motion_becomes_timeline_event(self):
        from gvl_tpu.fusion.timeline import ModalityType, TimelineIndexer
        from gvl_tpu.temporal.clip_encoder import extract_clip_embeddings

        rng = np.random.default_rng(4)
        frames = [(float(i), rng.integers(0, 255, (32, 32, 3),
                                          dtype=np.uint8))
                  for i in range(20)]
        timeline = TimelineIndexer()
        out = extract_clip_embeddings(frames, _StubClassifierEncoder(),
                                      clip_len=8, stride=4,
                                      timeline=timeline)
        assert len(out) >= 3
        events = timeline.query_by_modality(ModalityType.TEMPORAL)
        assert len(events) == 1  # only the confident mover
        assert "player moving right" in events[0].description
        assert "appears mid-clip" in events[0].description

    def test_hash_fake_emits_nothing(self):
        from gvl_tpu.fusion.timeline import ModalityType, TimelineIndexer
        from gvl_tpu.temporal.clip_encoder import (
            HashClipEncoder,
            extract_clip_embeddings,
        )

        rng = np.random.default_rng(5)
        frames = [(float(i), rng.integers(0, 255, (32, 32, 3),
                                          dtype=np.uint8))
                  for i in range(10)]
        timeline = TimelineIndexer()
        extract_clip_embeddings(frames, HashClipEncoder(16), clip_len=8,
                                stride=4, timeline=timeline)
        assert not timeline.query_by_modality(ModalityType.TEMPORAL)
