"""Segmenter tracking state machine, JAX segmenter model, OCR pipeline."""

import numpy as np
import pytest

from gvl_tpu.perception import (
    EntityState,
    OCRConfig,
    OCRPipeline,
    SAMConceptSegmenter,
    SAMConfig,
    SegmentationMask,
    TextCategorizer,
    create_ocr_pipeline,
    create_sam_segmenter,
)
from gvl_tpu.perception.ocr import DeterministicFakeOCR, OCRFrame, TextDetection
from gvl_tpu.perception.segmenter import DeterministicFakeSegmenter, mask_iou


def frames(n=5, h=120, w=160):
    rng = np.random.default_rng(0)
    return [rng.integers(0, 255, (h, w, 3), dtype=np.uint8) for _ in range(n)]


class TestMask:
    def test_from_logits(self):
        logits = np.full((20, 20), -5.0)
        logits[5:15, 8:18] = 5.0
        mask = SegmentationMask.from_logits(logits)
        assert mask.area_pixels == 100
        assert mask.bbox.to_xyxy() == (8.0, 5.0, 17.0, 14.0)
        assert 0 < mask.confidence < 1

    def test_iou(self):
        a = np.zeros((10, 10), bool)
        b = np.zeros((10, 10), bool)
        a[0:5, 0:10] = True
        b[0:10, 0:10] = True
        assert mask_iou(a, b) == pytest.approx(0.5)
        assert mask_iou(a, np.zeros((5, 5), bool)) == 0.0


class TestTracking:
    def test_persistent_identity_across_frames(self):
        seg = SAMConceptSegmenter(SAMConfig())
        ids = []
        for i, frame in enumerate(frames(4)):
            entities = seg.segment_with_prompts(frame, i, ["boss"])
            assert len(entities) == 1
            ids.append(entities[0].entity_id)
        assert len(set(ids)) == 1  # same drifting box tracked as one entity
        entity = seg.get_entity(ids[0])
        assert entity.duration_frames == 4
        assert len(entity.get_trajectory()) == 4

    def test_separate_ids_per_concept(self):
        seg = SAMConceptSegmenter()
        entities = seg.segment_with_prompts(frames(1)[0], 0, ["boss", "player"])
        assert {e.entity_id for e in entities} == {"boss_000", "player_000"}

    def test_lifecycle_active_occluded_lost_terminated(self):
        seg = SAMConceptSegmenter(SAMConfig(occlusion_patience=2,
                                            lost_patience=5,
                                            track_memory_frames=100))
        frame = frames(1)[0]
        seg.segment_with_prompts(frame, 0, ["boss"])
        entity = seg.get_all_entities()[0]
        assert entity.state is EntityState.ACTIVE
        # frames without the concept: run empty prompt lists to age entities
        seg.segment_with_prompts(frame, 1, [])
        assert entity.state is EntityState.OCCLUDED
        seg.segment_with_prompts(frame, 4, [])
        assert entity.state is EntityState.LOST
        seg.segment_with_prompts(frame, 10, [])
        assert entity.state is EntityState.TERMINATED

    def test_reacquisition_within_memory(self):
        seg = SAMConceptSegmenter(SAMConfig(track_memory_frames=30))
        fs = frames(2)
        first = seg.segment_with_prompts(fs[0], 0, ["boss"])[0]
        seg.segment_with_prompts(fs[0], 3, [])  # goes occluded
        again = seg.segment_with_prompts(fs[1], 5, ["boss"])[0]
        assert again.entity_id == first.entity_id
        assert again.state is EntityState.ACTIVE

    def test_min_area_filter(self):
        class TinyBackend(DeterministicFakeSegmenter):
            def __call__(self, frames_arr, concepts, idxs):
                out = super().__call__(frames_arr, concepts, idxs)
                for per_frame in out:
                    for dets in per_frame:
                        for det in dets:
                            m = det["mask"]
                            m.mask[:] = False
                            m.mask[0:3, 0:3] = True
                            det["mask"] = SegmentationMask(
                                m.mask, m.confidence, m.bbox, 9)
                return out

        cfg = SAMConfig(min_mask_area=100)
        seg = SAMConceptSegmenter(cfg, backend=TinyBackend(cfg))
        assert seg.segment_with_prompts(frames(1)[0], 0, ["boss"]) == []

    def test_batch_equivalence(self):
        cfg = SAMConfig()
        a = SAMConceptSegmenter(cfg)
        b = SAMConceptSegmenter(cfg)
        fs = frames(3)
        for i, f in enumerate(fs):
            a.segment_with_prompts(f, i, ["boss"])
        b.segment_batch(fs, [0, 1, 2], ["boss"])
        assert a.get_statistics() == b.get_statistics()

    def test_statistics_and_reset(self):
        seg = SAMConceptSegmenter()
        seg.segment_with_prompts(frames(1)[0], 0, ["boss", "player"])
        stats = seg.get_statistics()
        assert stats["total_entities"] == 2
        assert stats["entities_by_state"]["active"] == 2
        seg.reset()
        assert seg.get_statistics()["total_entities"] == 0


class TestJaxSegmenterModel:
    def test_batched_model_shapes(self):
        import jax
        import jax.numpy as jnp

        from gvl_tpu.models.sam import PromptableSegmenter, SamConfig, hash_tokenize

        cfg = SamConfig.tiny()
        model = PromptableSegmenter(cfg)
        pixels = jnp.zeros((2, 64, 64, 3))
        tokens = jnp.stack([
            jnp.asarray(hash_tokenize("boss enemy", cfg.text_vocab)),
            jnp.asarray(hash_tokenize("health bar", cfg.text_vocab)),
            jnp.asarray(hash_tokenize("player", cfg.text_vocab)),
        ])
        variables = model.init(jax.random.PRNGKey(0), pixels, tokens)
        out = model.apply(variables, pixels, tokens)
        assert out["mask_logits"].shape == (2, 3, 4, 16, 16)
        assert out["scores"].shape == (2, 3, 4)
        assert (np.asarray(out["scores"]) >= 0).all()

    def test_end_to_end_backend(self):
        seg = create_sam_segmenter(
            SAMConfig(image_size=64, min_mask_area=1,
                      detection_threshold=0.0), use_model=True)
        entities = seg.segment_with_prompts(frames(1, 64, 64)[0], 0, ["boss"])
        # random-init model: any detections must be valid TrackedEntities
        for e in entities:
            assert e.concept_label == "boss"
            assert e.frame_masks[0].mask.shape == (64, 64)


class TestOCR:
    def test_fake_engine_deterministic_and_categorized(self):
        ocr = OCRPipeline(OCRConfig(backend="fake"))
        frame = frames(1)[0]
        a = ocr.extract_text_from_frame(frame, 0, 0.0)
        b = OCRPipeline(OCRConfig(backend="fake")).extract_text_from_frame(
            frame, 0, 0.0)
        assert [d.text for d in a.detections] == [d.text for d in b.detections]
        assert all(d.category is not None for d in a.detections)

    def test_cache_hits(self):
        ocr = OCRPipeline(OCRConfig(backend="fake"))
        frame = frames(1)[0]
        first = ocr.extract_text_from_frame(frame, 0, 0.0)
        second = ocr.extract_text_from_frame(frame, 5, 5.0)
        assert second.processing_time_ms == 0.0
        assert second.timestamp == 5.0
        assert [d.text for d in second.detections] == [
            d.text for d in first.detections]

    def test_categorizer_rules(self):
        cat = TextCategorizer()
        assert cat.categorize("1250", ()) == "damage"
        assert cat.categorize("HP 100/100", ()) == "health"
        assert cat.categorize("LV 12", ()) == "level"
        assert cat.categorize("12:34", ()) == "time"
        assert cat.categorize("350 gold", ()) == "currency"
        assert cat.categorize("hello world", ()) == "general"
        assert cat.categorize("", ()) is None

    def test_text_timeline_and_changes(self):
        det = lambda t: TextDetection(t, 0.9, (0, 0, 1, 1), "health")
        ocr_frames = [
            OCRFrame(0, 0.0, [det("HP 100/100")]),
            OCRFrame(1, 1.0, [det("HP 100/100")]),
            OCRFrame(2, 2.0, [det("HP 55/100")]),
        ]
        changes = OCRPipeline.track_text_changes(ocr_frames, "hp")
        assert changes == [(0.0, "HP 100/100"), (2.0, "HP 55/100")]
        timeline = OCRPipeline.get_text_timeline(ocr_frames)
        assert len(timeline) == 3 and timeline[0][2] == "health"

    def test_roi_offsets(self):
        engine_calls = []

        def engine(crop):
            engine_calls.append(crop.shape)
            return [("X", 0.9, (1.0, 2.0, 3.0, 4.0))]

        ocr = OCRPipeline(
            OCRConfig(roi_regions=[(0.5, 0.5, 1.0, 1.0)], enable_caching=False),
            engine=engine,
        )
        frame = frames(1, 100, 200)[0]
        result = ocr.extract_text_from_frame(frame, 0, 0.0)
        assert engine_calls[0] == (50, 100, 3)
        assert result.detections[0].bbox == (101.0, 52.0, 103.0, 54.0)

    def test_video_frames_skip(self):
        ocr = create_ocr_pipeline("fake")
        results = ocr.extract_from_video_frames(frames(6), fps=2.0,
                                                skip_frames=2)
        assert [r.frame_idx for r in results] == [0, 2, 4]
        assert results[1].timestamp == 1.0
