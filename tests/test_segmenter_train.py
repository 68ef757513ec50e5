"""Synthetic-scene segmenter training: loss, matching, NMS, checkpoint."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from gvl_tpu.models.sam import (  # noqa: E402
    PromptableSegmenter,
    SamConfig,
    hash_tokenize,
    load_segmenter_npz,
    save_segmenter_npz,
)
from gvl_tpu.training.segmenter_train import (  # noqa: E402
    CONCEPTS,
    MAX_INST,
    SegTrainConfig,
    evaluate_segmenter,
    make_batch,
    make_scene,
    segmentation_loss,
    train_segmenter,
)

TINY = SamConfig(image_size=64, patch_size=8, encoder_dim=64,
                 encoder_layers=2, encoder_heads=2, text_dim=32,
                 text_layers=1, decoder_dim=64, decoder_layers=1,
                 num_queries=4)


class TestSyntheticScenes:
    def test_scene_shapes_and_validity(self):
        rng = np.random.default_rng(0)
        frame, gt, valid = make_scene(rng, 64)
        assert frame.shape == (64, 64, 3) and frame.dtype == np.uint8
        assert gt.shape == (len(CONCEPTS), MAX_INST, 64, 64)
        # every valid instance has a nonempty mask; invalid slots empty
        for ci in range(len(CONCEPTS)):
            for i in range(MAX_INST):
                assert gt[ci, i].any() == bool(valid[ci, i])

    def test_batch_compact_dtypes(self):
        rng = np.random.default_rng(1)
        cfg = SegTrainConfig(image_size=64, batch_size=2)
        frames, gt, valid = make_batch(rng, cfg, TINY)
        assert frames.dtype == np.uint8
        assert gt.dtype == bool
        ms = TINY.image_size // TINY.mask_downscale
        assert gt.shape == (2, len(CONCEPTS), MAX_INST, ms, ms)


class TestLoss:
    def _fake_out(self, b=2, c=len(CONCEPTS), q=4, s=8):
        rng = np.random.default_rng(0)
        return {
            "mask_logits": jnp.asarray(rng.normal(size=(b, c, q, s, s))),
            "scores": jnp.asarray(rng.uniform(0.1, 0.9, (b, c, q))),
        }

    def test_perfect_prediction_scores_lower(self):
        """A prediction matching GT must lose less than an anti-prediction."""
        b, c, q, s = 1, len(CONCEPTS), 4, 8
        gt = np.zeros((b, c, MAX_INST, s, s), np.float32)
        gt[0, 0, 0, 2:6, 2:6] = 1.0
        valid = np.zeros((b, c, MAX_INST), bool)
        valid[0, 0, 0] = True
        good_logits = np.full((b, c, q, s, s), -8.0, np.float32)
        good_logits[0, 0, 0] = np.where(gt[0, 0, 0] > 0, 8.0, -8.0)
        good_scores = np.full((b, c, q), 0.01, np.float32)
        good_scores[0, 0, 0] = 0.99
        good = segmentation_loss(
            {"mask_logits": jnp.asarray(good_logits),
             "scores": jnp.asarray(good_scores)},
            jnp.asarray(gt), jnp.asarray(valid))
        bad = segmentation_loss(
            {"mask_logits": jnp.asarray(-good_logits),
             "scores": jnp.asarray(1.0 - good_scores)},
            jnp.asarray(gt), jnp.asarray(valid))
        assert float(good) < float(bad)

    def test_loss_finite_with_no_instances(self):
        b, c, q, s = 1, len(CONCEPTS), 4, 8
        out = self._fake_out(b, c, q, s)
        gt = jnp.zeros((b, c, MAX_INST, s, s))
        valid = jnp.zeros((b, c, MAX_INST), bool)
        loss = segmentation_loss(out, gt, valid)
        assert np.isfinite(float(loss))


class TestTraining:
    def test_short_training_reduces_loss_and_saves(self, tmp_path):
        import logging

        records = []
        handler = logging.Handler()
        handler.emit = lambda r: records.append(r.getMessage())
        train_logger = logging.getLogger("gvl_tpu.training.segmenter_train")
        train_logger.addHandler(handler)
        train_logger.setLevel(logging.INFO)
        cfg = SegTrainConfig(image_size=64, steps=25, batch_size=2,
                             log_every=24)
        variables = train_segmenter(TINY, cfg)
        losses = [float(m.split()[-1]) for m in records if "loss" in m]
        assert losses[-1] < losses[0]

        path = tmp_path / "sam.npz"
        save_segmenter_npz(variables, path)
        loaded = load_segmenter_npz(path)
        chex = jax.tree_util.tree_all(jax.tree.map(
            lambda a, b: jnp.allclose(a, b), variables, loaded))
        assert bool(chex)

        metrics = evaluate_segmenter(loaded, TINY, n_scenes=2)
        assert set(metrics) == {"mean_iou", "detection_rate_at_50",
                                "instances"}


class TestBackendNMS:
    def test_duplicate_masks_suppressed(self):
        from gvl_tpu.perception.segmenter import (
            JaxSegmenterBackend,
            SAMConfig,
        )

        config = SAMConfig(image_size=64)
        backend = JaxSegmenterBackend.__new__(JaxSegmenterBackend)
        backend.config = config
        backend.mesh = None
        backend._data_size = 1
        from gvl_tpu.models.sam import SamConfig as MC, hash_tokenize as ht
        backend.model_config = MC(image_size=64)
        backend._hash_tokenize = ht

        q, side = 4, 16
        masks = np.zeros((1, 1, q, side, side), bool)
        masks[0, 0, 0, 2:10, 2:10] = True   # instance A
        masks[0, 0, 1, 2:10, 2:10] = True   # exact duplicate of A
        masks[0, 0, 2, 12:15, 12:15] = True  # instance B
        scores = np.asarray([[[0.9, 0.8, 0.7, 0.0]]], np.float32)
        backend._run = lambda v, px, tok: {
            "mask": jnp.asarray(masks), "scores": jnp.asarray(scores)}
        backend.variables = {}

        out = backend([np.zeros((64, 64, 3), np.uint8)], ["enemy"], [0])
        dets = out[0][0]
        assert len(dets) == 2  # duplicate suppressed, zero-score dropped
        confs = sorted(d["mask"].confidence for d in dets)
        assert confs == [pytest.approx(0.7), pytest.approx(0.9)]


class TestConceptDemoScene:
    def test_concept_demo_draws_signatures(self):
        from gvl_tpu.io.video import SyntheticVideo

        video = SyntheticVideo("concept_demo", duration=4, fps=1,
                               width=160, height=120)
        frame = video.frame(0)
        assert frame.shape == (120, 160, 3)
        # enemy triangles are red-dominant pixels somewhere in frame
        red = (frame[:, :, 0] > 180) & (frame[:, :, 1] < 120)
        assert red.any()
