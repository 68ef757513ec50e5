"""SigLIP tower: HF cross-check on a tiny random model + semantic encoder."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gvl_tpu.models.siglip import (
    SigLIPVisionConfig,
    SigLIPVisionTower,
    convert_hf_siglip_vision,
)
from gvl_tpu.perception.semantic import (
    AspectPreservingResizer,
    NaFlexConfig,
    SigLIPSemanticEncoder,
)


@pytest.fixture(scope="module")
def hf_pair():
    """Tiny randomly-initialized HF SiglipVisionModel + converted params."""
    torch = pytest.importorskip("torch")
    from transformers import SiglipVisionConfig as HFConfig, SiglipVisionModel

    hf_cfg = HFConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, image_size=56, patch_size=14,
    )
    torch.manual_seed(0)
    hf_model = SiglipVisionModel(hf_cfg).eval()
    cfg = SigLIPVisionConfig.tiny(image_size=56)
    params = convert_hf_siglip_vision(hf_model.state_dict(), cfg)
    return hf_model, SigLIPVisionTower(cfg), {"params": params}


class TestHFParity:
    def test_last_hidden_state_matches(self, hf_pair):
        import torch

        hf_model, tower, variables = hf_pair
        x = np.random.RandomState(1).randn(2, 56, 56, 3).astype(np.float32)
        with torch.no_grad():
            ref = hf_model(
                pixel_values=torch.from_numpy(x.transpose(0, 3, 1, 2))
            )
        out = tower.apply(variables, jnp.asarray(x), pool=True)
        np.testing.assert_allclose(
            np.asarray(out["last_hidden_state"]),
            ref.last_hidden_state.numpy(),
            atol=2e-4, rtol=2e-4,
        )

    def test_pooled_matches(self, hf_pair):
        import torch

        hf_model, tower, variables = hf_pair
        x = np.random.RandomState(2).randn(1, 56, 56, 3).astype(np.float32)
        with torch.no_grad():
            ref = hf_model(
                pixel_values=torch.from_numpy(x.transpose(0, 3, 1, 2))
            )
        out = tower.apply(variables, jnp.asarray(x), pool=True)
        np.testing.assert_allclose(
            np.asarray(out["pooled"]), ref.pooler_output.numpy(),
            atol=2e-4, rtol=2e-4,
        )

    def test_jit_static_shapes(self, hf_pair):
        _, tower, variables = hf_pair
        f = jax.jit(lambda v, x: tower.apply(v, x, pool=True)["pooled"])
        out = f(variables, jnp.ones((4, 56, 56, 3)))
        assert out.shape == (4, 64)


class TestNaFlexResizer:
    def setup_method(self):
        self.resizer = AspectPreservingResizer(NaFlexConfig())

    def test_landscape_rounding(self):
        h, w = self.resizer.compute_optimal_size(200, 400)  # 2:1 landscape
        assert w == 378  # 384 floored to patch multiple
        assert h == 182  # aspect-preserved, floored to 14-multiple
        assert h % 14 == 0 and w % 14 == 0

    def test_portrait(self):
        h, w = self.resizer.compute_optimal_size(400, 200)
        assert h == 378 and w == 182

    def test_minimum_floor(self):
        h, w = self.resizer.compute_optimal_size(1000, 10)
        assert h >= 14 and w >= 14

    def test_canvas_resize_pads(self):
        img = np.full((100, 200, 3), 255, np.uint8)
        canvas, aspect = self.resizer.resize_to_canvas(img, 384)
        assert canvas.shape == (384, 384, 3)
        assert aspect == pytest.approx(2.0)
        assert canvas[:192, :384].mean() > 200  # image in top-left
        assert canvas[200:, :].max() == 0       # zero padding below


class TestSemanticEncoder:
    def frame_and_masks(self):
        rng = np.random.RandomState(0)
        frame = rng.randint(0, 255, (240, 320, 3), dtype=np.uint8)
        m1 = np.zeros((240, 320), bool)
        m1[50:100, 60:120] = True
        m2 = np.zeros((240, 320), bool)
        m2[150:200, 200:280] = True
        return frame, [("e1", m1), ("e2", m2)]

    def test_encode_masked_regions_shapes(self):
        enc = SigLIPSemanticEncoder()
        frame, masks = self.frame_and_masks()
        embs = enc.encode_masked_regions(frame, masks)
        assert len(embs) == 2
        assert embs[0].embedding.shape == (1152,)
        assert embs[0].entity_id == "e1"
        x1, y1, x2, y2 = embs[0].original_bbox
        assert x1 <= 60 and x2 >= 120  # expanded bbox covers mask

    def test_deterministic_fake(self):
        enc = SigLIPSemanticEncoder()
        frame, masks = self.frame_and_masks()
        a = enc.encode_masked_regions(frame, masks)
        b = enc.encode_masked_regions(frame, masks)
        np.testing.assert_array_equal(a[0].embedding, b[0].embedding)
        assert not np.allclose(a[0].embedding, a[1].embedding)

    def test_empty_mask_center_crop(self):
        enc = SigLIPSemanticEncoder()
        frame, _ = self.frame_and_masks()
        embs = enc.encode_masked_regions(
            frame, [("ghost", np.zeros((240, 320), bool))])
        assert len(embs) == 1

    def test_encode_image(self):
        enc = SigLIPSemanticEncoder()
        frame, _ = self.frame_and_masks()
        emb = enc.encode_image(frame)
        assert emb.shape == (1152,)

    def test_similarity_and_topk(self):
        enc = SigLIPSemanticEncoder()
        frame, masks = self.frame_and_masks()
        embs = enc.encode_masked_regions(frame, masks)
        assert enc.compute_similarity(embs[0], embs[0]) == pytest.approx(1.0)
        ranked = enc.find_similar_regions(embs[0], embs, top_k=2)
        assert ranked[0][0].entity_id == "e1"

    def test_encode_with_context(self):
        enc = SigLIPSemanticEncoder()
        frame, masks = self.frame_and_masks()
        region, context = enc.encode_with_context(frame, masks[0][1])
        assert region.entity_id == "region"
        assert context.entity_id == "context"
        assert not np.allclose(region.embedding, context.embedding)

    def test_jax_backend_on_tiny_model(self, hf_pair):
        from gvl_tpu.perception.semantic import JaxSigLIPBackend

        _, tower, variables = hf_pair
        cfg = NaFlexConfig(base_resolution=56, embedding_dim=64)
        enc = SigLIPSemanticEncoder(
            cfg, backend=JaxSigLIPBackend(tower, variables, dtype="float32"))
        frame, masks = self.frame_and_masks()
        embs = enc.encode_masked_regions(frame, masks)
        assert embs[0].embedding.shape == (64,)


class TestTextTowerParity:
    @pytest.fixture(scope="class")
    def text_pair(self):
        import torch
        from transformers import SiglipTextConfig as HFCfg, SiglipTextModel

        from gvl_tpu.models.siglip import (
            SigLIPTextConfig,
            convert_hf_siglip_text,
        )

        hf_cfg = HFCfg(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, vocab_size=256,
            max_position_embeddings=16, hidden_act="gelu_pytorch_tanh")
        torch.manual_seed(0)
        hf = SiglipTextModel(hf_cfg).eval()
        cfg = SigLIPTextConfig.tiny()
        params = convert_hf_siglip_text(hf.state_dict(), cfg)
        return hf, cfg, {"params": params}

    def test_pooled_and_hidden_match(self, text_pair):
        import torch

        from gvl_tpu.models.siglip import SigLIPTextTower

        hf, cfg, variables = text_pair
        rng = np.random.RandomState(0)
        ids = rng.randint(0, cfg.vocab_size, (3, 16))
        with torch.no_grad():
            ref = hf(input_ids=torch.tensor(ids))
        out = SigLIPTextTower(cfg).apply(variables, jnp.asarray(ids))
        np.testing.assert_allclose(
            np.asarray(out["last_hidden_state"]),
            ref.last_hidden_state.numpy(), atol=2e-4)
        np.testing.assert_allclose(
            np.asarray(out["pooled"]), ref.pooler_output.numpy(),
            atol=2e-4)

    def test_open_vocab_scoring_shape(self, text_pair):
        """vision pooled x text pooled cosine — the open-vocab bridge."""
        from gvl_tpu.models.siglip import SigLIPTextTower

        _, cfg, variables = text_pair
        rng = np.random.RandomState(1)
        ids = rng.randint(0, cfg.vocab_size, (4, 16))  # 4 concepts
        text = np.asarray(SigLIPTextTower(cfg).apply(
            variables, jnp.asarray(ids))["pooled"])
        regions = rng.randn(7, cfg.projection_size)    # 7 region embeddings
        t = text / np.linalg.norm(text, axis=-1, keepdims=True)
        r = regions / np.linalg.norm(regions, axis=-1, keepdims=True)
        scores = r @ t.T
        assert scores.shape == (7, 4)
        assert np.abs(scores).max() <= 1.0 + 1e-6
