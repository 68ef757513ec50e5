"""JAX SAM port vs HF transformers.SamModel (random-init parity)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

torch = pytest.importorskip("torch")

from gvl_tpu.models.sam_vit import (  # noqa: E402
    SamViTConfig,
    convert_hf_sam,
    sam_predict,
    vision_encoder,
)


@pytest.fixture(scope="module")
def hf_pair():
    from transformers import SamConfig, SamModel

    hf_cfg = SamConfig(
        vision_config=dict(
            hidden_size=32, num_hidden_layers=3, num_attention_heads=2,
            image_size=64, patch_size=16, output_channels=16,
            global_attn_indexes=[1], window_size=2, mlp_dim=64,
            num_pos_feats=8),
        prompt_encoder_config=dict(
            hidden_size=16, image_embedding_size=4, image_size=64,
            patch_size=16),
        mask_decoder_config=dict(
            hidden_size=16, num_attention_heads=2, num_hidden_layers=2,
            iou_head_hidden_dim=16, mlp_dim=32),
    )
    torch.manual_seed(0)
    hf = SamModel(hf_cfg).eval()
    config = SamViTConfig.from_hf(hf_cfg)
    params = convert_hf_sam(hf.state_dict(), config)
    return hf, config, params


class TestVisionEncoderParity:
    def test_image_embeddings_match(self, hf_pair):
        hf, config, params = hf_pair
        rng = np.random.RandomState(0)
        pixels = rng.randn(2, 64, 64, 3).astype(np.float32)

        with torch.no_grad():
            ref = hf.vision_encoder(
                torch.tensor(pixels.transpose(0, 3, 1, 2))
            ).last_hidden_state.numpy()          # [B, C, H', W']
        out = np.asarray(vision_encoder(
            params["vision"], jnp.asarray(pixels), config))
        np.testing.assert_allclose(
            out.transpose(0, 3, 1, 2), ref, atol=2e-4)


class TestFullModelParity:
    def test_point_prompted_masks_match(self, hf_pair):
        hf, config, params = hf_pair
        rng = np.random.RandomState(1)
        pixels = rng.randn(1, 64, 64, 3).astype(np.float32)
        points = np.array([[[[20.0, 30.0], [45.0, 10.0]]]], np.float32)
        labels = np.array([[[1, 0]]], np.int64)

        with torch.no_grad():
            ref = hf(
                pixel_values=torch.tensor(pixels.transpose(0, 3, 1, 2)),
                input_points=torch.tensor(points),
                input_labels=torch.tensor(labels),
                multimask_output=True,
            )
        masks, iou = sam_predict(
            params, jnp.asarray(pixels), config,
            input_points=jnp.asarray(points),
            input_labels=jnp.asarray(labels))
        np.testing.assert_allclose(
            np.asarray(masks), ref.pred_masks.numpy(), atol=5e-4)
        np.testing.assert_allclose(
            np.asarray(iou), ref.iou_scores.numpy(), atol=5e-4)

    def test_box_prompted_masks_match(self, hf_pair):
        hf, config, params = hf_pair
        rng = np.random.RandomState(2)
        pixels = rng.randn(1, 64, 64, 3).astype(np.float32)
        boxes = np.array([[[8.0, 8.0, 40.0, 48.0]]], np.float32)

        with torch.no_grad():
            ref = hf(
                pixel_values=torch.tensor(pixels.transpose(0, 3, 1, 2)),
                input_boxes=torch.tensor(boxes),
                multimask_output=True,
            )
        masks, iou = sam_predict(
            params, jnp.asarray(pixels), config,
            input_boxes=jnp.asarray(boxes))
        np.testing.assert_allclose(
            np.asarray(masks), ref.pred_masks.numpy(), atol=5e-4)
        np.testing.assert_allclose(
            np.asarray(iou), ref.iou_scores.numpy(), atol=5e-4)

    def test_single_mask_output(self, hf_pair):
        hf, config, params = hf_pair
        rng = np.random.RandomState(3)
        pixels = rng.randn(1, 64, 64, 3).astype(np.float32)
        points = np.array([[[[32.0, 32.0]]]], np.float32)
        labels = np.array([[[1]]], np.int64)
        masks, iou = sam_predict(
            params, jnp.asarray(pixels), config,
            input_points=jnp.asarray(points),
            input_labels=jnp.asarray(labels),
            multimask_output=False)
        assert masks.shape[2] == 1 and iou.shape[2] == 1
