"""Qwen3-VL (vision tower + mrope + DeepStack) vs HF tiny-random model."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax

from gvl_tpu.models.qwen3vl import (
    Qwen3VL,
    Qwen3VLVisionConfig,
    Qwen3VLVisionTower,
    convert_hf_qwen3vl,
    convert_hf_qwen3vl_vision,
    mrope_cos_sin,
    patchify_frames,
    vl_position_ids,
)

MROPE_SECTION = (4, 2, 2)  # sums to head_dim//2 = 8 for the tiny config


def tiny_hf_model():
    import torch
    from transformers import Qwen3VLConfig, Qwen3VLForConditionalGeneration

    cfg = Qwen3VLConfig(
        vision_config=dict(
            hidden_size=32, depth=2, num_heads=2, patch_size=16,
            temporal_patch_size=2, spatial_merge_size=2,
            intermediate_size=64, out_hidden_size=48,
            num_position_embeddings=16, deepstack_visual_indexes=[0, 1],
        ),
        text_config=dict(
            hidden_size=48, num_hidden_layers=2, num_attention_heads=3,
            num_key_value_heads=1, head_dim=16, intermediate_size=96,
            vocab_size=512, rope_theta=10000.0,
            rope_scaling={"rope_type": "default",
                          "mrope_section": list(MROPE_SECTION),
                          "mrope_interleaved": True},
            max_position_embeddings=512,
        ),
        image_token_id=7, video_token_id=8, vision_start_token_id=5,
        vision_end_token_id=6,
    )
    torch.manual_seed(0)
    return Qwen3VLForConditionalGeneration(cfg).eval()


@pytest.fixture(scope="module")
def pair():
    hf = tiny_hf_model()
    vision_cfg, text_cfg, params = convert_hf_qwen3vl(hf)
    vl = Qwen3VL(vision_cfg, text_cfg, params, image_token_id=7,
                 mrope_section=MROPE_SECTION)
    return hf, vl


GRID = (1, 4, 4)  # t=1, 4x4 patches -> 4 merged tokens


def make_inputs(seed=0):
    rng = np.random.RandomState(seed)
    # pre-patchified pixels: [t*h*w, C*tp*ps*ps]
    patches = rng.randn(16, 3 * 2 * 16 * 16).astype(np.float32)
    # text ... <vision_start> <img>*4 <vision_end> text
    ids = np.array([[11, 12, 5, 7, 7, 7, 7, 6, 13, 14]], np.int64)
    return patches, ids


class TestVisionTower:
    def test_matches_hf_vision(self, pair):
        import torch

        hf, vl = pair
        patches, _ = make_inputs()
        with torch.no_grad():
            ref, ref_deep = hf.model.visual(
                torch.from_numpy(patches),
                grid_thw=torch.tensor([list(GRID)]),
            )
        out, deep = vl.encode_vision(patches, GRID)
        np.testing.assert_allclose(np.asarray(out), ref.numpy(),
                                   atol=3e-4, rtol=3e-4)
        assert len(deep) == len(ref_deep)
        for mine, theirs in zip(deep, ref_deep):
            np.testing.assert_allclose(np.asarray(mine), theirs.numpy(),
                                       atol=3e-4, rtol=3e-4)


class TestPositionIds:
    def test_matches_hf_get_rope_index(self, pair):
        import torch

        hf, vl = pair
        patches, ids = make_inputs()
        ref_pos, _ = hf.model.get_rope_index(
            torch.from_numpy(ids),
            image_grid_thw=torch.tensor([list(GRID)]),
        )
        mine = vl_position_ids(ids, GRID, image_token_id=7)
        np.testing.assert_array_equal(mine, ref_pos.numpy())


class TestFullModel:
    def test_multimodal_logits_match_hf(self, pair):
        import torch

        hf, vl = pair
        patches, ids = make_inputs()
        with torch.no_grad():
            ref = hf(
                input_ids=torch.from_numpy(ids),
                pixel_values=torch.from_numpy(patches),
                image_grid_thw=torch.tensor([list(GRID)]),
            ).logits
        logits = vl.forward(ids, patches, GRID)
        np.testing.assert_allclose(np.asarray(logits), ref.numpy(),
                                   atol=5e-3, rtol=5e-3)

    def test_text_only_logits_match_hf(self, pair):
        import torch

        hf, vl = pair
        ids = np.array([[11, 12, 13, 14, 15]], np.int64)
        with torch.no_grad():
            ref = hf(input_ids=torch.from_numpy(ids)).logits
        logits = vl.forward(ids)
        np.testing.assert_allclose(np.asarray(logits), ref.numpy(),
                                   atol=5e-3, rtol=5e-3)

    def test_vision_actually_influences_logits(self, pair):
        _, vl = pair
        patches, ids = make_inputs()
        base = np.asarray(vl.forward(ids, patches, GRID))
        other = np.asarray(vl.forward(ids, patches + 3.0, GRID))
        assert not np.allclose(base, other)


class TestPatchify:
    def test_shapes_and_grid(self):
        cfg = Qwen3VLVisionConfig.tiny()
        frames = np.zeros((3, 64, 64, 3), np.uint8)  # T padded 3->4
        patches, grid = patchify_frames(frames, cfg)
        assert grid == (2, 4, 4)
        assert patches.shape == (2 * 4 * 4, 3 * 2 * 16 * 16)

    def test_roundtrip_through_tower(self):
        cfg = Qwen3VLVisionConfig.tiny()
        tower = Qwen3VLVisionTower(cfg)
        frames = np.random.RandomState(0).randint(
            0, 255, (2, 64, 64, 3), np.uint8)
        patches, grid = patchify_frames(frames, cfg)
        variables = tower.init(jax.random.PRNGKey(0),
                               jnp.asarray(patches), grid)
        out, deep = tower.apply(variables, jnp.asarray(patches), grid)
        assert out.shape == (grid[0] * grid[1] * grid[2] // 4, 48)
        assert len(deep) == 2


class TestGenerate:
    def test_greedy_matches_hf_generate(self, pair):
        import torch

        hf, vl = pair
        patches, ids = make_inputs()
        with torch.no_grad():
            ref = hf.generate(
                input_ids=torch.from_numpy(ids),
                pixel_values=torch.from_numpy(patches),
                image_grid_thw=torch.tensor([list(GRID)]),
                max_new_tokens=6, do_sample=False,
                eos_token_id=None, pad_token_id=0,
            )[0, ids.shape[1]:].tolist()
        out = vl.generate(ids, patches, GRID, max_new_tokens=6,
                          temperature=0.0, eos_token_id=-1)
        assert out == ref


class TestAgentVLBackend:
    def test_reasoning_core_with_vl_backend_sees_the_frame(self, pair):
        """The full agent path: frame -> patchify -> vision tower -> spliced
        tokens -> generated answer; changing the frame changes the output."""
        from gvl_tpu.agent import ReasoningCoreConfig
        from gvl_tpu.agent.core import Qwen3VLChatBackend, ReasoningCore
        from gvl_tpu.fusion import ModalityType, TimelineIndexer

        hf, vl = pair

        class HashTok:  # minimal deterministic tokenizer
            def encode(self, text):
                from gvl_tpu.models.sam import hash_tokenize
                return [int(x) for x in
                        hash_tokenize(text, 500, 48) if x != 0]

            def decode(self, ids, skip_special_tokens=True):
                return " ".join(f"t{i}" for i in ids)

        backend = Qwen3VLChatBackend(
            vl, HashTok(), image_token_id=7, vision_start_id=5,
            vision_end_id=6, eos_token_id=-1, image_size=64,
        )
        cfg = ReasoningCoreConfig(max_new_tokens=4)
        core = ReasoningCore(cfg, backend=backend)
        idx = TimelineIndexer()
        idx.add_event(3.0, ModalityType.VISUAL, "boss appears")

        frame_a = np.zeros((64, 64, 3), np.uint8)
        frame_b = np.full((64, 64, 3), 200, np.uint8)
        out_a = core.reason("what is on screen?", current_frame=frame_a,
                            timeline_indexer=idx, track_conversation=False)
        out_b = core.reason("what is on screen?", current_frame=frame_b,
                            timeline_indexer=idx, track_conversation=False)
        assert out_a and out_b
        assert out_a != out_b  # pixels reached the model


class TestShardedVL:
    def test_tp_sharded_forward_matches_unsharded(self, pair):
        """TP-sharded text decoder (2x4 mesh) + replicated vision tower
        produce the same multimodal logits as the unsharded model."""
        from gvl_tpu.parallel.mesh import build_mesh
        from gvl_tpu.parallel.sharding import LLM_RULES, shard_pytree

        _, vl = pair
        patches, ids = make_inputs()
        expected = np.asarray(vl.forward(ids, patches, GRID))

        mesh = build_mesh(2, 4)
        sharded_vars = {
            "vision": vl.variables["vision"],          # replicated
            "text": shard_pytree(
                {"params": vl.variables["text"]}, mesh, LLM_RULES
            )["params"],
        }
        sharded = Qwen3VL(vl.vision_config, vl.text_config, sharded_vars,
                          image_token_id=7, mrope_section=MROPE_SECTION)
        got = np.asarray(sharded.forward(ids, patches, GRID))
        np.testing.assert_allclose(got, expected, atol=2e-4, rtol=2e-4)

    def test_tp_sharded_generate_matches_unsharded(self, pair):
        from gvl_tpu.parallel.mesh import build_mesh
        from gvl_tpu.parallel.sharding import LLM_RULES, shard_pytree

        _, vl = pair
        patches, ids = make_inputs()
        expected = vl.generate(ids, patches, GRID, max_new_tokens=5,
                               temperature=0.0)
        mesh = build_mesh(2, 4)
        sharded_vars = {
            "vision": vl.variables["vision"],
            "text": shard_pytree(
                {"params": vl.variables["text"]}, mesh, LLM_RULES
            )["params"],
        }
        sharded = Qwen3VL(vl.vision_config, vl.text_config, sharded_vars,
                          image_token_id=7, mrope_section=MROPE_SECTION)
        got = sharded.generate(ids, patches, GRID, max_new_tokens=5,
                               temperature=0.0)
        assert got == expected
