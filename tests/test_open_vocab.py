"""Open-vocab composite (SAM proposals + SigLIP text scoring) wiring."""

from pathlib import Path

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")
import jax.numpy as jnp  # noqa: E402


@pytest.fixture(scope="module")
def backend():
    from transformers import (
        SamConfig,
        SamModel,
        SiglipTextConfig as HFTextCfg,
        SiglipTextModel,
    )

    from gvl_tpu.models.sam_vit import SamViTConfig, convert_hf_sam
    from gvl_tpu.models.siglip import (
        SigLIPTextConfig,
        SigLIPTextTower,
        SigLIPVisionConfig,
        SigLIPVisionTower,
        convert_hf_siglip_text,
    )
    from gvl_tpu.perception.open_vocab import OpenVocabSamBackend
    from gvl_tpu.perception.semantic import JaxSigLIPBackend

    hf_sam_cfg = SamConfig(
        vision_config=dict(
            hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
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
    sam = SamModel(hf_sam_cfg).eval()
    sam_config = SamViTConfig.from_hf(hf_sam_cfg)
    sam_params = convert_hf_sam(sam.state_dict(), sam_config)

    vcfg = SigLIPVisionConfig.tiny(image_size=56)
    tower = SigLIPVisionTower(vcfg)
    vision_vars = jax.jit(tower.init)(
        jax.random.PRNGKey(0), jnp.ones((1, 56, 56, 3)))
    vision_backend = JaxSigLIPBackend(tower, vision_vars, dtype="float32")

    tcfg = SigLIPTextConfig.tiny(
        projection_size=vcfg.hidden_size)  # shared embedding dim
    hf_text = SiglipTextModel(HFTextCfg(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, vocab_size=256,
        max_position_embeddings=16, projection_size=vcfg.hidden_size,
        hidden_act="gelu_pytorch_tanh")).eval()
    text_params = {"params": convert_hf_siglip_text(
        hf_text.state_dict(), tcfg)}
    text_tower = SigLIPTextTower(tcfg)

    def tokenize(texts):
        ids = np.zeros((len(texts), tcfg.max_position), np.int32)
        for i, t in enumerate(texts):
            toks = [(hash(w) % 255) + 1 for w in t.split()][:16]
            ids[i, :len(toks)] = toks
        return ids

    return OpenVocabSamBackend(
        sam_config, sam_params, vision_backend, text_tower, text_params,
        tokenize, grid=2, score_threshold=-10.0)  # keep all at random init


class TestOpenVocabBackend:
    def test_backend_protocol_shapes(self, backend):
        rng = np.random.RandomState(0)
        frames = [rng.randint(0, 255, (48, 64, 3), np.uint8)
                  for _ in range(2)]
        concepts = ["enemy", "health bar"]
        results = backend(frames, concepts, [0, 1])
        assert len(results) == 2
        for per_frame in results:
            assert len(per_frame) == len(concepts)
            for dets in per_frame:
                for det in dets:
                    mask = det["mask"]
                    assert mask.mask.shape == (48, 64)
                    assert 0 <= mask.area_pixels <= 48 * 64

    def test_text_cache_reused(self, backend):
        backend._text_cache.clear()
        frames = [np.zeros((32, 32, 3), np.uint8)]
        backend(frames, ["boss"], [0])
        backend(frames, ["boss"], [0])
        assert len(backend._text_cache) == 1

    def test_prompt_ensemble_embeddings(self, backend):
        """Templated ensemble: normalized mean of per-template embeddings."""
        backend._text_cache.clear()
        base = backend._concept_embeddings(["enemy", "boss"])
        assert base.shape[0] == 2
        np.testing.assert_allclose(
            np.linalg.norm(base, axis=-1), 1.0, atol=1e-5)

        backend.prompt_templates = ("{}", "sprite of {}")
        backend._text_cache.clear()
        try:
            ens = backend._concept_embeddings(["enemy", "boss"])
            assert ens.shape == base.shape
            np.testing.assert_allclose(
                np.linalg.norm(ens, axis=-1), 1.0, atol=1e-5)
            # ensemble must actually mix the templated variants
            assert not np.allclose(ens, base, atol=1e-4)
            # and equal the normalized mean of the per-template embeddings
            backend.prompt_templates = None
            backend._text_cache.clear()
            sprite = backend._concept_embeddings(
                ["sprite of enemy", "sprite of boss"])
            manual = (base + sprite) / 2.0
            manual /= np.linalg.norm(manual, axis=-1, keepdims=True)
            np.testing.assert_allclose(ens, manual, atol=1e-5)
        finally:
            backend.prompt_templates = None
            backend._text_cache.clear()

    def test_trained_composite_and_ladder(self, tmp_path):
        """Offline rung: trained-segmenter proposals + mini-SigLIP naming."""
        from gvl_tpu.models.sam import (
            PromptableSegmenter,
            SamConfig,
            save_segmenter_npz,
        )
        from gvl_tpu.perception.open_vocab import OpenVocabSamBackend
        from gvl_tpu.training.siglip_train import (
            SigLIPTrainConfig,
            evaluate_open_vocab,
            minisiglip_text_config,
            minisiglip_vision_config,
            save_minisiglip,
            train_minisiglip,
        )

        cfg = SigLIPTrainConfig(
            steps=1, batch_size=8, pool_batches=1, canvas=64,
            vision=minisiglip_vision_config(
                hidden_size=32, intermediate_size=64, num_layers=1,
                num_heads=2, image_size=64),
            text=minisiglip_text_config(
                hidden_size=32, intermediate_size=64, num_layers=1,
                num_heads=2, projection_size=32))
        variables = train_minisiglip(cfg)
        ms_dir = tmp_path / "minisiglip"
        save_minisiglip(variables, ms_dir, cfg.vision, cfg.text)

        seg_model = PromptableSegmenter(SamConfig())
        seg_vars = seg_model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3)),
            jnp.zeros((1, 16), jnp.int32))
        seg_ckpt = tmp_path / "sam.npz"
        save_segmenter_npz(seg_vars, seg_ckpt)

        composite = OpenVocabSamBackend.from_trained_checkpoints(
            str(seg_ckpt), str(ms_dir), score_threshold=-10.0)
        # novel (never-trained) prompt strings must round-trip the protocol
        frames = [np.random.RandomState(0).randint(
            0, 255, (120, 160, 3), np.uint8)]
        res = composite(frames, ["a villain", "a power-up"], [0])
        assert len(res) == 1 and len(res[0]) == 2
        for dets in res[0]:
            for det in dets:
                assert det["mask"].mask.shape == (120, 160)

        m = evaluate_open_vocab(composite, n_scenes=1)
        assert set(m) >= {"det_correct", "label_acc", "localized",
                          "n_instances"}

        # preset ladder routes (sam_checkpoint, minisiglip dir) here
        from gvl_tpu.config.presets import load_preset
        from gvl_tpu.perception.batch import build_segmenter
        from gvl_tpu.perception.segmenter import SAMConceptSegmenter

        preset = load_preset("light")
        preset.perception.sam_backend = "open_vocab"
        preset.perception.sam_checkpoint = str(seg_ckpt)
        preset.perception.siglip_checkpoint = str(ms_dir)
        seg = build_segmenter(preset)
        assert isinstance(seg, SAMConceptSegmenter)
        assert isinstance(seg.backend, OpenVocabSamBackend)

    def test_tracker_integration(self, backend):
        from gvl_tpu.perception.segmenter import SAMConceptSegmenter, SAMConfig

        segmenter = SAMConceptSegmenter(SAMConfig(min_mask_area=1),
                                        backend=backend)
        rng = np.random.RandomState(1)
        frame = rng.randint(0, 255, (48, 64, 3), np.uint8)
        entities = segmenter.segment_with_prompts(frame, 0, ["enemy"])
        # random weights: entities may or may not fire, but the call must
        # round-trip the protocol and any entity must be well-formed
        for e in entities:
            assert e.concept_label == "enemy"
            assert e.get_mask_at_frame(0) is not None


class TestLexiconPromptResolver:
    """Prompt resolution through the retrieval text space (VERDICT r3 #7)."""

    class _FakeEmbedder:
        """Deterministic toy space: each known word owns an axis; texts
        embed as the normalized bag of their known words."""

        VOCAB = ("player", "hero", "enemy", "villain", "boss", "item",
                 "loot")

        def encode(self, texts):
            out = np.zeros((len(texts), len(self.VOCAB) + 1), np.float32)
            for i, t in enumerate(texts):
                words = t.lower().split()
                for j, w in enumerate(self.VOCAB):
                    if w in words:
                        out[i, j] = 1.0
                if not out[i].any():
                    out[i, -1] = 1.0       # unknown bucket
            return out

    def _resolver(self, **kw):
        from gvl_tpu.perception.open_vocab import LexiconPromptResolver

        lexicon = {"player": ("hero",), "enemy": ("villain",),
                   "boss": (), "item": ("loot",)}
        return LexiconPromptResolver(self._FakeEmbedder(), lexicon, **kw)

    def test_canonical_identity(self):
        r = self._resolver()
        assert r.resolve("enemy") == "enemy"

    def test_synonym_resolves(self):
        r = self._resolver()
        assert r.resolve("the hero") == "player"
        assert r.resolve("a villain") == "enemy"
        assert r.resolve("shiny loot") == "item"

    def test_exact_pool_entry_short_circuits(self):
        r = self._resolver()
        assert r.resolve("Villain") == "enemy"

    def test_unknown_passes_through(self):
        r = self._resolver()
        assert r.resolve("the castle wall") == "the castle wall"

    def test_ambiguous_passes_through(self):
        # mentions two concepts -> margin gate keeps the raw prompt
        r = self._resolver()
        assert r.resolve("hero fighting villain") == "hero fighting villain"

    def test_backend_applies_resolver(self, backend):
        backend.prompt_resolver = self._resolver()
        backend._text_cache.clear()
        resolved = backend._concept_embeddings(["the hero"])
        canonical = backend._concept_embeddings(["player"])
        np.testing.assert_allclose(resolved, canonical, atol=1e-6)

    @pytest.mark.skipif(
        not Path("outputs/retriever/retriever_config.json").exists(),
        reason="shipped retriever artifact absent")
    def test_shipped_artifact_resolves_unseen_probes(self):
        """Three of the four UNSEEN_PROMPTS probes resolve to their
        concepts through the SHIPPED trained retriever; the boss probe
        ("a giant foe") is COMPOSITIONAL — "giant" is excluded from
        every training pool by probe design, so its head noun "foe"
        points at enemy and the injective set-resolution must hand the
        slot back raw instead of collapsing it onto "a villain"'s
        enemy embedding.  Scene nouns outside the lexicon pass through
        (no false positives)."""
        from gvl_tpu.perception.open_vocab import LexiconPromptResolver
        from gvl_tpu.training.siglip_train import UNSEEN_PROMPTS

        r = LexiconPromptResolver.from_trained("outputs/retriever")
        resolved = r.resolve_set(list(UNSEEN_PROMPTS.values()))
        got = dict(zip(UNSEEN_PROMPTS.keys(), resolved))
        assert got["player"] == "player"
        assert got["enemy"] == "enemy"
        assert got["item"] == "item"
        assert got["boss"] == UNSEEN_PROMPTS["boss"]  # passthrough
        for neg in ("the castle wall", "a waterfall", "lava pit",
                    "speedrun timer"):
            assert r.resolve(neg) == neg
