"""MiniLM (BERT) sentence encoder: HF parity + retriever integration."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from gvl_tpu.models.minilm import (  # noqa: E402
    MiniLMConfig,
    MiniLMModel,
    MiniLMSentenceEncoder,
    convert_hf_bert,
    mean_pool_normalize,
)


@pytest.fixture(scope="module")
def hf_pair():
    import torch
    from transformers import BertConfig, BertModel

    hf_cfg = BertConfig(
        vocab_size=512, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=64, type_vocab_size=2,
        hidden_act="gelu", layer_norm_eps=1e-12,
    )
    torch.manual_seed(0)
    hf = BertModel(hf_cfg, add_pooling_layer=False).eval()
    cfg = MiniLMConfig.tiny()
    params = convert_hf_bert(hf.state_dict(), cfg)
    return hf, cfg, {"params": params}


class TestHFParity:
    def test_last_hidden_state_matches(self, hf_pair):
        import torch

        hf, cfg, variables = hf_pair
        rng = np.random.RandomState(0)
        ids = rng.randint(0, cfg.vocab_size, (2, 12))
        mask = np.ones_like(ids)
        mask[1, 8:] = 0

        with torch.no_grad():
            ref = hf(input_ids=torch.tensor(ids),
                     attention_mask=torch.tensor(mask)
                     ).last_hidden_state.numpy()
        out = np.asarray(MiniLMModel(cfg).apply(
            variables, jnp.asarray(ids), jnp.asarray(mask)))
        # padded positions diverge (HF computes them; irrelevant to
        # masked mean pooling) — compare live positions only
        np.testing.assert_allclose(out[0], ref[0], atol=2e-4)
        np.testing.assert_allclose(out[1, :8], ref[1, :8], atol=2e-4)

    def test_sentence_embedding_matches_st_recipe(self, hf_pair):
        """mean pool over mask + L2 norm == the sentence-transformers
        recipe applied to HF outputs."""
        import torch

        hf, cfg, variables = hf_pair
        rng = np.random.RandomState(1)
        ids = rng.randint(0, cfg.vocab_size, (3, 10))
        mask = np.ones_like(ids)
        mask[2, 4:] = 0

        with torch.no_grad():
            hidden = hf(input_ids=torch.tensor(ids),
                        attention_mask=torch.tensor(mask)
                        ).last_hidden_state.numpy()
        m = mask[..., None].astype(np.float32)
        ref = (hidden * m).sum(1) / np.maximum(m.sum(1), 1e-9)
        ref = ref / np.linalg.norm(ref, axis=-1, keepdims=True)

        out = np.asarray(mean_pool_normalize(
            MiniLMModel(cfg).apply(variables, jnp.asarray(ids),
                                   jnp.asarray(mask)),
            jnp.asarray(mask)))
        np.testing.assert_allclose(out, ref, atol=2e-4)
        np.testing.assert_allclose(
            np.linalg.norm(out, axis=-1), 1.0, atol=1e-5)


class TestSentenceEncoder:
    def _encoder(self, hf_pair):
        _, cfg, variables = hf_pair

        def tokenize(texts, max_len):
            ids = np.zeros((len(texts), max_len), np.int64)
            mask = np.zeros((len(texts), max_len), np.int64)
            for i, t in enumerate(texts):
                toks = [(hash(w) % (cfg.vocab_size - 1)) + 1
                        for w in t.split()][:max_len]
                ids[i, :len(toks)] = toks
                mask[i, :len(toks)] = 1
            return ids, mask

        return MiniLMSentenceEncoder(MiniLMModel(cfg), variables, tokenize)

    def test_encode_shapes_and_determinism(self, hf_pair):
        enc = self._encoder(hf_pair)
        vecs = enc.encode(["boss defeated", "health restored", "boss defeated"])
        assert vecs.shape == (3, 32)
        np.testing.assert_allclose(vecs[0], vecs[2], atol=1e-6)
        assert enc.encode([]).shape == (0, 32)

    def test_bucket_padding_invariant(self, hf_pair):
        enc = self._encoder(hf_pair)
        one = enc.encode(["a b c"])
        many = enc.encode(["a b c"] + [f"text {i}" for i in range(20)])
        np.testing.assert_allclose(one[0], many[0], atol=1e-5)

    def test_retriever_protocol(self, hf_pair):
        """Plugs into TimelineRetriever as its embedder."""
        from gvl_tpu.agent.config import ReasoningCoreConfig
        from gvl_tpu.agent.retriever import TimelineRetriever
        from gvl_tpu.fusion import ModalityType, TimelineIndexer

        timeline = TimelineIndexer()
        timeline.add_event(5.0, ModalityType.VISUAL, "boss appears")
        timeline.add_event(9.0, ModalityType.AUDIO, "victory fanfare")
        retriever = TimelineRetriever(
            ReasoningCoreConfig(), embedder=self._encoder(hf_pair))
        retriever.index_timeline(timeline)
        hits = retriever.retrieve_by_semantic("boss appears", top_k=1)
        assert hits and hits[0].description == "boss appears"
