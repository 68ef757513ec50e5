"""Self-trained semantic-retrieval embedder (the MiniLM-class rung).

Covers the pair generator's uniqueness contract, a tiny
train→save→load→encode cycle, the make_embedder ladder order
("auto" > trained dir > hashing), and the eval protocol running
identically over the hashing baseline.  Reference semantic retrieval:
`/root/reference/src/agent_core/qwen_reasoning_core.py:1492-1528`.
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from gvl_tpu.agent.config import ReasoningCoreConfig
from gvl_tpu.agent.retriever import HashingTextEmbedder, make_embedder
from gvl_tpu.training.retriever_train import (
    RetrieverTrainConfig,
    TrainedTextEmbedder,
    evaluate_retriever,
    is_trained_retriever_checkpoint,
    load_retriever,
    make_batch,
    make_pair,
    retriever_text_config,
    save_retriever,
    tokenize,
    train_retriever,
)


def _tiny_cfg():
    return retriever_text_config(hidden_size=32, intermediate_size=64,
                                 num_layers=1, num_heads=2,
                                 max_position=48, projection_size=32)


class TestPairGenerator:
    def test_pairs_are_strings(self):
        rng = np.random.default_rng(0)
        fams = set()
        for _ in range(80):
            q, d, key = make_pair(rng)
            assert q and d and ":" in key
            fams.add(key.split(":")[0])
        assert fams == {"det", "mot", "ocr", "aud", "sp", "atk", "cp"}

    def test_batch_keys_unique(self):
        rng = np.random.default_rng(1)
        queries, descs = make_batch(rng, 30)
        assert len(queries) == 30
        # descriptions must be distinct retrieval targets
        assert len(set(descs)) == len(descs)

    def test_tokenize_shape(self):
        ids = tokenize(["when does the hero appear"], 48)
        assert ids.shape == (1, 48)
        assert ids.dtype == np.int32


class TestTrainSaveLoad:
    @pytest.fixture(scope="class")
    def trained(self, tmp_path_factory):
        cfg = RetrieverTrainConfig(steps=5, batch_size=8,
                                   model=_tiny_cfg())
        params = train_retriever(cfg)
        out = tmp_path_factory.mktemp("retr_ckpt")
        save_retriever(params, out, model_cfg=cfg.model)
        return str(out)

    def test_roundtrip_and_encode(self, trained):
        assert is_trained_retriever_checkpoint(trained)
        emb = TrainedTextEmbedder.from_dir(trained)
        z = emb.encode(["player detected", "HP 42/100"])
        assert z.shape == (2, 32)
        np.testing.assert_allclose(np.linalg.norm(z, axis=-1), 1.0,
                                   atol=1e-4)
        assert not np.allclose(z[0], z[1])

    def test_eval_protocol_runs_on_both(self, trained):
        m1 = evaluate_retriever(TrainedTextEmbedder.from_dir(trained),
                                n_timelines=4, n_events=6)
        m2 = evaluate_retriever(HashingTextEmbedder(64),
                                n_timelines=4, n_events=6)
        for m in (m1, m2):
            assert set(m) >= {"paraphrase_top1", "paraphrase_top5",
                              "lexical_top1", "lexical_top5"}
        # hashing nails the lexical regime by construction
        assert m2["lexical_top1"] >= 0.5

    def test_ladder_prefers_trained_dir(self, trained):
        cfg = ReasoningCoreConfig(embedding_model=trained)
        emb = make_embedder(cfg)
        assert isinstance(emb, TrainedTextEmbedder)

    def test_hashing_sentinel_still_forces_lexical(self):
        cfg = ReasoningCoreConfig(embedding_model="hashing")
        assert isinstance(make_embedder(cfg), HashingTextEmbedder)

    def test_auto_resolves(self):
        cfg = ReasoningCoreConfig(embedding_model="auto")
        emb = make_embedder(cfg)
        if is_trained_retriever_checkpoint("outputs/retriever"):
            assert isinstance(emb, TrainedTextEmbedder)
        else:
            assert isinstance(emb, HashingTextEmbedder)
