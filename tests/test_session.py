"""Multi-turn prefix-cached session == stateless engine on full transcript."""

import jax
import jax.numpy as jnp
import pytest

from gvl_tpu.models.qwen3 import Qwen3Config, Qwen3Engine, Qwen3Model
from gvl_tpu.models.session import Qwen3ChatSession

TURN1 = [7, 3, 99, 12, 5]
TURN2 = [44, 8, 211]


@pytest.fixture(scope="module")
def setup():
    cfg = Qwen3Config.tiny(num_layers=3, max_cache_length=128)
    model = Qwen3Model(cfg)
    variables = {"params": model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))["params"]}
    engine = Qwen3Engine(cfg, variables, eos_token_id=-1, dtype=jnp.float32)
    return cfg, variables, engine


class TestPrefixCaching:
    def test_first_turn_matches_engine(self, setup):
        cfg, variables, engine = setup
        expected = engine.generate(TURN1, max_new_tokens=6, temperature=0.0)
        session = Qwen3ChatSession(cfg, variables, eos_token_id=-1,
                                   dtype=jnp.float32)
        assert session.generate(TURN1, max_new_tokens=6,
                                temperature=0.0) == expected
        assert session.last_ingested == len(TURN1)

    def test_second_turn_ingests_only_delta(self, setup):
        cfg, variables, engine = setup
        session = Qwen3ChatSession(cfg, variables, eos_token_id=-1,
                                   dtype=jnp.float32)
        out1 = session.generate(TURN1, max_new_tokens=6, temperature=0.0)
        transcript = TURN1 + out1 + TURN2
        expected = engine.generate(transcript, max_new_tokens=6,
                                   temperature=0.0)
        out2 = session.generate(transcript, max_new_tokens=6,
                                temperature=0.0)
        assert out2 == expected
        # all of TURN1 + out1 was already cached; only TURN2 is new
        assert session.last_ingested == len(TURN2)

    def test_three_turns_stay_exact(self, setup):
        cfg, variables, engine = setup
        session = Qwen3ChatSession(cfg, variables, eos_token_id=-1,
                                   dtype=jnp.float32)
        transcript = list(TURN1)
        for turn in ([31], [9, 77], [2, 2, 140]):
            out = session.generate(transcript, max_new_tokens=4,
                                   temperature=0.0)
            expected = engine.generate(transcript, max_new_tokens=4,
                                       temperature=0.0)
            assert out == expected
            transcript = transcript + out + turn

    def test_divergent_prompt_resets(self, setup):
        cfg, variables, engine = setup
        session = Qwen3ChatSession(cfg, variables, eos_token_id=-1,
                                   dtype=jnp.float32)
        session.generate(TURN1, max_new_tokens=4, temperature=0.0)
        other = [100, 101, 102, 103]   # NOT an extension of TURN1
        expected = engine.generate(other, max_new_tokens=4, temperature=0.0)
        out = session.generate(other, max_new_tokens=4, temperature=0.0)
        assert out == expected
        assert session.last_ingested == len(other)  # full re-prefill

    def test_same_transcript_reasked(self, setup):
        cfg, variables, engine = setup
        session = Qwen3ChatSession(cfg, variables, eos_token_id=-1,
                                   dtype=jnp.float32)
        expected = session.generate(TURN1, max_new_tokens=4,
                                    temperature=0.0)
        # the cached transcript now includes the response, so re-asking
        # the bare prompt is a divergence -> clean reset, same output
        again = session.generate(TURN1, max_new_tokens=4, temperature=0.0)
        assert again == expected
        assert session.last_ingested == len(TURN1)
        # asking with the response appended equals the cached transcript
        # exactly: only the final token is re-fed to recover logits
        engine = Qwen3Engine(cfg, variables, eos_token_id=-1,
                             dtype=jnp.float32)
        transcript = TURN1 + again
        out = session.generate(transcript, max_new_tokens=2,
                               temperature=0.0)
        assert session.last_ingested == 1
        assert out == engine.generate(transcript, max_new_tokens=2,
                                      temperature=0.0)

    def test_eos_mid_stream(self, setup):
        cfg, variables, engine = setup
        expected = engine.generate(TURN1, max_new_tokens=8, temperature=0.0)
        eos = expected[3]
        session = Qwen3ChatSession(cfg, variables, eos_token_id=eos,
                                   dtype=jnp.float32)
        out = session.generate(TURN1, max_new_tokens=8, temperature=0.0)
        assert out == expected[:expected.index(eos)]
        # next turn still exact after the eos-truncated one
        transcript = TURN1 + out + TURN2
        session2 = Qwen3Engine(cfg, variables, eos_token_id=eos,
                               dtype=jnp.float32)
        assert (session.generate(transcript, max_new_tokens=3,
                                 temperature=0.0)
                == session2.generate(transcript, max_new_tokens=3,
                                     temperature=0.0))

    def test_capacity_guard(self, setup):
        cfg, variables, _ = setup
        session = Qwen3ChatSession(cfg, variables, eos_token_id=-1,
                                   dtype=jnp.float32)
        with pytest.raises(ValueError):
            session.generate(list(range(100)), max_new_tokens=100)


class TestBackendSessionRouting:
    def test_session_used_without_prefix(self):
        import numpy as np

        from gvl_tpu.agent import ReasoningCoreConfig
        from gvl_tpu.agent.core import Qwen3ChatBackend

        calls = {"session": 0, "plain": 0}

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

        backend = Qwen3ChatBackend(FakeEngine("plain"), FakeTok(),
                                   session=FakeEngine("session"))
        cfg = ReasoningCoreConfig()
        messages = [{"role": "user", "content": "hi"}]
        list(backend.stream(messages, cfg))
        assert calls == {"session": 1, "plain": 0}
        list(backend.stream(messages, cfg,
                            inputs_embeds_prefix=np.zeros((1, 4))))
        assert calls == {"session": 1, "plain": 1}
