"""Byte-level QA LM: data generation, masking, render parity, training,
checkpoint wiring.

Reference parity surface: the reasoning core's loaded-LLM path
(`/root/reference/src/agent_core/qwen_reasoning_core.py:1803-1879`) —
here a from-scratch trained byte model through the same engine/backend.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from gvl_tpu.models.byte_tokenizer import (  # noqa: E402
    BOS_ID,
    EOS_ID,
    PAD_ID,
    ByteTokenizer,
)
from gvl_tpu.training.qa_lm_train import (  # noqa: E402
    QASample,
    QATrainConfig,
    encode_sample,
    generate_qa_sample,
    is_qa_lm_checkpoint,
    load_qa_lm,
    qa_lm_config,
    render_chatml,
    save_qa_lm,
    train_qa_lm,
)


class TestByteTokenizer:
    def test_roundtrip(self):
        tok = ByteTokenizer()
        text = '[00:07] (Text: "HP 75/100") — boss detected'
        assert tok.decode(tok.encode(text)) == text

    def test_specials_skipped_in_decode(self):
        tok = ByteTokenizer()
        ids = [BOS_ID] + tok.encode("hi") + [EOS_ID, PAD_ID]
        assert tok.decode(ids) == "hi"

    def test_vocab_lane_aligned(self):
        assert ByteTokenizer.vocab_size % 128 == 0


class TestGenerator:
    def test_families_covered_and_grounded(self):
        rng = np.random.default_rng(0)
        families = set()
        for _ in range(120):
            s = generate_qa_sample(rng)
            families.add(s.family)
            assert s.ground_truth
            assert "**Answer:**" in s.answer
            assert s.context_lines
        assert {"binary", "mcq", "timestamp"} <= families

    def test_mcq_letter_matches_option(self):
        rng = np.random.default_rng(1)
        for _ in range(60):
            s = generate_qa_sample(rng)
            if s.family != "mcq":
                continue
            idx = ord(s.ground_truth) - ord("A")
            line = [ln for ln in s.question.split("\n")
                    if ln.startswith(f"{s.ground_truth})")][0]
            option = line.split(") ", 1)[1]
            if option == "None of these":
                # grounded by ABSENCE: tested in
                # TestBenchmarkShapedVariants
                continue
            # the correct option's entity really is in the timeline
            assert any(option in ln for ln in s.context_lines), (
                option, s.context_lines)
            assert 0 <= idx < 8

    def test_timestamp_truth_in_context(self):
        rng = np.random.default_rng(2)
        for _ in range(60):
            s = generate_qa_sample(rng)
            if s.family == "timestamp":
                assert any(s.ground_truth in ln for ln in s.context_lines)


class TestEncoding:
    def test_mask_covers_answer_and_eos_only(self):
        tok = ByteTokenizer()
        s = QASample("sys", ["[00:01] player detected"],
                     "Q?", "**Answer:** Yes", "Yes")
        tokens, mask, prompt_len = encode_sample(s, tok, 512)
        assert tokens[0] == BOS_ID
        n_ans = len(tok.encode(s.answer)) + 1  # + EOS
        assert mask.sum() == n_ans
        assert mask[:prompt_len].sum() == 0
        assert tokens[prompt_len + n_ans - 1] == EOS_ID
        assert (tokens[prompt_len + n_ans:] == PAD_ID).all()

    def test_overlong_trims_context_front(self):
        tok = ByteTokenizer()
        lines = [f"[00:{i:02d}] enemy moving right" for i in range(40)]
        s = QASample("sys", list(lines), "Q?", "**Answer:** No", "No")
        tokens, mask, prompt_len = encode_sample(s, tok, 512)
        assert prompt_len + int(mask.sum()) <= 512
        # the LAST line survives (recency kept)
        assert lines[-1] in tok.decode(tokens[:prompt_len])

    def test_render_parity_with_backend(self):
        """Training prompts must be byte-identical to what the agent's
        Qwen3ChatBackend sends at inference — including the serving
        sections (regions / knowledge base / query suffixes)."""
        from gvl_tpu.agent.config import ReasoningCoreConfig
        from gvl_tpu.agent.core import Qwen3ChatBackend, ReasoningCore

        rng = np.random.default_rng(3)
        checked_sections = 0
        for _ in range(20):
            s = generate_qa_sample(rng)
            kb = next((x for x in s.extra_sections
                       if x.startswith("## Entity Knowledge Base")), None)
            regions = next(
                (x.split("\n", 1)[1] for x in s.extra_sections
                 if x.startswith("## Visual Regions")), None)
            checked_sections += bool(kb) + bool(regions)
            core = ReasoningCore(ReasoningCoreConfig(
                system_prompt=s.system))
            messages = core.build_prompt(
                query=s.question + s.question_suffix,
                timeline_context="\n".join(s.context_lines),
                region_tokens=regions,
                knowledge_base_context=kb)
            backend = Qwen3ChatBackend.__new__(Qwen3ChatBackend)
            backend.tokenizer = ByteTokenizer()
            rendered_ids = backend._render(messages)
            expected = render_chatml(s.system, s.user_text())
            assert bytes(rendered_ids).decode() == expected
        assert checked_sections > 0  # distribution actually samples them


@pytest.fixture(scope="module")
def micro_trained():
    cfg = QATrainConfig(
        steps=60, batch_size=8, pool_size=96, max_len=640,
        log_every=0,
        model=qa_lm_config(hidden_size=64, num_layers=2, num_heads=2,
                           num_kv_heads=1, head_dim=32,
                           intermediate_size=128, max_cache_length=1024))
    return cfg, train_qa_lm(cfg)


class TestTraining:
    def test_micro_training_reduces_masked_ce(self, micro_trained):
        import optax

        from gvl_tpu.models.qwen3 import Qwen3Model

        cfg, params = micro_trained
        model = Qwen3Model(cfg.model)
        init = model.init(jax.random.PRNGKey(cfg.seed),
                          jnp.zeros((1, 8), jnp.int32))["params"]
        tok = ByteTokenizer()
        rng = np.random.default_rng(99)
        toks, masks = [], []
        for _ in range(8):
            t, m, _ = encode_sample(generate_qa_sample(rng), tok,
                                    cfg.max_len)
            toks.append(t)
            masks.append(m)
        tokens = jnp.asarray(np.stack(toks))
        mask = jnp.asarray(np.stack(masks))

        def ce(p):
            logits, _ = model.apply({"params": p}, tokens)
            c = optax.softmax_cross_entropy_with_integer_labels(
                logits[:, :-1].astype(jnp.float32), tokens[:, 1:])
            m = mask[:, 1:]
            return float((c * m).sum() / m.sum())

        assert ce(params) < ce(init) * 0.7

    def test_checkpoint_roundtrip_and_factory(self, micro_trained,
                                              tmp_path, monkeypatch):
        cfg, params = micro_trained
        out = tmp_path / "qa_lm"
        # save with the micro model config, not the default geometry
        import json
        from dataclasses import asdict

        from gvl_tpu.utils.checkpoints import save_flat_npz

        out.mkdir()
        (out / "qa_lm_config.json").write_text(json.dumps({
            k: v for k, v in asdict(cfg.model).items()
            if k != "lora_targets"}))
        save_flat_npz(params, out / "params.npz")

        assert is_qa_lm_checkpoint(out)
        loaded_cfg, loaded = load_qa_lm(out)
        assert loaded_cfg.hidden_size == cfg.model.hidden_size
        a = jax.tree.leaves(params)
        b = jax.tree.leaves(loaded)
        assert all(np.allclose(x, y) for x, y in zip(a, b))

        from gvl_tpu.agent.core import Qwen3ChatBackend, create_reasoning_core

        core = create_reasoning_core(checkpoint_path=str(out))
        assert isinstance(core.backend, Qwen3ChatBackend)
        assert isinstance(core.backend.tokenizer, ByteTokenizer)

    def test_save_qa_lm_writes_default_config(self, tmp_path):
        from gvl_tpu.models.qwen3 import Qwen3Model

        cfg = qa_lm_config(hidden_size=64, num_layers=1, num_heads=2,
                           num_kv_heads=1, head_dim=32,
                           intermediate_size=128)
        params = Qwen3Model(cfg).init(
            jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))["params"]
        save_qa_lm(params, tmp_path / "ck")
        assert is_qa_lm_checkpoint(tmp_path / "ck")


class TestCausalFamily:
    def test_causal_grounded_and_unambiguous(self):
        from gvl_tpu.training.qa_lm_train import generate_qa_sample

        rng = np.random.default_rng(7)
        for _ in range(60):
            s = generate_qa_sample(rng, family="causal")
            assert s.family == "causal"
            # the cited cause line really is in the timeline
            ts = s.ground_truth.split("[")[1].rstrip("]")
            cause = [ln for ln in s.context_lines
                     if ln.startswith(f"[{ts}]") and "attacks" in ln]
            assert cause, (s.ground_truth, s.context_lines)
            victim = s.question.split("Why was the ")[1].split(" destroyed")[0]
            assert cause[0].rstrip(")").endswith(victim)
            # exactly one attack on THIS victim (no ambiguous chains)
            n_attacks = sum(1 for ln in s.context_lines
                            if f"attacks {victim})" in ln)
            assert n_attacks == 1
            assert any(f"{victim} destroyed" in ln
                       for ln in s.context_lines)

    def test_causal_excluded_from_base_training_mix(self):
        from gvl_tpu.training.qa_lm_train import (
            FAMILIES,
            FAMILY_WEIGHTS,
            LORA_FAMILY_WEIGHTS,
        )

        assert len(FAMILY_WEIGHTS) == len(FAMILIES)
        assert FAMILY_WEIGHTS[FAMILIES.index("causal")] == 0.0
        # LoRA curriculum is causal-dominant with base-family replay
        # (pure-causal SFT measured 0.0 base-mix accuracy post-merge)
        ci = FAMILIES.index("causal")
        assert LORA_FAMILY_WEIGHTS[ci] >= 0.5
        assert abs(sum(LORA_FAMILY_WEIGHTS) - 1.0) < 1e-9
        assert any(w > 0 for i, w in enumerate(LORA_FAMILY_WEIGHTS)
                   if i != ci)
        # the default (family=None) draw never yields causal either
        rng = np.random.default_rng(11)
        assert all(generate_qa_sample(rng).family != "causal"
                   for _ in range(120))


class TestLoraQA:
    def test_lora_train_updates_only_adapters(self, tmp_path):
        """train_qa_lm_lora on a micro base: lora_a/lora_b leaves move,
        every base leaf stays bit-identical (frozen), and the saved
        adapter merges through create_reasoning_core(lora_path=...)."""
        from gvl_tpu.models.qwen3 import Qwen3Model
        from gvl_tpu.training.qa_lm_train import (
            LoraQAConfig,
            save_qa_lm_adapter,
            train_qa_lm_lora,
        )

        cfg = qa_lm_config(hidden_size=64, num_layers=2, num_heads=2,
                           num_kv_heads=1, head_dim=32,
                           intermediate_size=128, max_cache_length=1024)
        params = Qwen3Model(cfg).init(
            jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))["params"]
        base = tmp_path / "qa_lm"
        save_qa_lm(params, base, cfg)

        lora_cfg, lora_params = train_qa_lm_lora(
            base, LoraQAConfig(steps=4, batch_size=2, max_len=640,
                               log_every=0, lora_rank=4, lora_alpha=8.0))
        assert lora_cfg.lora_rank == 4

        flat = {}

        def walk(tree, prefix=""):
            for key, value in tree.items():
                p = f"{prefix}/{key}" if prefix else key
                if isinstance(value, dict):
                    walk(value, p)
                else:
                    flat[p] = np.asarray(value)

        walk(lora_params)
        base_flat = {}
        walk_src = params

        def walk2(tree, prefix=""):
            for key, value in tree.items():
                p = f"{prefix}/{key}" if prefix else key
                if isinstance(value, dict):
                    walk2(value, p)
                else:
                    base_flat[p] = np.asarray(value)

        walk2(walk_src)
        lora_leaves = [k for k in flat if k.endswith(("lora_a", "lora_b"))]
        assert lora_leaves
        # lora_b starts at zero; after steps lora_a grads flow through it,
        # so at least the trained lora_b leaves must have moved
        assert any(np.abs(flat[k]).max() > 0
                   for k in lora_leaves if k.endswith("lora_b"))
        for k, v in base_flat.items():
            assert np.array_equal(flat[k], v), f"base leaf {k} changed"

        adapter = tmp_path / "adapter"
        save_qa_lm_adapter(lora_params, adapter, lora_cfg, base_dir=base)
        assert (adapter / "adapter_final.npz").exists()

        from gvl_tpu.agent.core import Qwen3ChatBackend, create_reasoning_core

        core = create_reasoning_core(checkpoint_path=str(base),
                                     lora_path=str(adapter))
        assert isinstance(core.backend, Qwen3ChatBackend)
        # merged engine must still decode
        out = core.backend.engine.generate([1, 2, 3], max_new_tokens=2,
                                           temperature=0.0)
        assert len(out) >= 1


class TestBenchmarkShapedVariants:
    def test_binary_lettered_options_variant(self):
        """~half of binary samples carry the benchmark runner's lettered
        options block (BenchmarkSample.get_prompt letters BINARY options
        too); the answer then leads with the letter."""
        from gvl_tpu.training.qa_lm_train import generate_qa_sample

        rng = np.random.default_rng(5)
        lettered = bare = 0
        for _ in range(60):
            s = generate_qa_sample(rng, family="binary")
            if "Options:\nA) Yes\nB) No" in s.question:
                lettered += 1
                assert ("**Answer:** A) Yes" in s.answer
                        or "**Answer:** B) No" in s.answer)
                # letter must agree with the truth
                if s.ground_truth == "Yes":
                    assert "A) Yes" in s.answer
                else:
                    assert "B) No" in s.answer
            else:
                bare += 1
        assert lettered > 10 and bare > 10

    def test_mcq_none_of_these_variant_grounded(self):
        """Benchmark-shaped MCQs (all concepts + 'None of these') stay
        grounded: the correct option's entity is in the timeline, and in
        the none-case NO non-player concept is."""
        from gvl_tpu.training.qa_lm_train import ENTITIES, generate_qa_sample

        rng = np.random.default_rng(6)
        shaped = none_correct = 0
        for _ in range(120):
            s = generate_qa_sample(rng, family="mcq")
            if "None of these" not in s.question:
                continue
            shaped += 1
            letter = s.ground_truth
            idx = ord(letter) - ord("A")
            options = [ln.split(") ", 1)[1]
                       for ln in s.question.splitlines()
                       if len(ln) > 2 and ln[1] == ")"]
            correct = options[idx]
            text = "\n".join(s.context_lines)
            if correct == "None of these":
                none_correct += 1
                assert not any(e in text for e in ENTITIES
                               if e != "player")
            else:
                assert correct in text
                # no OTHER concept may ground an alternative answer
                assert not any(e in text for e in ENTITIES
                               if e not in ("player", correct))
        assert shaped > 20 and none_correct > 3
