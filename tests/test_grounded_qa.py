"""Grounded synthetic QA: the eval loop must produce CORRECT answers.

VERDICT round-2 item #3: synthetic Phase-1 accuracy was 0.000 because
truths were random and no backend read the context.  Now ground truth is
derived from what the renderer draws, the trained segmenter perceives it,
and the grounded fake backend answers from the retrieved prompt alone —
so these tests gate the retrieval → prompt → generation → parsing loop.
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from gvl_tpu.agent.config import ReasoningCoreConfig
from gvl_tpu.agent.core import TimelineGroundedFakeBackend


def _prompt_messages(question, events, options=None):
    ctx = "\n".join(f"[{ts}] {desc}" for ts, desc in events)
    q = question
    if options:
        q += "\n\nOptions:"
        for i, option in enumerate(options):
            q += f"\n{chr(ord('A') + i)}) {option}"
        q += "\n\nAnswer with the letter of the correct option."
    text = f"## Timeline Context\n{ctx}\n\n## Question\n{q}"
    return [
        {"role": "system", "content": [{"type": "text", "text": "sys"}]},
        {"role": "user", "content": [{"type": "text", "text": text}]},
    ]


def _run(messages):
    backend = TimelineGroundedFakeBackend()
    return "".join(backend.stream(messages, ReasoningCoreConfig()))


EVENTS = [("00:02", "player detected"), ("00:05", "boss detected"),
          ("00:07", '(Text: "HP 75/100")')]


class TestGroundedBackend:
    def test_presence_yes_with_citation(self):
        out = _run(_prompt_messages(
            "Does a boss appear at any point in this video? "
            "Answer Yes or No.", EVENTS, ["Yes", "No"]))
        assert "**Answer:** Yes" in out
        assert "[00:05]" in out

    def test_presence_no(self):
        out = _run(_prompt_messages(
            "Does an enemy appear at any point in this video? "
            "Answer Yes or No.", EVENTS, ["Yes", "No"]))
        assert "**Answer:** No" in out

    def test_mcq_picks_grounded_option(self):
        out = _run(_prompt_messages(
            "Besides the player, which of the following entities appears "
            "in this video?", EVENTS,
            ["enemy", "boss", "item", "None of these"]))
        assert "**Answer:** B) boss" in out

    def test_mcq_none_when_nothing_grounds(self):
        out = _run(_prompt_messages(
            "Besides the player, which of the following entities appears "
            "in this video?", [("00:01", "player detected")],
            ["enemy", "boss", "item", "None of these"]))
        assert "**Answer:** D) None of these" in out

    def test_ocr_noise_tolerated(self):
        """One-edit OCR noise ('bos5' for 'boss') still grounds."""
        noisy = [("00:03", '(Text: "bos5 incoming")')]
        out = _run(_prompt_messages(
            "Does a boss appear at any point in this video? "
            "Answer Yes or No.", noisy, ["Yes", "No"]))
        assert "**Answer:** Yes" in out

    def test_open_question_cites_earliest(self):
        out = _run(_prompt_messages("What happened?", EVENTS))
        assert "[00:02]" in out
        assert "**Answer:**" in out


@pytest.mark.slow
class TestGroundedEndToEnd:
    """Synthetic clip → full pipeline → question → CORRECT answer."""

    @pytest.fixture(scope="class")
    def runner(self):
        from benchmarks.model_configs import get_model_config
        from benchmarks.model_inference import FullPipelineRunner

        return FullPipelineRunner(get_model_config("synthetic_gate"),
                                  preset="light", use_cache=False)

    def test_phase1_synthetic_scores_above_chance(self, runner):
        from benchmarks.loaders.base import BenchmarkConfig
        from benchmarks.loaders.glitchbench import GlitchBenchLoader
        from benchmarks.model_inference import check_correctness

        loader = GlitchBenchLoader(BenchmarkConfig(
            data_dir="/nonexistent", synthetic=True, max_samples=4))
        samples = loader.load()
        assert len(samples) == 4
        correct = 0
        for sample in samples:
            result = runner.run_inference(sample)
            assert not result.get("error")
            correct += check_correctness(result["predicted"], sample)
        # the grounded loop is deterministic: all four must be right
        assert correct == 4

    def test_llm_checkpoint_routes_trained_backend(self, tmp_path):
        """`EvalModelConfig.llm_checkpoint` (the qa_lm arm) must reach
        the loop's reasoning core: preset.reasoning.llm_checkpoint →
        process_video → create_reasoning_core(checkpoint_path=...) →
        Qwen3ChatBackend over the byte LM, replacing the grounded fake."""
        import jax
        import jax.numpy as jnp

        from benchmarks.model_configs import EvalModelConfig
        from benchmarks.model_inference import FullPipelineRunner
        from gvl_tpu.agent.core import Qwen3ChatBackend
        from gvl_tpu.models.byte_tokenizer import ByteTokenizer
        from gvl_tpu.models.qwen3 import Qwen3Model
        from gvl_tpu.training.qa_lm_train import qa_lm_config, save_qa_lm
        from scripts.realtime_inference import process_video

        cfg = qa_lm_config(hidden_size=64, num_layers=1, num_heads=2,
                           num_kv_heads=1, head_dim=32,
                           intermediate_size=128, max_cache_length=2048)
        params = Qwen3Model(cfg).init(
            jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))["params"]
        ckpt = tmp_path / "qa_lm"
        save_qa_lm(params, ckpt, cfg)

        ec = EvalModelConfig(
            name="qa_lm_test", use_sam=False, use_siglip=False,
            use_ocr=False, use_asr=False, fps=1.0, max_new_tokens=8,
            llm_checkpoint=str(ckpt))
        r = FullPipelineRunner(ec, preset="light", use_cache=False)
        assert r.preset.reasoning.llm_checkpoint == str(ckpt)
        pv = process_video("synthetic://concept_demo_llm?duration=2",
                           r.preset, use_cache=False)
        backend = pv.loop.reasoning_core.backend
        assert isinstance(backend, Qwen3ChatBackend)
        assert isinstance(backend.tokenizer, ByteTokenizer)

    def test_loop_components_shared_across_videos(self, runner):
        """Per-video loop_init must not REBUILD the reasoning core /
        projector bank (VERDICT r2 weak #7: 15.7 s of 17.1 s per sample
        was re-init).  The remaining per-video cost is index_timeline's
        retriever encode, which pays a one-off jit compile per new
        event-shape bucket — so assert object identity (the rebuild
        gate) plus a bound loose enough for one bucket compile."""
        from scripts.realtime_inference import process_video

        pv = process_video("synthetic://concept_demo_reuse?duration=4",
                           runner.preset, use_cache=False)
        pv2 = process_video("synthetic://concept_demo_reuse2?duration=4",
                            runner.preset, use_cache=False)
        # the expensive objects are the SAME instances across videos
        assert pv2.loop.reasoning_core is pv.loop.reasoning_core
        assert pv2.loop.projectors is pv.loop.projectors
        # same-bucket video: no rebuild, no recompile
        assert pv2.timings.get("loop_init", 99.0) < 1.0
        # the shared core was rebound to THIS video's timeline
        core = pv2.loop.reasoning_core
        assert core.retriever._events is not None
