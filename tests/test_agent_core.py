"""ReasoningCore + PerceptionReasoningLoop + game knowledge search."""

import numpy as np
import pytest

from gvl_tpu.agent import ReasoningCoreConfig
from gvl_tpu.agent.core import (
    ReasoningCore,
    TemplateFakeBackend,
    VisualInputProcessor,
    create_reasoning_core,
    messages_to_plain_text,
)
from gvl_tpu.agent.loop import PerceptionReasoningLoop, create_perception_loop
from gvl_tpu.agent.search import (
    GameDetector,
    GameKnowledgeSearcher,
    SearchCache,
    SearchResult,
    create_search_enhanced_system_prompt,
)
from gvl_tpu.fusion import (
    EntityCategory,
    KnowledgeBaseBuilder,
    ModalityType,
    TimelineIndexer,
)


def build_world():
    idx = TimelineIndexer()
    idx.add_event(100.0, ModalityType.VISUAL, "dragon boss appears",
                  entity_id="boss_001")
    idx.add_event(110.0, ModalityType.SPEECH, "watch out for the fire")
    idx.add_event(115.0, ModalityType.OCR, "-500 HP")
    kb = KnowledgeBaseBuilder()
    kb.register_entity("boss_001", "dragon", EntityCategory.ENEMY, timestamp=100.0)
    return idx, kb


class TestReasoningCore:
    def test_reason_produces_structured_answer(self):
        idx, kb = build_world()
        core = ReasoningCore(ReasoningCoreConfig())
        response, confidence = core.reason(
            "what happened at 1:40?", timeline_indexer=idx,
            knowledge_base=kb, return_confidence=True)
        assert "**Reasoning:**" in response and "**Answer:**" in response
        assert "[01:40]" in response  # cites a real timeline timestamp
        assert confidence > 0.5

    def test_conversation_tracked_and_followup(self):
        idx, kb = build_world()
        core = ReasoningCore()
        core.reason("what happened at 1:40?", timeline_indexer=idx)
        assert core.conversation_history.get_turn_count() == 2
        assert core.conversation_history.get_last_mentioned_timestamp() == 100.0
        core.reason("what happened next?", timeline_indexer=idx)
        assert core.conversation_history.get_turn_count() == 4

    def test_streaming_yields_pieces(self):
        idx, _ = build_world()
        pieces = list(ReasoningCore().reason_streaming(
            "describe the fight", timeline_indexer=idx))
        assert len(pieces) > 5
        assert "**Reasoning:**" in "".join(pieces)

    def test_prompt_structure(self):
        idx, kb = build_world()
        core = ReasoningCore()
        core.index_timeline(idx)
        events = core.retriever.hybrid_retrieve("at 1:40?", idx)
        messages = core.build_prompt(
            query="at 1:40?",
            timeline_context=core.format_timeline_context(events),
            region_tokens="Detected regions in frame:\n  - boss: confidence=0.90",
            knowledge_base_context=kb.export_for_llm(),
        )
        assert messages[0]["role"] == "system"
        user_text = "".join(
            p["text"] for p in messages[-1]["content"] if p.get("type") == "text")
        assert "## Timeline Context" in user_text
        assert "## Visual Regions" in user_text
        assert "## Entity Knowledge Base" in user_text
        assert user_text.rstrip().endswith("at 1:40?")

    def test_timeline_context_budget_truncation(self):
        core = ReasoningCore()
        idx = TimelineIndexer()
        for t in range(200):
            idx.add_event(float(t), ModalityType.SYSTEM, "x" * 50)
        ctx = core.format_timeline_context(idx.events, max_tokens=100)
        assert ctx.endswith("... (more events truncated)")
        assert len(ctx) < 600

    def test_empty_timeline_message(self):
        core = ReasoningCore()
        assert core.format_timeline_context([]) == (
            "No relevant events found in timeline.")

    def test_tool_call_two_pass(self):
        class ToolCallingBackend(TemplateFakeBackend):
            def __init__(self):
                self.calls = 0

            def stream(self, messages, config, inputs_embeds_prefix=None):
                self.calls += 1
                if self.calls == 1:
                    yield 'I need info <tool_call>search_web("dragon weakness")</tool_call>'
                else:
                    text = messages_to_plain_text(messages)
                    assert any("RESULT" in m["content"] for m in text)
                    yield "**Answer:** use ice"

        class Searcher:
            game_context = None

            def execute_tool_call(self, query, kind):
                return f"RESULT[{query}]"

        core = ReasoningCore(
            backend=ToolCallingBackend(), knowledge_searcher=Searcher())
        idx, _ = build_world()
        response = core.reason("what is the boss weak to?", timeline_indexer=idx)
        assert "use ice" in response
        assert core.backend.calls == 2

    def test_conversation_roundtrip(self, tmp_path):
        core = ReasoningCore()
        idx, _ = build_world()
        core.reason("q at 1:40?", timeline_indexer=idx)
        core.save_conversation(tmp_path / "c.json")
        core2 = ReasoningCore()
        core2.load_conversation(tmp_path / "c.json")
        assert core2.get_conversation_summary()["turn_count"] == 2

    def test_factory_without_checkpoint(self):
        from gvl_tpu.agent.core import TimelineGroundedFakeBackend

        core = create_reasoning_core()
        assert isinstance(core.backend, TimelineGroundedFakeBackend)


class TestVisualProcessor:
    def test_detail_levels(self):
        proc = VisualInputProcessor(ReasoningCoreConfig())
        low = proc.process_frame("img", "low")
        high = proc.process_frame("img", "high")
        auto = proc.process_frame("img")
        assert low["max_pixels"] < auto["max_pixels"] < high["max_pixels"]

    def test_region_tokens(self):
        text = VisualInputProcessor.process_region_tokens([
            {"label": "boss", "bbox": [1, 2, 3, 4], "confidence": 0.9},
            {"label": "chest", "confidence": 0.5},
        ])
        assert "boss: bbox=[1, 2, 3, 4], confidence=0.90" in text
        assert "chest: confidence=0.50" in text
        assert VisualInputProcessor.process_region_tokens([]) == ""


class TestPerceptionLoop:
    def make_loop(self):
        idx, kb = build_world()
        loop = create_perception_loop(timeline_indexer=idx, knowledge_base=kb)
        loop.start()
        return loop

    def test_not_running_returns_none(self):
        idx, kb = build_world()
        loop = create_perception_loop(timeline_indexer=idx, knowledge_base=kb)
        assert loop.process_frame(timestamp=1.0, force_reason=True) is None

    def test_trigger_activates_reasoning(self):
        loop = self.make_loop()
        response = loop.process_frame(
            timestamp=100.0,
            visual_detections=[{"label": "boss_dragon", "confidence": 0.95}],
        )
        assert response is not None and "**Answer:**" in response

    def test_no_trigger_no_response(self):
        loop = self.make_loop()
        assert loop.process_frame(
            timestamp=100.0,
            visual_detections=[{"label": "rock", "confidence": 0.95}],
        ) is None

    def test_pending_query_consumed(self):
        loop = self.make_loop()
        loop.set_query("what is the dragon doing?")
        loop.process_frame(timestamp=100.0, force_reason=True)
        assert loop.get_status()["pending_query"] is None

    def test_projection_and_injection_prefix(self):
        loop = self.make_loop()
        projected = loop.project_embeddings(
            siglip_embeddings=np.random.randn(3, 1152).astype(np.float32),
            audio_embeddings=np.random.randn(2, 1024).astype(np.float32),
        )
        assert projected["siglip"].shape == (3, 4096)
        ctx = loop.get_multimodal_context(projected)
        assert "3 visual region embeddings" in ctx
        prefix = loop.build_embedding_prefix(projected)
        assert prefix.shape == (5, 4096)
        assert loop.build_embedding_prefix({}) is None

    def test_reason_now_and_status(self):
        loop = self.make_loop()
        response = loop.reason_now("what happened at 1:40?")
        assert "[01:40]" in response
        status = loop.get_status()
        assert status["is_running"] is True


class TestSearch:
    def test_cache_roundtrip_and_ttl(self, tmp_path):
        cache = SearchCache(tmp_path, ttl_hours=24)
        results = [SearchResult("t", "s", "https://x.fandom.com/a", "x.fandom.com")]
        cache.put("dragon weakness", results)
        hit = cache.get("Dragon Weakness")  # normalized key
        assert hit and hit[0].title == "t"
        # fresh instance reads from disk
        cache2 = SearchCache(tmp_path)
        assert cache2.get("dragon weakness")[0].url == "https://x.fandom.com/a"

    def test_offline_search_returns_empty_but_caches(self, tmp_path):
        searcher = GameKnowledgeSearcher(
            cache=SearchCache(tmp_path), enable_network=False)
        assert searcher.search("elden ring boss") == []
        assert "[No search results found]" == searcher.execute_tool_call("x")

    def test_domain_boosting(self, tmp_path):
        searcher = GameKnowledgeSearcher(cache=SearchCache(tmp_path))
        results = [
            SearchResult("a", "", "https://random.com/1", "random.com"),
            SearchResult("b", "", "https://elden.fandom.com/2", "elden.fandom.com"),
        ]
        ranked = searcher._boost_gaming_domains(results)
        assert ranked[0].source_domain == "elden.fandom.com"

    def test_query_augmentation_with_context(self, tmp_path):
        searcher = GameKnowledgeSearcher(
            cache=SearchCache(tmp_path), enable_network=False)
        searcher.set_game_context("Elden Ring", "Action RPG")
        q = searcher._augment_query("margit", "boss")
        assert q.startswith("Elden Ring")
        assert "weakness" in q

    def test_tool_definition_shape(self):
        tool = GameKnowledgeSearcher.get_tool_definition()
        assert tool["function"]["name"] == "search_web"
        assert "query" in tool["function"]["parameters"]["properties"]

    def test_game_detector(self):
        det = GameDetector()
        ctx = det.detect_from_text("ELDEN RING - New Game", "ocr")
        assert ctx.game_name == "Elden Ring"
        assert det.detect_from_text("just some random text") is None

    def test_detector_from_timeline(self):
        det = GameDetector()
        idx = TimelineIndexer()
        idx.add_event(5.0, ModalityType.OCR, "HOLLOW KNIGHT")
        ctx = det.detect_from_timeline(idx)
        assert ctx.game_name == "Hollow Knight"

    def test_enhanced_prompt(self):
        from gvl_tpu.agent.search import GameContext

        prompt = create_search_enhanced_system_prompt(
            "base", GameContext(game_name="Hades", game_genre="Roguelike"))
        assert "search_web" in prompt and "Hades (Roguelike)" in prompt


class TestTTFT:
    def test_ttft_tracked_per_stream(self):
        idx, kb = build_world()
        core = ReasoningCore()
        assert core.get_ttft_stats()["count"] == 0
        core.reason("what happened at 1:40?", timeline_indexer=idx)
        core.reason("describe the scene", timeline_indexer=idx)
        stats = core.get_ttft_stats()
        assert stats["count"] == 2
        assert stats["p50_sec"] is not None and stats["p50_sec"] >= 0
        assert stats["p95_sec"] >= stats["p50_sec"] >= 0

    def test_ttft_in_loop_status(self):
        idx, kb = build_world()
        loop = create_perception_loop(timeline_indexer=idx, knowledge_base=kb)
        loop.start()
        loop.process_frame(timestamp=1.0, force_reason=True)
        assert loop.get_status()["ttft"]["count"] == 1
