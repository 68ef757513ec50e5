"""Agent machinery: conversation, confidence, tools, tokens, triggers,
temporal context, hybrid retrieval."""

import numpy as np
import pytest

from gvl_tpu.agent import (
    ConfidenceScorer,
    ConversationHistory,
    HashingTextEmbedder,
    ReasoningCoreConfig,
    SpecialTokens,
    TemporalContextManager,
    TimelineRetriever,
    ToolCallParser,
    TriggerDetector,
)
from gvl_tpu.fusion import ModalityType, TimelineIndexer


class TestConversation:
    def test_rolling_summary(self):
        h = ConversationHistory(max_turns=4)
        for i in range(6):
            h.add_user_message(f"question {i}")
        assert h.get_turn_count() == 4
        ctx = h.get_context_for_prompt()
        assert "[Earlier conversation summary:" in ctx
        assert "question 0" in ctx and "question 5" in ctx

    def test_timestamp_tracking(self):
        h = ConversationHistory()
        h.add_user_message("what happened at 5:30?", video_timestamp=330.0)
        h.add_assistant_message("boss died", confidence=0.8)
        h.add_user_message("and at 6:00?", video_timestamp=360.0)
        assert h.get_mentioned_timestamps() == [330.0, 360.0]
        assert h.get_last_mentioned_timestamp() == 360.0
        assert h.get_last_user_query() == "and at 6:00?"
        assert h.get_last_assistant_response() == "boss died"

    @pytest.mark.parametrize("query,expected", [
        ("what happened next?", True),
        ("tell me more", True),
        ("why?", True),
        ("how did that happen", True),
        ("what is the boss's name at 5:30?", False),
        ("describe the scene", False),
    ])
    def test_follow_up_detection(self, query, expected):
        assert ConversationHistory.is_follow_up_query(query) is expected

    def test_save_load_roundtrip(self, tmp_path):
        h = ConversationHistory()
        h.add_user_message("q1", video_timestamp=10.0)
        h.add_assistant_message("a1")
        h.save(tmp_path / "conv.json")
        h2 = ConversationHistory.load(tmp_path / "conv.json")
        assert h2.get_turn_count() == 2
        assert h2.get_last_mentioned_timestamp() == 10.0

    def test_chat_messages_format(self):
        h = ConversationHistory()
        h.add_user_message("hello")
        msgs = h.get_messages_for_chat()
        assert msgs == [
            {"role": "user", "content": [{"type": "text", "text": "hello"}]}
        ]


class TestConfidence:
    def setup_method(self):
        self.scorer = ConfidenceScorer()

    def test_full_structure_with_citations(self):
        resp = ("**Reasoning:** The timeline shows the boss HP reaching zero. "
                "**Answer:** The boss was defeated at [05:30].")
        score = self.scorer.score_response(
            "What happened at 5:30?", resp, context_events=[1, 2, 3])
        assert score == pytest.approx(0.3 + 0.05 + 0.25 + 0.2)

    def test_no_context_short_answer(self):
        score = self.scorer.score_response("what?", "no idea")
        assert score == pytest.approx(0.0 + 0.0 + 0.05 + 0.15)

    def test_timed_query_without_citation_penalized(self):
        long_resp = "x" * 60
        score = self.scorer.score_response("at 5:30?", long_resp)
        assert score == pytest.approx(0.0 + 0.0 + 0.1 + 0.05)

    def test_token_probs_scale(self):
        resp = "**Reasoning:** a **Answer:** b at [01:00]" + "x" * 30
        base = self.scorer.score_response("q", resp)
        scaled = self.scorer.score_response("q", resp, token_probs=[1.0, 1.0])
        half = self.scorer.score_response("q", resp, token_probs=[0.0])
        assert scaled == pytest.approx(base)
        assert half == pytest.approx(base * 0.5)


class TestTools:
    def test_parse_and_strip(self):
        parser = ToolCallParser()
        text = ('I need to look this up.\n'
                '<tool_call>search_web("dragon boss weakness")</tool_call>\n'
                'Stand by.')
        calls = parser.parse_tool_calls(text)
        assert len(calls) == 1
        assert calls[0].arguments == "dragon boss weakness"
        cleaned, results = parser.execute_all_tools(text)
        assert "<tool_call>" not in cleaned
        assert len(results) == 1
        assert "unavailable" in results[0]  # no searcher configured

    def test_unknown_tool_ignored(self):
        parser = ToolCallParser()
        assert parser.parse_tool_calls('<tool_call>rm_rf("x")</tool_call>') == []

    def test_searcher_routing(self):
        class FakeSearcher:
            def execute_tool_call(self, query, kind):
                return f"RESULT[{query}|{kind}]"

        parser = ToolCallParser(FakeSearcher())
        _, results = parser.execute_all_tools(
            "<tool_call>search_web('elden ring lore')</tool_call>")
        assert results == ["RESULT[elden ring lore|general]"]

    def test_results_prompt_format(self):
        parser = ToolCallParser()
        prompt = parser.format_tool_results_for_prompt(["r1", "r2"])
        assert "### Result 1" in prompt and "### Result 2" in prompt
        assert parser.format_tool_results_for_prompt([]) == ""


class TestSpecialTokens:
    def test_timestamp_roundtrip(self):
        token = SpecialTokens.format_timestamp(125.0)
        assert token == "<ts=02:05>"
        assert SpecialTokens.parse_timestamp(token) == 125.0
        assert SpecialTokens.parse_timestamp("<bad>") is None

    def test_interleaved_context(self):
        idx = TimelineIndexer()
        idx.add_event(83.0, ModalityType.VISUAL, "boss appears")
        idx.add_event(84.0, ModalityType.AUDIO, "roar")
        idx.add_event(85.0, ModalityType.SPEECH, "run!")
        text = SpecialTokens.format_interleaved_context(idx.events)
        lines = text.splitlines()
        assert lines[0] == "<ts=01:23> <r> boss appears"
        assert lines[1] == "<ts=01:24> <a> roar"
        assert lines[2] == "<ts=01:25> run!"
        emb = SpecialTokens.format_interleaved_context(
            idx.events, include_embeddings=True)
        assert "<r_emb>" in emb and "<a_emb>" in emb


class TestTrigger:
    def setup_method(self):
        self.det = TriggerDetector(ReasoningCoreConfig())

    def test_concept_trigger_fires(self):
        trig = self.det.process_frame(
            10.0, visual_detections=[{"label": "boss_dragon", "confidence": 0.9}])
        assert trig is not None
        assert trig.details["concept"] == "boss"

    def test_below_threshold_ignored(self):
        trig = self.det.process_frame(
            10.0, visual_detections=[{"label": "boss", "confidence": 0.5}])
        assert trig is None

    def test_cooldown(self):
        dets = [{"label": "boss", "confidence": 0.95}]
        assert self.det.process_frame(10.0, visual_detections=dets)
        assert self.det.process_frame(10.5, visual_detections=dets) is None
        assert self.det.process_frame(11.5, visual_detections=dets)

    def test_audio_trigger(self):
        trig = self.det.process_frame(
            5.0, audio_events=[{"event": "explosion", "confidence": 0.85}])
        assert trig is not None and trig.trigger_type == "audio"

    def test_pending_drain(self):
        self.det.process_frame(
            10.0, visual_detections=[{"label": "boss", "confidence": 0.9}])
        assert len(self.det.get_pending_triggers()) == 1
        assert self.det.get_pending_triggers() == []


class TestTemporalContext:
    def test_window_and_cap_pruning(self):
        cfg = ReasoningCoreConfig(temporal_window_minutes=1.0, max_hico_tokens=3)
        mgr = TemporalContextManager(cfg)
        for t in (0.0, 30.0, 50.0, 55.0, 58.0):
            mgr.add_context(t, np.ones(4) * t)
        # window prunes 0.0 (>60s older than 58); cap 3 prunes 30.0
        timestamps, stacked = mgr.get_context()
        assert timestamps == [50.0, 55.0, 58.0]
        assert stacked.shape == (3, 4)
        assert "3 frames" in mgr.get_context_summary()

    def test_empty(self):
        mgr = TemporalContextManager(ReasoningCoreConfig())
        assert mgr.get_context() == ([], None)
        assert "No temporal context" in mgr.get_context_summary()


class TestRetriever:
    def build(self):
        idx = TimelineIndexer()
        idx.add_event(100.0, ModalityType.VISUAL, "dragon boss appears")
        idx.add_event(110.0, ModalityType.VISUAL, "player dodges fire attack")
        idx.add_event(300.0, ModalityType.OCR, "LEVEL UP")
        idx.add_event(310.0, ModalityType.SPEECH, "we got the treasure chest")
        retriever = TimelineRetriever(ReasoningCoreConfig())
        retriever.index_timeline(idx)
        return idx, retriever

    @pytest.mark.parametrize("query,expected", [
        ("what happened at 1:40?", 100.0),
        ("at 01:02:03 what happened", 3723.0),
        ("what happened at 45 seconds", 45.0),
        ("around 30s there was a fight", 30.0),
        ("describe the fight", None),
    ])
    def test_timestamp_parsing(self, query, expected):
        _, r = self.build()
        assert r.parse_timestamp(query) == expected

    def test_time_based_retrieval(self):
        idx, r = self.build()
        events = r.retrieve_by_timestamp(105.0, timeline_indexer=idx)
        assert {e.timestamp for e in events} == {100.0, 110.0}

    def test_semantic_retrieval_ranks_relevant_first(self):
        _, r = self.build()
        top = r.retrieve_by_semantic("where is the treasure chest", top_k=1)
        assert top[0].description == "we got the treasure chest"
        top = r.retrieve_by_semantic("dragon boss fight", top_k=1)
        assert top[0].description == "dragon boss appears"

    def test_hybrid_with_timestamp_merges_semantic(self):
        idx, r = self.build()
        events = r.hybrid_retrieve("what boss appeared at 1:40?", idx)
        descs = [e.description for e in events]
        assert "dragon boss appears" in descs
        assert len(descs) == len(set(map(id, events)))  # deduped

    def test_hybrid_without_timestamp_is_semantic(self):
        idx, r = self.build()
        events = r.hybrid_retrieve("tell me about the level up text", idx)
        assert any(e.description == "LEVEL UP" for e in events)

    def test_reindex_skipped_on_same_count(self):
        idx, r = self.build()
        emb_before = r._event_embeddings
        r.index_timeline(idx)
        assert r._event_embeddings is emb_before

    def test_hashing_embedder_deterministic(self):
        e1 = HashingTextEmbedder(128).encode(["boss fight"])
        e2 = HashingTextEmbedder(128).encode(["boss fight"])
        np.testing.assert_array_equal(e1, e2)
        assert np.linalg.norm(e1[0]) == pytest.approx(1.0)
