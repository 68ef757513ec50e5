"""Timeline indexer: formats, merging, queries, transcripts.

Format strings are asserted character-exact against the reference's
rendering rules (timeline_indexer.py:72-96) — these are a compatibility
surface for downstream prompts.
"""

from gvl_tpu.fusion import (
    EventPriority,
    ModalityType,
    TimelineConfig,
    TimelineIndexer,
    create_timeline_indexer,
)


def build_sample_timeline() -> TimelineIndexer:
    idx = TimelineIndexer()
    idx.add_event(83.0, ModalityType.VISUAL, "Boss: HP drops to 50%",
                  entity_id="boss_dragon_001", priority=EventPriority.HIGH)
    idx.add_event(84.0, ModalityType.AUDIO, "roar")
    idx.add_event(85.5, ModalityType.SPEECH, "watch out for the fire")
    idx.add_event(86.0, ModalityType.OCR, "9999", confidence=0.95)
    idx.add_event(10.0, ModalityType.VISUAL, "player spawns",
                  entity_id="player_001")
    return idx


class TestFormats:
    def test_compact_visual(self):
        idx = build_sample_timeline()
        ev = idx.query_by_entity("boss_dragon_001")[0]
        assert ev.format_compact() == "[01:23] Boss: HP drops to 50%"

    def test_compact_speech_quoted(self):
        idx = build_sample_timeline()
        ev = idx.query_by_modality(ModalityType.SPEECH)[0]
        assert ev.format_compact() == '[01:25] "watch out for the fire"'

    def test_compact_audio_and_ocr(self):
        idx = build_sample_timeline()
        audio = idx.query_by_modality(ModalityType.AUDIO)[0]
        ocr = idx.query_by_modality(ModalityType.OCR)[0]
        assert audio.format_compact() == "[01:24] (Audio: roar)"
        assert ocr.format_compact() == '[01:26] (Text: "9999")'

    def test_verbose_includes_entity_and_modality(self):
        idx = build_sample_timeline()
        ev = idx.query_by_entity("boss_dragon_001")[0]
        assert ev.format_verbose() == (
            "[01:23] [boss_dragon_001] (visual) Boss: HP drops to 50%"
        )


class TestQueries:
    def test_range_inclusive(self):
        idx = build_sample_timeline()
        events = idx.query_range(83.0, 86.0)
        assert [e.timestamp for e in events] == [83.0, 84.0, 85.5, 86.0]

    def test_around_timestamp_window(self):
        idx = build_sample_timeline()
        events = idx.query_around_timestamp(84.0, window=4.0)
        assert [e.timestamp for e in events] == [83.0, 84.0, 85.5, 86.0]

    def test_by_entity_sorted(self):
        idx = build_sample_timeline()
        idx.add_event(50.0, ModalityType.VISUAL, "boss appears",
                      entity_id="boss_dragon_001")
        events = idx.query_by_entity("boss_dragon_001")
        assert [e.timestamp for e in events] == [50.0, 83.0]

    def test_low_priority_excluded_by_default(self):
        idx = build_sample_timeline()
        idx.add_event(84.2, ModalityType.OCR, "ambient text",
                      priority=EventPriority.LOW)
        timestamps = [e.timestamp for e in idx.query_range(80, 90)]
        assert 84.2 not in timestamps
        idx.config.include_low_priority = True
        timestamps = [e.timestamp for e in idx.query_range(80, 90)]
        assert 84.2 in timestamps

    def test_out_of_order_insertion_stays_sorted(self):
        idx = TimelineIndexer()
        for t in (30.0, 10.0, 20.0, 5.0):
            idx.add_event(t, ModalityType.SYSTEM, f"t={t}")
        assert [e.timestamp for e in idx.events] == [5.0, 10.0, 20.0, 30.0]


class TestMerging:
    def test_merge_same_entity_burst(self):
        idx = TimelineIndexer(TimelineConfig(merge_window_sec=0.5))
        for i, t in enumerate([10.0, 10.3, 10.6]):
            idx.add_event(t, ModalityType.VISUAL, f"obs {i}",
                          entity_id="e1")
        removed = idx.merge_and_dedupe()
        assert removed == 2
        merged = idx.events[0]
        assert merged.timestamp == 10.0
        assert merged.description == "obs 0; obs 1; obs 2"
        assert merged.duration == 0.6000000000000014 or abs(merged.duration - 0.6) < 1e-9

    def test_no_merge_across_entities(self):
        idx = TimelineIndexer()
        idx.add_event(10.0, ModalityType.VISUAL, "a", entity_id="e1")
        idx.add_event(10.2, ModalityType.VISUAL, "b", entity_id="e2")
        idx.merge_and_dedupe()
        assert len(idx.events) == 2

    def test_dedupe_by_prefix_key(self):
        idx = TimelineIndexer()
        idx.add_event(10.0, ModalityType.OCR, "Score: 100")
        idx.add_event(50.0, ModalityType.OCR, "SCORE: 100")  # same lowercase key
        idx.merge_and_dedupe()
        assert len(idx.events) == 1

    def test_merged_priority_and_confidence(self):
        idx = TimelineIndexer()
        idx.add_event(10.0, ModalityType.VISUAL, "a", entity_id="e1",
                      priority=EventPriority.LOW, confidence=0.5)
        idx.add_event(10.1, ModalityType.VISUAL, "b", entity_id="e1",
                      priority=EventPriority.CRITICAL, confidence=0.9)
        idx.merge_and_dedupe()
        ev = idx.events[0]
        assert ev.priority is EventPriority.CRITICAL
        assert ev.confidence == 0.9


class TestTranscript:
    def test_transcript_order_and_content(self):
        idx = build_sample_timeline()
        transcript = idx.build_structured_transcript(start_time=80, end_time=90)
        assert transcript.splitlines() == [
            "[01:23] Boss: HP drops to 50%",
            "[01:24] (Audio: roar)",
            '[01:25] "watch out for the fire"',
            '[01:26] (Text: "9999")',
        ]

    def test_transcript_budget_keeps_high_priority(self):
        idx = TimelineIndexer()
        for t in range(10):
            idx.add_event(float(t), ModalityType.SYSTEM, f"filler {t}")
        idx.add_event(100.0, ModalityType.VISUAL, "boss killed",
                      priority=EventPriority.CRITICAL)
        transcript = idx.build_structured_transcript(max_events=3)
        assert "boss killed" in transcript
        # survivors re-sorted by time: CRITICAL event is last chronologically
        assert transcript.splitlines()[-1] == "[01:40] boss killed"

    def test_segments(self):
        idx = build_sample_timeline()
        segments = idx.get_segments(segment_duration=40.0)
        assert len(segments) == 2
        assert segments[0].start_time == 10.0
        assert segments[0].event_count == 1  # player spawns
        assert segments[1].event_count == 4


class TestAdaptersAndStats:
    def test_statistics(self):
        idx = build_sample_timeline()
        stats = idx.get_statistics()
        assert stats["total_events"] == 5
        assert stats["unique_entities"] == 2
        assert stats["events_by_modality"]["visual"] == 2

    def test_factory(self):
        idx = create_timeline_indexer(merge_window=1.0, max_events_per_query=7)
        assert idx.config.merge_window_sec == 1.0
        assert idx.config.max_events_per_query == 7

    def test_clear(self):
        idx = build_sample_timeline()
        idx.clear()
        assert idx.get_statistics()["total_events"] == 0
        assert idx.get_segments() == []
