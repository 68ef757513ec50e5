#!/usr/bin/env python
"""Interactive gameplay-video QA: full perception → external memory → chat.

The flagship entry point (parity surface:
`/root/reference/scripts/realtime_inference.py` — same CLI contract:
``--video --preset --fps --query`` plus interactive slash commands).

Pipeline: frame decode (y4m / synthetic / cv2) → open-vocab segmentation +
tracking → region semantics → temporal clips → audio (ASR + events) → OCR
→ unified timeline + entity knowledge base → trigger-gated reasoning loop
with streaming answers.
"""

from __future__ import annotations

import argparse
import logging
import sys
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Optional

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from gvl_tpu.utils.jax_setup import setup_jax

setup_jax()

from gvl_tpu.agent import ReasoningCoreConfig, PerceptionReasoningLoop
from gvl_tpu.agent.search import GameDetector, GameKnowledgeSearcher
from gvl_tpu.cache import FeatureCache
from gvl_tpu.config import SystemConfig, load_preset
from gvl_tpu.fusion import (
    EventPriority,
    KnowledgeBaseBuilder,
    ModalityType,
    TimelineIndexer,
)
from gvl_tpu.io import extract_frames
from gvl_tpu.perception import (
    OCRPipeline,
    SAMConceptSegmenter,
    SAMConfig,
    SigLIPSemanticEncoder,
    create_ocr_pipeline,
)
from gvl_tpu.temporal import TemporalCompressionModule
from gvl_tpu.utils import StageTimer

logger = logging.getLogger("realtime_inference")

DEFAULT_CONCEPTS = ["player", "enemy", "boss", "item"]


@dataclass
class ProcessedVideo:
    """Everything extracted from one video + the live reasoning loop."""

    video_path: str
    timestamps: list[float] = field(default_factory=list)
    timeline: TimelineIndexer = field(default_factory=TimelineIndexer)
    knowledge_base: KnowledgeBaseBuilder = field(
        default_factory=KnowledgeBaseBuilder)
    siglip_embeddings: list[tuple[float, np.ndarray]] = field(
        default_factory=list)
    videomae_embeddings: list[tuple[float, np.ndarray]] = field(
        default_factory=list)
    audio_embeddings: list[tuple[float, np.ndarray]] = field(
        default_factory=list)
    loop: Optional[PerceptionReasoningLoop] = None
    timings: dict = field(default_factory=dict)


def _make_segmenter(config: SystemConfig) -> SAMConceptSegmenter:
    """Preset backend ladder (see gvl_tpu.perception.batch)."""
    from gvl_tpu.perception.batch import build_segmenter

    return build_segmenter(config)


def _make_siglip_encoder(config: SystemConfig) -> SigLIPSemanticEncoder:
    """Preset backend ladder (checkpoint = HF directory)."""
    from gvl_tpu.perception.batch import build_siglip_encoder

    return build_siglip_encoder(config)


def run_sam_detection(frames, config: SystemConfig, timeline, kb,
                      concepts=DEFAULT_CONCEPTS):
    """Segment+track at the (lower) segmenter rate; feed timeline + KB."""
    sam_step = max(1, int(round(config.inference.fps
                                / max(config.perception.sam3_fps, 1e-6))))
    segmenter = _make_segmenter(config)
    sampled = [(i, ts, frame) for i, (ts, frame) in enumerate(frames)
               if i % sam_step == 0]
    if not sampled:
        return segmenter
    batch = segmenter.segment_batch(
        [f for _, _, f in sampled], [i for i, _, _ in sampled], concepts
    )
    for (idx, ts, _), entities in zip(sampled, batch):
        timeline.add_from_sam_entities(entities, idx, ts)
        kb.update_from_tracking(entities, idx, ts)
    return segmenter


def extract_siglip_embeddings(frames, segmenter, config: SystemConfig):
    """Per-frame region (or whole-frame) semantic embeddings."""
    encoder = _make_siglip_encoder(config)
    out = []
    for idx, (ts, frame) in enumerate(frames):
        masks = []
        for entity in segmenter.get_all_entities():
            mask = entity.get_mask_at_frame(idx)
            if mask is not None:
                masks.append((entity.entity_id, mask.mask))
        if masks:
            embs = encoder.encode_masked_regions(frame, masks)
            for emb in embs:
                out.append((ts, emb.embedding))
        else:
            out.append((ts, encoder.encode_image(frame)))
    return out


def extract_videomae_embeddings(frames, config: SystemConfig,
                                timeline=None):
    """16-frame clips, stride 8 → clip embeddings through the preset
    ladder: local HF VideoMAE dir > self-trained mini tower (which also
    emits textual motion events into ``timeline``) > hash fake."""
    from gvl_tpu.temporal.clip_encoder import (
        build_clip_encoder,
        extract_clip_embeddings,
    )

    return extract_clip_embeddings(frames, build_clip_encoder(config),
                                   timeline=timeline)


def run_audio_analysis(video_path: str, timeline, config: SystemConfig):
    """Sibling .wav (or silence) → ASR + events into the timeline.

    The ASR backend and the chunk embedder come from the preset ladder
    (``audio.whisper_checkpoint`` / ``audio.wav2vec2_checkpoint`` →
    JAX models; fakes otherwise)."""
    from gvl_tpu.audio import build_audio_stack

    proc, embedder = build_audio_stack(config.audio)
    if str(video_path).startswith("synthetic://"):
        from gvl_tpu.io.video import SyntheticVideo

        synth = SyntheticVideo.from_url(str(video_path))
        if synth.with_audio:   # procedural track with known truth
            audio, rate = synth.audio()
        else:
            audio, rate = np.zeros(16000, np.float32), 16000
    elif (wav_path := Path(video_path).with_suffix(".wav")).exists():
        audio, rate = proc.preprocessor.load_audio(wav_path)
    else:
        audio, rate = proc.preprocessor.extract_from_video(video_path)
    result = proc.analyze_audio(audio, rate)
    timeline.add_from_audio_result(result)
    # wav2vec2-style chunk embeddings (10 s chunks)
    embeddings = [
        (start, embedder(chunk, rate))
        for chunk, start, _ in proc.preprocessor.chunk_audio(
            audio, rate, chunk_duration=10.0, overlap=0.0)
    ]
    return result, embeddings


def run_ocr_extraction(frames, timeline, config: SystemConfig):
    """OCR each frame; conf>=0.7 & len>=3 filter before timeline entry."""
    ocr = create_ocr_pipeline(
        config.perception.ocr_backend
    )
    ocr_frames = []
    for idx, (ts, frame) in enumerate(frames):
        result = ocr.extract_text_from_frame(frame, idx, ts)
        ocr_frames.append(result)
        for det in result.detections:
            if det.confidence < 0.7 or len(det.text) < 3:
                continue
            important = det.category in ("damage", "health")
            timeline.add_event(
                ts, ModalityType.OCR, det.text,
                priority=EventPriority.MEDIUM if important else EventPriority.LOW,
                confidence=det.confidence,
                metadata={"category": det.category, "bbox": det.bbox},
            )
    return ocr_frames


def run_hico(frames, timeline, config: SystemConfig):
    if not config.temporal.use_hico or len(frames) < 2:
        return []
    module = TemporalCompressionModule()
    tokens = module.segment_and_compress(
        np.stack([f for _, f in frames]), fps=config.inference.fps
    )
    timeline.add_from_hico_tokens(tokens)
    return tokens


def run_pipelined_perception(
    frames, config: SystemConfig, timeline, kb, concepts=DEFAULT_CONCEPTS
):
    """Frame-major perception through the stage-parallel pipeline.

    Stages (segment+track → region semantics → OCR) each run in their own
    worker with bounded queues, so frame i+1 segments while frame i is
    being encoded — the reference's Future-Work pipeline parallelism
    (`README.md:851-855`) live in the flagship path.
    Returns the per-timestamp SigLIP embeddings.
    """
    from gvl_tpu.parallel.pipeline import PerceptionPipeline, PipelineStage

    segmenter = _make_segmenter(config)
    encoder = _make_siglip_encoder(config)
    ocr = create_ocr_pipeline(
        config.perception.ocr_backend
    )
    sam_step = max(1, int(round(config.inference.fps
                                / max(config.perception.sam3_fps, 1e-6))))

    def stage_segment(item):
        idx, ts, frame = item
        entities = []
        if config.perception.use_sam and idx % sam_step == 0:
            entities = segmenter.segment_with_prompts(frame, idx, concepts)
        return idx, ts, frame, entities

    def stage_semantic(item):
        idx, ts, frame, entities = item
        embeddings = []
        if config.perception.use_siglip:
            masks = [(e.entity_id, e.frame_masks[idx].mask)
                     for e in entities if idx in e.frame_masks]
            if masks:
                embeddings = [
                    (ts, emb.embedding)
                    for emb in encoder.encode_masked_regions(frame, masks)
                ]
            else:
                embeddings = [(ts, encoder.encode_image(frame))]
        return idx, ts, frame, entities, embeddings

    def stage_ocr(item):
        idx, ts, frame, entities, embeddings = item
        ocr_result = (
            ocr.extract_text_from_frame(frame, idx, ts)
            if config.perception.use_ocr else None
        )
        return idx, ts, entities, embeddings, ocr_result

    pipeline = PerceptionPipeline([
        PipelineStage("segment", stage_segment),
        PipelineStage("semantic", stage_semantic),
        PipelineStage("ocr", stage_ocr),
    ])

    siglip_embeddings = []
    for idx, ts, entities, embeddings, ocr_result in pipeline.run(
        [(i, ts, frame) for i, (ts, frame) in enumerate(frames)]
    ):
        if entities:
            timeline.add_from_sam_entities(entities, idx, ts)
            kb.update_from_tracking(entities, idx, ts)
        siglip_embeddings.extend(embeddings)
        if ocr_result is not None:
            for det in ocr_result.detections:
                if det.confidence < 0.7 or len(det.text) < 3:
                    continue
                important = det.category in ("damage", "health")
                timeline.add_event(
                    ts, ModalityType.OCR, det.text,
                    priority=(EventPriority.MEDIUM if important
                              else EventPriority.LOW),
                    confidence=det.confidence,
                    metadata={"category": det.category, "bbox": det.bbox},
                )
    return siglip_embeddings


def process_video(
    video_path: str,
    config: Optional[SystemConfig] = None,
    use_cache: bool = True,
    concepts: list[str] = DEFAULT_CONCEPTS,
    pipelined: bool = False,
    batched: bool = False,
) -> ProcessedVideo:
    """Run (or reload) the full perception stack and build the loop."""
    config = config or load_preset("light")
    timer = StageTimer()
    cache = FeatureCache(config.inference.cache_dir)
    result = ProcessedVideo(video_path=video_path)
    timeline, kb = result.timeline, result.knowledge_base

    cached = cache.load_features(video_path) if (
        use_cache and config.inference.use_feature_cache) else None
    if cached is not None:
        logger.info("cache hit for %s", video_path)
        _restore_from_cache(result, cached)
    else:
        with timer.stage("frame_extraction"):
            from gvl_tpu.io.ingest import resolve_video_source

            # YouTube URLs download first (yt-dlp), codec files go
            # through the ffmpeg→y4m→native ladder, synthetic://
            # and .y4m hit the native paths directly
            frames = resolve_video_source(
                video_path, fps=config.inference.fps)
        result.timestamps = [t for t, _ in frames]

        if batched:
            # throughput-oriented: chunked frames×concepts segmentation,
            # shared region/OCR buckets (gvl_tpu.perception.batch)
            from gvl_tpu.perception import run_batched_perception

            with timer.stage("batched_perception"):
                result.siglip_embeddings = run_batched_perception(
                    frames, config, timeline, kb, concepts)
        elif pipelined:
            with timer.stage("pipelined_perception"):
                result.siglip_embeddings = run_pipelined_perception(
                    frames, config, timeline, kb, concepts)
        else:
            segmenter = None
            if config.perception.use_sam:
                with timer.stage("sam_detection"):
                    segmenter = run_sam_detection(frames, config, timeline,
                                                  kb, concepts)
            else:
                segmenter = _make_segmenter(config)
                if config.perception.use_siglip:
                    # segmenter-free grounding: zero-shot mini-SigLIP
                    # window labels → VISUAL events (the gvp_light arm
                    # otherwise has no entity events and every visual
                    # question falls to chance; VERDICT r3 #4)
                    from gvl_tpu.perception.frame_labeler import (
                        emit_zero_shot_labels,
                    )

                    with timer.stage("zero_shot_labels"):
                        emit_zero_shot_labels(frames, config, timeline,
                                              concepts=concepts)

            if config.perception.use_siglip:
                with timer.stage("siglip_embeddings"):
                    result.siglip_embeddings = extract_siglip_embeddings(
                        frames, segmenter, config)

        if config.perception.use_videomae:
            with timer.stage("videomae_embeddings"):
                result.videomae_embeddings = extract_videomae_embeddings(
                    frames, config, timeline=timeline)

        if config.audio.use_audio:
            with timer.stage("audio_analysis"):
                _, result.audio_embeddings = run_audio_analysis(
                    video_path, timeline, config)

        if config.perception.use_ocr and not (pipelined or batched):
            with timer.stage("ocr_extraction"):
                run_ocr_extraction(frames, timeline, config)

        with timer.stage("temporal_compression"):
            run_hico(frames, timeline, config)

        with timer.stage("timeline_indexing"):
            timeline.merge_and_dedupe()

        if use_cache and config.inference.use_feature_cache:
            with timer.stage("cache_save"):
                cache.save_features(video_path, _to_cache_dict(result))

    _finalize_processed(result, config, timer)
    print(timer.report())
    return result


def processed_from_features(video_path: str, config: SystemConfig,
                            features: dict) -> ProcessedVideo:
    """Build a live :class:`ProcessedVideo` (incl. the reasoning loop)
    from a previously persisted feature dict (the ``_to_cache_dict``
    layout) WITHOUT running any perception — the Stage-B entry for the
    benchmark :class:`~benchmarks.perception_cache.PerceptionCache`."""
    timer = StageTimer()
    result = ProcessedVideo(video_path=video_path)
    with timer.stage("cache_restore"):
        _restore_from_cache(result, features)
    _finalize_processed(result, config, timer)
    return result


def _finalize_processed(result: ProcessedVideo, config: SystemConfig,
                        timer: "StageTimer") -> None:
    """Shared tail of process_video: projector-dim resolution + loop."""
    timeline, kb = result.timeline, result.knowledge_base
    reasoning_config = ReasoningCoreConfig(
        max_new_tokens=config.reasoning.max_new_tokens,
        trigger_concepts=config.inference.trigger_concepts,
        trigger_confidence_threshold=
            config.inference.trigger_confidence_threshold,
    )
    # a trained mini-SigLIP tower emits its own embedding width — the
    # siglip projector head must match the encoder actually in use
    from gvl_tpu.utils.checkpoints import resolve_repo_path as _rrp

    _sig_ckpt = _rrp(getattr(config.perception, "siglip_checkpoint", None))
    if _sig_ckpt:
        from gvl_tpu.training.siglip_train import is_minisiglip_checkpoint

        if is_minisiglip_checkpoint(_sig_ckpt):
            import json as _json

            reasoning_config.siglip_dim = _json.loads(
                (Path(_sig_ckpt) / "minisiglip_config.json").read_text()
            )["vision"]["hidden_size"]
    # same rule for the self-trained temporal tower (mini width ≠ 768)
    _vmae_ckpt = _rrp(getattr(config.perception, "videomae_checkpoint",
                              None))
    if _vmae_ckpt:
        from gvl_tpu.training.videomae_train import (
            is_trained_clip_checkpoint,
        )

        if is_trained_clip_checkpoint(_vmae_ckpt):
            import json as _json

            reasoning_config.videomae_dim = _json.loads(
                (Path(_vmae_ckpt) / "videomae_config.json").read_text()
            )["model"]["hidden_size"]
    # the data wins over the ladder: a cache hit may carry embeddings
    # from a different tower than the currently-resolved checkpoints
    # (e.g. hash-fake 768 cached before the trained 256-d clip tower
    # shipped) — projector heads must match what will be projected
    if result.videomae_embeddings:
        reasoning_config.videomae_dim = int(
            result.videomae_embeddings[0][1].shape[-1])
    if result.siglip_embeddings:
        reasoning_config.siglip_dim = int(
            result.siglip_embeddings[0][1].shape[-1])
    if result.audio_embeddings:
        reasoning_config.audiomae_dim = int(
            result.audio_embeddings[0][1].shape[-1])
    with timer.stage("loop_init"):
        from gvl_tpu.utils.checkpoints import resolve_repo_path

        core, projectors = _loop_components(
            reasoning_config, config.reasoning.projector_path,
            resolve_repo_path(
                getattr(config.reasoning, "llm_checkpoint", None)))
        core.clear_conversation()
        loop = PerceptionReasoningLoop(
            config=reasoning_config,
            timeline_indexer=timeline,
            knowledge_base=kb,
            projector_weights_path=config.reasoning.projector_path,
            reasoning_core=core,
            projectors=projectors,
        )
        loop.start()
        loop.reasoning_core.index_timeline(timeline)
    result.loop = loop
    result.timings = dict(timer.timings)


# (reasoning core, projector bank) shared across videos: bank init +
# weight load dominate per-video setup (~10 s measured), and a benchmark
# run visits hundreds of videos — the reference memoizes equivalently
# (`/root/reference/benchmarks/model_inference.py:142-174`).  Keyed on
# everything that changes the built objects; conversation state is
# cleared per video by process_video.
_LOOP_COMPONENT_CACHE: dict = {}


def _loop_components(reasoning_config: ReasoningCoreConfig,
                     projector_path: Optional[str],
                     llm_checkpoint: Optional[str] = None):
    from dataclasses import asdict

    key = (repr(sorted(asdict(reasoning_config).items(),
                       key=lambda kv: kv[0])), projector_path,
           llm_checkpoint)
    if key not in _LOOP_COMPONENT_CACHE:
        from gvl_tpu.agent.core import create_reasoning_core
        from gvl_tpu.models.projector import ProjectorBank

        core = create_reasoning_core(reasoning_config,
                                     checkpoint_path=llm_checkpoint)
        projectors = ProjectorBank(reasoning_config).init()
        if projector_path and Path(projector_path).exists():
            projectors.load_weights(projector_path)
        _LOOP_COMPONENT_CACHE[key] = (core, projectors)
    return _LOOP_COMPONENT_CACHE[key]


def _to_cache_dict(result: ProcessedVideo) -> dict:
    from gvl_tpu.fusion.schema import kb_to_schema_dict

    return {
        "timestamps": np.asarray(result.timestamps, np.float64),
        "siglip_ts": np.asarray([t for t, _ in result.siglip_embeddings]),
        "siglip": (np.stack([e for _, e in result.siglip_embeddings])
                   if result.siglip_embeddings else np.zeros((0, 1152))),
        "videomae_ts": np.asarray([t for t, _ in result.videomae_embeddings]),
        "videomae": (np.stack([e for _, e in result.videomae_embeddings])
                     if result.videomae_embeddings else np.zeros((0, 768))),
        "audio_ts": np.asarray([t for t, _ in result.audio_embeddings]),
        "audio": (np.stack([e for _, e in result.audio_embeddings])
                  if result.audio_embeddings else np.zeros((0, 1024))),
        "events": [
            {
                "timestamp": e.timestamp,
                "modality": e.modality.value,
                "description": e.description,
                "priority": e.priority.value,
                "duration": e.duration,
                "entity_id": e.entity_id,
                "confidence": e.confidence,
            }
            for e in result.timeline.events
        ],
        "knowledge_base": kb_to_schema_dict(result.knowledge_base),
    }


def _restore_from_cache(result: ProcessedVideo, cached: dict) -> None:
    result.timestamps = list(np.asarray(cached.get("timestamps", [])))
    for key, attr in (("siglip", "siglip_embeddings"),
                      ("videomae", "videomae_embeddings"),
                      ("audio", "audio_embeddings")):
        ts = np.asarray(cached.get(f"{key}_ts", []))
        arr = np.asarray(cached.get(key, np.zeros((0,))))
        setattr(result, attr, [(float(t), arr[i]) for i, t in enumerate(ts)])
    for ev in cached.get("events", []):
        result.timeline.add_event(
            timestamp=float(ev["timestamp"]),
            modality=ModalityType(ev["modality"]),
            description=ev["description"],
            priority=EventPriority(int(ev["priority"])),
            duration=float(ev.get("duration", 0.0)),
            entity_id=ev.get("entity_id"),
            confidence=float(ev.get("confidence", 1.0)),
        )
    kb_doc = cached.get("knowledge_base") or {}
    from gvl_tpu.fusion import EntityCategory, EntityState as KBState  # noqa
    from gvl_tpu.fusion.knowledge_base import EntityState as NodeState
    for ent in kb_doc.get("entities", []):
        result.knowledge_base.register_entity(
            ent["entity_id"], ent["label"],
            EntityCategory(ent.get("category", "unknown")),
            timestamp=float(ent.get("first_seen", 0.0)),
        )


def _window(embs: list[tuple[float, np.ndarray]], ts: Optional[float],
            window: float = 30.0) -> Optional[np.ndarray]:
    if not embs:
        return None
    if ts is None:
        chosen = [e for _, e in embs]
    else:
        chosen = [e for t, e in embs if abs(t - ts) <= window]
    return np.stack(chosen) if chosen else None


def answer_query(processed: ProcessedVideo, query: str,
                 timestamp: Optional[float] = None) -> str:
    """One-shot QA with ±30 s multimodal embedding windows."""
    loop = processed.loop
    loop.set_query(query)
    return loop.process_frame(
        timestamp=timestamp or 0.0,
        region_embeddings=_window(processed.siglip_embeddings, timestamp),
        videomae_embeddings=_window(processed.videomae_embeddings, timestamp),
        audio_embeddings=_window(processed.audio_embeddings, timestamp),
        force_reason=True,
    )


def answer_query_streaming(processed: ProcessedVideo, query: str,
                           timestamp: Optional[float] = None):
    """Streaming QA through the reasoning core."""
    loop = processed.loop
    projected = loop.project_embeddings(
        siglip_embeddings=_window(processed.siglip_embeddings, timestamp),
        videomae_embeddings=_window(processed.videomae_embeddings, timestamp),
        audio_embeddings=_window(processed.audio_embeddings, timestamp),
    )
    yield from loop.reasoning_core.reason_streaming(
        query,
        timeline_indexer=loop.timeline_indexer,
        knowledge_base=loop.knowledge_base,
        video_timestamp=timestamp,
        inputs_embeds_prefix=loop.build_embedding_prefix(projected),
    )


HELP = """Commands:
  /clear            reset conversation
  /history          show conversation summary
  /save <path>      save conversation
  /load <path>      load conversation
  /game <name>      set the current game
  /search <query>   web search (general)
  /wiki /boss /lore <query>   category searches
  /status           loop status
  /quit             exit"""


def interactive_mode(processed: ProcessedVideo) -> None:
    searcher = GameKnowledgeSearcher()
    detector = GameDetector()
    ctx = detector.detect_from_timeline(processed.timeline)
    if ctx:
        searcher.game_context = ctx
        print(f"Detected game: {ctx.game_name} ({ctx.game_genre})")
    core = processed.loop.reasoning_core
    core._knowledge_searcher = searcher
    core.tool_parser._knowledge_searcher = searcher

    print("\nInteractive mode — ask about the video ('/help' for commands)")
    while True:
        try:
            line = input("\n> ").strip()
        except (EOFError, KeyboardInterrupt):
            break
        if not line:
            continue
        if line.startswith("/"):
            cmd, _, arg = line.partition(" ")
            if cmd == "/quit":
                break
            elif cmd == "/help":
                print(HELP)
            elif cmd == "/clear":
                core.clear_conversation()
                print("conversation cleared")
            elif cmd == "/history":
                print(core.get_conversation_summary())
            elif cmd == "/save":
                core.save_conversation(arg or "conversation.json")
            elif cmd == "/load":
                core.load_conversation(arg or "conversation.json")
            elif cmd == "/game":
                searcher.set_game_context(arg)
                print(f"game set: {arg}")
            elif cmd == "/status":
                print(processed.loop.get_status())
            elif cmd in ("/search", "/wiki", "/boss", "/lore"):
                category = cmd[1:] if cmd != "/search" else "general"
                print(searcher.execute_tool_call(arg, category))
            else:
                print(f"unknown command {cmd} — /help")
            continue
        ts = processed.loop.reasoning_core.retriever.parse_timestamp(line)
        t0 = time.perf_counter()
        for piece in answer_query_streaming(processed, line, ts):
            print(piece, end="", flush=True)
        print(f"\n[{time.perf_counter() - t0:.1f}s]")


def main(argv: Optional[list[str]] = None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--video", required=True,
                        help="path, .y4m, or synthetic://scene?duration=..")
    parser.add_argument("--preset", default="light",
                        choices=["light", "standard", "full"])
    parser.add_argument("--fps", type=float, default=None)
    parser.add_argument("--use-sam", action="store_true", default=None)
    parser.add_argument("--no-sam", dest="use_sam", action="store_false")
    parser.add_argument("--no-cache", action="store_true")
    parser.add_argument("--batched", action="store_true",
                        help="throughput-oriented batched perception "
                             "(chunked device programs; best for offline)")
    parser.add_argument("--pipelined", action="store_true",
                        help="stage-parallel perception (segment/semantic/"
                             "OCR workers with bounded queues)")
    parser.add_argument("--query", default=None,
                        help="one-shot question (skips interactive mode)")
    parser.add_argument("--concepts", nargs="*", default=DEFAULT_CONCEPTS)
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO,
                        format="%(levelname)s %(name)s: %(message)s")
    config = load_preset(args.preset)
    if args.fps is not None:
        config.inference.fps = args.fps
    if args.use_sam is not None:
        config.perception.use_sam = args.use_sam

    processed = process_video(
        args.video, config, use_cache=not args.no_cache,
        concepts=args.concepts, pipelined=args.pipelined,
        batched=args.batched,
    )
    stats = processed.timeline.get_statistics()
    print(f"\nTimeline: {stats['total_events']} events, "
          f"{stats['unique_entities']} entities, "
          f"{stats['duration']:.0f}s span")

    if args.query:
        ts = processed.loop.reasoning_core.retriever.parse_timestamp(args.query)
        print()
        for piece in answer_query_streaming(processed, args.query, ts):
            print(piece, end="", flush=True)
        print()
        return 0

    interactive_mode(processed)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
