"""Throughput-oriented batched perception.

The reference loops Python per frame per encoder
(`/root/reference/scripts/realtime_inference.py:165-522` — one SAM3
forward PER (frame × concept), one SigLIP forward per region).  On TPU
the equivalent sin is one small device dispatch per frame: dispatch
latency (tens of µs direct-attached, ~30 ms over a remote tunnel) swamps
the compute.  This module processes a clip in CHUNKS with a fixed, small
number of dispatches per chunk:

- segmentation: ONE [frames × concepts] program per chunk
  (:meth:`SAMConceptSegmenter.segment_batch`),
- region semantics: all regions of the chunk flattened into shared
  bucket-padded SigLIP batches
  (:meth:`SigLIPSemanticEncoder.encode_regions_multi`),
- OCR: ONE stacked detector call + shared recognizer buckets
  (:meth:`OCRPipeline.extract_batch`),

then feeds the timeline / knowledge base exactly like the sequential
path.  Use the stage-parallel :mod:`gvl_tpu.parallel.pipeline` when
latency-to-first-frame matters; use this when throughput does.
"""

from __future__ import annotations

import logging
from typing import Optional, Sequence

import numpy as np

logger = logging.getLogger(__name__)

DEFAULT_CONCEPTS = ["player", "enemy", "boss", "item"]


def _resolve_checkpoint(path) -> Optional[str]:
    """Checkpoint path as given, else relative to the repo root (presets
    use repo-relative defaults like ``outputs/sam_params.npz`` that must
    resolve from any CWD)."""
    from gvl_tpu.utils.checkpoints import resolve_repo_path

    return resolve_repo_path(path)


def run_batched_perception(
    frames: Sequence[tuple[float, np.ndarray]],
    config,
    timeline,
    kb,
    concepts: Sequence[str] = DEFAULT_CONCEPTS,
    chunk: int = 32,
    segmenter=None,
    encoder=None,
    ocr=None,
) -> list[tuple[float, np.ndarray]]:
    """Full visual perception over ``frames`` → per-timestamp SigLIP
    embeddings; timeline/KB are fed in place.

    ``frames`` is ``[(timestamp, HxWx3 uint8)]``.  ``config`` is a
    :class:`~gvl_tpu.config.presets.SystemConfig`.  Pass pre-built
    ``segmenter`` / ``encoder`` / ``ocr`` to reuse compiled programs
    across clips (otherwise they are constructed from the config).

    Segmentation is software-pipelined one chunk ahead: chunk ``i+1``'s
    frames×concepts program is dispatched (async) before chunk ``i``'s
    host work (mask NMS, tracking, region prep, timeline/KB ingest)
    runs, so the device computes while the host consumes — JAX's async
    dispatch makes the overlap free.  Larger ``chunk`` amortizes
    dispatch + readback latency (measured on the tunnel-attached v5e:
    23.5 fps at chunk=8 → 27.5 at chunk=48, before the overlap).
    """
    from gvl_tpu.fusion import EventPriority, ModalityType

    if segmenter is None or encoder is None or ocr is None:
        built = build_perception_stack(config)
        segmenter = segmenter or built[0]
        encoder = encoder or built[1]
        ocr = ocr or built[2]

    p = config.perception
    sam_step = max(1, int(round(
        config.inference.fps / max(p.sam3_fps, 1e-6))))

    # precompute chunk groups so segmentation can run one chunk ahead
    groups = []
    for start in range(0, len(frames), chunk):
        group = frames[start:start + chunk]
        indices = list(range(start, start + len(group)))
        groups.append({
            "indices": indices,
            "stamps": [ts for ts, _ in group],
            "images": [f for _, f in group],
            "sampled": [(pos, idx) for pos, idx in enumerate(indices)
                        if idx % sam_step == 0] if p.use_sam else [],
        })

    backend = getattr(segmenter, "backend", None)
    can_pipeline = (p.use_sam and backend is not None
                    and hasattr(backend, "submit"))

    def submit_seg(g):
        if can_pipeline and g["sampled"]:
            g["seg_handle"] = backend.submit(
                [g["images"][pos] for pos, _ in g["sampled"]],
                list(concepts))

    if groups:
        submit_seg(groups[0])

    out: list[tuple[float, np.ndarray]] = []
    for gi, g in enumerate(groups):
        if gi + 1 < len(groups):
            submit_seg(groups[gi + 1])    # device works ahead
        indices, stamps, images = g["indices"], g["stamps"], g["images"]
        sampled = g["sampled"]

        # ---- segmentation + tracking: one frames×concepts program
        per_frame_entities: list[list] = [[] for _ in indices]
        if p.use_sam and sampled:
            sample_frames = [images[pos] for pos, _ in sampled]
            sample_indices = [idx for _, idx in sampled]
            if "seg_handle" in g:
                raw = backend.collect(g["seg_handle"], sample_frames,
                                      sample_indices, list(concepts))
                batch_entities = segmenter.ingest_raw(
                    raw, sample_indices, list(concepts))
            else:
                batch_entities = segmenter.segment_batch(
                    sample_frames, sample_indices, list(concepts))
            for (pos, idx), entities in zip(sampled, batch_entities):
                per_frame_entities[pos] = entities
                timeline.add_from_sam_entities(
                    entities, idx, stamps[pos])
                kb.update_from_tracking(entities, idx, stamps[pos])

        # ---- region semantics: every region of the chunk, one batch set
        if p.use_siglip:
            frame_masks = []
            for pos, idx in enumerate(indices):
                masks = []
                for entity in per_frame_entities[pos]:
                    m = entity.get_mask_at_frame(idx)
                    if m is not None:
                        masks.append((entity.entity_id, m.mask))
                frame_masks.append((images[pos], masks))
            region_embs = encoder.encode_regions_multi(frame_masks)
            # whole-frame fallback for frames with no regions, batched too
            bare = [pos for pos, embs in enumerate(region_embs)
                    if not embs]
            bare_embs = encoder.encode_images_batch(
                [images[pos] for pos in bare])
            for pos, embs in enumerate(region_embs):
                for emb in embs:
                    out.append((stamps[pos], emb.embedding))
            for j, pos in enumerate(bare):
                out.append((stamps[pos], bare_embs[j]))

        # ---- OCR: one detector dispatch + shared recognizer buckets
        if p.use_ocr:
            for result in ocr.extract_batch(images, indices, stamps):
                for det in result.detections:
                    if det.confidence < 0.7 or len(det.text) < 3:
                        continue
                    important = det.category in ("damage", "health")
                    timeline.add_event(
                        result.timestamp, ModalityType.OCR, det.text,
                        priority=(EventPriority.MEDIUM if important
                                  else EventPriority.LOW),
                        confidence=det.confidence,
                        metadata={"category": det.category,
                                  "bbox": det.bbox},
                    )
    out.sort(key=lambda pair: pair[0])
    return out


def build_segmenter(config, mesh=None):
    """Segmenter from the preset ladder: trained JAX model when the
    checkpoint exists ("auto"), forced JAX ("jax", random-init without a
    checkpoint), or the deterministic fake ("fake").  ``mesh`` enables
    data-parallel segmentation over its ``data`` axis."""
    from gvl_tpu.perception import (
        SAMConceptSegmenter,
        SAMConfig,
        create_sam_segmenter,
    )

    p = config.perception
    backend = getattr(p, "sam_backend", "auto")
    if backend == "open_vocab":
        sam_dir = _resolve_checkpoint(getattr(p, "sam_vit_dir", None))
        siglip_dir = _resolve_checkpoint(
            getattr(p, "siglip_checkpoint", None))
        seg_ckpt = _resolve_checkpoint(getattr(p, "sam_checkpoint", None))
        from gvl_tpu.training.siglip_train import is_minisiglip_checkpoint

        if siglip_dir and is_minisiglip_checkpoint(siglip_dir) and seg_ckpt:
            # fully offline rung: trained segmenter proposals scored in
            # the self-trained mini-SigLIP image-text space
            from gvl_tpu.perception.open_vocab import (
                create_trained_open_vocab_segmenter,
            )

            return create_trained_open_vocab_segmenter(seg_ckpt, siglip_dir)
        if sam_dir and siglip_dir:
            from gvl_tpu.perception.open_vocab import (
                create_open_vocab_segmenter,
            )

            return create_open_vocab_segmenter(sam_dir, siglip_dir)
        logger.warning(
            "sam_backend='open_vocab' needs sam_vit_dir + siglip_checkpoint"
            " HF directories (or sam_checkpoint + a trained mini-SigLIP"
            " dir); falling back to 'auto'")
        backend = "auto"
    ckpt = _resolve_checkpoint(getattr(p, "sam_checkpoint", None))
    if backend == "jax" or (backend == "auto" and ckpt):
        return create_sam_segmenter(
            SAMConfig(), use_model=True, checkpoint=ckpt, mesh=mesh)
    return SAMConceptSegmenter(SAMConfig())


def build_siglip_encoder(config, mesh=None):
    """Semantic encoder from the preset ladder (checkpoint = HF dir)."""
    from gvl_tpu.perception import SigLIPSemanticEncoder

    p = config.perception
    backend = getattr(p, "siglip_backend", "auto")
    if backend == "fake":     # explicit fake always wins (CPU CI, smoke)
        return SigLIPSemanticEncoder()
    nf = None
    if getattr(p, "siglip_int8", False):
        from gvl_tpu.perception.semantic import NaFlexConfig

        nf = NaFlexConfig(quant_int8=True)

    def _fused(cfg):
        # the fused W8A8 serving tower applies to the big (so400m/HF)
        # towers; the trained mini tower is already cheap and keeps its
        # exact bf16 numerics.  An EXPLICIT siglip_int8 request picks
        # the XLA int8 path over the fused default.
        if getattr(p, "siglip_fused", False) and not (
                cfg is not None and cfg.quant_int8):
            from gvl_tpu.perception.semantic import NaFlexConfig

            cfg = cfg or NaFlexConfig()
            cfg.quant_fused = True
        return cfg

    ckpt = _resolve_checkpoint(getattr(p, "siglip_checkpoint", None))
    if ckpt:
        from gvl_tpu.training.siglip_train import is_minisiglip_checkpoint

        if is_minisiglip_checkpoint(ckpt):
            return SigLIPSemanticEncoder.from_trained_checkpoint(
                ckpt, config=nf, mesh=mesh)
        return SigLIPSemanticEncoder.from_hf_checkpoint(
            ckpt, config=_fused(nf), mesh=mesh)
    if backend == "jax":
        return SigLIPSemanticEncoder.with_random_tower(config=_fused(nf),
                                                       mesh=mesh)
    return SigLIPSemanticEncoder()


def build_perception_stack(config, mesh=None):
    """(segmenter, encoder, ocr) honoring the preset's backend ladders.

    ``mesh`` data-parallelizes the segmenter and tower over its ``data``
    axis — the fleet-scaling route for the 300 fps/chip perception
    target on a v5e-8 (frames shard, each chip runs the full program)."""
    from gvl_tpu.perception import create_ocr_pipeline

    return (build_segmenter(config, mesh=mesh),
            build_siglip_encoder(config, mesh=mesh),
            create_ocr_pipeline(config.perception.ocr_backend))
