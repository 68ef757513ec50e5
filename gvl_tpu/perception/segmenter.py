"""Open-vocabulary concept segmentation + persistent entity tracking.

Host-side tracking state machine over per-frame detections from a
pluggable segmentation backend:

- :class:`JaxSegmenterBackend` — the batched Flax promptable segmenter
  (all frames × concepts in one program);
- :class:`DeterministicFakeSegmenter` — hash-seeded drifting boxes, so the
  full tracking pipeline (IoU matching, lifecycle states, timeline/KB
  ingestion) runs identically without weights.

Entity lifecycle ACTIVE → OCCLUDED → LOST → TERMINATED with the
reference's thresholds (`sam_concept_segmenter.py:164-187,770-790`).
NOTE: the reference's elif ordering makes LOST→TERMINATED unreachable;
fixed here (see COMPAT.md).
"""

from __future__ import annotations

import hashlib
import logging
from dataclasses import dataclass, field
from enum import Enum
from typing import Callable, Optional

import numpy as np

logger = logging.getLogger(__name__)


class EntityState(Enum):
    ACTIVE = "active"
    OCCLUDED = "occluded"
    LOST = "lost"
    TERMINATED = "terminated"


@dataclass
class BoundingBox:
    x_min: float
    y_min: float
    x_max: float
    y_max: float

    @property
    def center(self) -> tuple[float, float]:
        return ((self.x_min + self.x_max) / 2, (self.y_min + self.y_max) / 2)

    @property
    def area(self) -> float:
        return (self.x_max - self.x_min) * (self.y_max - self.y_min)

    @property
    def width(self) -> float:
        return self.x_max - self.x_min

    @property
    def height(self) -> float:
        return self.y_max - self.y_min

    def to_xyxy(self) -> tuple[float, float, float, float]:
        return (self.x_min, self.y_min, self.x_max, self.y_max)


@dataclass
class SegmentationMask:
    mask: np.ndarray          # bool [H, W]
    confidence: float
    bbox: BoundingBox
    area_pixels: int

    @classmethod
    def from_logits(cls, logits: np.ndarray, threshold: float = 0.0):
        """Binarize logits; confidence = mean sigmoid."""
        mask = np.asarray(logits) > threshold
        ys, xs = np.where(mask)
        bbox = (
            BoundingBox(float(xs.min()), float(ys.min()),
                        float(xs.max()), float(ys.max()))
            if len(xs) else BoundingBox(0, 0, 0, 0)
        )
        confidence = float(1.0 / (1.0 + np.exp(-np.asarray(logits))).mean())
        return cls(mask=mask, confidence=confidence, bbox=bbox,
                   area_pixels=int(mask.sum()))

    @classmethod
    def from_bbox(cls, bbox_xyxy, shape: tuple[int, int], confidence: float):
        """Rectangular mask from an xyxy box (fake/detector backends)."""
        x1, y1, x2, y2 = (int(round(v)) for v in bbox_xyxy)
        h, w = shape
        x1, x2 = max(0, x1), min(w, x2)
        y1, y2 = max(0, y1), min(h, y2)
        mask = np.zeros((h, w), bool)
        mask[y1:y2, x1:x2] = True
        return cls(mask=mask, confidence=confidence,
                   bbox=BoundingBox(float(x1), float(y1), float(x2), float(y2)),
                   area_pixels=int(mask.sum()))


@dataclass
class TrackedEntity:
    entity_id: str
    concept_label: str
    first_seen_frame: int
    last_seen_frame: int
    state: EntityState = EntityState.ACTIVE
    confidence: float = 0.0
    frame_masks: dict[int, SegmentationMask] = field(default_factory=dict)
    state_history: list[tuple[int, EntityState]] = field(default_factory=list)
    attributes: dict = field(default_factory=dict)

    def update(self, frame_idx: int, mask: SegmentationMask,
               state: Optional[EntityState] = None) -> None:
        self.frame_masks[frame_idx] = mask
        self.last_seen_frame = frame_idx
        self.confidence = mask.confidence
        if state and state is not self.state:
            self.state = state
            self.state_history.append((frame_idx, state))

    def get_trajectory(self) -> list[tuple[int, tuple[float, float]]]:
        return [(f, m.bbox.center) for f, m in sorted(self.frame_masks.items())]

    def get_mask_at_frame(self, frame_idx: int) -> Optional[SegmentationMask]:
        return self.frame_masks.get(frame_idx)

    @property
    def duration_frames(self) -> int:
        return self.last_seen_frame - self.first_seen_frame + 1


@dataclass
class SAMConfig:
    """Thresholds and tracking patience (reference defaults)."""

    model_name: str = "gvl/sam3-tpu"
    dtype: str = "bfloat16"       # compute dtype; master weights stay fp32
    mask_threshold: float = 0.0
    min_mask_area: int = 100
    nms_threshold: float = 0.7
    detection_threshold: float = 0.3
    track_memory_frames: int = 30
    occlusion_patience: int = 10
    lost_patience: int = 30
    match_iou_threshold: float = 0.3
    image_size: int = 256


def mask_iou(a: np.ndarray, b: np.ndarray) -> float:
    if a.shape != b.shape:
        return 0.0
    union = np.logical_or(a, b).sum()
    if union == 0:
        return 0.0
    return float(np.logical_and(a, b).sum() / union)


class DeterministicFakeSegmenter:
    """Hash-seeded detector: one drifting box per concept.

    The box's base position derives from the concept hash; it drifts
    smoothly with frame index, so cross-frame IoU stays high and the
    tracker exercises real matching.
    """

    def __init__(self, config: SAMConfig):
        self.config = config

    def __call__(
        self, frames: np.ndarray, concepts: list[str], frame_indices: list[int]
    ) -> list[list[list[dict]]]:
        out = []
        for frame, frame_idx in zip(frames, frame_indices):
            h, w = frame.shape[:2]
            per_frame = []
            for concept in concepts:
                digest = hashlib.blake2b(concept.encode(), digest_size=8).digest()
                rng = np.random.default_rng(int.from_bytes(digest, "little"))
                cx = float(rng.uniform(0.25, 0.75)) * w + 3.0 * frame_idx
                cy = float(rng.uniform(0.25, 0.75)) * h
                size = float(rng.uniform(0.12, 0.25)) * min(h, w)
                cx = min(max(cx, size), w - size)
                bbox = (cx - size, cy - size, cx + size, cy + size)
                mask = SegmentationMask.from_bbox(bbox, (h, w), confidence=0.9)
                per_frame.append([{"mask": mask}])
            out.append(per_frame)
        return out


class JaxSegmenterBackend:
    """Batched Flax segmenter: frames × concepts in one jitted program."""

    def __init__(self, config: SAMConfig, model=None, variables=None,
                 rng=None, mesh=None):
        """``mesh``: optional :class:`jax.sharding.Mesh` with a ``data``
        axis — frames shard over it (data-parallel segmentation; XLA
        keeps the whole frames×concepts program per shard)."""
        import jax
        import jax.numpy as jnp

        from gvl_tpu.models.sam import (
            PromptableSegmenter, SamConfig, hash_tokenize,
        )

        self.config = config
        self.model_config = SamConfig(image_size=config.image_size)
        self.model = model or PromptableSegmenter(self.model_config)
        if variables is None:
            rng = rng if rng is not None else jax.random.PRNGKey(0)
            variables = self.model.init(
                rng,
                jnp.zeros((1, config.image_size, config.image_size, 3)),
                jnp.zeros((1, 16), jnp.int32),
            )
        self.variables = variables
        self._hash_tokenize = hash_tokenize
        self.mesh = mesh
        self._data_size = 1

        threshold = float(config.mask_threshold)

        def run(v, px, tok):
            # uint8 in, normalize on device: 1 byte/pixel over the host
            # link instead of 4
            out = self.model.apply(v, px.astype(jnp.float32) / 255.0, tok)
            # threshold on device: bool masks read back at 1 byte/cell
            # instead of 4 (the logits are never needed on host)
            return {"mask": out["mask_logits"] > threshold,
                    "scores": out["scores"]}

        if mesh is None:
            self._run = jax.jit(run)
        else:
            from jax.sharding import NamedSharding, PartitionSpec as P

            self._data_size = mesh.shape["data"]
            self._frame_sharding = NamedSharding(mesh, P("data"))
            replicated = NamedSharding(mesh, P())
            self.variables = jax.device_put(self.variables, replicated)
            self._run = jax.jit(run, in_shardings=(
                replicated, self._frame_sharding, replicated))

    def submit(self, frames, concepts):
        """Host resize + upload + ASYNC device dispatch.

        Returns an opaque handle for :meth:`collect` — the caller can
        overlap host work (tracking, region prep) of the previous chunk
        with this chunk's device compute.
        """
        import jax.numpy as jnp

        from gvl_tpu.runtime.native import resize_image

        size = self.config.image_size
        # resize per frame BEFORE stacking: the stack then copies
        # size²-sized arrays, not full frames (measured host hot spot)
        resized = np.stack([
            resize_image(np.ascontiguousarray(f), size, size)
            for f in frames])
        n_real = len(frames)
        pad = (-n_real) % self._data_size
        if pad:   # frame batch must divide the data axis
            resized = np.concatenate(
                [resized, np.zeros_like(resized[:1]).repeat(pad, 0)])
        tokens = np.stack([
            self._hash_tokenize(c, self.model_config.text_vocab)
            for c in concepts
        ])
        px = jnp.asarray(resized)
        if self.mesh is not None:
            import jax

            px = jax.device_put(px, self._frame_sharding)
        return self._run(self.variables, px, jnp.asarray(tokens)), n_real

    def collect(self, handle, frames, frame_indices, concepts):
        """Block on the device result and run host-side NMS."""
        out, n_real = handle
        small_masks = np.asarray(out["mask"], bool)[:n_real]
        scores = np.asarray(out["scores"], np.float32)[:n_real]

        results = []
        for fi, (frame, frame_idx) in enumerate(zip(frames, frame_indices)):
            h, w = frame.shape[:2]
            per_frame = []
            for ci in range(len(concepts)):
                # score-ordered mask NMS at the decode resolution: several
                # queries typically fire on the same instance
                order = np.argsort(-scores[fi, ci])
                kept_small: list[np.ndarray] = []
                dets = []
                for qi in order:
                    if scores[fi, ci, qi] < self.config.detection_threshold:
                        continue
                    small = small_masks[fi, ci, qi]
                    area = small.sum()
                    if not area:
                        continue
                    dup = any(
                        (small & k).sum() / max((small | k).sum(), 1)
                        > self.config.nms_threshold
                        for k in kept_small
                    )
                    if dup:
                        continue
                    kept_small.append(small)
                    from gvl_tpu.runtime.native import resize_mask

                    mask = resize_mask(small, h, w)
                    ys, xs = np.where(mask)
                    bbox = (
                        BoundingBox(float(xs.min()), float(ys.min()),
                                    float(xs.max()), float(ys.max()))
                        if len(xs) else BoundingBox(0, 0, 0, 0)
                    )
                    dets.append({"mask": SegmentationMask(
                        mask=mask, confidence=float(scores[fi, ci, qi]),
                        bbox=bbox, area_pixels=int(mask.sum()),
                    )})
                per_frame.append(dets)
            results.append(per_frame)
        return results

    def __call__(self, frames, concepts, frame_indices):
        return self.collect(self.submit(frames, concepts),
                            frames, frame_indices, concepts)


class SAMConceptSegmenter:
    """Text-prompted segmentation with persistent entity tracking.

    >>> segmenter = SAMConceptSegmenter()
    >>> for idx, frame in enumerate(frames):
    ...     entities = segmenter.segment_with_prompts(frame, idx, ["boss"])
    """

    def __init__(
        self,
        config: Optional[SAMConfig] = None,
        backend: Optional[Callable] = None,
    ):
        self.config = config or SAMConfig()
        self.backend = backend or DeterministicFakeSegmenter(self.config)
        self._tracked_entities: dict[str, TrackedEntity] = {}
        self._entity_counter: dict[str, int] = {}
        self._current_frame = 0

    # ------------------------------------------------------------ tracking

    def _generate_entity_id(self, concept_label: str) -> str:
        normalized = concept_label.lower().replace(" ", "_")
        count = self._entity_counter.get(normalized, 0)
        self._entity_counter[normalized] = count + 1
        return f"{normalized}_{count:03d}"

    def _match_detection_to_entity(
        self, mask: SegmentationMask, concept_label: str, frame_idx: int
    ) -> Optional[TrackedEntity]:
        """Best same-concept entity by mask IoU within the memory window.

        Exact bbox pre-gate: a mask lives inside its bbox, so disjoint
        bboxes imply mask IoU 0 — the full-resolution pixel IoU (the
        measured host hot spot at 48-frame chunks) only runs for
        candidates whose boxes actually overlap."""
        best, best_iou = None, 0.0
        box = mask.bbox
        for entity in self._tracked_entities.values():
            if entity.concept_label != concept_label:
                continue
            if entity.state is EntityState.TERMINATED:
                continue
            if frame_idx - entity.last_seen_frame > self.config.track_memory_frames:
                continue
            last_mask = entity.get_mask_at_frame(entity.last_seen_frame)
            if last_mask is None:
                continue
            other = last_mask.bbox
            if (box.x_max <= other.x_min or other.x_max <= box.x_min
                    or box.y_max <= other.y_min or other.y_max <= box.y_min):
                continue   # disjoint boxes → mask IoU is exactly 0
            iou = mask_iou(mask.mask, last_mask.mask)
            if iou > best_iou and iou > self.config.match_iou_threshold:
                best, best_iou = entity, iou
        return best

    def _update_entity_states(self, frame_idx: int) -> None:
        """Age out unseen entities.  (Reference bug fixed: terminate is
        checked before the lost transition so it is actually reachable.)"""
        for entity in self._tracked_entities.values():
            if entity.state is EntityState.TERMINATED:
                continue
            gap = frame_idx - entity.last_seen_frame
            if gap > self.config.lost_patience:
                if entity.state is EntityState.LOST:
                    entity.state = EntityState.TERMINATED
                    entity.state_history.append(
                        (frame_idx, EntityState.TERMINATED))
            elif gap > self.config.occlusion_patience:
                if entity.state is EntityState.OCCLUDED:
                    entity.state = EntityState.LOST
                    entity.state_history.append((frame_idx, EntityState.LOST))
            elif gap > 0 and entity.state is EntityState.ACTIVE:
                entity.state = EntityState.OCCLUDED
                entity.state_history.append((frame_idx, EntityState.OCCLUDED))

    # ------------------------------------------------------------- segment

    def segment_with_prompts(
        self,
        frame: np.ndarray,
        frame_idx: int,
        concept_prompts: list[str],
    ) -> list[TrackedEntity]:
        """Segment one frame (see :meth:`segment_batch` for the fast path)."""
        return self.segment_batch([frame], [frame_idx], concept_prompts)[0]

    def segment_batch(
        self,
        frames: list[np.ndarray],
        frame_indices: list[int],
        concept_prompts: list[str],
    ) -> list[list[TrackedEntity]]:
        """Batched path: ONE backend call for all frames × concepts, then
        sequential tracking over frames."""
        raw = self.backend(np.stack(frames), concept_prompts, frame_indices)
        return self.ingest_raw(raw, frame_indices, concept_prompts)

    def ingest_raw(
        self,
        raw: list,                       # [frame][concept][det] dicts
        frame_indices: list[int],
        concept_prompts: list[str],
    ) -> list[list[TrackedEntity]]:
        """Tracking over pre-computed backend detections (the host half
        of :meth:`segment_batch`; lets callers pipeline the device half
        via ``backend.submit``/``backend.collect``)."""
        all_results = []
        for frame_pos, frame_idx in enumerate(frame_indices):
            self._current_frame = frame_idx
            detected: list[TrackedEntity] = []
            for concept_pos, concept in enumerate(concept_prompts):
                for det in raw[frame_pos][concept_pos]:
                    seg_mask: SegmentationMask = det["mask"]
                    if seg_mask.area_pixels < self.config.min_mask_area:
                        continue
                    matched = self._match_detection_to_entity(
                        seg_mask, concept, frame_idx
                    )
                    if matched is not None:
                        matched.update(frame_idx, seg_mask, EntityState.ACTIVE)
                        detected.append(matched)
                    else:
                        entity_id = self._generate_entity_id(concept)
                        entity = TrackedEntity(
                            entity_id=entity_id,
                            concept_label=concept,
                            first_seen_frame=frame_idx,
                            last_seen_frame=frame_idx,
                            confidence=seg_mask.confidence,
                        )
                        entity.frame_masks[frame_idx] = seg_mask
                        entity.state_history.append(
                            (frame_idx, EntityState.ACTIVE))
                        self._tracked_entities[entity_id] = entity
                        detected.append(entity)
            self._update_entity_states(frame_idx)
            all_results.append(detected)
        return all_results

    # --------------------------------------------------------------- query

    def get_entity(self, entity_id: str) -> Optional[TrackedEntity]:
        return self._tracked_entities.get(entity_id)

    def get_active_entities(self) -> list[TrackedEntity]:
        return [e for e in self._tracked_entities.values()
                if e.state is EntityState.ACTIVE]

    def get_all_entities(self) -> list[TrackedEntity]:
        return list(self._tracked_entities.values())

    def get_statistics(self) -> dict:
        by_state: dict[str, int] = {}
        for entity in self._tracked_entities.values():
            by_state[entity.state.value] = by_state.get(entity.state.value, 0) + 1
        return {
            "total_entities": len(self._tracked_entities),
            "entities_by_state": by_state,
            "current_frame": self._current_frame,
        }

    def reset(self) -> None:
        self._tracked_entities.clear()
        self._entity_counter.clear()
        self._current_frame = 0


def create_sam_segmenter(
    config: Optional[SAMConfig] = None,
    use_model: bool = False,
    checkpoint: Optional[str] = None,
    mesh=None,
) -> SAMConceptSegmenter:
    """Factory: JAX model backend when requested, deterministic fake else.

    ``checkpoint`` loads trained :class:`~gvl_tpu.models.sam.
    PromptableSegmenter` params from an ``.npz`` (flat ``/``-joined keys,
    the same layout :mod:`gvl_tpu.perception.ocr_model` uses).
    ``mesh`` enables data-parallel segmentation over its ``data`` axis.
    """
    config = config or SAMConfig()
    backend = None
    if use_model or checkpoint:
        variables = None
        if checkpoint:
            # stale/corrupt/mismatched artifacts must not take down every
            # default-preset perception run — validate against the model
            # geometry and fall back to random init on any problem
            try:
                import jax
                import jax.numpy as jnp

                from gvl_tpu.models.sam import (
                    PromptableSegmenter,
                    SamConfig,
                    load_segmenter_npz,
                )

                loaded = load_segmenter_npz(checkpoint)
                model = PromptableSegmenter(
                    SamConfig(image_size=config.image_size))
                expected = jax.eval_shape(
                    lambda: model.init(
                        jax.random.PRNGKey(0),
                        jnp.zeros((1, config.image_size,
                                   config.image_size, 3)),
                        jnp.zeros((1, 16), jnp.int32)))
                mismatch = jax.tree_util.tree_all(jax.tree.map(
                    lambda a, b: tuple(a.shape) == tuple(b.shape),
                    expected, loaded))
                if not bool(mismatch):
                    raise ValueError("checkpoint geometry mismatch")
                variables = loaded
            except Exception as exc:
                logger.warning(
                    "segmenter checkpoint %s unusable (%s); random init",
                    checkpoint, exc)
        backend = JaxSegmenterBackend(config, variables=variables, mesh=mesh)
    return SAMConceptSegmenter(config, backend=backend)
