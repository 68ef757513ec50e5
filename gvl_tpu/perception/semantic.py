"""Region semantic encoding: segmentation masks → 1152-dim embeddings.

The host side extracts mask regions (bbox expanded 10%), resizes them
aspect-preserved onto a fixed canvas, and the JAX SigLIP tower encodes the
whole batch in one XLA program.  TPU-first deltas from the reference
(`/root/reference/src/perception/siglip_semantic_encoder.py`):

- regions land on ONE static canvas (base_resolution²) instead of
  per-batch max padding, so the encoder compiles exactly once;
- batch sizes snap to fixed buckets;
- the encoder backend is pluggable: the JAX tower when weights are
  available, otherwise a deterministic hash-seeded fake with identical
  shapes (the formalized placeholder pattern, SURVEY §4).
"""

from __future__ import annotations

import hashlib
import logging
from dataclasses import dataclass, field
from typing import Callable, Optional, Sequence

import numpy as np

logger = logging.getLogger(__name__)

PATCH = 14


@dataclass
class NaFlexConfig:
    """Aspect-preserving ("NaFlex") resize and encoder settings."""

    model_name: str = "google/siglip2-so400m-patch14-384"
    dtype: str = "bfloat16"
    base_resolution: int = 384
    # regions are small crops (HUD-scale objects, typically 30-100 px):
    # encoding them on a 128 canvas costs (9/27)² ≈ 11% of the 384-canvas
    # FLOPs.  Measured effects: perception e2e 27.5 → 33.6 fps on one
    # v5e (48-frame chunks), top-1 neighbor agreement vs 224-canvas
    # embeddings reported in ROADMAP ("Perception e2e round 3")
    region_resolution: int = 128
    min_resolution: int = 128
    max_resolution: int = 768
    preserve_aspect_ratio: bool = True
    embedding_dim: int = 1152
    use_cls_token: bool = True
    pool_strategy: str = "mean"  # 'cls' (MAP-pooled), 'mean', 'max'
    batch_size: int = 16
    # image normalization (SigLIP processors use 0.5/0.5)
    image_mean: tuple[float, float, float] = (0.5, 0.5, 0.5)
    image_std: tuple[float, float, float] = (0.5, 0.5, 0.5)
    # W8A8 encoder blocks on the int8 MXU (~1.5-2x tower throughput on
    # v5e; pooled-embedding cosine vs bf16 ≈ 0.9999 on random weights,
    # accuracy delta measured on the trained mini-SigLIP in tests)
    quant_int8: bool = False
    # Pallas-fused W8A8 serving path (gvl_tpu.models.siglip_fused):
    # so400m tower 197 → ~240 img/s on v5e at unchanged pooled cosine
    # (calibrated static activation scales baked at build time)
    quant_fused: bool = False


def _maybe_quantize_tower(tower, params: dict, config: "NaFlexConfig"):
    """Rebuild (tower, params) on the W8A8 path when config asks.

    ``quant_fused`` is handled separately (:func:`build_vision_backend`
    constructs a :class:`FusedSigLIPBackend`); this hook covers the
    XLA-composed ``quant_int8`` path only."""
    if not config.quant_int8 or config.quant_fused:
        return tower, params
    from dataclasses import replace

    from gvl_tpu.models.siglip import (
        SigLIPVisionTower,
        quantize_siglip_int8,
    )

    qcfg = replace(tower.config, quant_int8=True)
    return SigLIPVisionTower(qcfg), {
        "params": quantize_siglip_int8(params["params"])}


class AspectPreservingResizer:
    """Computes patch-aligned target sizes preserving aspect ratio."""

    def __init__(self, config: NaFlexConfig):
        self.config = config

    def compute_optimal_size(self, original_h: int, original_w: int) -> tuple[int, int]:
        """(target_h, target_w): aspect preserved, bounded, multiple of 14."""
        cfg = self.config
        aspect = original_w / original_h
        base = cfg.base_resolution
        if aspect >= 1:
            target_w = min(cfg.max_resolution, max(cfg.min_resolution, base))
            target_h = max(cfg.min_resolution, int(target_w / aspect))
        else:
            target_h = min(cfg.max_resolution, max(cfg.min_resolution, base))
            target_w = max(cfg.min_resolution, int(target_h * aspect))
        target_h = (target_h // PATCH) * PATCH
        target_w = (target_w // PATCH) * PATCH
        return max(PATCH, target_h), max(PATCH, target_w)

    def resize_with_aspect_ratio(self, image) -> tuple[np.ndarray, float]:
        """Reference-named API: resize to the aspect-preserving optimal
        size (multiples of 14, bounded), without canvas padding."""
        from PIL import Image

        arr = np.asarray(image)
        target_h, target_w = self.compute_optimal_size(*arr.shape[:2])
        resized = np.asarray(
            Image.fromarray(arr).resize((target_w, target_h), Image.BILINEAR))
        return resized, arr.shape[1] / max(arr.shape[0], 1)

    def resize_to_canvas(
        self, image: np.ndarray, canvas: int
    ) -> tuple[np.ndarray, float]:
        """Resize into a canvas×canvas frame (aspect preserved, zero pad).

        Returns (uint8 [canvas, canvas, 3], aspect_ratio).
        """
        from gvl_tpu.runtime.native import resize_image

        h, w = image.shape[:2]
        aspect = w / h if h else 1.0
        scale = canvas / max(h, w)
        nh = max(1, min(canvas, int(round(h * scale))))
        nw = max(1, min(canvas, int(round(w * scale))))
        resized = resize_image(np.ascontiguousarray(image), nh, nw)
        out = np.zeros((canvas, canvas, 3), dtype=np.uint8)
        out[:nh, :nw] = resized if resized.ndim == 3 else resized[..., None]
        return out, aspect


class RegionExtractor:
    """Crops mask bounding boxes (10% expanded) out of frames."""

    def __init__(self, config: NaFlexConfig):
        self.config = config
        self.resizer = AspectPreservingResizer(config)

    def extract_masked_region(
        self,
        frame: np.ndarray,
        mask: np.ndarray,
        expand_ratio: float = 0.1,
    ) -> tuple[np.ndarray, tuple[int, int, int, int]]:
        """(cropped uint8 region, xyxy bbox). Empty mask → center crop."""
        ys, xs = np.where(mask)
        if len(xs) == 0:
            h, w = frame.shape[:2]
            cx, cy = w // 2, h // 2
            size = min(h, w) // 4
            bbox = (cx - size, cy - size, cx + size, cy + size)
        else:
            x_min, x_max = int(xs.min()), int(xs.max())
            y_min, y_max = int(ys.min()), int(ys.max())
            bw, bh = x_max - x_min, y_max - y_min
            bbox = (
                max(0, int(x_min - bw * expand_ratio)),
                max(0, int(y_min - bh * expand_ratio)),
                min(frame.shape[1], int(x_max + bw * expand_ratio)),
                min(frame.shape[0], int(y_max + bh * expand_ratio)),
            )
        x1, y1, x2, y2 = bbox
        return frame[y1:y2, x1:x2], bbox

    def prepare(
        self, region: np.ndarray, canvas_size: int | None = None
    ) -> tuple[np.ndarray, float]:
        """Region → uint8 [canvas, canvas, 3] + aspect.

        Pixels stay uint8 here; backends normalize ON DEVICE — the
        host→HBM transfer is 1 byte/pixel instead of 4, which is the
        binding cost for remote-attached chips and still free bandwidth
        on direct-attached ones.
        """
        canvas, aspect = self.resizer.resize_to_canvas(
            region, canvas_size or self.config.base_resolution
        )
        return canvas.astype(np.uint8), aspect


@dataclass
class SemanticEmbedding:
    """One encoded region."""

    embedding: np.ndarray
    entity_id: str
    confidence: float = 1.0
    original_bbox: Optional[tuple[int, int, int, int]] = None
    aspect_ratio: float = 1.0
    metadata: dict = field(default_factory=dict)


class DeterministicFakeBackend:
    """Hash-seeded stand-in encoder: same interface/shapes as the JAX tower.

    Embeddings are a deterministic function of the pixel content, so
    identical regions embed identically and cosine retrieval over fakes
    behaves consistently across runs — the formalized version of the
    reference's placeholder pattern.
    """

    def __init__(self, dim: int = 1152):
        self.dim = dim

    def __call__(self, batch: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        n = batch.shape[0]
        seq = np.zeros((n, 4, self.dim), dtype=np.float32)
        for i in range(n):
            digest = hashlib.blake2b(
                np.ascontiguousarray(batch[i]).tobytes(), digest_size=8
            ).digest()
            rng = np.random.default_rng(int.from_bytes(digest, "little"))
            seq[i] = rng.standard_normal((4, self.dim)).astype(np.float32)
        seq /= np.linalg.norm(seq, axis=-1, keepdims=True)
        return seq, seq.mean(axis=1)


class JaxSigLIPBackend:
    """The real encoder: jitted SigLIP tower over static-shape batches.

    Accepts uint8 pixel batches and normalizes ON DEVICE (mean/std from
    the NaFlex config), so the host→HBM transfer is 1 byte/pixel.
    Pre-normalized float batches still work (the normalize is skipped)."""

    def __init__(self, tower, variables, dtype: str = "bfloat16",
                 image_mean=(0.5, 0.5, 0.5), image_std=(0.5, 0.5, 0.5),
                 pool_strategy: str = "mean", mesh=None):
        """``mesh``: a :class:`jax.sharding.Mesh` with a ``data`` axis —
        the batch is sharded over it (data-parallel encode: each chip
        takes batch/N images, embeddings gather back)."""
        import jax
        import jax.numpy as jnp

        self.tower = tower
        self.variables = variables
        self._dtype = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
        self.mesh = mesh
        self._data_size = 1
        mean = jnp.asarray(image_mean, jnp.float32)
        std = jnp.asarray(image_std, jnp.float32)
        dt = self._dtype

        def run(variables, pixels):
            if pixels.dtype == jnp.uint8:
                pixels = ((pixels.astype(jnp.float32) / 255.0 - mean)
                          / std).astype(dt)
            out = tower.apply(variables, pixels, pool=True)
            # pool ON DEVICE: the full hidden sequence is ~260x the size
            # of the embedding — reading it back to pool on host would
            # dominate remote-attached latency
            seq = out["last_hidden_state"]
            if pool_strategy == "mean":
                pooled = seq.mean(axis=1)
            elif pool_strategy == "max":
                pooled = seq.max(axis=1)
            else:  # 'cls' → MAP-head pooled output
                pooled = out["pooled"]
            return pooled.astype(jnp.float32)

        if mesh is None:
            self._run = jax.jit(run)
        else:
            from jax.sharding import NamedSharding, PartitionSpec as P

            self._data_size = mesh.shape["data"]
            self._batch_sharding = NamedSharding(mesh, P("data"))
            replicated = NamedSharding(mesh, P())
            self.variables = jax.device_put(variables, replicated)
            self._run = jax.jit(
                run, in_shardings=(replicated, self._batch_sharding))

    def __call__(self, batch: np.ndarray) -> tuple[None, np.ndarray]:
        """Returns (None, pooled): pooling already happened on device."""
        import jax
        import jax.numpy as jnp

        batch = np.asarray(batch)
        if batch.dtype != np.uint8:
            batch = batch.astype(self._dtype)
        n = batch.shape[0]
        pad = (-n) % self._data_size
        if pad:   # batch must divide the data axis to shard evenly
            batch = np.concatenate(
                [batch, np.zeros_like(batch[:1]).repeat(pad, 0)])
        x = jnp.asarray(batch)
        if self.mesh is not None:
            x = jax.device_put(x, self._batch_sharding)
        pooled = self._run(self.variables, x)
        return None, np.asarray(pooled, np.float32)[:n]


class FusedSigLIPBackend:
    """Pallas-fused W8A8 serving backend (same call contract as
    :class:`JaxSigLIPBackend`: uint8 batches in, pooled f32 out).

    Built from bf16 tower params: quantize → calibrate activation scales
    on a sample batch → fuse into the serving layout
    (:mod:`gvl_tpu.models.siglip_fused`).  TPU lowers to the fused
    kernels; other platforms take the exact XLA reference paths."""

    def __init__(self, tower, variables, dtype: str = "bfloat16",
                 image_mean=(0.5, 0.5, 0.5), image_std=(0.5, 0.5, 0.5),
                 pool_strategy: str = "mean", mesh=None,
                 calib_pixels=None):
        import jax
        import jax.numpy as jnp

        from gvl_tpu.models.siglip_fused import (
            prepare_fused_siglip,
            siglip_fused_apply,
        )

        self.tower = tower
        cfg = tower.config
        self._dtype = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
        self.mesh = mesh
        self._data_size = 1
        mean = jnp.asarray(image_mean, jnp.float32)
        std = jnp.asarray(image_std, jnp.float32)
        size = cfg.image_size

        if calib_pixels is None:
            calib_pixels = jax.random.normal(
                jax.random.PRNGKey(0), (4, size, size, 3), jnp.float32
            ) * 0.5
        params = jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16),
                              variables["params"])
        self.variables = prepare_fused_siglip(params, cfg, calib_pixels)

        def run(fused, pixels):
            if pixels.dtype == jnp.uint8:
                pixels = ((pixels.astype(jnp.float32) / 255.0 - mean)
                          / std).astype(jnp.bfloat16)
            out = siglip_fused_apply(fused, pixels, cfg, pool=True)
            seq = out["last_hidden_state"]
            if pool_strategy == "mean":
                pooled = seq.mean(axis=1)
            elif pool_strategy == "max":
                pooled = seq.max(axis=1)
            else:
                pooled = out["pooled"]
            return pooled.astype(jnp.float32)

        if mesh is None:
            self._run = jax.jit(run)
        else:
            from jax.sharding import NamedSharding, PartitionSpec as P

            self._data_size = mesh.shape["data"]
            self._batch_sharding = NamedSharding(mesh, P("data"))
            replicated = NamedSharding(mesh, P())
            self.variables = jax.device_put(self.variables, replicated)
            self._run = jax.jit(
                run, in_shardings=(replicated, self._batch_sharding))

    __call__ = JaxSigLIPBackend.__call__


def build_vision_backend(tower, variables, config: "NaFlexConfig",
                         mesh=None):
    """JaxSigLIPBackend or FusedSigLIPBackend per ``config.quant_fused``."""
    cls = FusedSigLIPBackend if config.quant_fused else JaxSigLIPBackend
    return cls(tower, variables, config.dtype,
               image_mean=config.image_mean, image_std=config.image_std,
               pool_strategy=config.pool_strategy, mesh=mesh)


class SigLIPSemanticEncoder:
    """Mask regions → semantic embeddings (the SAM→SigLIP bridge).

    >>> encoder = SigLIPSemanticEncoder()   # fake backend, no weights
    >>> embs = encoder.encode_masked_regions(frame, [("e1", mask)])
    >>> embs[0].embedding.shape             # (1152,)
    """

    def __init__(
        self,
        config: Optional[NaFlexConfig] = None,
        backend: Optional[Callable] = None,
        projection: Optional[Callable] = None,
    ):
        self.config = config or NaFlexConfig()
        self.region_extractor = RegionExtractor(self.config)
        self.backend = backend or DeterministicFakeBackend(self.config.embedding_dim)
        # optional extra REN-style projection head (reference :416-420)
        self.projection = projection

    @classmethod
    def from_hf_checkpoint(cls, path: str,
                           config: Optional[NaFlexConfig] = None,
                           mesh=None):
        from gvl_tpu.models.siglip import load_hf_siglip

        config = config or NaFlexConfig()
        tower, variables = load_hf_siglip(path)
        tower, variables = _maybe_quantize_tower(tower, variables, config)
        return cls(config, backend=build_vision_backend(
            tower, variables, config, mesh=mesh))

    @classmethod
    def with_random_tower(cls, config: Optional[NaFlexConfig] = None,
                          mesh=None):
        """Real so400m tower, random init — the full TPU compute path
        without weights (perf benches, smoke tests; embeddings are
        meaningless)."""
        import jax
        import jax.numpy as jnp

        from gvl_tpu.models.siglip import SigLIPVisionConfig, SigLIPVisionTower

        config = config or NaFlexConfig()
        tower = SigLIPVisionTower(SigLIPVisionConfig.so400m())
        dtype = jnp.bfloat16 if config.dtype == "bfloat16" else jnp.float32
        params = jax.jit(tower.init)(
            jax.random.PRNGKey(0),
            jnp.ones((1, config.base_resolution, config.base_resolution, 3),
                     dtype))
        params = jax.tree.map(lambda a: a.astype(dtype), params)
        tower, params = _maybe_quantize_tower(tower, params, config)
        return cls(config, backend=build_vision_backend(
            tower, params, config, mesh=mesh))

    @classmethod
    def from_trained_checkpoint(cls, path: str,
                                config: Optional[NaFlexConfig] = None,
                                mesh=None):
        """Self-trained mini-SigLIP checkpoint dir
        (``scripts/train_siglip.py``): the offline-trained rung of the
        checkpoint ladder — region embeddings land in a REAL learned
        image-text space (the contrastive space is the MAP-pooled
        output, so pooling is forced to 'cls')."""
        from gvl_tpu.models.siglip import SigLIPVisionTower
        from gvl_tpu.training.siglip_train import load_minisiglip

        _, variables, vision_cfg, _ = load_minisiglip(path)
        config = config or NaFlexConfig()
        config.embedding_dim = vision_cfg.hidden_size
        config.pool_strategy = "cls"
        # crops are encoded at the tower's native training canvas
        config.base_resolution = vision_cfg.image_size
        config.region_resolution = vision_cfg.image_size
        tower = SigLIPVisionTower(vision_cfg)
        tower, tower_vars = _maybe_quantize_tower(
            tower, {"params": variables["params"]["vision"]}, config)
        return cls(config, backend=build_vision_backend(
            tower, tower_vars, config, mesh=mesh))

    # ------------------------------------------------------------ encoding

    def _pool(self, sequence, pooled: np.ndarray) -> np.ndarray:
        if sequence is None:   # backend pooled on device already
            return pooled
        strategy = self.config.pool_strategy
        if strategy == "mean":
            return sequence.mean(axis=1)
        if strategy == "max":
            return sequence.max(axis=1)
        return pooled  # 'cls' → MAP-head pooled output

    def _bucket_pad(self, n: int) -> int:
        for b in (1, 4, 8, self.config.batch_size):
            if n <= b:
                return b
        return ((n + self.config.batch_size - 1)
                // self.config.batch_size) * self.config.batch_size

    def encode_image(self, image) -> np.ndarray:
        """Encode one full image to (embedding_dim,)."""
        arr = np.asarray(image)
        prepared, _ = self.region_extractor.prepare(arr)
        seq, pooled = self.backend(prepared[None])
        return self._pool(seq, pooled)[0]

    def encode_masked_regions(
        self,
        frame: np.ndarray,
        masks: Sequence[tuple[str, np.ndarray]],
    ) -> list[SemanticEmbedding]:
        """Encode every (entity_id, mask) region in bucketed batches."""
        if not masks:
            return []
        prepared, metadata = [], []
        for entity_id, mask in masks:
            region, bbox = self.region_extractor.extract_masked_region(frame, mask)
            tensor, aspect = self.region_extractor.prepare(
                region, self.config.region_resolution)
            prepared.append(tensor)
            metadata.append(
                {"entity_id": entity_id, "bbox": bbox, "aspect_ratio": aspect}
            )

        return self._encode_prepared(prepared, metadata)

    def _encode_prepared(
        self, prepared: list[np.ndarray], metadata: list[dict]
    ) -> list[SemanticEmbedding]:
        """Bucket-padded batches of already-prepared region tensors."""
        out: list[SemanticEmbedding] = []
        step = self.config.batch_size
        for i in range(0, len(prepared), step):
            chunk = prepared[i:i + step]
            n = len(chunk)
            padded_n = self._bucket_pad(n)
            batch = np.stack(
                chunk + [np.zeros_like(chunk[0])] * (padded_n - n)
            )
            seq, pooled = self.backend(batch)
            embeddings = self._pool(seq, pooled)[:n]
            if self.projection is not None:
                embeddings = np.asarray(self.projection(embeddings))
            for emb, meta in zip(embeddings, metadata[i:i + step]):
                out.append(
                    SemanticEmbedding(
                        embedding=np.asarray(emb),
                        entity_id=meta["entity_id"],
                        confidence=1.0,
                        original_bbox=meta["bbox"],
                        aspect_ratio=meta["aspect_ratio"],
                    )
                )
        return out

    def encode_regions_multi(
        self,
        frame_masks: Sequence[tuple[np.ndarray, Sequence[tuple[str, np.ndarray]]]],
    ) -> list[list[SemanticEmbedding]]:
        """Encode regions from MANY frames in shared bucketed batches.

        Per-frame calls cost one device dispatch per frame — ruinous over
        a remote tunnel and wasteful everywhere.  This flattens every
        (frame, mask) region across the clip into the same bucket-padded
        batches, so a chunk of frames costs ceil(total_regions /
        batch_size) dispatches total.  Returns one embedding list per
        input frame, order-preserved.
        """
        prepared, metadata, owners = [], [], []
        for fi, (frame, masks) in enumerate(frame_masks):
            frame = np.asarray(frame)
            for entity_id, mask in masks:
                region, bbox = self.region_extractor.extract_masked_region(
                    frame, mask)
                tensor, aspect = self.region_extractor.prepare(
                    region, self.config.region_resolution)
                prepared.append(tensor)
                metadata.append({"entity_id": entity_id, "bbox": bbox,
                                 "aspect_ratio": aspect})
                owners.append(fi)
        flat = self._encode_prepared(prepared, metadata)
        out: list[list[SemanticEmbedding]] = [[] for _ in frame_masks]
        for emb, fi in zip(flat, owners):
            out[fi].append(emb)
        return out

    def encode_images_batch(self, images: Sequence[np.ndarray]) -> np.ndarray:
        """Whole-frame embeddings for a batch of frames, bucket-padded
        (one dispatch per bucket instead of per frame)."""
        if not len(images):
            return np.zeros((0, self.config.embedding_dim), np.float32)
        prepared = [self.region_extractor.prepare(np.asarray(img))[0]
                    for img in images]
        out, step = [], self.config.batch_size
        for i in range(0, len(prepared), step):
            chunk = prepared[i:i + step]
            n = len(chunk)
            padded_n = self._bucket_pad(n)
            batch = np.stack(
                chunk + [np.zeros_like(chunk[0])] * (padded_n - n))
            seq, pooled = self.backend(batch)
            out.append(self._pool(seq, pooled)[:n])
        return np.concatenate(out, axis=0)

    def encode_with_context(
        self,
        frame: np.ndarray,
        mask: np.ndarray,
        context_radius: int = 50,
    ) -> tuple[SemanticEmbedding, SemanticEmbedding]:
        """Encode the region and its dilated surroundings separately."""
        import scipy.ndimage as ndi

        region = self.encode_masked_regions(frame, [("region", mask)])[0]
        dilated = ndi.binary_dilation(mask, iterations=max(1, context_radius // 3))
        context_mask = dilated & ~mask.astype(bool)
        context = self.encode_masked_regions(frame, [("context", context_mask)])[0]
        return region, context

    # ---------------------------------------------------------- similarity

    @staticmethod
    def compute_similarity(emb1: SemanticEmbedding, emb2: SemanticEmbedding) -> float:
        a = emb1.embedding.astype(np.float64)
        b = emb2.embedding.astype(np.float64)
        denom = np.linalg.norm(a) * np.linalg.norm(b)
        return float(a @ b / denom) if denom else 0.0

    def find_similar_regions(
        self,
        query: SemanticEmbedding,
        candidates: Sequence[SemanticEmbedding],
        top_k: int = 5,
    ) -> list[tuple[SemanticEmbedding, float]]:
        scored = [(c, self.compute_similarity(query, c)) for c in candidates]
        scored.sort(key=lambda t: t[1], reverse=True)
        return scored[:top_k]


def create_siglip_encoder(
    model_name: str = "google/siglip2-so400m-patch14-384",
    preserve_aspect_ratio: bool = True,
    checkpoint_path: Optional[str] = None,
) -> SigLIPSemanticEncoder:
    """Factory: real JAX backend when a checkpoint path is given, else fake."""
    config = NaFlexConfig(
        model_name=model_name, preserve_aspect_ratio=preserve_aspect_ratio
    )
    if checkpoint_path:
        return SigLIPSemanticEncoder.from_hf_checkpoint(checkpoint_path, config)
    return SigLIPSemanticEncoder(config)
