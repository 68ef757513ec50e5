"""Hierarchical token compression (HiCo) for long videos, in Flax.

Two cross-attention compression stages with learned queries —
FRAME tokens → CLIP tokens (4:1) → VIDEO tokens (8:1) — plus a rolling
compressed-token cache, replacing the reference's torch module
(`/root/reference/src/temporal/internvideo_hico_module.py:184-282`).
All clips in a video compress in ONE batched XLA program instead of the
reference's per-clip Python loop.
"""

from __future__ import annotations

import hashlib
import logging
from dataclasses import dataclass, field
from enum import Enum
from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from gvl_tpu.ops.attention import dot_product_attention

logger = logging.getLogger(__name__)


class CompressionLevel(Enum):
    FRAME = "frame"
    CLIP = "clip"
    VIDEO = "video"


@dataclass
class TemporalToken:
    """One compressed temporal token with its time span."""

    embedding: np.ndarray
    start_time: float
    end_time: float
    compression_level: CompressionLevel
    source_frame_count: int
    metadata: dict = field(default_factory=dict)

    def __repr__(self) -> str:
        return (
            f"TemporalToken(level={self.compression_level.value}, "
            f"time=[{self.start_time:.2f}s-{self.end_time:.2f}s], "
            f"frames={self.source_frame_count})"
        )


@dataclass
class HiCoConfig:
    model_name: str = "gvl/hico-tpu"
    hidden_dim: int = 1408
    clip_duration_sec: float = 4.0
    frames_per_clip: int = 16
    clip_overlap_sec: float = 0.5
    frame_to_clip_ratio: int = 4
    clip_to_video_ratio: int = 8
    max_context_tokens: int = 256
    cache_compressed_tokens: bool = True
    max_cached_clips: int = 100
    num_heads: int = 8
    max_positions: int = 1024


class _CrossAttnPool(nn.Module):
    """Learned queries cross-attend the token set; LN(residual + attn)."""

    hidden_dim: int
    num_heads: int

    @nn.compact
    def __call__(self, tokens: jax.Array, num_queries: int) -> jax.Array:
        d = self.hidden_dim
        batch = tokens.shape[0]
        query = self.param("query", nn.initializers.normal(1.0), (1, 1, d))
        query = jnp.broadcast_to(query, (batch, num_queries, d)).astype(tokens.dtype)

        dense = lambda name: nn.Dense(d, name=name)
        q, k, v = dense("q_proj")(query), dense("k_proj")(tokens), dense("v_proj")(tokens)

        def split(t):
            return t.reshape(t.shape[0], t.shape[1], self.num_heads, -1).swapaxes(1, 2)

        attn = dot_product_attention(split(q), split(k), split(v))
        attn = attn.swapaxes(1, 2).reshape(batch, num_queries, d)
        out = dense("o_proj")(attn)
        return nn.LayerNorm(name="norm")(out + query)


class HierarchicalCompressor(nn.Module):
    """Frame→clip and clip→video compression with temporal positions."""

    config: HiCoConfig

    def setup(self):
        cfg = self.config
        self.temporal_pe = self.param(
            "temporal_pe", nn.initializers.normal(0.02),
            (cfg.max_positions, cfg.hidden_dim),
        )
        self.frame_to_clip = _CrossAttnPool(
            cfg.hidden_dim, cfg.num_heads, name="frame_to_clip"
        )
        self.clip_to_video = _CrossAttnPool(
            cfg.hidden_dim, cfg.num_heads, name="clip_to_video"
        )

    def compress_frames_to_clip(
        self, frame_tokens: jax.Array, num_output_tokens: int = 1
    ) -> jax.Array:
        """[B, T, D] frame tokens → [B, num_output_tokens, D]."""
        seq = frame_tokens.shape[1]
        tokens = frame_tokens + self.temporal_pe[None, :seq].astype(
            frame_tokens.dtype
        )
        return self.frame_to_clip(tokens, num_output_tokens)

    def compress_clips_to_video(
        self, clip_tokens: jax.Array, num_output_tokens: int = 1
    ) -> jax.Array:
        """[B, n_clips, D] → [B, num_output_tokens, D]."""
        return self.clip_to_video(clip_tokens, num_output_tokens)

    def __call__(self, frame_tokens: jax.Array) -> jax.Array:
        """Init path: exercises both stages so one variables dict covers all."""
        clip = self.compress_frames_to_clip(frame_tokens)
        return self.compress_clips_to_video(clip)


class HashFrameEncoder:
    """Deterministic fake frame encoder (hash-seeded [T, D] features)."""

    def __init__(self, dim: int):
        self.dim = dim

    def __call__(self, frames: np.ndarray) -> np.ndarray:
        out = np.zeros((len(frames), self.dim), np.float32)
        for i, frame in enumerate(frames):
            digest = hashlib.blake2b(
                np.ascontiguousarray(frame).tobytes(), digest_size=8
            ).digest()
            rng = np.random.default_rng(int.from_bytes(digest, "little"))
            out[i] = rng.standard_normal(self.dim).astype(np.float32)
        return out / np.linalg.norm(out, axis=-1, keepdims=True)


class TemporalCompressionModule:
    """Segment → encode → compress pipeline with a rolling token cache.

    >>> mod = TemporalCompressionModule()
    >>> tokens = mod.segment_and_compress(frames, fps=2.0)
    >>> context = mod.get_rolling_context(current_time=120.0)
    """

    def __init__(
        self,
        config: Optional[HiCoConfig] = None,
        frame_encoder: Optional[Callable] = None,
        rng: Optional[jax.Array] = None,
        checkpoint: Optional[str] = "outputs/hico_params.npz",
    ):
        self.config = config or HiCoConfig()
        self.frame_encoder = frame_encoder or HashFrameEncoder(self.config.hidden_dim)
        self.compressor = HierarchicalCompressor(self.config)
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        dummy = jnp.zeros((1, self.config.frames_per_clip, self.config.hidden_dim))
        self.variables = None
        if checkpoint:   # trained queries when the artifact exists
            resolved = _resolve_checkpoint(checkpoint)
            if resolved:
                try:
                    loaded = load_hico_npz(resolved)
                    pe = loaded["params"]["temporal_pe"]
                    want = (self.config.max_positions,
                            self.config.hidden_dim)
                    if tuple(pe.shape) != want:
                        raise ValueError(
                            f"geometry mismatch: checkpoint temporal_pe "
                            f"{tuple(pe.shape)} != config {want}")
                    self.variables = loaded
                    logger.info("loaded HiCo compressor from %s", resolved)
                except Exception as exc:
                    logger.warning("HiCo checkpoint %s unusable (%s); "
                                   "random init", resolved, exc)
        if self.variables is None:
            self.variables = jax.jit(self.compressor.init)(rng, dummy)
        self._compress_clip = jax.jit(
            lambda v, x: self.compressor.apply(
                v, x, method=HierarchicalCompressor.compress_frames_to_clip
            )
        )
        self._compress_video = jax.jit(
            lambda v, x, n: self.compressor.apply(
                v, x, n, method=HierarchicalCompressor.compress_clips_to_video
            ),
            static_argnums=(2,),
        )
        self._token_cache: list[TemporalToken] = []

    # --------------------------------------------------------- segmentation

    def segment_video(
        self, frames: np.ndarray, fps: float
    ) -> list[tuple[np.ndarray, float, float]]:
        """Overlapping clips of ``clip_duration_sec`` (tiny tails dropped)."""
        cfg = self.config
        total = len(frames)
        clip_n = max(1, int(cfg.clip_duration_sec * fps))
        stride = max(1, clip_n - int(cfg.clip_overlap_sec * fps))
        clips = []
        start = 0
        while start < total:
            end = min(start + clip_n, total)
            clips.append((frames[start:end], start / fps, end / fps))
            start += stride
            if total - start < clip_n // 2:
                break
        return clips

    def _sample_clip_frames(self, clip: np.ndarray) -> np.ndarray:
        """Uniformly sample/pad to frames_per_clip."""
        target = self.config.frames_per_clip
        if len(clip) >= target:
            idx = np.linspace(0, len(clip) - 1, target).astype(int)
            return clip[idx]
        pad = np.repeat(clip[-1:], target - len(clip), axis=0)
        return np.concatenate([clip, pad], axis=0)

    # ---------------------------------------------------------- compression

    def segment_and_compress(
        self,
        frames: np.ndarray,
        fps: float,
        target_level: CompressionLevel = CompressionLevel.CLIP,
    ) -> list[TemporalToken]:
        """The primary long-video entry point.

        All clips are encoded then compressed in one batched program
        ([n_clips, frames_per_clip, D] → [n_clips, 1, D]).
        """
        clips = self.segment_video(frames, fps)
        if not clips:
            return []

        features = np.stack([
            self.frame_encoder(self._sample_clip_frames(clip))
            for clip, _, _ in clips
        ])  # [n_clips, T, D]

        tokens: list[TemporalToken] = []
        if target_level is CompressionLevel.FRAME:
            for feats, (clip, t0, t1) in zip(features, clips):
                span = (t1 - t0) / len(feats)
                for i, emb in enumerate(feats):
                    tokens.append(TemporalToken(
                        embedding=np.asarray(emb),
                        start_time=t0 + i * span,
                        end_time=t0 + (i + 1) * span,
                        compression_level=CompressionLevel.FRAME,
                        source_frame_count=1,
                    ))
            return tokens

        # pad the clip batch to a power-of-two bucket so XLA compiles once
        n_clips = features.shape[0]
        bucket = 1 << (n_clips - 1).bit_length()
        if bucket != n_clips:
            features = np.concatenate(
                [features, np.zeros((bucket - n_clips, *features.shape[1:]),
                                    features.dtype)], axis=0)
        clip_embs = np.asarray(
            self._compress_clip(self.variables, jnp.asarray(features))
        )[:n_clips, 0]  # [n_clips, D]

        if target_level is CompressionLevel.CLIP:
            for emb, (clip, t0, t1) in zip(clip_embs, clips):
                tokens.append(TemporalToken(
                    embedding=emb,
                    start_time=t0,
                    end_time=t1,
                    compression_level=CompressionLevel.CLIP,
                    source_frame_count=len(clip),
                ))
        else:  # VIDEO
            num_out = max(1, len(clips) // self.config.clip_to_video_ratio)
            video = self._compress_video(
                self.variables, jnp.asarray(clip_embs[None]), num_out
            )
            t0, t1 = clips[0][1], clips[-1][2]
            n_frames = sum(len(c) for c, _, _ in clips)
            for i in range(num_out):
                tokens.append(TemporalToken(
                    embedding=np.asarray(video[0, i]),
                    start_time=t0,
                    end_time=t1,
                    compression_level=CompressionLevel.VIDEO,
                    source_frame_count=n_frames,
                ))

        if self.config.cache_compressed_tokens:
            self._token_cache.extend(tokens)
            del self._token_cache[: -self.config.max_cached_clips]
        return tokens

    # ---------------------------------------------------------- rolling ctx

    def get_rolling_context(
        self, current_time: float, window_sec: Optional[float] = None
    ) -> list[TemporalToken]:
        """Cached tokens inside the window, newest-capped at max tokens."""
        window = window_sec if window_sec is not None else 300.0
        cutoff = current_time - window
        selected = [t for t in self._token_cache if t.end_time >= cutoff]
        return selected[-self.config.max_context_tokens:]

    def clear_cache(self) -> None:
        self._token_cache.clear()


def create_hico_module(
    clip_duration: float = 4.0,
    frames_per_clip: int = 16,
    frame_encoder: Optional[Callable] = None,
) -> TemporalCompressionModule:
    return TemporalCompressionModule(
        HiCoConfig(clip_duration_sec=clip_duration, frames_per_clip=frames_per_clip),
        frame_encoder=frame_encoder,
    )


# --------------------------------------------------------------------------
# Checkpoint IO (flat-npz layout, same scheme as the other artifacts)
# --------------------------------------------------------------------------

def _resolve_checkpoint(path) -> Optional[str]:
    from gvl_tpu.utils.checkpoints import resolve_repo_path

    return resolve_repo_path(path)


def save_hico_npz(variables: dict, path) -> None:
    from gvl_tpu.utils.checkpoints import save_flat_npz

    save_flat_npz(variables, path)


def load_hico_npz(path) -> dict:
    from gvl_tpu.utils.checkpoints import load_flat_npz

    return load_flat_npz(path)
