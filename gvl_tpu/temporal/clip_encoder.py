"""VideoMAE clip embeddings behind the preset checkpoint ladder.

The reference extracts VideoMAE embeddings with a real HF model in the
main path (`/root/reference/scripts/realtime_inference.py:339-381`,
16-frame clips, stride 8, mean-pooled tokens).  This module gives the
flagship pipeline the same ladder the SAM/SigLIP/OCR stacks already
have (:mod:`gvl_tpu.perception.batch`): the JAX VideoMAE tower when
``perception.videomae_checkpoint`` resolves to a local HF directory, a
deterministic hash fake otherwise — so ``process_video`` produces model
embeddings with zero code edits the moment weights exist.
"""

from __future__ import annotations

import logging
from typing import Optional, Sequence

import numpy as np

logger = logging.getLogger(__name__)

# HF VideoMAEImageProcessor defaults (ImageNet)
_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


class HashClipEncoder:
    """Deterministic fake: 16-frame clip → hash-seeded embedding.

    Matches the shape/scale contract of the real tower so the timeline,
    projector and retrieval paths exercise identically in CI.
    """

    def __init__(self, dim: int = 768):
        self.dim = dim
        from gvl_tpu.temporal.hico import HashFrameEncoder

        self._frame_encoder = HashFrameEncoder(dim)

    def encode_clip(self, clip: np.ndarray) -> np.ndarray:
        """[T, H, W, C] uint8 → [dim] float32."""
        return self._frame_encoder(clip).mean(axis=0)

    def encode_clips(self, clips: Sequence[np.ndarray]) -> np.ndarray:
        return np.stack([self.encode_clip(c) for c in clips]) \
            if clips else np.zeros((0, self.dim), np.float32)


class JaxVideoMAEClipEncoder:
    """The real tower: resize → normalize → ONE batched device program.

    Clips are padded to the model's ``num_frames`` by repeating the last
    frame (matching the reference's short-tail handling) and batched into
    a single jitted forward per :meth:`encode_clips` call — not one
    dispatch per clip.
    """

    def __init__(self, encoder, variables, dtype=None):
        import jax
        import jax.numpy as jnp

        self.config = encoder.config
        self.dim = self.config.hidden_size
        mean = jnp.asarray(_MEAN)
        std = jnp.asarray(_STD)
        compute = dtype or jnp.bfloat16

        def run(pixels_u8):
            # [B, T, H, W, C] uint8 → clip embeddings [B, D] f32
            x = (pixels_u8.astype(jnp.float32) / 255.0 - mean) / std
            out = encoder.apply(variables, x.astype(compute))
            return out["clip_embedding"].astype(jnp.float32)

        self._run = jax.jit(run)

    def _prepare(self, clip: np.ndarray) -> np.ndarray:
        from gvl_tpu.runtime.native import resize_image

        cfg = self.config
        frames = [resize_image(np.ascontiguousarray(f),
                               cfg.image_size, cfg.image_size)
                  for f in clip]
        if len(frames) < cfg.num_frames:        # repeat-pad short tails
            frames += [frames[-1]] * (cfg.num_frames - len(frames))
        elif len(frames) > cfg.num_frames:      # uniform temporal sample
            idx = np.linspace(0, len(frames) - 1, cfg.num_frames)
            frames = [frames[int(i)] for i in idx]
        return np.stack(frames).astype(np.uint8)

    def encode_clip(self, clip: np.ndarray) -> np.ndarray:
        return self.encode_clips([clip])[0]

    def encode_clips(self, clips: Sequence[np.ndarray]) -> np.ndarray:
        import jax.numpy as jnp

        if not len(clips):
            return np.zeros((0, self.dim), np.float32)
        batch = np.stack([self._prepare(c) for c in clips])
        return np.asarray(self._run(jnp.asarray(batch)))


def build_clip_encoder(config):
    """Preset ladder: JAX VideoMAE when ``videomae_checkpoint`` resolves
    to a local HF directory; the SELF-TRAINED mini tower when it is a
    ``scripts/train_videomae.py`` checkpoint (the default,
    ``outputs/videomae``); deterministic hash fake otherwise."""
    from gvl_tpu.utils.checkpoints import resolve_repo_path

    p = config.perception
    ckpt = resolve_repo_path(getattr(p, "videomae_checkpoint", None))
    if ckpt:
        from gvl_tpu.training.videomae_train import (
            TrainedClipEncoder,
            is_trained_clip_checkpoint,
        )

        if is_trained_clip_checkpoint(ckpt):
            logger.info("VideoMAE clip encoder: self-trained tower "
                        "from %s", ckpt)
            return TrainedClipEncoder.from_dir(ckpt)
        from gvl_tpu.models.videomae import load_hf_videomae

        encoder, variables = load_hf_videomae(ckpt)
        logger.info("VideoMAE clip encoder: JAX tower from %s", ckpt)
        return JaxVideoMAEClipEncoder(encoder, variables)
    return HashClipEncoder(768)


def extract_clip_embeddings(
    frames: Sequence[tuple[float, np.ndarray]],
    encoder,
    clip_len: int = 16,
    stride: int = 8,
    timeline=None,
    min_confidence: float = 0.6,
) -> list[tuple[float, np.ndarray]]:
    """Reference clip schedule (16-frame windows, stride 8,
    `/root/reference/scripts/realtime_inference.py:339-381`) through ONE
    batched device call.

    When the encoder exposes trained heads (``classify_clips``, the
    self-trained rung) and ``timeline`` is given, confident motion
    predictions are emitted as TEMPORAL text events — "player moving
    right" becomes retrievable context, a capability the reference's
    embedding-only VideoMAE path never had.
    """
    arr = [f for _, f in frames]
    times = [t for t, _ in frames]
    starts, clips = [], []
    for start in range(0, max(1, len(arr) - clip_len + 1), stride):
        chunk = arr[start:start + clip_len]
        if not chunk:
            break
        starts.append(times[start])
        clips.append(np.stack(chunk))
    if not clips:
        return []
    embeddings = encoder.encode_clips(clips)
    if timeline is not None and hasattr(encoder, "classify_clips"):
        from gvl_tpu.fusion.timeline import EventPriority, ModalityType
        from gvl_tpu.training.videomae_train import DIRECTION_PHRASES

        for ts, labels in zip(starts, encoder.classify_clips(clips)):
            d_name, d_p = labels["direction"]
            k_name, k_p = labels["kind"]
            e_name, e_p = labels["event"]
            conf = min(d_p, k_p)
            if conf < min_confidence or d_name == "static":
                continue
            desc = f"{k_name} {DIRECTION_PHRASES[d_name]}"
            if e_name != "none" and e_p >= min_confidence:
                desc += f" ({e_name} mid-clip)"
            timeline.add_event(
                timestamp=float(ts), modality=ModalityType.TEMPORAL,
                description=desc, priority=EventPriority.MEDIUM,
                confidence=float(conf),
                metadata={"source": "clip_encoder"})
    return list(zip(starts, embeddings))
