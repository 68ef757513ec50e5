"""Open-vocabulary promptable segmentation model ("SAM3-class") in Flax.

An own-design, TPU-first text-promptable instance segmenter standing in for
the reference's transformers-dev SAM3 dependency
(`/root/reference/src/perception/sam_concept_segmenter.py:190-650`):

- ViT image encoder → per-pixel embedding map;
- lightweight text tower → one prompt embedding per concept;
- query-based mask decoder: M learned object queries, conditioned on the
  prompt, cross-attend image features; each query emits a mask (dot
  product with the pixel embeddings) and a confidence score.

The critical TPU property: ALL (frame × concept) pairs run in one batched
XLA program — the reference loops Python-side per frame per concept, which
is where its ~2.2 s/frame goes.  Precision follows the reference's
hard-learned rule: fp32 master weights with bf16 compute
(`sam_concept_segmenter.py:227-233`).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from gvl_tpu.nn.layers import TransformerBlock, TransformerStack


@dataclass(frozen=True)
class SamConfig:
    """Model geometry (defaults sized for gameplay frames at 256px)."""

    image_size: int = 256
    patch_size: int = 16
    encoder_dim: int = 384
    encoder_layers: int = 6
    encoder_heads: int = 6
    text_vocab: int = 4096       # hashed-wordpiece vocabulary
    text_dim: int = 256
    text_layers: int = 2
    decoder_dim: int = 256
    decoder_layers: int = 2
    num_queries: int = 8         # max instances per (frame, concept)
    mask_downscale: int = 4      # masks decoded at image_size / this

    @property
    def tokens_per_side(self) -> int:
        return self.image_size // self.patch_size

    @classmethod
    def tiny(cls) -> "SamConfig":
        return cls(image_size=64, patch_size=16, encoder_dim=64,
                   encoder_layers=2, encoder_heads=2, text_dim=32,
                   text_layers=1, decoder_dim=64, decoder_layers=1,
                   num_queries=4)


def hash_tokenize(text: str, vocab: int, max_len: int = 16) -> np.ndarray:
    """Deterministic word-hash tokenizer (no external vocab files)."""
    import zlib

    words = text.lower().split()[:max_len]
    ids = [zlib.crc32(w.encode()) % (vocab - 1) + 1 for w in words]
    ids += [0] * (max_len - len(ids))
    return np.asarray(ids, np.int32)


class TextTower(nn.Module):
    """Hashed tokens → one prompt embedding."""

    config: SamConfig

    @nn.compact
    def __call__(self, token_ids: jax.Array) -> jax.Array:   # [B, T]
        cfg = self.config
        x = nn.Embed(cfg.text_vocab, cfg.text_dim, name="embed")(token_ids)
        pos = self.param("pos", nn.initializers.normal(0.02),
                         (token_ids.shape[-1], cfg.text_dim))
        x = x + pos[None]
        for i in range(cfg.text_layers):
            x = TransformerBlock(
                num_heads=4, intermediate_dim=cfg.text_dim * 4,
                name=f"layers_{i}",
            )(x)
        mask = (token_ids > 0)[..., None]
        pooled = (x * mask).sum(1) / jnp.maximum(mask.sum(1), 1)
        return nn.Dense(cfg.decoder_dim, name="proj")(pooled)


class ImageEncoder(nn.Module):
    """ViT over the frame → [B, HW, decoder_dim] feature map."""

    config: SamConfig

    @nn.compact
    def __call__(self, pixels: jax.Array) -> jax.Array:  # [B, H, W, 3]
        cfg = self.config
        p = cfg.patch_size
        b, h, w, c = pixels.shape
        nh, nw = h // p, w // p
        x = pixels[:, : nh * p, : nw * p].reshape(b, nh, p, nw, p, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, nh * nw, p * p * c)
        x = nn.Dense(cfg.encoder_dim, name="patch_proj")(x)
        pos = self.param("pos", nn.initializers.normal(0.02),
                         (cfg.tokens_per_side ** 2, cfg.encoder_dim))
        if pos.shape[0] != x.shape[1]:
            side = cfg.tokens_per_side
            grid = pos.reshape(side, side, -1)
            grid = jax.image.resize(grid, (nh, nw, grid.shape[-1]), "bilinear")
            pos = grid.reshape(nh * nw, -1)
        x = x + pos[None].astype(x.dtype)
        x = TransformerStack(
            num_layers=cfg.encoder_layers, num_heads=cfg.encoder_heads,
            intermediate_dim=cfg.encoder_dim * 4, name="encoder",
        )(x)
        return nn.Dense(cfg.decoder_dim, name="neck")(x)


class MaskDecoder(nn.Module):
    """Prompt-conditioned queries → per-query masks + scores."""

    config: SamConfig

    @nn.compact
    def __call__(
        self, image_feats: jax.Array, prompt: jax.Array
    ) -> dict[str, jax.Array]:
        cfg = self.config
        b, hw, d = image_feats.shape
        queries = self.param(
            "queries", nn.initializers.normal(0.02), (cfg.num_queries, d)
        )
        q = jnp.broadcast_to(
            queries[None], (b, cfg.num_queries, d)
        ).astype(image_feats.dtype)
        q = q + prompt[:, None, :].astype(q.dtype)

        kv = jnp.concatenate([image_feats, prompt[:, None, :]], axis=1)
        for i in range(cfg.decoder_layers):
            # queries attend the image (+prompt), then self-attend
            from gvl_tpu.nn.layers import Attention, MlpGelu

            q = q + Attention(num_heads=8, name=f"cross_{i}")(
                nn.LayerNorm(name=f"cross_norm_{i}")(q), kv
            )
            q = q + Attention(num_heads=8, name=f"self_{i}")(
                nn.LayerNorm(name=f"self_norm_{i}")(q)
            )
            q = q + MlpGelu(d * 4, name=f"mlp_{i}")(
                nn.LayerNorm(name=f"mlp_norm_{i}")(q)
            )

        # pixel embedding map at 1/downscale resolution
        side = int(round(float(np.sqrt(hw))))
        up = cfg.patch_size // cfg.mask_downscale
        pix = nn.Dense(d * up * up, name="pixel_head")(image_feats)
        pix = pix.reshape(b, side, side, up, up, d)
        pix = pix.transpose(0, 1, 3, 2, 4, 5).reshape(b, side * up, side * up, d)

        mask_emb = nn.Dense(d, name="mask_head")(q)      # [B, Q, d]
        logits = jnp.einsum("bqd,bhwd->bqhw", mask_emb, pix)
        scores = nn.Dense(1, name="score_head")(q)[..., 0]  # [B, Q]
        return {"mask_logits": logits, "scores": jax.nn.sigmoid(scores)}


class PromptableSegmenter(nn.Module):
    """Full model: one call segments every (frame, concept) pair."""

    config: SamConfig

    def setup(self):
        self.image_encoder = ImageEncoder(self.config)
        self.text_tower = TextTower(self.config)
        self.decoder = MaskDecoder(self.config)

    def __call__(
        self, pixels: jax.Array, token_ids: jax.Array
    ) -> dict[str, jax.Array]:
        """pixels [F, H, W, 3]; token_ids [C, T] →
        mask_logits [F, C, Q, H/ds, W/ds], scores [F, C, Q].

        Image features are computed once per frame and broadcast over
        concepts (the expensive tower never repeats per concept).
        """
        feats = self.image_encoder(pixels)             # [F, HW, D]
        prompts = self.text_tower(token_ids)           # [C, D]
        f, hw, d = feats.shape
        c = prompts.shape[0]
        feats_fc = jnp.repeat(feats, c, axis=0)        # [F*C, HW, D]
        prompts_fc = jnp.tile(prompts, (f, 1))         # [F*C, D]
        out = self.decoder(feats_fc, prompts_fc)
        q = self.config.num_queries
        side = pixels.shape[1] // self.config.mask_downscale
        return {
            "mask_logits": out["mask_logits"].reshape(f, c, q, side, -1),
            "scores": out["scores"].reshape(f, c, q),
        }

    def encode_image(self, pixels: jax.Array) -> jax.Array:
        return self.image_encoder(pixels)


# --------------------------------------------------------------------------
# Checkpoint I/O (same flat-npz layout as gvl_tpu.perception.ocr_model)
# --------------------------------------------------------------------------

def save_segmenter_npz(variables: dict, path) -> None:
    from gvl_tpu.utils.checkpoints import save_flat_npz

    save_flat_npz(variables, path)


def load_segmenter_npz(path) -> dict:
    from gvl_tpu.utils.checkpoints import load_flat_npz

    return load_flat_npz(path)
