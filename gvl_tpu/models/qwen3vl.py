"""Qwen3-VL in Flax: vision tower + DeepStack + mrope text decoder.

The reference's flagship model (`Qwen3-VL-8B-Instruct`,
`qwen_reasoning_core.py:1819-1822`) rebuilt TPU-first:

- vision tower: pre-patchified pixels → dense patch embed, bilinearly
  interpolated learned positions, 2-D rotary attention blocks, a 2×2
  spatial-merge projector, and DeepStack mergers tapping intermediate
  layers (arXiv:2406.04334);
- text decoder: the gvl Qwen3 stack with interleaved mrope (T/H/W
  position triples folded into one cos/sin table) and DeepStack features
  added to the first layers' hidden states at visual positions;
- image tokens in the prompt are replaced by merged visual embeddings
  (real splicing, not placeholders).

Converter + logits-parity tests run against HF
``Qwen3VLForConditionalGeneration`` with tiny random weights.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from gvl_tpu.models.qwen3 import Qwen3Config, Qwen3Model, convert_hf_qwen3
from gvl_tpu.ops.attention import dot_product_attention

_gelu_tanh = partial(nn.gelu, approximate=True)
_gelu_exact = partial(nn.gelu, approximate=False)


@dataclass(frozen=True)
class Qwen3VLVisionConfig:
    """Defaults: Qwen3-VL-8B vision tower."""

    hidden_size: int = 1152
    depth: int = 27
    num_heads: int = 16
    patch_size: int = 16
    temporal_patch_size: int = 2
    spatial_merge_size: int = 2
    intermediate_size: int = 4304
    out_hidden_size: int = 4096
    num_position_embeddings: int = 2304
    deepstack_visual_indexes: tuple[int, ...] = (8, 16, 24)
    layer_norm_eps: float = 1e-6

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def grid_per_side(self) -> int:
        return int(self.num_position_embeddings ** 0.5)

    @classmethod
    def tiny(cls) -> "Qwen3VLVisionConfig":
        return cls(hidden_size=32, depth=2, num_heads=2, intermediate_size=64,
                   out_hidden_size=48, num_position_embeddings=16,
                   deepstack_visual_indexes=(0, 1))


# ---------------------------------------------------------------- host math

def interpolated_pos_indices(
    config: Qwen3VLVisionConfig, grid_thw: tuple[int, int, int]
) -> tuple[np.ndarray, np.ndarray]:
    """Bilinear (idx[4, HW], weight[4, HW]) over the learned pos grid,
    then permuted into spatial-merge-block token order and tiled over T."""
    t, h, w = grid_thw
    side = config.grid_per_side
    h_idx = np.linspace(0, side - 1, h)
    w_idx = np.linspace(0, side - 1, w)
    h_floor = h_idx.astype(np.int64)
    w_floor = w_idx.astype(np.int64)
    h_ceil = np.clip(h_floor + 1, None, side - 1)
    w_ceil = np.clip(w_floor + 1, None, side - 1)
    dh = (h_idx - h_floor)[:, None]
    dw = (w_idx - w_floor)[None, :]

    idx = np.stack([
        (h_floor[:, None] * side + w_floor[None, :]).ravel(),
        (h_floor[:, None] * side + w_ceil[None, :]).ravel(),
        (h_ceil[:, None] * side + w_floor[None, :]).ravel(),
        (h_ceil[:, None] * side + w_ceil[None, :]).ravel(),
    ])
    weight = np.stack([
        ((1 - dh) * (1 - dw)).ravel(),
        ((1 - dh) * dw).ravel(),
        (dh * (1 - dw)).ravel(),
        (dh * dw).ravel(),
    ])
    # raster -> merge-block order, tiled over t
    m = config.spatial_merge_size
    order = np.arange(h * w).reshape(h // m, m, w // m, m)
    order = order.transpose(0, 2, 1, 3).ravel()
    idx = idx[:, order]
    weight = weight[:, order]
    idx = np.tile(idx, (1, t))
    weight = np.tile(weight, (1, t))
    return idx, weight.astype(np.float32)


def vision_rope_table(
    config: Qwen3VLVisionConfig, grid_thw: tuple[int, int, int]
) -> tuple[np.ndarray, np.ndarray]:
    """2-D rotary (cos, sin) [seq, head_dim] in merge-block token order."""
    t, h, w = grid_thw
    m = config.spatial_merge_size
    half = config.head_dim // 2  # rotary dim; split across (row, col)
    inv = 1.0 / (10000.0 ** (np.arange(0, half, 2) / half))

    rows = np.arange(h)[:, None].repeat(w, 1)
    cols = np.arange(w)[None, :].repeat(h, 0)
    order = np.arange(h * w).reshape(h // m, m, w // m, m)
    order = order.transpose(0, 2, 1, 3).ravel()
    rows = rows.ravel()[order]
    cols = cols.ravel()[order]

    freqs = np.concatenate(
        [rows[:, None] * inv[None, :], cols[:, None] * inv[None, :]], axis=1
    )  # [HW, half]
    emb = np.concatenate([freqs, freqs], axis=1)  # [HW, head_dim]
    emb = np.tile(emb, (t, 1))
    return np.cos(emb).astype(np.float32), np.sin(emb).astype(np.float32)


def patchify_frames(
    frames: np.ndarray, config: Qwen3VLVisionConfig
) -> tuple[np.ndarray, tuple[int, int, int]]:
    """[T, H, W, 3] uint8/float → (patches [seq, C*tp*ps*ps], grid_thw).

    Matches the Qwen-VL processor layout: tokens in spatial-merge-block
    order; each patch vector flattens (C, tp, ps, ps).
    """
    ps, tp, m = (config.patch_size, config.temporal_patch_size,
                 config.spatial_merge_size)
    t, h, w, c = frames.shape
    if t % tp:
        frames = np.concatenate(
            [frames, frames[-1:].repeat(tp - t % tp, 0)], axis=0)
        t = frames.shape[0]
    gt, gh, gw = t // tp, h // ps, w // ps
    x = frames.astype(np.float32)
    x = x.reshape(gt, tp, gh // m, m, ps, gw // m, m, ps, c)
    # -> [gt, gh/m, gw/m, m(h), m(w), C, tp, ps(h), ps(w)]
    x = x.transpose(0, 2, 5, 3, 6, 8, 1, 4, 7)
    patches = x.reshape(gt * gh * gw, c * tp * ps * ps)
    return patches, (gt, gh, gw)


# ------------------------------------------------------------- vision tower

class _VisionBlock(nn.Module):
    config: Qwen3VLVisionConfig

    @nn.compact
    def __call__(self, x, cos, sin):
        cfg = self.config
        d = cfg.hidden_size
        n_heads = cfg.num_heads
        seq = x.shape[0]

        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="norm1")(x)
        qkv = nn.Dense(3 * d, name="qkv")(h).reshape(seq, 3, n_heads, -1)
        q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]  # [seq, H, Dh]

        def rot(t):
            half = t.shape[-1] // 2
            rotated = jnp.concatenate([-t[..., half:], t[..., :half]], -1)
            return t * cos[:, None, :] + rotated * sin[:, None, :]

        q, k, v = rot(q), rot(k), v
        out = dot_product_attention(
            q.transpose(1, 0, 2)[None], k.transpose(1, 0, 2)[None],
            v.transpose(1, 0, 2)[None],
        )[0].transpose(1, 0, 2).reshape(seq, d)
        x = x + nn.Dense(d, name="proj")(out)

        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="norm2")(x)
        h = nn.Dense(cfg.intermediate_size, name="fc1")(h)
        h = _gelu_tanh(h)
        return x + nn.Dense(d, name="fc2")(h)


class _PatchMerger(nn.Module):
    config: Qwen3VLVisionConfig
    postshuffle_norm: bool = False

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        merged = cfg.hidden_size * cfg.spatial_merge_size ** 2
        if self.postshuffle_norm:
            x = x.reshape(-1, merged)
            x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="norm")(x)
        else:
            x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="norm")(x)
            x = x.reshape(-1, merged)
        h = nn.Dense(merged, name="fc1")(x)
        h = _gelu_exact(h)
        return nn.Dense(cfg.out_hidden_size, name="fc2")(h)


class Qwen3VLVisionTower(nn.Module):
    """Pre-patchified pixels + static grid → merged embeds + deepstack."""

    config: Qwen3VLVisionConfig

    @nn.compact
    def __call__(self, patches: jax.Array, grid_thw: tuple[int, int, int]):
        cfg = self.config
        x = nn.Dense(cfg.hidden_size, name="patch_proj")(patches)

        pos_table = self.param(
            "pos_embed", nn.initializers.normal(0.02),
            (cfg.num_position_embeddings, cfg.hidden_size),
        )
        idx, weight = interpolated_pos_indices(cfg, grid_thw)
        pos = (pos_table[jnp.asarray(idx)]
               * jnp.asarray(weight)[..., None]).sum(0)
        x = x + pos.astype(x.dtype)

        cos, sin = vision_rope_table(cfg, grid_thw)
        cos = jnp.asarray(cos)
        sin = jnp.asarray(sin)

        deepstack = []
        for i in range(cfg.depth):
            x = _VisionBlock(cfg, name=f"blocks_{i}")(x, cos, sin)
            if i in cfg.deepstack_visual_indexes:
                pos_in_list = cfg.deepstack_visual_indexes.index(i)
                deepstack.append(_PatchMerger(
                    cfg, postshuffle_norm=True,
                    name=f"deepstack_{pos_in_list}")(x))
        merged = _PatchMerger(cfg, postshuffle_norm=False, name="merger")(x)
        return merged, deepstack


# ------------------------------------------------------------------- mrope

def mrope_cos_sin(
    position_ids: jax.Array,   # [3, B, S] (t, h, w)
    head_dim: int,
    rope_theta: float,
    mrope_section: tuple[int, int, int] = (24, 20, 20),
) -> tuple[jax.Array, jax.Array]:
    """Interleaved mrope table [B, S, head_dim] (HF apply_interleaved_mrope)."""
    half = head_dim // 2
    inv = 1.0 / (rope_theta ** (jnp.arange(0, half, dtype=jnp.float32) * 2 / head_dim))
    freqs = position_ids[..., None].astype(jnp.float32) * inv  # [3, B, S, half]
    # start from T everywhere, overwrite interleaved H/W lanes
    out = freqs[0]
    lanes = np.zeros(half, dtype=np.int64)  # 0=T, 1=H, 2=W
    for dim, offset in ((1, 1), (2, 2)):
        length = mrope_section[dim] * 3
        lanes[offset:length:3] = dim
    out = jnp.where(jnp.asarray(lanes == 1), freqs[1], out)
    out = jnp.where(jnp.asarray(lanes == 2), freqs[2], out)
    emb = jnp.concatenate([out, out], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def vl_position_ids(
    input_ids: np.ndarray,       # [B, S]
    grid_thw: tuple[int, int, int],
    image_token_id: int,
    spatial_merge_size: int = 2,
) -> np.ndarray:
    """[3, B, S] (t, h, w) position triples — single image span per row.

    Text tokens advance all three axes together; the image span holds T
    constant while H/W sweep the merged grid; text after the image resumes
    from max(position) + 1 (the Qwen-VL get_rope_index rule).
    """
    batch, seq = input_ids.shape
    t, h, w = grid_thw
    mh, mw = h // spatial_merge_size, w // spatial_merge_size
    out = np.zeros((3, batch, seq), np.int64)
    for b in range(batch):
        ids = input_ids[b]
        image_positions = np.where(ids == image_token_id)[0]
        cursor = 0   # next text position value
        pos = 0      # index into the sequence
        while pos < seq:
            if len(image_positions) and pos == image_positions[0]:
                n_vis = t * mh * mw
                t_idx = np.repeat(np.arange(t), mh * mw)
                h_idx = np.tile(np.repeat(np.arange(mh), mw), t)
                w_idx = np.tile(np.arange(mw), t * mh)
                span = slice(pos, pos + n_vis)
                out[0, b, span] = cursor + t_idx
                out[1, b, span] = cursor + h_idx
                out[2, b, span] = cursor + w_idx
                cursor = cursor + int(max(t, mh, mw))
                pos += n_vis
                image_positions = image_positions[n_vis:]
            else:
                out[:, b, pos] = cursor
                cursor += 1
                pos += 1
    return out


# ---------------------------------------------------------------- VL model

class Qwen3VL:
    """Vision tower + mrope text decoder with DeepStack injection.

    >>> vl = Qwen3VL(vision_cfg, text_cfg, variables)
    >>> logits = vl.forward(input_ids, patches, grid_thw)
    """

    def __init__(
        self,
        vision_config: Qwen3VLVisionConfig,
        text_config: Qwen3Config,
        variables: dict,
        image_token_id: int = 151655,
        mrope_section: tuple[int, int, int] = (24, 20, 20),
    ):
        self.vision_config = vision_config
        self.text_config = text_config
        self.variables = variables  # {"vision": {...}, "text": {...}}
        self.image_token_id = image_token_id
        self.mrope_section = mrope_section
        self.vision = Qwen3VLVisionTower(vision_config)
        self.text = Qwen3Model(text_config)

    def encode_vision(self, patches, grid_thw):
        return self.vision.apply(
            {"params": self.variables["vision"]}, jnp.asarray(patches),
            tuple(int(x) for x in grid_thw),
        )

    def forward(
        self,
        input_ids: np.ndarray,          # [B, S] with image tokens inline
        patches: Optional[np.ndarray] = None,
        grid_thw: Optional[tuple[int, int, int]] = None,
        position_ids: Optional[np.ndarray] = None,  # [3, B, S] override
    ) -> jax.Array:
        """Teacher-forced logits [B, S, vocab] with visual splicing."""
        ids = jnp.asarray(input_ids, jnp.int32)
        embeds = self.text.apply(
            {"params": self.variables["text"]}, ids,
            method=Qwen3Model.embed_only,
        )
        deepstack_dense = None
        if patches is not None:
            visual, deepstack = self.encode_vision(patches, grid_thw)
            mask = ids == self.image_token_id          # [B, S]
            batch, seq = ids.shape
            # scatter merged embeds into the image-token slots (each row is
            # assumed to contain the full image span)
            flat_mask = mask.reshape(-1)
            order = jnp.cumsum(flat_mask) - 1           # index into visual
            take = jnp.clip(order, 0, visual.shape[0] - 1)
            spliced = jnp.where(
                flat_mask[:, None],
                visual[take].astype(embeds.dtype),
                embeds.reshape(batch * seq, -1),
            )
            embeds = spliced.reshape(batch, seq, -1)
            deepstack_dense = jnp.stack([
                jnp.where(
                    flat_mask[:, None],
                    ds[take].astype(embeds.dtype),
                    jnp.zeros_like(embeds.reshape(batch * seq, -1)),
                ).reshape(batch, seq, -1)
                for ds in deepstack
            ])
        if position_ids is None:
            position_ids = vl_position_ids(
                np.asarray(input_ids), grid_thw or (1, 2, 2),
                self.image_token_id,
                self.vision_config.spatial_merge_size,
            )
        cos, sin = mrope_cos_sin(
            jnp.asarray(position_ids), self.text_config.head_dim,
            self.text_config.rope_theta, self.mrope_section,
        )
        logits, _ = self.text.apply(
            {"params": self.variables["text"]},
            inputs_embeds=embeds,
            rope_cos_sin=(cos, sin),
            deepstack_embeds=deepstack_dense,
        )
        return logits


    # ------------------------------------------------------------ generate

    def generate(
        self,
        input_ids: np.ndarray,            # [1, S]
        patches: Optional[np.ndarray] = None,
        grid_thw: Optional[tuple[int, int, int]] = None,
        max_new_tokens: int = 64,
        temperature: float = 0.0,
        top_p: float = 0.8,
        top_k: int = 20,
        eos_token_id: int = 151645,
        rng: Optional[jax.Array] = None,
    ) -> list[int]:
        """Greedy/sampled generation with visual prefill.

        The prefill runs with full mrope tables; decode continues at
        ``max(position_ids) + 1`` where the T/H/W triples coincide, so the
        standard 1-D rope path is exact for the generated text.
        """
        from gvl_tpu.models.qwen3 import KVCache, sample_logits

        rng = rng if rng is not None else jax.random.PRNGKey(0)
        ids = np.asarray(input_ids, np.int32)
        batch, seq = ids.shape
        assert batch == 1, "VL generate currently supports batch=1"

        # prompt-side tensors (visual splice + mrope)
        grid = grid_thw or (1, 2, 2)
        position_ids = vl_position_ids(
            ids, grid, self.image_token_id,
            self.vision_config.spatial_merge_size,
        )
        next_pos = int(position_ids.max()) + 1

        cache = KVCache.zeros(self.text_config, batch=1, dtype=jnp.float32)
        embeds = self.text.apply(
            {"params": self.variables["text"]}, jnp.asarray(ids),
            method=Qwen3Model.embed_only,
        )
        deepstack_dense = None
        if patches is not None:
            visual, deepstack = self.encode_vision(patches, grid)
            mask = (jnp.asarray(ids) == self.image_token_id).reshape(-1)
            order = jnp.clip(jnp.cumsum(mask) - 1, 0, visual.shape[0] - 1)
            flat = embeds.reshape(-1, embeds.shape[-1])
            embeds = jnp.where(
                mask[:, None], visual[order].astype(flat.dtype), flat
            ).reshape(embeds.shape)
            deepstack_dense = jnp.stack([
                jnp.where(mask[:, None], ds[order].astype(flat.dtype),
                          jnp.zeros_like(flat)).reshape(embeds.shape)
                for ds in deepstack
            ])
        cos, sin = mrope_cos_sin(
            jnp.asarray(position_ids), self.text_config.head_dim,
            self.text_config.rope_theta, self.mrope_section,
        )
        logits, cache = self.text.apply(
            {"params": self.variables["text"]},
            inputs_embeds=embeds, rope_cos_sin=(cos, sin), cache=cache,
            deepstack_embeds=deepstack_dense,
        )
        rng, sub = jax.random.split(rng)
        token = sample_logits(logits[:, -1], sub, temperature, top_p, top_k)

        @jax.jit
        def step(variables, token, cache, pos, rng):
            logits, cache = self.text.apply(
                variables, token[:, None], positions=pos[None], cache=cache
            )
            nxt = sample_logits(logits[:, -1], rng, temperature, top_p, top_k)
            return nxt, cache

        out: list[int] = []
        for i in range(max_new_tokens):
            tok = int(token[0])
            if tok == eos_token_id:
                break
            out.append(tok)
            rng, sub = jax.random.split(rng)
            token, cache = step(
                {"params": self.variables["text"]}, token, cache,
                jnp.int32(next_pos + i), sub,
            )
        return out


# --------------------------------------------------------------- converter

def _t(x) -> np.ndarray:
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)


def convert_hf_qwen3vl_vision(
    state_dict: dict[str, Any], config: Qwen3VLVisionConfig
) -> dict:
    """Map HF ``Qwen3VLVisionModel`` weights onto the Flax tower."""
    sd = state_dict
    conv = _t(sd["patch_embed.proj.weight"])  # [D, C, tp, ps, ps]
    params: dict[str, Any] = {
        "patch_proj": {
            "kernel": conv.reshape(conv.shape[0], -1).T,
            "bias": _t(sd["patch_embed.proj.bias"]),
        },
        "pos_embed": _t(sd["pos_embed.weight"]),
    }
    lin = lambda name: {"kernel": _t(sd[name + ".weight"]).T,
                        "bias": _t(sd[name + ".bias"])}
    ln = lambda name: {"scale": _t(sd[name + ".weight"]),
                       "bias": _t(sd[name + ".bias"])}
    for i in range(config.depth):
        pre = f"blocks.{i}."
        params[f"blocks_{i}"] = {
            "norm1": ln(pre + "norm1"),
            "qkv": lin(pre + "attn.qkv"),
            "proj": lin(pre + "attn.proj"),
            "norm2": ln(pre + "norm2"),
            "fc1": lin(pre + "mlp.linear_fc1"),
            "fc2": lin(pre + "mlp.linear_fc2"),
        }

    def merger(prefix):
        return {
            "norm": ln(prefix + ".norm"),
            "fc1": lin(prefix + ".linear_fc1"),
            "fc2": lin(prefix + ".linear_fc2"),
        }

    params["merger"] = merger("merger")
    for j in range(len(config.deepstack_visual_indexes)):
        params[f"deepstack_{j}"] = merger(f"deepstack_merger_list.{j}")
    return jax.tree.map(jnp.asarray, params)


def convert_hf_qwen3vl(model) -> tuple[Qwen3VLVisionConfig, Qwen3Config, dict]:
    """Split a HF ``Qwen3VLForConditionalGeneration`` into (configs, params)."""
    hf_vision = model.config.vision_config
    hf_text = model.config.text_config
    vision_config = Qwen3VLVisionConfig(
        hidden_size=hf_vision.hidden_size,
        depth=hf_vision.depth,
        num_heads=hf_vision.num_heads,
        patch_size=hf_vision.patch_size,
        temporal_patch_size=hf_vision.temporal_patch_size,
        spatial_merge_size=hf_vision.spatial_merge_size,
        intermediate_size=hf_vision.intermediate_size,
        out_hidden_size=hf_vision.out_hidden_size,
        num_position_embeddings=hf_vision.num_position_embeddings,
        deepstack_visual_indexes=tuple(hf_vision.deepstack_visual_indexes),
    )
    text_config = Qwen3Config(
        hidden_size=hf_text.hidden_size,
        num_layers=hf_text.num_hidden_layers,
        num_heads=hf_text.num_attention_heads,
        num_kv_heads=hf_text.num_key_value_heads,
        head_dim=hf_text.head_dim,
        intermediate_size=hf_text.intermediate_size,
        vocab_size=hf_text.vocab_size,
        rope_theta=hf_text.rope_theta,
        rms_norm_eps=hf_text.rms_norm_eps,
        tie_word_embeddings=hf_text.tie_word_embeddings,
    )
    sd = model.state_dict()
    vision_sd = {k.removeprefix("model.visual."): v
                 for k, v in sd.items() if k.startswith("model.visual.")}
    text_sd = {k.replace("model.language_model.", "model."): v
               for k, v in sd.items()
               if k.startswith("model.language_model.")}
    for key in ("lm_head.weight",):
        if key in sd:
            text_sd[key] = sd[key]
    vision_params = convert_hf_qwen3vl_vision(vision_sd, vision_config)
    text_params = convert_hf_qwen3(text_sd, text_config)
    return vision_config, text_config, {
        "vision": vision_params, "text": {"params": text_params}["params"],
    }
