"""SigLIP2-class vision tower in Flax, TPU-first.

Replaces the reference's torch SigLIP wrapper
(`/root/reference/src/perception/siglip_semantic_encoder.py:166-289`) with
a batched XLA program: patchify is a reshape+matmul (stride == kernel, so
the conv collapses onto the MXU), attention goes through the framework
flash kernel, and all shapes are static per resolution bucket.

Includes a converter from HuggingFace ``SiglipVisionModel`` state dicts
(so400m-patch14-384: width 1152, 27 layers, 16 heads, MLP 4304) and the
attention-pooling MAP head whose output is ``get_image_features`` parity.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from functools import partial
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from gvl_tpu.nn.layers import TransformerBlock
from gvl_tpu.ops.attention import dot_product_attention

# SigLIP uses the tanh-approximated GELU ("gelu_pytorch_tanh")
_gelu_tanh = partial(nn.gelu, approximate=True)


@dataclass(frozen=True)
class SigLIPVisionConfig:
    """Vision-tower hyperparameters (defaults: so400m-patch14-384)."""

    hidden_size: int = 1152
    intermediate_size: int = 4304
    num_layers: int = 27
    num_heads: int = 16
    patch_size: int = 14
    image_size: int = 384
    layer_norm_eps: float = 1e-6
    # W8A8 encoder blocks on the int8 MXU path (~2x bf16 FLOP rate on
    # v5e); patch embed / MAP head stay bf16.  Build params with
    # quantize_siglip_int8.
    quant_int8: bool = False
    # static calibrated activation scales (vs dynamic per-row): removes
    # the VPU-bound amax reduction from the hot path; calibrate with
    # calibrate_siglip_int8
    quant_static_act: bool = False

    @property
    def patches_per_side(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.patches_per_side ** 2

    @classmethod
    def so400m(cls) -> "SigLIPVisionConfig":
        return cls()

    @classmethod
    def tiny(cls, image_size: int = 56) -> "SigLIPVisionConfig":
        """Small config for tests / HF cross-checks."""
        return cls(hidden_size=64, intermediate_size=128, num_layers=2,
                   num_heads=4, image_size=image_size)


class PatchEmbed(nn.Module):
    """Non-overlapping patchify + linear embed as one MXU matmul.

    Input is channels-last [B, H, W, 3]; each PxP patch is flattened in
    (row, col, channel) order to match the HF conv-kernel layout after
    transposition.
    """

    config: SigLIPVisionConfig

    @nn.compact
    def __call__(self, pixels: jax.Array) -> jax.Array:
        cfg = self.config
        b, h, w, c = pixels.shape
        p = cfg.patch_size
        nh, nw = h // p, w // p
        # a strided conv drops trailing pixels when the size is not a patch
        # multiple (384 = 27*14 + 6 in so400m) — crop to match
        pixels = pixels[:, : nh * p, : nw * p]
        x = pixels.reshape(b, nh, p, nw, p, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, nh * nw, p * p * c)
        return nn.Dense(cfg.hidden_size, name="proj")(x)


class MAPHead(nn.Module):
    """Attention-pooling head: learned probe cross-attends the sequence."""

    config: SigLIPVisionConfig

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.config
        d = cfg.hidden_size
        batch = x.shape[0]
        probe = self.param(
            "probe", nn.initializers.normal(1.0), (1, 1, d)
        )
        probe = jnp.broadcast_to(probe, (batch, 1, d)).astype(x.dtype)

        dense = lambda name: nn.Dense(d, name=name)
        q = dense("q_proj")(probe)
        k = dense("k_proj")(x)
        v = dense("v_proj")(x)

        def split(t):
            return t.reshape(batch, -1, cfg.num_heads, d // cfg.num_heads)

        attn = dot_product_attention(
            split(q).swapaxes(1, 2), split(k).swapaxes(1, 2),
            split(v).swapaxes(1, 2),
        ).swapaxes(1, 2).reshape(batch, 1, d)
        hidden = dense("o_proj")(attn)

        residual = hidden
        hidden = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="norm")(hidden)
        h = nn.Dense(cfg.intermediate_size, name="fc1")(hidden)
        h = _gelu_tanh(h)
        h = nn.Dense(d, name="fc2")(h)
        return (residual + h)[:, 0]


class SigLIPVisionTower(nn.Module):
    """Embeddings → encoder → post-norm (+ optional MAP-head pooling)."""

    config: SigLIPVisionConfig

    @nn.compact
    def __call__(
        self, pixels: jax.Array, *, pool: bool = True
    ) -> dict[str, jax.Array]:
        cfg = self.config
        x = PatchEmbed(cfg, name="patch_embed")(pixels)
        num_patches = x.shape[1]
        pos = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (cfg.num_patches, cfg.hidden_size),
        )
        if num_patches != cfg.num_patches:
            # non-square / off-size bucket: bilinear-resize the learned grid
            side = cfg.patches_per_side
            hw = int(round((pixels.shape[1] // cfg.patch_size)))
            ww = int(round((pixels.shape[2] // cfg.patch_size)))
            grid = pos.reshape(side, side, cfg.hidden_size)
            grid = jax.image.resize(
                grid, (hw, ww, cfg.hidden_size), method="bilinear"
            )
            pos = grid.reshape(hw * ww, cfg.hidden_size)
        x = x + pos[None].astype(x.dtype)

        for i in range(cfg.num_layers):
            x = TransformerBlock(
                num_heads=cfg.num_heads,
                intermediate_dim=cfg.intermediate_size,
                norm="layernorm",
                mlp="gelu",
                norm_eps=cfg.layer_norm_eps,
                quant=cfg.quant_int8,
                quant_static=cfg.quant_static_act,
                name=f"layers_{i}",
            )(x)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="post_norm")(x)

        out = {"last_hidden_state": x}
        if pool:
            out["pooled"] = MAPHead(cfg, name="head")(x)
        return out


def calibrate_siglip_int8(config: "SigLIPVisionConfig", qparams: dict,
                          sample_pixels) -> dict:
    """Run the DYNAMIC W8A8 tower over calibration pixels, collect each
    quantized dense's observed activation amax, and bake static
    ``act_scale`` params — returns params for a tower built with
    ``quant_static_act=True``."""
    from dataclasses import replace as _replace

    from gvl_tpu.nn.quant import bake_act_scales

    dyn_tower = SigLIPVisionTower(_replace(config, quant_int8=True,
                                           quant_static_act=False))
    _, mutated = dyn_tower.apply(
        {"params": qparams}, sample_pixels, pool=True,
        mutable=["calibration"])
    return bake_act_scales(qparams, mutated["calibration"])


def quantize_siglip_int8(params: dict) -> dict:
    """bf16/f32 vision-tower params → W8A8 params for a tower built with
    ``SigLIPVisionConfig(quant_int8=True)``.

    Only the encoder blocks (``layers_*``) are quantized — patch embed
    and the MAP head stay bf16 (negligible FLOPs, and the head feeds
    the contrastive space where full precision is cheapest insurance).
    """
    from gvl_tpu.nn.quant import quantize_kernels_int8

    out = dict(params)
    for k in list(out):
        if k.startswith("layers_"):
            out[k] = quantize_kernels_int8(out[k])
    return out


# --------------------------------------------------------------------------
# HuggingFace weight conversion
# --------------------------------------------------------------------------

def _t(x) -> np.ndarray:
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)


def convert_hf_siglip_vision(
    state_dict: dict[str, Any], config: SigLIPVisionConfig
) -> dict:
    """Map a ``SiglipVisionModel`` state dict onto :class:`SigLIPVisionTower`.

    Handles the MLP-gelu naming gap (TransformerBlock uses a generic
    fc1/fc2 MLP and auto-named LayerNorms) and splits the MAP head's fused
    ``in_proj`` into q/k/v.
    """
    sd = {k.removeprefix("vision_model."): v for k, v in state_dict.items()}
    d = config.hidden_size
    params: dict[str, Any] = {}

    # patch embedding: conv [D, C, kh, kw] -> dense [kh*kw*C, D]
    conv_w = _t(sd["embeddings.patch_embedding.weight"])
    kernel = conv_w.transpose(2, 3, 1, 0).reshape(-1, d)
    params["patch_embed"] = {
        "proj": {
            "kernel": kernel,
            "bias": _t(sd["embeddings.patch_embedding.bias"]),
        }
    }
    params["pos_embed"] = _t(sd["embeddings.position_embedding.weight"])

    for i in range(config.num_layers):
        pre = f"encoder.layers.{i}."
        lin = lambda name: {
            "kernel": _t(sd[pre + name + ".weight"]).T,
            "bias": _t(sd[pre + name + ".bias"]),
        }
        ln = lambda name: {
            "scale": _t(sd[pre + name + ".weight"]),
            "bias": _t(sd[pre + name + ".bias"]),
        }
        params[f"layers_{i}"] = {
            "LayerNorm_0": ln("layer_norm1"),
            "attention": {
                "q_proj": lin("self_attn.q_proj"),
                "k_proj": lin("self_attn.k_proj"),
                "v_proj": lin("self_attn.v_proj"),
                "o_proj": lin("self_attn.out_proj"),
            },
            "LayerNorm_1": ln("layer_norm2"),
            "mlp": {"fc1": lin("mlp.fc1"), "fc2": lin("mlp.fc2")},
        }

    params["post_norm"] = {
        "scale": _t(sd["post_layernorm.weight"]),
        "bias": _t(sd["post_layernorm.bias"]),
    }

    if "head.probe" in sd:
        in_w = _t(sd["head.attention.in_proj_weight"])  # [3D, D]
        in_b = _t(sd["head.attention.in_proj_bias"])
        params["head"] = {
            "probe": _t(sd["head.probe"])[0],  # [1, D] stored as (1,1,D) param
            "q_proj": {"kernel": in_w[:d].T, "bias": in_b[:d]},
            "k_proj": {"kernel": in_w[d:2 * d].T, "bias": in_b[d:2 * d]},
            "v_proj": {"kernel": in_w[2 * d:].T, "bias": in_b[2 * d:]},
            "o_proj": {
                "kernel": _t(sd["head.attention.out_proj.weight"]).T,
                "bias": _t(sd["head.attention.out_proj.bias"]),
            },
            "norm": {
                "scale": _t(sd["head.layernorm.weight"]),
                "bias": _t(sd["head.layernorm.bias"]),
            },
            "fc1": {
                "kernel": _t(sd["head.mlp.fc1.weight"]).T,
                "bias": _t(sd["head.mlp.fc1.bias"]),
            },
            "fc2": {
                "kernel": _t(sd["head.mlp.fc2.weight"]).T,
                "bias": _t(sd["head.mlp.fc2.bias"]),
            },
        }
        params["head"]["probe"] = _t(sd["head.probe"]).reshape(1, 1, d)

    return jax.tree.map(jnp.asarray, params)


def load_hf_siglip(
    model_name_or_path: str, config: Optional[SigLIPVisionConfig] = None
) -> tuple[SigLIPVisionTower, dict]:
    """Load a HF checkpoint from a local path into the Flax tower."""
    from transformers import SiglipVisionModel

    model = SiglipVisionModel.from_pretrained(model_name_or_path)
    hf_cfg = model.config
    config = config or SigLIPVisionConfig(
        hidden_size=hf_cfg.hidden_size,
        intermediate_size=hf_cfg.intermediate_size,
        num_layers=hf_cfg.num_hidden_layers,
        num_heads=hf_cfg.num_attention_heads,
        patch_size=hf_cfg.patch_size,
        image_size=hf_cfg.image_size,
    )
    params = convert_hf_siglip_vision(model.state_dict(), config)
    return SigLIPVisionTower(config), {"params": params}


# --------------------------------------------------------------------------
# Text tower
# --------------------------------------------------------------------------

@dataclass(frozen=True)
class SigLIPTextConfig:
    """Text-tower hyperparameters (defaults: so400m's text side)."""

    hidden_size: int = 1152
    intermediate_size: int = 4304
    num_layers: int = 27
    num_heads: int = 16
    vocab_size: int = 32000
    max_position: int = 64
    projection_size: int = 1152
    layer_norm_eps: float = 1e-6

    @classmethod
    def tiny(cls, **kw) -> "SigLIPTextConfig":
        base = dict(hidden_size=32, intermediate_size=64, num_layers=2,
                    num_heads=2, vocab_size=256, max_position=16,
                    projection_size=32)
        base.update(kw)
        return cls(**base)


class SigLIPTextTower(nn.Module):
    """SigLIP text encoder: no causal mask, no attention mask (the
    SigLIP tokenizer pads to max_position and the model attends pads),
    pooled output = LAST position through the projection head — exact
    ``SiglipTextModel`` semantics.  Together with the vision tower this
    gives real open-vocabulary region scoring (cosine over the shared
    embedding space), the text side the reference gets from SAM3."""

    config: SigLIPTextConfig

    @nn.compact
    def __call__(self, input_ids: jax.Array) -> dict[str, jax.Array]:
        cfg = self.config
        x = nn.Embed(cfg.vocab_size, cfg.hidden_size,
                     name="token_embed")(input_ids)
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02),
            (cfg.max_position, cfg.hidden_size))
        x = x + pos[None, : x.shape[1]].astype(x.dtype)
        for i in range(cfg.num_layers):
            x = TransformerBlock(
                num_heads=cfg.num_heads,
                intermediate_dim=cfg.intermediate_size,
                norm="layernorm",
                mlp="gelu",
                norm_eps=cfg.layer_norm_eps,
                name=f"layers_{i}",
            )(x)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="final_norm")(x)
        pooled = nn.Dense(cfg.projection_size, name="head")(x[:, -1])
        return {"last_hidden_state": x, "pooled": pooled}


def convert_hf_siglip_text(
    state_dict: dict[str, Any], config: SigLIPTextConfig
) -> dict:
    """Map a ``SiglipTextModel`` state dict onto :class:`SigLIPTextTower`."""
    sd = {k.removeprefix("text_model."): v for k, v in state_dict.items()}
    params: dict[str, Any] = {
        "token_embed": {
            "embedding": _t(sd["embeddings.token_embedding.weight"])},
        "pos_embed": _t(sd["embeddings.position_embedding.weight"]),
        "final_norm": {
            "scale": _t(sd["final_layer_norm.weight"]),
            "bias": _t(sd["final_layer_norm.bias"]),
        },
        "head": {
            "kernel": _t(sd["head.weight"]).T,
            "bias": _t(sd["head.bias"]),
        },
    }
    for i in range(config.num_layers):
        pre = f"encoder.layers.{i}."
        lin = lambda name: {
            "kernel": _t(sd[pre + name + ".weight"]).T,
            "bias": _t(sd[pre + name + ".bias"]),
        }
        ln = lambda name: {
            "scale": _t(sd[pre + name + ".weight"]),
            "bias": _t(sd[pre + name + ".bias"]),
        }
        params[f"layers_{i}"] = {
            "LayerNorm_0": ln("layer_norm1"),
            "attention": {
                "q_proj": lin("self_attn.q_proj"),
                "k_proj": lin("self_attn.k_proj"),
                "v_proj": lin("self_attn.v_proj"),
                "o_proj": lin("self_attn.out_proj"),
            },
            "LayerNorm_1": ln("layer_norm2"),
            "mlp": {"fc1": lin("mlp.fc1"), "fc2": lin("mlp.fc2")},
        }
    return jax.tree.map(jnp.asarray, params)


def load_hf_siglip_text(
    model_name_or_path: str, config: Optional[SigLIPTextConfig] = None
) -> tuple[SigLIPTextTower, dict]:
    """Load a HF text checkpoint from a local path into the Flax tower."""
    from transformers import SiglipTextModel

    model = SiglipTextModel.from_pretrained(model_name_or_path)
    hf_cfg = model.config
    config = config or SigLIPTextConfig(
        hidden_size=hf_cfg.hidden_size,
        intermediate_size=hf_cfg.intermediate_size,
        num_layers=hf_cfg.num_hidden_layers,
        num_heads=hf_cfg.num_attention_heads,
        vocab_size=hf_cfg.vocab_size,
        max_position=hf_cfg.max_position_embeddings,
        projection_size=getattr(hf_cfg, "projection_size",
                                hf_cfg.hidden_size),
    )
    params = convert_hf_siglip_text(model.state_dict(), config)
    return SigLIPTextTower(config), {"params": params}
