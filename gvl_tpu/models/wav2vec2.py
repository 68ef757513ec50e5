"""Wav2Vec2 audio encoder in Flax, TPU-first.

Raw 16 kHz waveform → 1024-dim frame embeddings (~49 Hz).  The conv
feature extractor runs as XLA 1-D convolutions on the MXU; the relative
positional convolution resolves torch's weight-norm parametrization at
conversion time.  Both HF layouts are supported: group-norm +
post-norm ("base"-style) and layer-norm + pre-norm ("stable", lv60-style).
Replaces the reference's torch path
(`/root/reference/scripts/realtime_inference.py:384-441`).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from gvl_tpu.ops.attention import dot_product_attention

_gelu = partial(nn.gelu, approximate=False)


@dataclass(frozen=True)
class Wav2Vec2Config:
    """Defaults: facebook/wav2vec2-large (stable layer-norm variant)."""

    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_layers: int = 24
    num_heads: int = 16
    conv_dim: tuple[int, ...] = (512,) * 7
    conv_kernel: tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    conv_bias: bool = True
    feat_extract_norm: str = "layer"      # "layer" | "group"
    do_stable_layer_norm: bool = True
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    layer_norm_eps: float = 1e-5

    @classmethod
    def large(cls) -> "Wav2Vec2Config":
        return cls()

    @classmethod
    def tiny(cls, stable: bool = True) -> "Wav2Vec2Config":
        return cls(hidden_size=32, intermediate_size=64, num_layers=1,
                   num_heads=2, conv_dim=(16, 16), conv_kernel=(10, 3),
                   conv_stride=(5, 2), conv_bias=False,
                   feat_extract_norm="layer" if stable else "group",
                   do_stable_layer_norm=stable,
                   num_conv_pos_embeddings=16,
                   num_conv_pos_embedding_groups=4)

    def frames_for_samples(self, n: int) -> int:
        for k, s in zip(self.conv_kernel, self.conv_stride):
            n = (n - k) // s + 1
        return n


def _conv1d(x, kernel, stride, groups=1, bias=None, padding="VALID"):
    """[B, T, C] x [k, Cin/groups, Cout] valid conv."""
    out = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(stride,), padding=padding,
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
    )
    return out if bias is None else out + bias


class FeatureExtractor(nn.Module):
    """Stack of strided 1-D convs turning waveform into ~49 Hz features."""

    config: Wav2Vec2Config

    @nn.compact
    def __call__(self, wav: jax.Array) -> jax.Array:
        cfg = self.config
        x = wav[..., None]  # [B, T, 1]
        in_dim = 1
        for i, (dim, k, s) in enumerate(
            zip(cfg.conv_dim, cfg.conv_kernel, cfg.conv_stride)
        ):
            kernel = self.param(
                f"conv_{i}/kernel", nn.initializers.he_normal(), (k, in_dim, dim)
            )
            bias = (
                self.param(f"conv_{i}/bias", nn.initializers.zeros, (dim,))
                if cfg.conv_bias else None
            )
            x = _conv1d(x, kernel.astype(x.dtype), s,
                        bias=None if bias is None else bias.astype(x.dtype))
            if cfg.feat_extract_norm == "group" and i == 0:
                x = nn.GroupNorm(num_groups=dim, epsilon=cfg.layer_norm_eps,
                                 name="group_norm")(x)
            elif cfg.feat_extract_norm == "layer":
                x = nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                                 name=f"conv_{i}/norm")(x)
            x = _gelu(x)
            in_dim = dim
        return x


class PositionalConvEmbed(nn.Module):
    """Grouped conv positional embedding (torch weight-norm pre-resolved)."""

    config: Wav2Vec2Config

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.config
        d = cfg.hidden_size
        k = cfg.num_conv_pos_embeddings
        groups = cfg.num_conv_pos_embedding_groups
        kernel = self.param(
            "kernel", nn.initializers.he_normal(), (k, d // groups, d)
        )
        bias = self.param("bias", nn.initializers.zeros, (d,))
        pad = k // 2
        out = jax.lax.conv_general_dilated(
            x, kernel.astype(x.dtype), window_strides=(1,),
            padding=[(pad, pad)],
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=groups,
        ) + bias.astype(x.dtype)
        if k % 2 == 0:  # torch removes one trailing frame for even kernels
            out = out[:, :-1]
        return _gelu(out)


class Wav2Vec2Layer(nn.Module):
    config: Wav2Vec2Config

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.config
        d = cfg.hidden_size
        batch, seq, _ = x.shape
        stable = cfg.do_stable_layer_norm

        def attend(h):
            def split(t):
                return t.reshape(batch, seq, cfg.num_heads, -1).swapaxes(1, 2)

            q = nn.Dense(d, name="q_proj")(h)
            k = nn.Dense(d, name="k_proj")(h)
            v = nn.Dense(d, name="v_proj")(h)
            a = dot_product_attention(split(q), split(k), split(v))
            return nn.Dense(d, name="o_proj")(
                a.swapaxes(1, 2).reshape(batch, seq, d)
            )

        def feed_forward(h):
            h = nn.Dense(cfg.intermediate_size, name="fc1")(h)
            h = _gelu(h)
            return nn.Dense(d, name="fc2")(h)

        ln_attn = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="attn_norm")
        ln_ff = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="ff_norm")

        if stable:  # pre-norm
            x = x + attend(ln_attn(x))
            x = x + feed_forward(ln_ff(x))
        else:  # post-norm
            x = ln_attn(x + attend(x))
            x = ln_ff(x + feed_forward(x))
        return x


class Wav2Vec2Encoder(nn.Module):
    """Full model: feature extractor → projection → transformer."""

    config: Wav2Vec2Config

    @nn.compact
    def __call__(self, wav: jax.Array) -> dict[str, jax.Array]:
        cfg = self.config
        feats = FeatureExtractor(cfg, name="feature_extractor")(wav)
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="proj_norm")(feats)
        h = nn.Dense(cfg.hidden_size, name="feature_projection")(h)
        h = h + PositionalConvEmbed(cfg, name="pos_conv")(h)
        if not cfg.do_stable_layer_norm:
            h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="encoder_norm")(h)
        for i in range(cfg.num_layers):
            h = Wav2Vec2Layer(cfg, name=f"layers_{i}")(h)
        if cfg.do_stable_layer_norm:
            h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="encoder_norm")(h)
        return {"last_hidden_state": h, "features": feats}


def _t(x) -> np.ndarray:
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)


def convert_hf_wav2vec2(state_dict: dict[str, Any], config: Wav2Vec2Config) -> dict:
    """Map a HF ``Wav2Vec2Model`` state dict onto :class:`Wav2Vec2Encoder`."""
    sd = state_dict
    params: dict[str, Any] = {}

    fe: dict[str, Any] = {}
    for i in range(len(config.conv_dim)):
        pre = f"feature_extractor.conv_layers.{i}."
        # torch conv1d [out, in, k] -> [k, in, out]
        fe[f"conv_{i}/kernel"] = _t(sd[pre + "conv.weight"]).transpose(2, 1, 0)
        if config.conv_bias:
            fe[f"conv_{i}/bias"] = _t(sd[pre + "conv.bias"])
        if config.feat_extract_norm == "layer":
            fe[f"conv_{i}/norm"] = {
                "scale": _t(sd[pre + "layer_norm.weight"]),
                "bias": _t(sd[pre + "layer_norm.bias"]),
            }
        elif i == 0:
            fe["group_norm"] = {
                "scale": _t(sd[pre + "layer_norm.weight"]),
                "bias": _t(sd[pre + "layer_norm.bias"]),
            }
    params["feature_extractor"] = fe

    params["proj_norm"] = {
        "scale": _t(sd["feature_projection.layer_norm.weight"]),
        "bias": _t(sd["feature_projection.layer_norm.bias"]),
    }
    params["feature_projection"] = {
        "kernel": _t(sd["feature_projection.projection.weight"]).T,
        "bias": _t(sd["feature_projection.projection.bias"]),
    }

    # resolve weight-norm: w[:, :, k] = g[0, 0, k] * v[:, :, k] / ||v[:, :, k]||
    g = _t(sd["encoder.pos_conv_embed.conv.parametrizations.weight.original0"])
    v = _t(sd["encoder.pos_conv_embed.conv.parametrizations.weight.original1"])
    norm = np.sqrt((v ** 2).sum(axis=(0, 1), keepdims=True))
    w = g * v / np.maximum(norm, 1e-12)           # [out, in/groups, k]
    params["pos_conv"] = {
        "kernel": w.transpose(2, 1, 0),            # -> [k, in/groups, out]
        "bias": _t(sd["encoder.pos_conv_embed.conv.bias"]),
    }
    params["encoder_norm"] = {
        "scale": _t(sd["encoder.layer_norm.weight"]),
        "bias": _t(sd["encoder.layer_norm.bias"]),
    }

    for i in range(config.num_layers):
        pre = f"encoder.layers.{i}."
        lin = lambda name: {
            "kernel": _t(sd[pre + name + ".weight"]).T,
            "bias": _t(sd[pre + name + ".bias"]),
        }
        params[f"layers_{i}"] = {
            "q_proj": lin("attention.q_proj"),
            "k_proj": lin("attention.k_proj"),
            "v_proj": lin("attention.v_proj"),
            "o_proj": lin("attention.out_proj"),
            "attn_norm": {
                "scale": _t(sd[pre + "layer_norm.weight"]),
                "bias": _t(sd[pre + "layer_norm.bias"]),
            },
            "fc1": lin("feed_forward.intermediate_dense"),
            "fc2": lin("feed_forward.output_dense"),
            "ff_norm": {
                "scale": _t(sd[pre + "final_layer_norm.weight"]),
                "bias": _t(sd[pre + "final_layer_norm.bias"]),
            },
        }
    return jax.tree.map(jnp.asarray, params)


def load_hf_wav2vec2(
    model_name_or_path: str, config: Optional[Wav2Vec2Config] = None
) -> tuple[Wav2Vec2Encoder, dict]:
    from transformers import Wav2Vec2Model

    model = Wav2Vec2Model.from_pretrained(model_name_or_path)
    hf = model.config
    config = config or Wav2Vec2Config(
        hidden_size=hf.hidden_size,
        intermediate_size=hf.intermediate_size,
        num_layers=hf.num_hidden_layers,
        num_heads=hf.num_attention_heads,
        conv_dim=tuple(hf.conv_dim),
        conv_kernel=tuple(hf.conv_kernel),
        conv_stride=tuple(hf.conv_stride),
        conv_bias=hf.conv_bias,
        feat_extract_norm=hf.feat_extract_norm,
        do_stable_layer_norm=hf.do_stable_layer_norm,
        num_conv_pos_embeddings=hf.num_conv_pos_embeddings,
        num_conv_pos_embedding_groups=hf.num_conv_pos_embedding_groups,
    )
    params = convert_hf_wav2vec2(model.state_dict(), config)
    return Wav2Vec2Encoder(config), {"params": params}
