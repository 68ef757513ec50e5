"""VideoMAE temporal encoder in Flax, TPU-first.

16-frame clips → 768-dim temporal embeddings (the reference's supported
temporal path, `/root/reference/scripts/extract_features.py:335-403`; the
clip embedding is the mean over tokens).  The 3-D tubelet conv collapses
to a reshape+matmul on the MXU; position encodings are the fixed
sinusoidal table; attention layers are BEiT-style (q/v bias only, no k
bias).  Includes a converter from HF ``VideoMAEModel`` state dicts.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from gvl_tpu.ops.attention import dot_product_attention

_gelu = partial(nn.gelu, approximate=False)


@dataclass(frozen=True)
class VideoMAEConfig:
    """Defaults: MCG-NJU/videomae-base."""

    hidden_size: int = 768
    intermediate_size: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    image_size: int = 224
    patch_size: int = 16
    num_frames: int = 16
    tubelet_size: int = 2
    layer_norm_eps: float = 1e-12

    @property
    def tokens_per_clip(self) -> int:
        spatial = (self.image_size // self.patch_size) ** 2
        return spatial * (self.num_frames // self.tubelet_size)

    @classmethod
    def base(cls) -> "VideoMAEConfig":
        return cls()

    @classmethod
    def tiny(cls) -> "VideoMAEConfig":
        return cls(hidden_size=32, intermediate_size=64, num_layers=1,
                   num_heads=2, image_size=32, patch_size=16, num_frames=4,
                   tubelet_size=2)


def sinusoid_table(n_position: int, dim: int) -> np.ndarray:
    """HF VideoMAE fixed sinusoidal position table [n_position, dim]."""
    pos = np.arange(n_position)[:, None]
    i = np.arange(dim)[None, :]
    angle = pos / np.power(10000.0, 2 * (i // 2) / dim)
    table = np.zeros((n_position, dim), dtype=np.float32)
    table[:, 0::2] = np.sin(angle[:, 0::2])
    table[:, 1::2] = np.cos(angle[:, 1::2])
    return table


class TubeletEmbed(nn.Module):
    """3-D tubelet patchify as one matmul.

    Input [B, T, H, W, 3] channels-last; each (t, p, p) tubelet flattens in
    (C, t, ph, pw) order to match the torch Conv3d im2col layout.
    """

    config: VideoMAEConfig

    @nn.compact
    def __call__(self, video: jax.Array) -> jax.Array:
        cfg = self.config
        b, t, h, w, c = video.shape
        ts, p = cfg.tubelet_size, cfg.patch_size
        nt, nh, nw = t // ts, h // p, w // p
        x = video.reshape(b, nt, ts, nh, p, nw, p, c)
        # -> [B, nt, nh, nw, C, ts, p, p]
        x = x.transpose(0, 1, 3, 5, 7, 2, 4, 6)
        x = x.reshape(b, nt * nh * nw, c * ts * p * p)
        return nn.Dense(cfg.hidden_size, name="proj")(x)


class VideoMAELayer(nn.Module):
    """Pre-LN block with BEiT-style attention biases (q and v only)."""

    config: VideoMAEConfig

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.config
        d = cfg.hidden_size
        n_heads = cfg.num_heads
        d_head = d // n_heads
        batch, seq, _ = x.shape

        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="norm_before")(x)
        q = nn.Dense(d, use_bias=True, name="q_proj")(h)
        k = nn.Dense(d, use_bias=False, name="k_proj")(h)
        v = nn.Dense(d, use_bias=True, name="v_proj")(h)

        def split(t):
            return t.reshape(batch, seq, n_heads, d_head).swapaxes(1, 2)

        attn = dot_product_attention(split(q), split(k), split(v))
        attn = attn.swapaxes(1, 2).reshape(batch, seq, d)
        x = x + nn.Dense(d, name="o_proj")(attn)

        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="norm_after")(x)
        h = nn.Dense(cfg.intermediate_size, name="fc1")(h)
        h = _gelu(h)
        return x + nn.Dense(d, name="fc2")(h)


class VideoMAEEncoder(nn.Module):
    """Tubelet embed + sinusoidal positions + transformer stack."""

    config: VideoMAEConfig

    @nn.compact
    def __call__(self, video: jax.Array) -> dict[str, jax.Array]:
        cfg = self.config
        x = TubeletEmbed(cfg, name="patch_embed")(video)
        pos = jnp.asarray(sinusoid_table(x.shape[1], cfg.hidden_size))
        x = x + pos[None].astype(x.dtype)
        for i in range(cfg.num_layers):
            x = VideoMAELayer(cfg, name=f"layers_{i}")(x)
        return {
            "last_hidden_state": x,
            # the framework's clip embedding (reference mean-pools)
            "clip_embedding": x.mean(axis=1),
        }


def _t(x) -> np.ndarray:
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)


def convert_hf_videomae(
    state_dict: dict[str, Any], config: VideoMAEConfig
) -> dict:
    """Map a HF ``VideoMAEModel`` state dict onto :class:`VideoMAEEncoder`."""
    sd = state_dict
    d = config.hidden_size
    conv_w = _t(sd["embeddings.patch_embeddings.projection.weight"])
    # [D, C, t, kh, kw] -> [C*t*kh*kw, D] with (C, t, kh, kw) flatten order
    kernel = conv_w.reshape(d, -1).T
    params: dict[str, Any] = {
        "patch_embed": {
            "proj": {
                "kernel": kernel,
                "bias": _t(sd["embeddings.patch_embeddings.projection.bias"]),
            }
        }
    }
    for i in range(config.num_layers):
        pre = f"encoder.layer.{i}."
        lin = lambda name: _t(sd[pre + name + ".weight"]).T
        ln = lambda name: {
            "scale": _t(sd[pre + name + ".weight"]),
            "bias": _t(sd[pre + name + ".bias"]),
        }
        params[f"layers_{i}"] = {
            "norm_before": ln("layernorm_before"),
            "q_proj": {
                "kernel": lin("attention.attention.query"),
                "bias": _t(sd[pre + "attention.attention.q_bias"]),
            },
            "k_proj": {"kernel": lin("attention.attention.key")},
            "v_proj": {
                "kernel": lin("attention.attention.value"),
                "bias": _t(sd[pre + "attention.attention.v_bias"]),
            },
            "o_proj": {
                "kernel": lin("attention.output.dense"),
                "bias": _t(sd[pre + "attention.output.dense.bias"]),
            },
            "norm_after": ln("layernorm_after"),
            "fc1": {
                "kernel": lin("intermediate.dense"),
                "bias": _t(sd[pre + "intermediate.dense.bias"]),
            },
            "fc2": {
                "kernel": lin("output.dense"),
                "bias": _t(sd[pre + "output.dense.bias"]),
            },
        }
    return jax.tree.map(jnp.asarray, params)


def load_hf_videomae(
    model_name_or_path: str, config: Optional[VideoMAEConfig] = None
) -> tuple[VideoMAEEncoder, dict]:
    from transformers import VideoMAEModel

    model = VideoMAEModel.from_pretrained(model_name_or_path)
    hf = model.config
    config = config or VideoMAEConfig(
        hidden_size=hf.hidden_size,
        intermediate_size=hf.intermediate_size,
        num_layers=hf.num_hidden_layers,
        num_heads=hf.num_attention_heads,
        image_size=hf.image_size,
        patch_size=hf.patch_size,
        num_frames=hf.num_frames,
        tubelet_size=hf.tubelet_size,
    )
    params = convert_hf_videomae(model.state_dict(), config)
    return VideoMAEEncoder(config), {"params": params}
