"""Segment-Anything (SAM ViT) in JAX: converter + inference port.

The reference's segmentation rests on downloaded SAM3 weights
(`/root/reference/src/perception/sam_concept_segmenter.py:190-361`).
This ports the released SAM architecture (facebook/sam-vit-base/large/
huge — the same promptable-mask family) to JAX so real checkpoints run
TPU-native the moment they are available: ViT encoder with decomposed
relative-position window attention, random-Fourier positional prompts,
two-way mask-decoder transformer, hypernetwork mask heads and IoU
prediction.  Parity is tested against HF ``transformers.SamModel`` on
random-init models (no network in this environment); point/box prompts
are supported like the reference's `SAMConfig` point/box paths.

Implementation style: pure functions over a params dict produced by
:func:`convert_hf_sam` — conversion IS the init, which keeps the
layout definition in exactly one place.
"""

from __future__ import annotations

import logging
import math
from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


@dataclass(frozen=True)
class SamViTConfig:
    """Geometry (defaults: facebook/sam-vit-base)."""

    image_size: int = 1024
    patch_size: int = 16
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_dim: int = 3072
    output_channels: int = 256
    window_size: int = 14
    global_attn_indexes: tuple[int, ...] = (2, 5, 8, 11)
    layer_norm_eps: float = 1e-6
    # prompt encoder / mask decoder
    prompt_hidden: int = 256
    num_pos_feats: int = 128
    decoder_heads: int = 8
    decoder_layers: int = 2
    decoder_mlp_dim: int = 2048
    attention_downsample_rate: int = 2
    num_multimask_outputs: int = 3
    iou_head_hidden: int = 256
    iou_head_depth: int = 3

    @property
    def embed_side(self) -> int:
        return self.image_size // self.patch_size

    @classmethod
    def from_hf(cls, hf_config) -> "SamViTConfig":
        v, p, m = (hf_config.vision_config, hf_config.prompt_encoder_config,
                   hf_config.mask_decoder_config)
        return cls(
            image_size=v.image_size, patch_size=v.patch_size,
            hidden_size=v.hidden_size, num_layers=v.num_hidden_layers,
            num_heads=v.num_attention_heads, mlp_dim=v.mlp_dim,
            output_channels=v.output_channels, window_size=v.window_size,
            global_attn_indexes=tuple(v.global_attn_indexes),
            layer_norm_eps=v.layer_norm_eps,
            prompt_hidden=p.hidden_size, num_pos_feats=v.num_pos_feats,
            decoder_heads=m.num_attention_heads,
            decoder_layers=m.num_hidden_layers,
            decoder_mlp_dim=m.mlp_dim,
            attention_downsample_rate=m.attention_downsample_rate,
            num_multimask_outputs=m.num_multimask_outputs,
            iou_head_hidden=m.iou_head_hidden_dim,
            iou_head_depth=m.iou_head_depth,
        )


# --------------------------------------------------------------------------
# small functional pieces
# --------------------------------------------------------------------------

def _dense(p, x):
    out = x @ p["kernel"]
    return out + p["bias"] if "bias" in p else out


def _layer_norm(p, x, eps):
    mean = x.mean(-1, keepdims=True)
    var = ((x - mean) ** 2).mean(-1, keepdims=True)
    return (x - mean) / jnp.sqrt(var + eps) * p["scale"] + p["bias"]


def _conv(p, x, stride=1, padding="SAME"):
    # kernel [kh, kw, in, out], x [B, H, W, C]
    out = jax.lax.conv_general_dilated(
        x, p["kernel"], (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out + p["bias"] if "bias" in p else out


def _conv_transpose(p, x):
    """torch ConvTranspose2d(kernel=stride=2) exactly: with no overlap,
    out[2i+a, 2j+b, o] = Σ_c x[i,j,c]·w[c,o,a,b] — one matmul per pixel
    (kernel kept in the torch layout [in, out, kh, kw])."""
    w = p["kernel"]
    b, h, ww, _ = x.shape
    o = w.shape[1]
    y = jnp.einsum("nhwc,coab->nhawbo", x, w)   # [n, h, 2, w, 2, o]
    y = y.reshape(b, h * 2, ww * 2, o)
    return y + p["bias"] if "bias" in p else y


def _feed_forward(p, x, sigmoid_output=False):
    h = jax.nn.relu(_dense(p["proj_in"], x))
    for layer in p["layers"]:
        h = jax.nn.relu(_dense(layer, h))
    h = _dense(p["proj_out"], h)
    return jax.nn.sigmoid(h) if sigmoid_output else h


# --------------------------------------------------------------------------
# vision encoder
# --------------------------------------------------------------------------

def _get_rel_pos(q_size: int, k_size: int, rel_pos: jax.Array) -> jax.Array:
    max_rel_dist = 2 * max(q_size, k_size) - 1
    if rel_pos.shape[0] != max_rel_dist:
        rel_pos = jax.image.resize(
            rel_pos, (max_rel_dist, rel_pos.shape[1]), "linear")
    q_coords = np.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = np.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    rel = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel_pos[rel.astype(np.int64)]


def _vision_attention(p, x, num_heads: int, use_rel_pos: bool = True):
    """x [B, H, W, D] (windowed or global)."""
    b, h, w, d = x.shape
    hd = d // num_heads
    qkv = _dense(p["qkv"], x).reshape(b, h * w, 3, num_heads, hd)
    qkv = qkv.transpose(2, 0, 3, 1, 4).reshape(3, b * num_heads, h * w, hd)
    q, k, v = qkv[0], qkv[1], qkv[2]

    scores = (q * (hd ** -0.5)) @ k.swapaxes(-2, -1)
    if use_rel_pos:
        rh = _get_rel_pos(h, h, p["rel_pos_h"])
        rw = _get_rel_pos(w, w, p["rel_pos_w"])
        rq = q.reshape(b * num_heads, h, w, hd)
        rel_h = jnp.einsum("bhwc,hkc->bhwk", rq, rh)
        rel_w = jnp.einsum("bhwc,wkc->bhwk", rq, rw)
        scores = scores + (
            rel_h[:, :, :, :, None] + rel_w[:, :, :, None, :]
        ).reshape(scores.shape)
    probs = jax.nn.softmax(scores.astype(jnp.float32), -1).astype(q.dtype)
    out = (probs @ v).reshape(b, num_heads, h, w, hd)
    out = out.transpose(0, 2, 3, 1, 4).reshape(b, h, w, d)
    return _dense(p["proj"], out)


def _window_partition(x, window: int):
    b, h, w, c = x.shape
    pad_h = (window - h % window) % window
    pad_w = (window - w % window) % window
    x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    ph, pw = h + pad_h, w + pad_w
    x = x.reshape(b, ph // window, window, pw // window, window, c)
    return (x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window, window, c),
            (ph, pw))


def _window_unpartition(x, window: int, padded, original):
    ph, pw = padded
    h, w = original
    b = x.shape[0] // (ph * pw // window // window)
    x = x.reshape(b, ph // window, pw // window, window, window, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, ph, pw, -1)
    return x[:, :h, :w]


def vision_encoder(params, pixels: jax.Array, config: SamViTConfig):
    """pixels [B, H, W, 3] (preprocessed) → image embeddings
    [B, H/16, W/16, output_channels]."""
    x = _conv(params["patch_embed"], pixels,
              stride=config.patch_size, padding="VALID")
    if "pos_embed" in params:
        x = x + params["pos_embed"]
    for i in range(config.num_layers):
        p = params[f"layer_{i}"]
        window = 0 if i in config.global_attn_indexes else config.window_size
        residual = x
        h = _layer_norm(p["norm1"], x, config.layer_norm_eps)
        if window > 0:
            hh, ww = h.shape[1], h.shape[2]
            h, padded = _window_partition(h, window)
        h = _vision_attention(p["attn"], h, config.num_heads)
        if window > 0:
            h = _window_unpartition(h, window, padded, (hh, ww))
        x = residual + h
        n = _layer_norm(p["norm2"], x, config.layer_norm_eps)
        x = x + _dense(p["mlp"]["lin2"],
                       jax.nn.gelu(_dense(p["mlp"]["lin1"], n),
                                   approximate=False))
    neck = params["neck"]
    x = _conv(neck["conv1"], x)
    x = _layer_norm(neck["ln1"], x, 1e-6)
    x = _conv(neck["conv2"], x)
    x = _layer_norm(neck["ln2"], x, 1e-6)
    return x


# --------------------------------------------------------------------------
# prompts
# --------------------------------------------------------------------------

def _fourier_pe(pe_table: jax.Array, coords: jax.Array) -> jax.Array:
    """coords in [0,1]² …x2 → …x(2*num_pos_feats)."""
    coords = 2.0 * coords - 1.0
    proj = (2.0 * np.pi) * (coords @ pe_table)
    return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)


def image_wide_pe(params, config: SamViTConfig) -> jax.Array:
    """[1, H', W', prompt_hidden] dense positional map."""
    size = config.embed_side
    grid = (np.arange(size, dtype=np.float32) + 0.5) / size
    yx = np.stack(np.meshgrid(grid, grid, indexing="ij"), -1)  # [H,W,(y,x)]
    coords = jnp.asarray(yx[..., ::-1].copy())                 # (x, y)
    return _fourier_pe(params["shared_pe"], coords)[None]


def embed_points(params, points: jax.Array, labels: jax.Array,
                 config: SamViTConfig, pad: bool = True) -> jax.Array:
    """points [B, P, N, 2] pixel xy; labels [B, P, N]
    (1 fg, 0 bg, -1 pad) → [B, P, N(+1), prompt_hidden]."""
    points = (points + 0.5) / config.image_size
    if pad:
        points = jnp.concatenate(
            [points, jnp.zeros_like(points[:, :, :1])], axis=2)
        labels = jnp.concatenate(
            [labels, -jnp.ones_like(labels[:, :, :1])], axis=2)
    pe = _fourier_pe(params["shared_pe"], points)
    pe = jnp.where(labels[..., None] == -1,
                   params["not_a_point"][None, None], pe)
    pe = jnp.where((labels == 0)[..., None],
                   pe + params["point_embed_0"][None, None], pe)
    pe = jnp.where((labels == 1)[..., None],
                   pe + params["point_embed_1"][None, None], pe)
    return pe


def embed_boxes(params, boxes: jax.Array,
                config: SamViTConfig) -> jax.Array:
    """boxes [B, P, 4] pixel xyxy → [B, P, 2, prompt_hidden]."""
    b, p_, _ = boxes.shape
    coords = ((boxes + 0.5) / config.image_size).reshape(b, p_, 2, 2)
    pe = _fourier_pe(params["shared_pe"], coords)
    pe = pe.at[:, :, 0].add(params["point_embed_2"])
    pe = pe.at[:, :, 1].add(params["point_embed_3"])
    return pe


# --------------------------------------------------------------------------
# mask decoder
# --------------------------------------------------------------------------

def _decoder_attention(p, q, k, v, num_heads: int):
    """SamAttention: q/k/v [B, P, N, hidden] → [B, P, Nq, hidden]."""
    b, pb = q.shape[0], q.shape[1]
    query, key, value = _dense(p["q"], q), _dense(p["k"], k), _dense(p["v"], v)
    internal = query.shape[-1]
    hd = internal // num_heads

    def split(t):
        return t.reshape(b * pb, t.shape[2], num_heads, hd).swapaxes(1, 2)

    query, key, value = split(query), split(key), split(value)
    scores = (query * (hd ** -0.5)) @ key.swapaxes(-2, -1)
    probs = jax.nn.softmax(scores.astype(jnp.float32), -1).astype(query.dtype)
    out = (probs @ value).swapaxes(1, 2)
    out = out.reshape(b, pb, out.shape[1], internal)
    return _dense(p["out"], out)


def _two_way_block(p, queries, keys, query_pe, key_pe, heads: int,
                   eps: float, skip_first_pe: bool):
    if skip_first_pe:
        queries = _decoder_attention(p["self_attn"], queries, queries,
                                     queries, heads)
    else:
        q = queries + query_pe
        queries = queries + _decoder_attention(
            p["self_attn"], q, q, queries, heads)
    queries = _layer_norm(p["norm1"], queries, eps)

    q = queries + query_pe
    k = keys + key_pe
    queries = queries + _decoder_attention(
        p["cross_t2i"], q, k, keys, heads)
    queries = _layer_norm(p["norm2"], queries, eps)

    h = _dense(p["mlp"]["lin1"], queries)
    h = _dense(p["mlp"]["lin2"], jax.nn.relu(h))
    queries = _layer_norm(p["norm3"], queries + h, eps)

    q = queries + query_pe
    k = keys + key_pe
    keys = keys + _decoder_attention(p["cross_i2t"], k, q, queries, heads)
    keys = _layer_norm(p["norm4"], keys, eps)
    return queries, keys


def mask_decoder(
    params, image_embeddings: jax.Array, image_pe: jax.Array,
    sparse_prompts: jax.Array, dense_prompts: jax.Array,
    config: SamViTConfig, multimask_output: bool = True,
):
    """image_embeddings [B, H', W', C]; sparse [B, P, N, C];
    dense [B, H', W', C] → (masks [B, P, M, 4H', 4W'],
    iou [B, P, M])."""
    p = params["decoder"]
    b, hh, ww, c = image_embeddings.shape
    pb = sparse_prompts.shape[1]
    num_mask_tokens = config.num_multimask_outputs + 1

    output_tokens = jnp.concatenate(
        [p["iou_token"], p["mask_tokens"]], axis=0)
    output_tokens = jnp.broadcast_to(
        output_tokens[None, None], (b, pb, *output_tokens.shape))
    tokens = jnp.concatenate([output_tokens, sparse_prompts], axis=2)

    img = (image_embeddings + dense_prompts).reshape(b, 1, hh * ww, c)
    img = jnp.broadcast_to(img, (b, pb, hh * ww, c))
    pe = jnp.broadcast_to(image_pe.reshape(1, 1, hh * ww, c),
                          (b, pb, hh * ww, c))

    queries, keys = tokens, img
    eps = 1e-5   # HF SamTwoWayAttentionBlock default layer_norm_eps
    for i in range(config.decoder_layers):
        queries, keys = _two_way_block(
            p[f"layer_{i}"], queries, keys, tokens, pe,
            config.decoder_heads, eps, skip_first_pe=(i == 0))
    q = queries + tokens
    k = keys + pe
    queries = queries + _decoder_attention(
        p["final_attn"], q, k, keys, config.decoder_heads)
    queries = _layer_norm(p["final_norm"], queries, eps)

    iou_token_out = queries[:, :, 0]
    mask_tokens_out = queries[:, :, 1:1 + num_mask_tokens]

    img_sp = keys.reshape(b * pb, hh, ww, c)
    up = _conv_transpose(p["upscale1"], img_sp)
    up = jax.nn.gelu(_layer_norm(p["upscale_ln"], up, 1e-6),
                     approximate=False)
    up = jax.nn.gelu(_conv_transpose(p["upscale2"], up), approximate=False)
    uh, uw, uc = up.shape[1], up.shape[2], up.shape[3]

    hyper = jnp.stack([
        _feed_forward(p[f"hyper_{i}"], mask_tokens_out[:, :, i])
        for i in range(num_mask_tokens)
    ], axis=2)                                      # [B, P, M, uc]
    flat = up.reshape(b, pb, uh * uw, uc)
    masks = jnp.einsum("bpmc,bpnc->bpmn", hyper, flat)
    masks = masks.reshape(b, pb, num_mask_tokens, uh, uw)

    iou = _feed_forward(p["iou_head"], iou_token_out)
    sl = slice(1, None) if multimask_output else slice(0, 1)
    return masks[:, :, sl], iou[:, :, sl]


def sam_predict(
    params, pixels: jax.Array, config: SamViTConfig,
    input_points: Optional[jax.Array] = None,
    input_labels: Optional[jax.Array] = None,
    input_boxes: Optional[jax.Array] = None,
    multimask_output: bool = True,
):
    """Full forward: preprocessed pixels [B, S, S, 3] + prompts →
    (low-res masks, iou scores), HF ``SamModel`` semantics."""
    image = vision_encoder(params["vision"], pixels, config)
    pe = image_wide_pe(params["prompt"], config)

    sparse = None
    if input_points is not None:
        sparse = embed_points(params["prompt"], input_points, input_labels,
                              config, pad=input_boxes is None)
    if input_boxes is not None:
        box = embed_boxes(params["prompt"], input_boxes, config)
        sparse = box if sparse is None else jnp.concatenate(
            [sparse, box], axis=2)
    if sparse is None:
        sparse = jnp.zeros(
            (pixels.shape[0], 1, 0, config.prompt_hidden), pixels.dtype)
    dense = jnp.broadcast_to(
        params["prompt"]["no_mask"].reshape(1, 1, 1, -1),
        image.shape)
    return mask_decoder(params, image, pe, sparse, dense, config,
                        multimask_output)


# --------------------------------------------------------------------------
# HF conversion
# --------------------------------------------------------------------------

def _t(x) -> np.ndarray:
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)


def convert_hf_sam(state_dict: dict[str, Any],
                   config: SamViTConfig) -> dict:
    """``transformers.SamModel`` state dict → params for this module."""
    sd = state_dict

    def dense(prefix, bias=True):
        out = {"kernel": _t(sd[f"{prefix}.weight"]).T}
        if bias:
            out["bias"] = _t(sd[f"{prefix}.bias"])
        return out

    def norm(prefix):
        return {"scale": _t(sd[f"{prefix}.weight"]),
                "bias": _t(sd[f"{prefix}.bias"])}

    def conv(prefix, bias=True):
        out = {"kernel": _t(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0)}
        if bias and f"{prefix}.bias" in sd:
            out["bias"] = _t(sd[f"{prefix}.bias"])
        return out

    def conv_t(prefix):
        # kept in torch's [in, out, kh, kw] layout (see _conv_transpose)
        return {"kernel": _t(sd[f"{prefix}.weight"]),
                "bias": _t(sd[f"{prefix}.bias"])}

    vision: dict[str, Any] = {
        "patch_embed": conv("vision_encoder.patch_embed.projection"),
        "neck": {
            "conv1": conv("vision_encoder.neck.conv1"),
            "ln1": norm("vision_encoder.neck.layer_norm1"),
            "conv2": conv("vision_encoder.neck.conv2"),
            "ln2": norm("vision_encoder.neck.layer_norm2"),
        },
    }
    if "vision_encoder.pos_embed" in sd:
        vision["pos_embed"] = _t(sd["vision_encoder.pos_embed"])
    for i in range(config.num_layers):
        p = f"vision_encoder.layers.{i}"
        vision[f"layer_{i}"] = {
            "norm1": norm(f"{p}.layer_norm1"),
            "norm2": norm(f"{p}.layer_norm2"),
            "attn": {
                "qkv": dense(f"{p}.attn.qkv"),
                "proj": dense(f"{p}.attn.proj"),
                "rel_pos_h": _t(sd[f"{p}.attn.rel_pos_h"]),
                "rel_pos_w": _t(sd[f"{p}.attn.rel_pos_w"]),
            },
            "mlp": {"lin1": dense(f"{p}.mlp.lin1"),
                    "lin2": dense(f"{p}.mlp.lin2")},
        }

    prompt = {
        "shared_pe": _t(
            sd["shared_image_embedding.positional_embedding"]),
        "not_a_point": _t(sd["prompt_encoder.not_a_point_embed.weight"])[0],
        "no_mask": _t(sd["prompt_encoder.no_mask_embed.weight"])[0],
    }
    for i in range(4):
        prompt[f"point_embed_{i}"] = _t(
            sd[f"prompt_encoder.point_embed.{i}.weight"])[0]

    def sam_attn(prefix):
        return {"q": dense(f"{prefix}.q_proj"),
                "k": dense(f"{prefix}.k_proj"),
                "v": dense(f"{prefix}.v_proj"),
                "out": dense(f"{prefix}.out_proj")}

    num_mask_tokens = config.num_multimask_outputs + 1
    decoder: dict[str, Any] = {
        "iou_token": _t(sd["mask_decoder.iou_token.weight"]),
        "mask_tokens": _t(sd["mask_decoder.mask_tokens.weight"]),
        "final_attn": sam_attn(
            "mask_decoder.transformer.final_attn_token_to_image"),
        "final_norm": norm("mask_decoder.transformer.layer_norm_final_attn"),
        "upscale1": conv_t("mask_decoder.upscale_conv1"),
        "upscale2": conv_t("mask_decoder.upscale_conv2"),
        "upscale_ln": norm("mask_decoder.upscale_layer_norm"),
        "iou_head": {
            "proj_in": dense("mask_decoder.iou_prediction_head.proj_in"),
            "proj_out": dense("mask_decoder.iou_prediction_head.proj_out"),
            "layers": [
                dense(f"mask_decoder.iou_prediction_head.layers.{j}")
                for j in range(config.iou_head_depth - 2)
            ],
        },
    }
    for i in range(num_mask_tokens):
        h = f"mask_decoder.output_hypernetworks_mlps.{i}"
        decoder[f"hyper_{i}"] = {
            "proj_in": dense(f"{h}.proj_in"),
            "proj_out": dense(f"{h}.proj_out"),
            "layers": [dense(f"{h}.layers.{j}") for j in range(1)],
        }
    for i in range(config.decoder_layers):
        t = f"mask_decoder.transformer.layers.{i}"
        decoder[f"layer_{i}"] = {
            "self_attn": sam_attn(f"{t}.self_attn"),
            "cross_t2i": sam_attn(f"{t}.cross_attn_token_to_image"),
            "cross_i2t": sam_attn(f"{t}.cross_attn_image_to_token"),
            "norm1": norm(f"{t}.layer_norm1"),
            "norm2": norm(f"{t}.layer_norm2"),
            "norm3": norm(f"{t}.layer_norm3"),
            "norm4": norm(f"{t}.layer_norm4"),
            "mlp": {"lin1": dense(f"{t}.mlp.lin1"),
                    "lin2": dense(f"{t}.mlp.lin2")},
        }

    params = {"vision": vision, "prompt": prompt, "decoder": decoder}
    return jax.tree.map(jnp.asarray, params,
                        is_leaf=lambda x: isinstance(x, np.ndarray))


def load_hf_sam(path: str) -> tuple[SamViTConfig, dict]:
    """Load a local HF SAM checkpoint directory."""
    from transformers import SamConfig as HFSamConfig

    hf_config = HFSamConfig.from_pretrained(path)
    config = SamViTConfig.from_hf(hf_config)
    try:
        from pathlib import Path

        from safetensors.numpy import load_file

        sd = load_file(str(Path(path) / "model.safetensors"))
    except Exception:
        import torch
        from pathlib import Path

        sd = torch.load(Path(path) / "pytorch_model.bin",
                        map_location="cpu", weights_only=True)
    return config, convert_hf_sam(sd, config)
