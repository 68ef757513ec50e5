"""Pallas-fused W8A8 serving path for the SigLIP vision tower.

The XLA-composed W8A8 tower (``SigLIPVisionConfig(quant_int8=True)``)
only realizes 1.04-1.12x of the int8 MXU's measured ~2x dot-level gain
because quantize/dequantize/LayerNorm/GELU glue round-trips activations
through HBM between every dot (`scripts/profile_tower.py` breakdown).
This module rebuilds the encoder stack on the fused kernels of
:mod:`gvl_tpu.ops.quant_matmul`:

    residual stream (bf16, row-padded once per tower)
      → ln_quant                      [LayerNorm + quantize, one pass]
      → w8a8_matmul  (fused QKV)      [int8 dot → dequant+bias → bf16]
      → flash attention (bf16)
      → quant_static
      → w8a8_matmul  (o-proj)         [... → +residual, bf16]
      → ln_quant
      → w8a8_matmul  (fc1)            [... → tanh-GELU → requant, int8]
      → w8a8_matmul  (fc2)            [... → +residual, bf16]

so the [M, intermediate] activation exists only as int8 and every
elementwise op rides a matmul or a single fused pass.  Activation
scales are the same static per-tensor calibration the XLA path uses
(:func:`gvl_tpu.models.siglip.calibrate_siglip_int8`), so accuracy is
identical to the already-verified static-act tower up to bf16 rounding
of the LayerNorm output.

Reference capability surface: the torch SigLIP wrapper's bf16-autocast
encode (`/root/reference/src/perception/siglip_semantic_encoder.py:
261-289`); this path is the TPU-first replacement chasing the BASELINE
300 img/s-per-chip target (measured 275 img/s on one v5e in round 4,
vs 197 bf16 — see BENCH_r04.json and the ROADMAP roofline discussion).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from gvl_tpu.models.siglip import MAPHead, SigLIPVisionConfig
from gvl_tpu.ops.quant_matmul import (
    attention_fused_qkv,
    attention_packed_multihead,
    ln_quant,
    w8a8_matmul,
)

# Per-batch sequence pad multiple.  The residual stream runs as
# [B·Sp, D] with Sp = round_up(S, SEQ_PAD): per-batch padding keeps
# q/k/v blocks of one image contiguous for the fused-QKV attention
# kernel (no [B,H,S,D] transposes ever materialize), and the multiple
# keeps B·Sp tall-block friendly for the matmul kernels.  32 (not 64):
# at so400m's S=729 the pad rows are pure waste through EVERY op, and
# Sp=736 (vs 768) cuts that from 5.4% to 1% — all kernels only need
# Sp%16 and B·Sp%32.
SEQ_PAD = 32

# Per-head lanes in the fused QKV/attention layout.  Head dim 72 is not
# a lane multiple, and Mosaic's DMA cannot slice unaligned minor-dim
# windows, so the QKV projection emits each head padded to 128 lanes via
# zero weight columns — ~78% extra FLOPs on the cheap QKV dot, bought
# back by never materializing a transpose/pad/slice of the activations.
DH_PAD = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pad_head_cols(kernel_q, scale, bias, num_heads: int):
    """[D, H·dh] weight (+[H·dh] vecs) → head-dim-padded [D, H·DH_PAD].

    Zero weight columns in the pad lanes make the projection EMIT the
    padded layout, so no activation pad op ever runs."""
    d, hd = kernel_q.shape
    dh = hd // num_heads
    pad = DH_PAD - dh

    def pad_vec(v):
        v = v.reshape(num_heads, dh)
        return jnp.pad(v, ((0, 0), (0, pad))).reshape(-1)

    w = kernel_q.reshape(d, num_heads, dh)
    w = jnp.pad(w, ((0, 0), (0, 0), (0, pad))).reshape(d, -1)
    return w, pad_vec(scale), pad_vec(bias)


def fuse_siglip_int8(params: dict, config: SigLIPVisionConfig,
                     packed_attention: bool = False) -> dict:
    """Calibrated static-act W8A8 params → fused serving layout.

    ``params`` is the tree produced by ``quantize_siglip_int8`` +
    ``calibrate_siglip_int8`` (every encoder dense holds ``kernel_q`` /
    ``scale`` / ``bias`` / ``act_scale``).  Returns a plain pytree:
    q/k/v kernels concatenated, MLP dims padded to a lane multiple,
    dequant scales combined (act * weight), quantize scales inverted.

    ``packed_attention``: keep heads PACKED (no DH_PAD zero columns) —
    the qkv projection emits 3·H·dh columns instead of 3·H·128 and the
    o-projection contracts over H·dh, shedding the ~78% head-pad FLOPs
    on both dots; attention runs the in-register-sliced multi-head
    kernel (:func:`gvl_tpu.ops.quant_matmul.attention_packed_multihead`).
    """
    d = config.hidden_size
    di = config.intermediate_size
    dip = _round_up(di, 128)
    f32 = lambda a: jnp.asarray(a, jnp.float32)

    n_heads = config.num_heads
    dh = d // n_heads
    layers = []
    for i in range(config.num_layers):
        lp = params[f"layers_{i}"]
        at, mlp = lp["attention"], lp["mlp"]
        names = ("q_proj", "k_proj", "v_proj")
        act_in = f32(at["q_proj"]["act_scale"])
        o, fc1, fc2 = at["o_proj"], mlp["fc1"], mlp["fc2"]
        pad = dip - di
        if packed_attention:
            parts = [(at[k]["kernel_q"], f32(at[k]["scale"]),
                      f32(at[k]["bias"])) for k in names]
            w_o = o["kernel_q"]                  # [H·dh, D], no pad
        else:
            parts = [
                _pad_head_cols(at[k]["kernel_q"], f32(at[k]["scale"]),
                               f32(at[k]["bias"]), n_heads)
                for k in names
            ]
            # o-projection ingests the padded layout via zero weight ROWS
            w_o = o["kernel_q"].reshape(n_heads, dh, d)
            w_o = jnp.pad(w_o, ((0, 0), (0, DH_PAD - dh), (0, 0)))
            w_o = w_o.reshape(n_heads * DH_PAD, d)
        layers.append({
            "ln1_g": f32(lp["LayerNorm_0"]["scale"]),
            "ln1_b": f32(lp["LayerNorm_0"]["bias"]),
            "ln1_inv": 1.0 / act_in,
            "w_qkv": jnp.concatenate([p[0] for p in parts], axis=1),
            "s_qkv": act_in * jnp.concatenate([p[1] for p in parts]),
            "b_qkv": jnp.concatenate([p[2] for p in parts]),
            "attn_inv": 1.0 / f32(o["act_scale"]),
            "w_o": w_o,
            "s_o": f32(o["act_scale"]) * f32(o["scale"]),
            "b_o": f32(o["bias"]),
            "ln2_g": f32(lp["LayerNorm_1"]["scale"]),
            "ln2_b": f32(lp["LayerNorm_1"]["bias"]),
            "ln2_inv": 1.0 / f32(fc1["act_scale"]),
            "w1": jnp.pad(fc1["kernel_q"], ((0, 0), (0, pad))),
            "s1": jnp.pad(f32(fc1["act_scale"]) * f32(fc1["scale"]),
                          (0, pad)),
            "b1": jnp.pad(f32(fc1["bias"]), (0, pad)),
            "gelu_inv": 1.0 / f32(fc2["act_scale"]),
            "w2": jnp.pad(fc2["kernel_q"], ((0, pad), (0, 0))),
            "s2": f32(fc2["act_scale"]) * f32(fc2["scale"]),
            "b2": f32(fc2["bias"]),
        })

    bf16 = lambda a: jnp.asarray(a, jnp.bfloat16)
    bf = {
        "patch_kernel": bf16(params["patch_embed"]["proj"]["kernel"]),
        "patch_bias": bf16(params["patch_embed"]["proj"]["bias"]),
        "pos_embed": bf16(params["pos_embed"]),
        "post_norm_g": f32(params["post_norm"]["scale"]),
        "post_norm_b": f32(params["post_norm"]["bias"]),
        "head": params["head"],
    }
    return {"bf16": bf, "layers": layers}


# Per-op (block_m, block_n) for the four layer matmuls — measured
# IN-CONTEXT on v5e at so400m tower shapes (scripts/bench_fused_tower.py
# --blocks sweeps these; isolated-op sweeps overstate by ~2x from
# cross-iteration pipelining, so only whole-tower timings pick winners).
BLOCKS: dict[str, tuple[int, int]] = {
    "qkv": (1472, 512),
    "o": (256, 1152),
    "fc1": (736, 256),
    "fc2": (256, 1024),
}
# attention q-block (rows per grid step; seq_pad-clamped in the kernel)
ATTN_BLOCK_Q = 1024


def _fused_layer(h: jax.Array, lp: dict, config: SigLIPVisionConfig,
                 batch: int, seq_pad: int, seq: int,
                 int8_attention: bool = False,
                 packed: bool = False) -> jax.Array:
    """One encoder layer over the [B·Sp, D] residual stream."""
    d = config.hidden_size
    n_heads = config.num_heads
    eps = config.layer_norm_eps
    sm_scale = 1.0 / float(np.sqrt(d // n_heads))

    xq = ln_quant(h, lp["ln1_g"], lp["ln1_b"], lp["ln1_inv"], eps=eps)
    qkv = w8a8_matmul(xq, lp["w_qkv"], lp["s_qkv"], lp["b_qkv"],
                      block_m=BLOCKS["qkv"][0], block_n=BLOCKS["qkv"][1])
    # o-proj's static activation quantize rides the attention epilogue
    # (int8 out): no separate quant pass, half the attention output HBM
    # traffic
    if packed:
        aq = attention_packed_multihead(
            qkv, batch=batch, seq_pad=seq_pad, kv_len=seq,
            num_heads=n_heads, head_dim=d // n_heads, sm_scale=sm_scale,
            out_scale_inv=lp["attn_inv"])
    else:
        aq = attention_fused_qkv(
            qkv, batch=batch, seq_pad=seq_pad, kv_len=seq,
            num_heads=n_heads, dh_pad=DH_PAD, sm_scale=sm_scale,
            int8_scores=int8_attention, block_q=ATTN_BLOCK_Q,
            out_scale_inv=lp["attn_inv"])
    h = w8a8_matmul(aq, lp["w_o"], lp["s_o"], lp["b_o"],
                    epilogue="residual", residual=h,
                    block_m=BLOCKS["o"][0], block_n=BLOCKS["o"][1])

    yq = ln_quant(h, lp["ln2_g"], lp["ln2_b"], lp["ln2_inv"], eps=eps)
    hq = w8a8_matmul(yq, lp["w1"], lp["s1"], lp["b1"],
                     epilogue="gelu_quant", out_scale_inv=lp["gelu_inv"],
                     block_m=BLOCKS["fc1"][0], block_n=BLOCKS["fc1"][1])
    return w8a8_matmul(hq, lp["w2"], lp["s2"], lp["b2"],
                       epilogue="residual", residual=h,
                       block_m=BLOCKS["fc2"][0], block_n=BLOCKS["fc2"][1])


def siglip_fused_apply(
    fused: dict, pixels: jax.Array, config: SigLIPVisionConfig,
    *, pool: bool = True, int8_attention: bool = False,
) -> dict[str, jax.Array]:
    """Forward pass with the ``SigLIPVisionTower`` output contract."""
    cfg = config
    bf: dict[str, Any] = fused["bf16"]
    b, hgt, wdt, c = pixels.shape
    p = cfg.patch_size
    nh, nw = hgt // p, wdt // p
    x = pixels[:, : nh * p, : nw * p].astype(jnp.bfloat16)
    x = x.reshape(b, nh, p, nw, p, c).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(b, nh * nw, p * p * c)
    x = x @ bf["patch_kernel"] + bf["patch_bias"]

    pos = bf["pos_embed"]
    if x.shape[1] != pos.shape[0]:  # off-size bucket: resize learned grid
        side = cfg.patches_per_side
        grid = pos.reshape(side, side, cfg.hidden_size)
        grid = jax.image.resize(grid.astype(jnp.float32),
                                (nh, nw, cfg.hidden_size), "bilinear")
        pos = grid.reshape(nh * nw, cfg.hidden_size).astype(pos.dtype)
    x = x + pos[None]

    seq, d = x.shape[1], cfg.hidden_size
    seq_pad = _round_up(seq, SEQ_PAD)
    h = jnp.pad(x, ((0, 0), (0, seq_pad - seq), (0, 0)))
    h = h.reshape(b * seq_pad, d)
    # packed vs head-padded attention layout is inferred from the o-proj
    # kernel's STATIC row count (a stored bool leaf would trace to an
    # array under jit); when dh is already lane-aligned the layouts
    # coincide and the padded kernel path serves both
    packed = (fused["layers"][0]["w_o"].shape[0]
              != cfg.num_heads * DH_PAD)
    for lp in fused["layers"]:
        h = _fused_layer(h, lp, cfg, b, seq_pad, seq,
                         int8_attention=int8_attention,
                         packed=packed)
    x = h.reshape(b, seq_pad, d)[:, :seq]

    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    x = (xc * jax.lax.rsqrt(var + cfg.layer_norm_eps)
         * bf["post_norm_g"] + bf["post_norm_b"]).astype(jnp.bfloat16)

    out = {"last_hidden_state": x}
    if pool:
        out["pooled"] = MAPHead(cfg, name="head").apply(
            {"params": bf["head"]}, x)
    return out


def prepare_fused_siglip(params: dict, config: SigLIPVisionConfig,
                         sample_pixels,
                         packed_attention: bool = False) -> dict:
    """bf16/f32 tower params → calibrated fused serving tree in one call
    (quantize → run dynamic tower for activation amax → bake → fuse)."""
    from gvl_tpu.models.siglip import (
        calibrate_siglip_int8,
        quantize_siglip_int8,
    )

    qparams = quantize_siglip_int8(params)
    sparams = calibrate_siglip_int8(config, qparams, sample_pixels)
    return fuse_siglip_int8(sparams, config,
                            packed_attention=packed_attention)
