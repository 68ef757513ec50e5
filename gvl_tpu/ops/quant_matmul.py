"""Fused W8A8 matmul kernels for encoder towers (Pallas, int8 MXU).

Round-4 perf work (VERDICT r3 #1): the v5e MXU runs int8 dots at ~2x the
bf16 rate (303-500 TOP/s measured at SigLIP tower shapes,
`scripts/profile_tower.py`), but the XLA-composed W8A8 tower only
realizes 1.04-1.12x because every quantize / dequantize / LayerNorm /
GELU between the dots round-trips [M, 4304]-sized activations through
HBM — the measured per-layer glue (~0.7 ms) exceeds the int8 dots
themselves (~0.47 ms).  These kernels fuse the glue into the matmuls so
activations cross HBM exactly once per op, as int8:

- :func:`w8a8_matmul` — ``x_q @ w_q`` on the int8 MXU with the whole
  epilogue in VMEM: int32 accum → per-channel dequant → bias →
  {none | +residual | tanh-GELU → requantize}.  The ``gelu_quant``
  epilogue writes int8 directly (the next layer's input), so the
  [M, intermediate] activation never exists in bf16/f32.
- :func:`ln_quant` — LayerNorm (f32 math) fused with static-scale
  quantization: bf16 in, int8 out, one pass.
- :func:`quant_static` — plain static-scale quantization (attention
  output → int8 for the o-projection).

Activation scales are calibrated per layer (static symmetric per-tensor,
`gvl_tpu.models.siglip.calibrate_siglip_int8`) and passed as SMEM
scalars so one compiled kernel serves all 27 layers.  Each function has
an XLA reference implementation (identical integer algebra) used as the
non-TPU path via ``lax.platform_dependent`` and as test ground truth.

Replaces what the reference gets from torch autocast + cuBLAS
(`/root/reference/src/perception/siglip_semantic_encoder.py:261-289`)
with a quantized serving path the reference does not have.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pick_block(dim: int, cap: int, step: int = 8) -> int:
    """Largest divisor of ``dim`` that is ≤ cap and a ``step`` multiple
    (falls back to ``dim`` itself when no aligned divisor exists —
    callers have already validated alignment)."""
    cap = min(cap, dim)
    for cand in range(cap - cap % step, 0, -step):
        if dim % cand == 0:
            return cand
    return dim


# Mosaic double-buffers every blocked operand; leave headroom under the
# 16 MB scoped-vmem limit for semaphores/accumulators.
_VMEM_BUDGET = 10 * 1024 * 1024


# --------------------------------------------------------------------------
# w8a8 matmul with fused epilogue
# --------------------------------------------------------------------------

def _gelu_exp2(y: jax.Array) -> jax.Array:
    """tanh-GELU via the VPU's native exp2.

    0.5·(1+tanh(t)) == sigmoid(2t), so the tanh approximation is exactly
    y·sigmoid(2·0.79788456·(y + 0.044715·y³)) — one exp2 + one
    reciprocal instead of XLA's multi-pass tanh rational (the tanh
    lowering measured the fc1 matmul at HALF the rate of the identical-
    shape fc2: 145 vs 298 TOPS — the epilogue, not the dot, was binding).
    Same math as jax.nn.gelu(approximate=True) up to last-ulp exp
    differences, which the int8 requantize absorbs."""
    u = y * y
    # 2·sqrt(2/pi)·log2(e) folded into one constant
    arg = (-2.302118131) * y * (1.0 + 0.044715 * u)
    return y / (1.0 + jnp.exp2(arg))


def _w8a8_kernel(s_out_ref, x_ref, w_ref, scale_ref, bias_ref, res_ref,
                 o_ref, *, epilogue: str):
    acc = jax.lax.dot_general(
        x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * scale_ref[:]
    if bias_ref is not None:
        y = y + bias_ref[:]
    if epilogue == "gelu_quant":
        y = _gelu_exp2(y)
        q = jnp.clip(jnp.round(y * s_out_ref[0]), -127, 127)
        o_ref[:] = q.astype(jnp.int8)
    elif epilogue == "quant":
        # static per-column requantize: the caller pre-folds the output
        # inverse scale into scale/bias, so this is just round+clip
        o_ref[:] = jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)
    elif epilogue == "residual":
        o_ref[:] = (y + res_ref[:].astype(jnp.float32)).astype(o_ref.dtype)
    else:  # "none"
        o_ref[:] = y.astype(o_ref.dtype)


def w8a8_matmul_reference(
    x_q: jax.Array,
    w_q: jax.Array,
    scale: jax.Array,
    bias: Optional[jax.Array] = None,
    *,
    epilogue: str = "none",
    out_scale_inv: Optional[jax.Array] = None,
    residual: Optional[jax.Array] = None,
    out_dtype=jnp.bfloat16,
) -> jax.Array:
    """XLA ground truth with the kernel's exact integer algebra."""
    acc = jax.lax.dot_general(
        x_q, w_q, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * scale[None, :]
    if bias is not None:
        y = y + bias[None, :]
    if epilogue == "gelu_quant":
        y = _gelu_exp2(y)
        return jnp.clip(jnp.round(y * out_scale_inv), -127, 127
                        ).astype(jnp.int8)
    if epilogue == "quant":
        return jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)
    if epilogue == "residual":
        return (y + residual.astype(jnp.float32)).astype(out_dtype)
    return y.astype(out_dtype)


def w8a8_matmul_pallas(
    x_q: jax.Array,
    w_q: jax.Array,
    scale: jax.Array,
    bias: Optional[jax.Array] = None,
    *,
    epilogue: str = "none",
    out_scale_inv: Optional[jax.Array] = None,
    residual: Optional[jax.Array] = None,
    out_dtype=jnp.bfloat16,
    block_m: int = 1024,
    block_n: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """``x_q [M,K] int8 @ w_q [K,N] int8`` with a fused epilogue.

    M must be a multiple of 32 and K/N multiples of 128 (the caller pads
    once per tower, not per op).  ``scale`` is the combined per-output-
    channel dequant scale (act_scale * weight_scale, [N] f32); ``bias``
    [N] f32.  Epilogues: "none" (out_dtype), "residual" (+residual
    [M,N], out_dtype), "gelu_quant" (tanh-GELU then requantize by the
    SMEM scalar ``out_scale_inv`` → int8).
    """
    m, k = x_q.shape
    n = w_q.shape[1]
    if m % 32 or k % 128 or n % 128:
        raise ValueError(f"unpadded w8a8 shapes: [{m},{k}]x[{k},{n}]")
    # Large block_m is the weight-traffic lever: the full W streams from
    # HBM once per m-block (the x block is constant across the fast j
    # axis and its DMA is skipped), so fewer/taller m-blocks amortize
    # weight bandwidth.  block_n only needs to divide n as a lane
    # multiple — pick the largest such divisor under the cap.  Then
    # shrink block_m until the double-buffered working set fits scoped
    # VMEM (large-batch callers would otherwise OOM the 16 MB limit).
    block_m = _pick_block(m, block_m, step=32)
    block_n = _pick_block(n, block_n, step=128)

    def working_set(bm: int, bn: int) -> int:
        per_out = {"residual": 4,     # bf16 out + bf16 residual block
                   "gelu_quant": 1, "quant": 1}.get(epilogue, 2)
        return 2 * (bm * k            # x int8, double-buffered
                    + k * bn          # w int8
                    + bm * bn * per_out)

    while block_m > 32 and working_set(block_m, block_n) > _VMEM_BUDGET:
        block_m = _pick_block(m, block_m // 2, step=32)
    while block_n > 128 and working_set(block_m, block_n) > _VMEM_BUDGET:
        block_n = _pick_block(n, block_n // 2, step=128)
    grid = (m // block_m, n // block_n)

    if epilogue == "gelu_quant":
        if out_scale_inv is None:
            raise ValueError("gelu_quant needs out_scale_inv")
        out_dtype = jnp.int8
    elif epilogue == "quant":
        out_dtype = jnp.int8
    s_out = jnp.asarray(
        out_scale_inv if out_scale_inv is not None else 0.0,
        jnp.float32).reshape(1)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # out_scale_inv (1,)
        pl.BlockSpec((block_m, k), lambda i, j: (i, 0)),
        pl.BlockSpec((k, block_n), lambda i, j: (0, j)),
        pl.BlockSpec((1, block_n), lambda i, j: (0, j)),
    ]
    args = [s_out, x_q, w_q, scale.reshape(1, n)]
    if bias is not None:
        in_specs.append(pl.BlockSpec((1, block_n), lambda i, j: (0, j)))
        args.append(bias.reshape(1, n))
    if epilogue == "residual":
        if residual is None:
            raise ValueError("residual epilogue needs residual input")
        in_specs.append(
            pl.BlockSpec((block_m, block_n), lambda i, j: (i, j)))
        args.append(residual)

    def kernel(s_out_ref, x_ref, w_ref, scale_ref, *rest):
        bias_ref = res_ref = None
        rest = list(rest)
        o_ref = rest.pop()
        if bias is not None:
            bias_ref = rest.pop(0)
        if epilogue == "residual":
            res_ref = rest.pop(0)
        _w8a8_kernel(s_out_ref, x_ref, w_ref, scale_ref, bias_ref,
                     res_ref, o_ref, epilogue=epilogue)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(*args)


def w8a8_matmul(x_q, w_q, scale, bias=None, *, epilogue="none",
                out_scale_inv=None, residual=None, out_dtype=jnp.bfloat16,
                block_m: int = 1024, block_n: int = 512):
    """Platform entry: Pallas on TPU lowerings, XLA reference elsewhere."""
    operands = [x_q, w_q, scale]
    sig = ["x", "w", "s"]
    if bias is not None:
        operands.append(bias)
        sig.append("b")
    if residual is not None:
        operands.append(residual)
        sig.append("r")

    def unpack(*ops):
        d = dict(zip(sig, ops))
        return (d["x"], d["w"], d["s"], d.get("b"), d.get("r"))

    def tpu_path(*ops):
        x, w, s, b, r = unpack(*ops)
        return w8a8_matmul_pallas(
            x, w, s, b, epilogue=epilogue, out_scale_inv=out_scale_inv,
            residual=r, out_dtype=out_dtype, block_m=block_m,
            block_n=block_n)

    def ref_path(*ops):
        x, w, s, b, r = unpack(*ops)
        return w8a8_matmul_reference(
            x, w, s, b, epilogue=epilogue, out_scale_inv=out_scale_inv,
            residual=r, out_dtype=out_dtype)

    return jax.lax.platform_dependent(
        *operands, tpu=tpu_path, default=ref_path)


# --------------------------------------------------------------------------
# attention straight off the packed [M, 3·H·dh] QKV projection output
# --------------------------------------------------------------------------
#
# The encoder's attention input/output transposes are the hidden cost of
# the [B,H,S,D] kernel layout: [M, 3D] → reshape → swapaxes → pad(72→128)
# costs ~0.5 ms/layer at tower shapes (measured, scripts/
# bench_fused_tower.py --pieces).  Emitting the projection head-dim-
# padded instead wastes 78% of the QKV matmul on zero columns (dh 72 →
# 128; measured +0.22 ms/layer).  This kernel takes the UNPADDED packed
# buffer and does the padding itself: each (batch, head) program DMAs
# its three (Sp, dh) slabs from HBM into lane-padded VMEM scratch
# (strided descriptors are free to the DMA engine), computes plain
# softmax attention there, and DMAs the (Sp, dh) output slab back — no
# transpose, pad, or slice ever materializes in HBM and the adjacent
# matmuls keep their unpadded shapes.

def _packed_attn_kernel(qkv_ref, o_ref, q_s, k_s, v_s, o_s, sems, *,
                        sm_scale: float, kv_len: int, seq_pad: int,
                        num_heads: int, head_dim: int):
    b = pl.program_id(0)
    h = pl.program_id(1)
    row0 = b * seq_pad
    hd = num_heads * head_dim
    dh = head_dim

    # zero q/k pad lanes (disjoint from the DMA'd [:, :dh] region):
    # uninitialized scratch can hold NaN bit patterns and NaN*0 = NaN,
    # so BOTH contraction operands' pads must be zero for exact scores.
    # v's pads only pollute output pad lanes, which are never copied out.
    if dh < k_s.shape[1]:
        q_s[:, dh:] = jnp.zeros_like(q_s[:, dh:])
        k_s[:, dh:] = jnp.zeros_like(k_s[:, dh:])

    copies = []
    for i, scratch in enumerate((q_s, k_s, v_s)):
        dma = pltpu.make_async_copy(
            qkv_ref.at[pl.ds(row0, seq_pad), pl.ds(i * hd + h * dh, dh)],
            scratch.at[:, :dh],
            sems.at[i],
        )
        dma.start()
        copies.append(dma)
    for dma in copies:
        dma.wait()

    s = jax.lax.dot_general(
        q_s[:], k_s[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * sm_scale
    if kv_len != seq_pad:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, -1e30)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.maximum(jnp.sum(p, axis=1, keepdims=True), 1e-30)
    out = jax.lax.dot_general(
        p.astype(v_s.dtype), v_s[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_s[:] = (out / denom).astype(o_s.dtype)

    dma_out = pltpu.make_async_copy(
        o_s.at[:, :dh],
        o_ref.at[pl.ds(row0, seq_pad), pl.ds(h * dh, dh)],
        sems.at[3],
    )
    dma_out.start()
    dma_out.wait()


def attention_qkv_packed_reference(qkv, *, batch, seq_pad, kv_len,
                                   num_heads, head_dim, sm_scale):
    """XLA ground truth: unpack → masked attention → repack."""
    from gvl_tpu.ops.attention import attention_reference

    hd = num_heads * head_dim
    parts = [
        qkv[:, i * hd:(i + 1) * hd]
        .reshape(batch, seq_pad, num_heads, head_dim).transpose(0, 2, 1, 3)
        for i in range(3)
    ]
    out = attention_reference(*parts, kv_len=kv_len, sm_scale=sm_scale)
    return out.transpose(0, 2, 1, 3).reshape(batch * seq_pad, hd)


def attention_qkv_packed_pallas(qkv, *, batch, seq_pad, kv_len, num_heads,
                                head_dim, sm_scale,
                                interpret: bool = False):
    """``qkv [B·Sp, 3·H·dh]`` → attention output ``[B·Sp, H·dh]``.

    Sp must be a 16-multiple ≲ 2048 (all keys of one (batch, head) ride
    one VMEM block — the encoder regime; the generic flash path covers
    longer sequences).  Keys beyond ``kv_len`` per batch are masked;
    query rows beyond it produce garbage the caller slices off.
    """
    m, width = qkv.shape
    if m != batch * seq_pad or width != 3 * num_heads * head_dim:
        raise ValueError(f"qkv shape {qkv.shape} inconsistent with "
                         f"B={batch} Sp={seq_pad} H={num_heads} "
                         f"dh={head_dim}")
    if seq_pad % 16:
        raise ValueError(f"unaligned Sp={seq_pad}")
    dh_pad = _round_up(head_dim, 128)

    kernel = functools.partial(
        _packed_attn_kernel, sm_scale=sm_scale, kv_len=kv_len,
        seq_pad=seq_pad, num_heads=num_heads, head_dim=head_dim)
    return pl.pallas_call(
        kernel,
        grid=(batch, num_heads),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((m, num_heads * head_dim),
                                       qkv.dtype),
        scratch_shapes=[
            pltpu.VMEM((seq_pad, dh_pad), qkv.dtype),  # q
            pltpu.VMEM((seq_pad, dh_pad), qkv.dtype),  # k
            pltpu.VMEM((seq_pad, dh_pad), qkv.dtype),  # v
            pltpu.VMEM((seq_pad, dh_pad), qkv.dtype),  # out
            pltpu.SemaphoreType.DMA((4,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(qkv)


def _packed_mh_attn_kernel(s_out_ref, qkv_ref, o_ref, *, num_heads: int,
                           head_dim: int, sm_scale: float, kv_len: int,
                           seq_pad: int, quant_out: bool):
    """All heads of one image per grid cell, PACKED layout (no dh pad).

    The earlier packed kernel (_packed_attn_kernel) DMA'd per-head
    (Sp, 72) windows and hit Mosaic's lane-aligned-DMA requirement; this
    one loads the whole ALIGNED (Sp, 3·H·dh) block once and slices heads
    in-register (static unaligned lane slices lower to relayouts — VPU
    cost, not a DMA restriction).  Head dots contract over dh=72, which
    the MXU pads internally — attention FLOPs match the padded kernel —
    but the PROJECTIONS shed their zero-column/row padding: qkv emits
    3·H·dh (not 3·H·128) columns and o-proj contracts over H·dh."""
    blk = qkv_ref[:]                       # (Sp, 3·H·dh)
    hd = num_heads * head_dim
    scale2 = sm_scale * 1.4426950408889634
    outs = []
    for h in range(num_heads):             # static unroll
        q = blk[:, h * head_dim:(h + 1) * head_dim]
        k = blk[:, hd + h * head_dim: hd + (h + 1) * head_dim]
        v = blk[:, 2 * hd + h * head_dim: 2 * hd + (h + 1) * head_dim]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale2
        if kv_len != seq_pad:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < kv_len, s, -1e30)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp2(s - m)
        denom = jnp.maximum(jnp.sum(p, axis=1, keepdims=True), 1e-30)
        out = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        outs.append(out / denom)
    out = jnp.concatenate(outs, axis=1)    # (Sp, H·dh)
    if quant_out:
        out = jnp.clip(jnp.round(out * s_out_ref[0]), -127, 127)
    o_ref[:] = out.astype(o_ref.dtype)


def attention_packed_multihead_pallas(qkv, *, batch, seq_pad, kv_len,
                                      num_heads, head_dim, sm_scale,
                                      out_scale_inv=None,
                                      interpret: bool = False):
    """``qkv [B·Sp, 3·H·dh]`` (packed, dh need not be lane-aligned) →
    ``[B·Sp, H·dh]`` attention output (int8 when ``out_scale_inv``)."""
    m, width = qkv.shape
    if m != batch * seq_pad or width != 3 * num_heads * head_dim:
        raise ValueError(f"qkv shape {qkv.shape} inconsistent with "
                         f"B={batch} Sp={seq_pad} H={num_heads} "
                         f"dh={head_dim}")
    if seq_pad % 16 or width % 128:
        raise ValueError(f"unaligned Sp={seq_pad} / width={width}")
    quant_out = out_scale_inv is not None
    s_out = jnp.asarray(out_scale_inv if quant_out else 0.0,
                        jnp.float32).reshape(1)
    out_dtype = jnp.int8 if quant_out else qkv.dtype

    kernel = functools.partial(
        _packed_mh_attn_kernel, num_heads=num_heads, head_dim=head_dim,
        sm_scale=sm_scale, kv_len=kv_len, seq_pad=seq_pad,
        quant_out=quant_out)
    return pl.pallas_call(
        kernel,
        grid=(batch,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # out_scale_inv (1,)
            pl.BlockSpec((seq_pad, width), lambda b: (b, 0)),
        ],
        out_specs=pl.BlockSpec((seq_pad, num_heads * head_dim),
                               lambda b: (b, 0)),
        out_shape=jax.ShapeDtypeStruct((m, num_heads * head_dim),
                                       out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(s_out, qkv)


def attention_packed_multihead(qkv, *, batch, seq_pad, kv_len, num_heads,
                               head_dim, sm_scale, out_scale_inv=None):
    """Packed multi-head attention (TPU Pallas / XLA reference)."""
    def ref(x, **kw):
        out = attention_qkv_packed_reference(
            x, batch=batch, seq_pad=seq_pad, kv_len=kv_len,
            num_heads=num_heads, head_dim=head_dim, sm_scale=sm_scale)
        if out_scale_inv is not None:
            out = jnp.clip(jnp.round(out.astype(jnp.float32)
                                     * out_scale_inv),
                           -127, 127).astype(jnp.int8)
        return out

    return jax.lax.platform_dependent(
        qkv,
        tpu=functools.partial(
            attention_packed_multihead_pallas, batch=batch,
            seq_pad=seq_pad, kv_len=kv_len, num_heads=num_heads,
            head_dim=head_dim, sm_scale=sm_scale,
            out_scale_inv=out_scale_inv),
        default=ref,
    )


def attention_qkv_packed(qkv, *, batch, seq_pad, kv_len, num_heads,
                         head_dim, sm_scale):
    """NOTE: the Mosaic DMA engine requires minor-dim slices aligned to
    the 128-lane tiling, so the TPU path only lowers when head_dim is a
    lane multiple; the head-dim-padded :func:`attention_fused_qkv` is
    the general-case kernel (dh=72 towers)."""
    if head_dim % 128:
        raise ValueError(
            f"head_dim={head_dim} is not lane-aligned; use the padded "
            "layout (attention_fused_qkv)")
    kw = dict(batch=batch, seq_pad=seq_pad, kv_len=kv_len,
              num_heads=num_heads, head_dim=head_dim, sm_scale=sm_scale)
    return jax.lax.platform_dependent(
        qkv,
        tpu=functools.partial(attention_qkv_packed_pallas, **kw),
        default=functools.partial(attention_qkv_packed_reference, **kw),
    )


# ---- head-dim-PADDED fused-QKV attention (the general encoder path):
# the QKV projection emits [B·Sp, 3·H·dh_pad] via zero weight columns
# (trading ~78% extra FLOPs on the cheap QKV dot for zero transposes),
# and this kernel indexes (BQ, dh_pad) blocks straight out of it.

def _padded_attn_kernel(s_out_ref, q_ref, k_ref, v_ref, o_ref, *,
                        sm_scale: float, kv_len: int, seq_pad: int,
                        int8_scores: bool, quant_out: bool):
    q = q_ref[:]                      # (BQ, dh_pad)
    k = k_ref[:]                      # (Sp, dh_pad)
    v = v_ref[:]                      # (Sp, dh_pad)
    # softmax in log2 space: exp(x) = exp2(x·log2e) and the VPU's native
    # transcendental is exp2, so folding log2e into the score scale
    # removes one [BQ, Sp] multiply pass
    scale2 = sm_scale * 1.4426950408889634

    def quant_block(x):
        amax = jnp.maximum(jnp.max(jnp.abs(x.astype(jnp.float32))), 1e-8)
        inv = 127.0 / amax
        q8 = jnp.clip(jnp.round(x.astype(jnp.float32) * inv),
                      -127, 127).astype(jnp.int8)
        return q8, amax / 127.0

    if int8_scores:
        # dynamic per-block symmetric int8: the operands are already in
        # VMEM, so the quantize is a local VPU pass and both attention
        # dots run at the MXU's 2x int8 rate
        q8, sq = quant_block(q)
        k8, sk = quant_block(k)
        s = jax.lax.dot_general(
            q8, k8, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32
        ).astype(jnp.float32) * (sq * sk * scale2)
    else:
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale2
    if kv_len != seq_pad:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, -1e30)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp2(s - m)
    denom = jnp.maximum(jnp.sum(p, axis=1, keepdims=True), 1e-30)
    if int8_scores:
        # p in [0, 1]: fixed 127 quantization; v dynamic per block
        p8 = jnp.round(p * 127.0).astype(jnp.int8)
        v8, sv = quant_block(v)
        out = jax.lax.dot_general(
            p8, v8, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32
        ).astype(jnp.float32) * (sv / 127.0)
    else:
        out = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    out = out / denom
    if quant_out:
        # fused static requantize: the consumer (o-projection) reads
        # int8 directly — no separate quant pass, half the output HBM
        # traffic
        out = jnp.clip(jnp.round(out * s_out_ref[0]), -127, 127)
    o_ref[:] = out.astype(o_ref.dtype)


def attention_fused_qkv_reference(qkv, *, batch, seq_pad, kv_len,
                                  num_heads, dh_pad, sm_scale,
                                  out_scale_inv=None):
    out = attention_qkv_packed_reference(
        qkv, batch=batch, seq_pad=seq_pad, kv_len=kv_len,
        num_heads=num_heads, head_dim=dh_pad, sm_scale=sm_scale)
    if out_scale_inv is not None:
        out = jnp.clip(jnp.round(out.astype(jnp.float32) * out_scale_inv),
                       -127, 127).astype(jnp.int8)
    return out


def attention_fused_qkv_pallas(qkv, *, batch, seq_pad, kv_len, num_heads,
                               dh_pad, sm_scale, int8_scores: bool = False,
                               block_q: int = 1024,
                               out_scale_inv=None,
                               interpret: bool = False):
    """``qkv [B·Sp, 3·H·dh_pad]`` → attention output ``[B·Sp, H·dh_pad]``.

    ``out_scale_inv``: fuse the consumer's static activation quantize
    into the epilogue — output is int8 (W8A8 towers feed the o-proj
    directly, skipping the separate quant pass and halving output
    traffic)."""
    m, width = qkv.shape
    if m != batch * seq_pad or width != 3 * num_heads * dh_pad:
        raise ValueError(f"qkv shape {qkv.shape} inconsistent with "
                         f"B={batch} Sp={seq_pad} H={num_heads} "
                         f"dhp={dh_pad}")
    if seq_pad % 16 or dh_pad % 128:
        raise ValueError(f"unaligned Sp={seq_pad} / dh_pad={dh_pad}")
    bq = min(block_q, seq_pad)
    while seq_pad % bq:
        bq //= 2
    nq = seq_pad // bq
    h = num_heads
    quant_out = out_scale_inv is not None
    s_out = jnp.asarray(out_scale_inv if quant_out else 0.0,
                        jnp.float32).reshape(1)
    out_dtype = jnp.int8 if quant_out else qkv.dtype

    kernel = functools.partial(
        _padded_attn_kernel, sm_scale=sm_scale, kv_len=kv_len,
        seq_pad=seq_pad, int8_scores=int8_scores, quant_out=quant_out)
    return pl.pallas_call(
        kernel,
        grid=(batch, h, nq),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # out_scale_inv (1,)
            pl.BlockSpec((bq, dh_pad),
                         lambda b, hh, iq, _nq=nq: (b * _nq + iq, hh)),
            pl.BlockSpec((seq_pad, dh_pad),
                         lambda b, hh, iq, _h=h: (b, _h + hh)),
            pl.BlockSpec((seq_pad, dh_pad),
                         lambda b, hh, iq, _h=h: (b, 2 * _h + hh)),
        ],
        out_specs=pl.BlockSpec(
            (bq, dh_pad), lambda b, hh, iq, _nq=nq: (b * _nq + iq, hh)),
        out_shape=jax.ShapeDtypeStruct((m, h * dh_pad), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        interpret=interpret,
    )(s_out, qkv, qkv, qkv)


def attention_fused_qkv(qkv, *, batch, seq_pad, kv_len, num_heads,
                        dh_pad, sm_scale, int8_scores: bool = False,
                        block_q: int = 1024, out_scale_inv=None):
    """``int8_scores``: quantize q/k/v/p per block inside the kernel so
    both attention dots ride the int8 MXU (2x).  Accuracy-neutral at the
    tower level (pooled cosine vs bf16 unchanged) but measured a net
    LOSS at encoder shapes on v5e (33.3 -> 34.5 ms tower: the in-kernel
    quantize VPU passes cost more than the MXU saves), so OFF by
    default — kept for wider-head or longer-sequence regimes."""
    kw = dict(batch=batch, seq_pad=seq_pad, kv_len=kv_len,
              num_heads=num_heads, dh_pad=dh_pad, sm_scale=sm_scale,
              int8_scores=int8_scores, block_q=block_q,
              out_scale_inv=out_scale_inv)
    ref_kw = {k: v for k, v in kw.items()
              if k not in ("int8_scores", "block_q")}
    return jax.lax.platform_dependent(
        qkv,
        tpu=functools.partial(attention_fused_qkv_pallas, **kw),
        default=functools.partial(attention_fused_qkv_reference, **ref_kw),
    )


# --------------------------------------------------------------------------
# LayerNorm + quantize
# --------------------------------------------------------------------------

def _ln_quant_kernel(inv_ref, x_ref, g_ref, b_ref, o_ref, *, eps: float):
    x = x_ref[:].astype(jnp.float32)
    mu = jnp.mean(x, axis=1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps) * g_ref[:] + b_ref[:]
    o_ref[:] = jnp.clip(jnp.round(y * inv_ref[0]), -127, 127
                        ).astype(jnp.int8)


def ln_quant_reference(x, gamma, beta, inv_scale, *, eps=1e-6):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps) * gamma[None, :] + beta[None, :]
    return jnp.clip(jnp.round(y * inv_scale), -127, 127).astype(jnp.int8)


def ln_quant_pallas(x, gamma, beta, inv_scale, *, eps=1e-6,
                    block_m: int = 512, interpret: bool = False):
    m, d = x.shape
    if m % 32 or d % 128:
        raise ValueError(f"unpadded ln_quant shape [{m},{d}]")
    block_m = _pick_block(m, block_m, step=32)
    while block_m > 32 and 2 * block_m * d * 3 > _VMEM_BUDGET:
        block_m = _pick_block(m, block_m // 2, step=32)
    inv = jnp.asarray(inv_scale, jnp.float32).reshape(1)
    return pl.pallas_call(
        functools.partial(_ln_quant_kernel, eps=eps),
        grid=(m // block_m,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((block_m, d), lambda i: (i, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_m, d), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, d), jnp.int8),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(inv, x, gamma.reshape(1, d), beta.reshape(1, d))


def ln_quant(x, gamma, beta, inv_scale, *, eps=1e-6, block_m: int = 512):
    return jax.lax.platform_dependent(
        x, gamma, beta,
        tpu=functools.partial(ln_quant_pallas, inv_scale=inv_scale,
                              eps=eps, block_m=block_m),
        default=functools.partial(ln_quant_reference,
                                  inv_scale=inv_scale, eps=eps),
    )


# --------------------------------------------------------------------------
# plain static quantize
# --------------------------------------------------------------------------

def _quant_kernel(inv_ref, x_ref, o_ref):
    y = x_ref[:].astype(jnp.float32) * inv_ref[0]
    o_ref[:] = jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)


def quant_static_reference(x, inv_scale):
    y = x.astype(jnp.float32) * inv_scale
    return jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)


def quant_static_pallas(x, inv_scale, *, block_m: int = 1024,
                        interpret: bool = False):
    m, d = x.shape
    if m % 32 or d % 128:
        raise ValueError(f"unpadded quant shape [{m},{d}]")
    block_m = _pick_block(m, block_m, step=32)
    while block_m > 32 and 2 * block_m * d * 3 > _VMEM_BUDGET:
        block_m = _pick_block(m, block_m // 2, step=32)
    inv = jnp.asarray(inv_scale, jnp.float32).reshape(1)
    return pl.pallas_call(
        _quant_kernel,
        grid=(m // block_m,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((block_m, d), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((block_m, d), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, d), jnp.int8),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(inv, x)


def quant_static(x, inv_scale, *, block_m: int = 1024):
    return jax.lax.platform_dependent(
        x,
        tpu=functools.partial(quant_static_pallas, inv_scale=inv_scale,
                              block_m=block_m),
        default=functools.partial(quant_static_reference,
                                  inv_scale=inv_scale),
    )
