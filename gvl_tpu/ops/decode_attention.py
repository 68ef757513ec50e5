"""Single-token decode attention that reads only the live KV prefix.

The straightforward decode step masks a full [S_max] cache read per layer;
with an 8K cache and a 1K-token conversation that is 8× wasted HBM
traffic — and decode is bandwidth-bound.  This kernel walks KV blocks with
the per-slot length as a scalar-prefetch operand: blocks past the live
prefix map to the previous block index (the pipeline skips their DMAs) and
their compute is predicated off, so each step reads ceil(len/BK) blocks
instead of S_max/BK.

Layout: q [B, Hkv, G, D] (query heads grouped under their KV head),
k/v [B, Hkv, S_max, D], lengths [B].  Inference-only (no VJP).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
NEG_INF = -1e30
DEFAULT_BLOCK_K = 512


def _decode_kernel(
    lengths_ref,                      # scalar-prefetch [B]
    q_ref, k_ref, v_ref, o_ref,
    m_ref, l_ref, acc_ref,
    *, sm_scale: float, block_k: int,
):
    b = pl.program_id(0)
    ik = pl.program_id(2)
    length = lengths_ref[b]
    last_ik = jnp.maximum(length - 1, 0) // block_k

    @pl.when(ik == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(ik <= last_ik)
    def _step():
        q = q_ref[0, 0]                     # [G, D]
        k = k_ref[0, 0]                     # [BK, D]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sm_scale                        # [G, BK]
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ik * block_k
        s = jnp.where(col < length, s, NEG_INF)

        m_prev = m_ref[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_ref[:] = jnp.broadcast_to(
            alpha * l_ref[:, :1] + jnp.sum(p, axis=1, keepdims=True),
            l_ref.shape,
        )
        v = v_ref[0, 0]
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)

    @pl.when(ik == last_ik)
    def _finalize():
        denom = jnp.maximum(l_ref[:, :1], 1e-30)
        o_ref[0, 0] = (acc_ref[:] / denom).astype(o_ref.dtype)


def decode_attention(
    q: jax.Array,          # [B, Hq, D] — one token per slot
    k_cache: jax.Array,    # [B, Hkv, S_max, D]
    v_cache: jax.Array,
    lengths: jax.Array,    # [B] live prefix sizes (keys 0..len-1 attended)
    *,
    sm_scale: Optional[float] = None,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: bool = False,
) -> jax.Array:
    """Returns [B, Hq, D] attention over each slot's live prefix."""
    batch, num_q_heads, head_dim = q.shape
    _, num_kv_heads, s_max, _ = k_cache.shape
    group = num_q_heads // num_kv_heads
    scale = sm_scale if sm_scale is not None else 1.0 / np.sqrt(head_dim)

    block_k = min(block_k, s_max)
    if s_max % block_k:
        raise ValueError(f"cache length {s_max} not divisible by {block_k}")
    n_blocks = s_max // block_k

    pd = ((head_dim + LANE - 1) // LANE) * LANE
    gp = max(8, ((group + 7) // 8) * 8)  # min sublane tile

    # [B, Hkv, G, D] with padding to (gp, pd)
    qg = q.reshape(batch, num_kv_heads, group, head_dim)
    qg = jnp.pad(qg, ((0, 0), (0, 0), (0, gp - group), (0, pd - head_dim)))
    kp = jnp.pad(k_cache, ((0, 0), (0, 0), (0, 0), (0, pd - head_dim)))
    vp = jnp.pad(v_cache, ((0, 0), (0, 0), (0, 0), (0, pd - head_dim)))

    def kv_index(b, h, ik, lengths_ref):
        # clamp at the last live block: repeated indices skip the DMA
        last = jnp.maximum(lengths_ref[b] - 1, 0) // block_k
        return (b, h, jnp.minimum(ik, last), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(batch, num_kv_heads, n_blocks),
        in_specs=[
            pl.BlockSpec((1, 1, gp, pd),
                         lambda b, h, ik, lens: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, block_k, pd), kv_index),
            pl.BlockSpec((1, 1, block_k, pd), kv_index),
        ],
        out_specs=pl.BlockSpec((1, 1, gp, pd),
                               lambda b, h, ik, lens: (b, h, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((gp, LANE), jnp.float32),
            pltpu.VMEM((gp, LANE), jnp.float32),
            pltpu.VMEM((gp, pd), jnp.float32),
        ],
    )

    out = pl.pallas_call(
        functools.partial(_decode_kernel, sm_scale=scale, block_k=block_k),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (batch, num_kv_heads, gp, pd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(lengths.astype(jnp.int32), qg, kp, vp)

    out = out[:, :, :group, :head_dim]
    return out.reshape(batch, num_q_heads, head_dim)


def _decode_kernel_stacked(
    layer_ref, lengths_ref,           # scalar-prefetch [1], [B]
    q_ref, k_ref, v_ref, o_ref,
    m_ref, l_ref, acc_ref,
    *, sm_scale: float, block_k: int,
):
    b = pl.program_id(0)
    ik = pl.program_id(2)
    length = lengths_ref[b]
    last_ik = jnp.maximum(length - 1, 0) // block_k
    del layer_ref  # consumed by the index maps

    @pl.when(ik == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(ik <= last_ik)
    def _step():
        q = q_ref[0, 0]                     # [G, D]
        k = k_ref[0, 0, 0]                  # [BK, D]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sm_scale                        # [G, BK]
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ik * block_k
        s = jnp.where(col < length, s, NEG_INF)

        m_prev = m_ref[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_ref[:] = jnp.broadcast_to(
            alpha * l_ref[:, :1] + jnp.sum(p, axis=1, keepdims=True),
            l_ref.shape,
        )
        v = v_ref[0, 0, 0]
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)

    @pl.when(ik == last_ik)
    def _finalize():
        denom = jnp.maximum(l_ref[:, :1], 1e-30)
        o_ref[0, 0] = (acc_ref[:] / denom).astype(o_ref.dtype)


def decode_attention_stacked(
    q: jax.Array,          # [B, Hq, D] — one token per slot
    k_all: jax.Array,      # [L, B, Hkv, S_max, D] — ALL layers' caches
    v_all: jax.Array,
    lengths: jax.Array,    # [B]
    layer: jax.Array,      # scalar int32 — which layer's cache to read
    *,
    sm_scale: Optional[float] = None,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: bool = False,
) -> jax.Array:
    """:func:`decode_attention` reading layer ``layer`` of the STACKED
    cache directly (no per-layer slice materialization).

    The scan-over-layers decode carries the whole stacked cache; slicing
    a layer out for the kernel would copy S_max·Hkv·D per layer per
    step — the measured source of the round-2 S_max-proportional decode
    tax.  Here the layer index is a scalar-prefetch operand of the block
    index map, so the kernel DMAs only that layer's live blocks.
    """
    batch, num_q_heads, head_dim = q.shape
    _, _, num_kv_heads, s_max, _ = k_all.shape
    group = num_q_heads // num_kv_heads
    scale = sm_scale if sm_scale is not None else 1.0 / np.sqrt(head_dim)
    if head_dim % LANE:
        raise ValueError(f"head_dim {head_dim} must be a multiple of {LANE}")

    block_k = min(block_k, s_max)
    if s_max % block_k:
        raise ValueError(f"cache length {s_max} not divisible by {block_k}")
    n_blocks = s_max // block_k
    gp = max(8, ((group + 7) // 8) * 8)  # min sublane tile

    qg = q.reshape(batch, num_kv_heads, group, head_dim)
    qg = jnp.pad(qg, ((0, 0), (0, 0), (0, gp - group), (0, 0)))

    def kv_index(b, h, ik, layer_ref, lengths_ref):
        last = jnp.maximum(lengths_ref[b] - 1, 0) // block_k
        return (layer_ref[0], b, h, jnp.minimum(ik, last), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(batch, num_kv_heads, n_blocks),
        in_specs=[
            pl.BlockSpec((1, 1, gp, head_dim),
                         lambda b, h, ik, lay, lens: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, 1, block_k, head_dim), kv_index),
            pl.BlockSpec((1, 1, 1, block_k, head_dim), kv_index),
        ],
        out_specs=pl.BlockSpec((1, 1, gp, head_dim),
                               lambda b, h, ik, lay, lens: (b, h, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((gp, LANE), jnp.float32),
            pltpu.VMEM((gp, LANE), jnp.float32),
            pltpu.VMEM((gp, head_dim), jnp.float32),
        ],
    )

    out = pl.pallas_call(
        functools.partial(_decode_kernel_stacked, sm_scale=scale,
                          block_k=block_k),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (batch, num_kv_heads, gp, head_dim), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(jnp.reshape(layer, (1,)).astype(jnp.int32),
      lengths.astype(jnp.int32), qg, k_all, v_all)

    out = out[:, :, :group, :head_dim]
    return out.reshape(batch, num_q_heads, head_dim)


def decode_attention_stacked_reference(
    q: jax.Array, k_all: jax.Array, v_all: jax.Array,
    lengths: jax.Array, layer: jax.Array,
    sm_scale: Optional[float] = None,
) -> jax.Array:
    """Slice-then-reference (CPU/ground-truth path)."""
    return decode_attention_reference(
        q, k_all[layer], v_all[layer], lengths, sm_scale=sm_scale)


def decode_attention_reference(
    q: jax.Array, k_cache: jax.Array, v_cache: jax.Array, lengths: jax.Array,
    sm_scale: Optional[float] = None,
) -> jax.Array:
    """Masked full-cache einsum (ground truth / CPU path)."""
    batch, num_q_heads, head_dim = q.shape
    _, num_kv_heads, s_max, _ = k_cache.shape
    group = num_q_heads // num_kv_heads
    scale = sm_scale if sm_scale is not None else 1.0 / np.sqrt(head_dim)
    kf = jnp.repeat(k_cache, group, axis=1)
    vf = jnp.repeat(v_cache, group, axis=1)
    scores = jnp.einsum(
        "bhd,bhkd->bhk", q, kf, preferred_element_type=jnp.float32
    ) * scale
    live = jnp.arange(s_max)[None, None, :] < lengths[:, None, None]
    scores = jnp.where(live, scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1).astype(vf.dtype)
    return jnp.einsum("bhk,bhkd->bhd", probs, vf).astype(q.dtype)


def chunk_attention_reference(
    q: jax.Array, k_cache: jax.Array, v_cache: jax.Array, start: jax.Array,
    sm_scale: Optional[float] = None,
) -> jax.Array:
    """Multi-token chunk attending over the cached prefix plus itself.

    The verification step of speculative decoding: the target model scores
    a chunk of ``S`` draft tokens written into the cache at offset
    ``start`` in ONE forward pass, so chunk row ``i`` may attend to every
    cache position ``j < start + i + 1`` (prefix + causal self).  With
    ``start == 0`` this reduces to plain causal attention over the chunk.

    q: [B, Hq, S, D]; k_cache/v_cache: [B, Hkv, S_max, D] (chunk already
    written at ``start``); start: [B] live-prefix lengths.
    Returns [B, Hq, S, D].
    """
    batch, num_q_heads, seq, head_dim = q.shape
    _, num_kv_heads, s_max, _ = k_cache.shape
    group = num_q_heads // num_kv_heads
    scale = sm_scale if sm_scale is not None else 1.0 / np.sqrt(head_dim)
    kf = jnp.repeat(k_cache, group, axis=1)
    vf = jnp.repeat(v_cache, group, axis=1)
    scores = jnp.einsum(
        "bhsd,bhkd->bhsk", q, kf, preferred_element_type=jnp.float32
    ) * scale
    row_end = start[:, None] + jnp.arange(seq)[None, :] + 1   # [B, S]
    live = (jnp.arange(s_max)[None, None, :]
            < row_end[:, :, None])                            # [B, S, K]
    scores = jnp.where(live[:, None], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1).astype(vf.dtype)
    return jnp.einsum("bhsk,bhkd->bhsd", probs, vf).astype(q.dtype)


def _chunk_kernel(
    starts_ref,                       # scalar-prefetch [B] cache offsets
    q_ref, k_ref, v_ref, o_ref,
    m_ref, l_ref, acc_ref,
    *, sm_scale: float, block_k: int, group: int, chunk: int,
):
    b = pl.program_id(0)
    ik = pl.program_id(2)
    start = starts_ref[b]
    # the furthest row attends start + chunk keys
    last_ik = jnp.maximum(start + chunk - 1, 0) // block_k

    @pl.when(ik == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(ik <= last_ik)
    def _step():
        q = q_ref[0, 0]                     # [R, D]; row = s*G + g
        k = k_ref[0, 0]                     # [BK, D]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sm_scale                        # [R, BK]
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ik * block_k
        row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        row_end = start + row // group + 1  # row's live-prefix length
        s = jnp.where(col < row_end, s, NEG_INF)

        m_prev = m_ref[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_ref[:] = jnp.broadcast_to(
            alpha * l_ref[:, :1] + jnp.sum(p, axis=1, keepdims=True),
            l_ref.shape,
        )
        v = v_ref[0, 0]
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)

    @pl.when(ik == last_ik)
    def _finalize():
        denom = jnp.maximum(l_ref[:, :1], 1e-30)
        o_ref[0, 0] = (acc_ref[:] / denom).astype(o_ref.dtype)


def chunk_attention(
    q: jax.Array,          # [B, Hq, S, D] — chunk written at offset start
    k_cache: jax.Array,    # [B, Hkv, S_max, D]
    v_cache: jax.Array,
    start: jax.Array,      # [B] cache offsets (row s attends start+s+1 keys)
    *,
    sm_scale: Optional[float] = None,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: bool = False,
) -> jax.Array:
    """Length-clamped chunk attention (speculative verify / prefix-cache
    ingest): reads ceil((start+S)/BK) KV blocks instead of the full cache.
    Same math as :func:`chunk_attention_reference`.

    Sized for SMALL chunks (the verify/delta case): all S*G query rows
    live in one VMEM block, so S*G must stay modest — the wrapper rejects
    rows > 512 (use flash attention for big prefills instead).

    Numerics: exact vs the reference in interpret mode (2e-5 f32); on
    real TPU both paths run MXU default-precision matmuls, so they agree
    only to ~1e-3 in f32/bf16 (verified: a poisoned cache tail past each
    row's live region changes NOTHING — masking is exact).
    """
    batch, num_q_heads, chunk, head_dim = q.shape
    _, num_kv_heads, s_max, _ = k_cache.shape
    group = num_q_heads // num_kv_heads
    if chunk * group > 512:
        raise ValueError(
            f"chunk_attention holds all S*G={chunk * group} query rows in "
            "one VMEM block; use flash/reference attention for big chunks")
    scale = sm_scale if sm_scale is not None else 1.0 / np.sqrt(head_dim)

    block_k = min(block_k, s_max)
    if s_max % block_k:
        raise ValueError(f"cache length {s_max} not divisible by {block_k}")
    n_blocks = s_max // block_k

    pd = ((head_dim + LANE - 1) // LANE) * LANE
    rows = chunk * group
    rp = max(8, ((rows + 7) // 8) * 8)

    # [B, Hkv, S*G, D], s-major rows (row = s*G + g)
    qr = q.reshape(batch, num_kv_heads, group, chunk, head_dim)
    qr = qr.transpose(0, 1, 3, 2, 4).reshape(
        batch, num_kv_heads, rows, head_dim)
    qr = jnp.pad(qr, ((0, 0), (0, 0), (0, rp - rows), (0, pd - head_dim)))
    kp = jnp.pad(k_cache, ((0, 0), (0, 0), (0, 0), (0, pd - head_dim)))
    vp = jnp.pad(v_cache, ((0, 0), (0, 0), (0, 0), (0, pd - head_dim)))

    def kv_index(b, h, ik, starts_ref):
        last = jnp.maximum(starts_ref[b] + chunk - 1, 0) // block_k
        return (b, h, jnp.minimum(ik, last), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(batch, num_kv_heads, n_blocks),
        in_specs=[
            pl.BlockSpec((1, 1, rp, pd),
                         lambda b, h, ik, starts: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, block_k, pd), kv_index),
            pl.BlockSpec((1, 1, block_k, pd), kv_index),
        ],
        out_specs=pl.BlockSpec((1, 1, rp, pd),
                               lambda b, h, ik, starts: (b, h, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((rp, LANE), jnp.float32),
            pltpu.VMEM((rp, LANE), jnp.float32),
            pltpu.VMEM((rp, pd), jnp.float32),
        ],
    )

    out = pl.pallas_call(
        functools.partial(_chunk_kernel, sm_scale=scale, block_k=block_k,
                          group=group, chunk=chunk),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (batch, num_kv_heads, rp, pd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(start.astype(jnp.int32), qr, kp, vp)

    out = out[:, :, :rows, :head_dim].reshape(
        batch, num_kv_heads, chunk, group, head_dim)
    return out.transpose(0, 1, 3, 2, 4).reshape(
        batch, num_q_heads, chunk, head_dim)
