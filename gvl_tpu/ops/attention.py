"""Fused multi-head attention for TPU: Pallas flash-attention forward.

Replaces the reference's flash-attn-2 CUDA wheel
(`/root/reference/src/agent_core/qwen_reasoning_core.py:1824-1844`) with a
blocked online-softmax kernel: the grid walks (batch, q-head, q-block,
k-block); running max / normalizer / output accumulators live in VMEM
scratch across the sequential k-block dimension, so attention never
materializes the [Sq, Sk] score matrix in HBM.

Supports grouped-query attention (kv heads broadcast over query-head
groups via the k/v index maps), causal masking with diagonal-block
early-out, and right-padded keys (static ``kv_len``).

The public entry :func:`dot_product_attention` dispatches to the kernel on
TPU and to an XLA einsum path elsewhere; gradients always take the XLA
path (forward is wrapped in ``jax.custom_vjp`` with a recompute backward),
which keeps training correct while inference stays on the fused kernel.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128          # TPU lane width: last-dim tile and scratch width
DEFAULT_BLOCK_Q = 512
DEFAULT_BLOCK_K = 1024
NEG_INF = -1e30     # big-negative instead of -inf: keeps exp() NaN-free


def _attn_kernel(
    q_ref, k_ref, v_ref, o_ref,
    m_ref, l_ref, acc_ref,
    *, sm_scale: float, causal: bool, kv_len: int,
    block_q: int, block_k: int, num_k_blocks: int,
):
    iq = pl.program_id(2)
    ik = pl.program_id(3)

    @pl.when(ik == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # Last k-block this q-block must visit (diagonal block when causal).
    if causal:
        last_ik = jnp.minimum(
            ((iq + 1) * block_q - 1) // block_k, num_k_blocks - 1
        )
    else:
        last_ik = num_k_blocks - 1

    @pl.when(ik <= last_ik)
    def _step():
        # keep matmul inputs in their storage dtype (bf16 on the MXU),
        # accumulate f32 via preferred_element_type
        q = q_ref[0, 0]  # (BQ, D)
        k = k_ref[0, 0]  # (BK, D)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sm_scale  # (BQ, BK) f32

        # Masking is only paid where it can bite: the causal mask on
        # diagonal-straddling blocks, the key-padding mask on the final
        # k block (when kv_len is not block-aligned).
        needs_pad_mask = kv_len is not None and kv_len % block_k != 0

        def _mask(s):
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ik * block_k
            if needs_pad_mask:
                s = jnp.where(col < kv_len, s, NEG_INF)
            if causal:
                row = (
                    jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
                    + iq * block_q
                )
                s = jnp.where(col <= row, s, NEG_INF)
            return s

        if causal or needs_pad_mask:
            on_diag = ((ik + 1) * block_k - 1) > (iq * block_q)
            is_tail = ik == pl.num_programs(3) - 1
            cond = jnp.logical_or(
                jnp.logical_and(bool(causal), on_diag),
                jnp.logical_and(bool(needs_pad_mask), is_tail),
            )
            s = jax.lax.cond(cond, _mask, lambda s: s, s)

        m_prev = m_ref[:, :1]                              # (BQ, 1)
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)                             # (BQ, BK)
        alpha = jnp.exp(m_prev - m_new)                    # (BQ, 1)
        l_new = alpha * l_ref[:, :1] + jnp.sum(p, axis=1, keepdims=True)

        v = v_ref[0, 0]                                    # (BK, D)
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(ik == last_ik)
    def _finalize():
        denom = jnp.maximum(l_ref[:, :1], 1e-30)
        o_ref[0, 0] = (acc_ref[:] / denom).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _attn_single_kernel(
    q_ref, k_ref, v_ref, o_ref,
    *, sm_scale: float, causal: bool, kv_len: Optional[int],
    block_q: int, seq_k: int,
):
    """Fast path when all keys fit one block: plain softmax, no scratch.

    Skips the online-softmax running max/normalizer/accumulator traffic
    (several [BQ, 128] f32 reads+writes per step) that dominates VPU time
    for encoder-length sequences.
    """
    iq = pl.program_id(2)
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * sm_scale

    if kv_len is not None and kv_len != seq_k:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, NEG_INF)
    if causal:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + iq * block_q
        s = jnp.where(col <= row, s, NEG_INF)

    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.maximum(jnp.sum(p, axis=1, keepdims=True), 1e-30)
    v = v_ref[0, 0]
    out = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0, 0] = (out / denom).astype(o_ref.dtype)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    sm_scale: Optional[float] = None,
    kv_len: Optional[int] = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: bool = False,
) -> jax.Array:
    """Blocked flash-attention forward.

    Args:
        q: [B, Hq, Sq, D] queries.
        k/v: [B, Hkv, Sk, D]; Hq must be a multiple of Hkv (GQA broadcast).
        causal: apply a causal mask (query i attends keys <= i).
        sm_scale: score scale; default 1/sqrt(D).
        kv_len: number of valid keys (static); keys beyond are masked.
            Defaults to Sk.
    Returns:
        [B, Hq, Sq, D] outputs in q's dtype.
    """
    batch, num_q_heads, seq_q, head_dim = q.shape
    _, num_kv_heads, seq_k, _ = k.shape
    if num_q_heads % num_kv_heads:
        raise ValueError(f"Hq={num_q_heads} not a multiple of Hkv={num_kv_heads}")
    group = num_q_heads // num_kv_heads
    scale = sm_scale if sm_scale is not None else 1.0 / math.sqrt(head_dim)
    valid_kv = kv_len if kv_len is not None else seq_k

    # split the sequence into equal chunks instead of naive clamping:
    # e.g. seq 729 with max block 512 becomes 2x368 (1% pad) rather than
    # 2x512 (40% pad)
    def _pick_block(seq: int, maximum: int) -> int:
        n_blocks = max(1, -(-seq // maximum))
        return _round_up(-(-seq // n_blocks), 16)

    block_q = _pick_block(seq_q, block_q)
    block_k = _pick_block(seq_k, block_k)

    # Pad to block/lane multiples; padded keys are masked via valid_kv,
    # padded query rows and head-dim lanes are sliced off below.
    pq, pk = _round_up(seq_q, block_q), _round_up(seq_k, block_k)
    pd = _round_up(head_dim, LANE)
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, pq - seq_q), (0, pd - head_dim)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, pk - seq_k), (0, pd - head_dim)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, pk - seq_k), (0, pd - head_dim)))

    nq, nk = pq // block_q, pk // block_k

    if nk == 1:
        # all keys in one block: plain-softmax kernel, no scratch
        out = pl.pallas_call(
            functools.partial(
                _attn_single_kernel,
                sm_scale=scale,
                causal=causal,
                kv_len=valid_kv,
                block_q=block_q,
                seq_k=pk,
            ),
            grid=(batch, num_q_heads, nq),
            in_specs=[
                pl.BlockSpec((1, 1, block_q, pd),
                             lambda b, h, iq: (b, h, iq, 0)),
                pl.BlockSpec((1, 1, block_k, pd),
                             lambda b, h, iq, g=group: (b, h // g, 0, 0)),
                pl.BlockSpec((1, 1, block_k, pd),
                             lambda b, h, iq, g=group: (b, h // g, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, block_q, pd),
                                   lambda b, h, iq: (b, h, iq, 0)),
            out_shape=jax.ShapeDtypeStruct(
                (batch, num_q_heads, pq, pd), q.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel"),
            ),
            interpret=interpret,
        )(qp, kp, vp)
        return out[:, :, :seq_q, :head_dim]

    grid = (batch, num_q_heads, nq, nk)

    kernel = functools.partial(
        _attn_kernel,
        sm_scale=scale,
        causal=causal,
        kv_len=valid_kv,
        block_q=block_q,
        block_k=block_k,
        num_k_blocks=nk,
    )

    if causal:
        # clamp the k index at the diagonal: past-diagonal steps map to the
        # same block as the last needed one, so the pipeline skips their
        # DMAs entirely (compute is already skipped via pl.when)
        def kv_index(b, h, iq, ik, g=group):
            last = jnp.minimum(((iq + 1) * block_q - 1) // block_k, nk - 1)
            return (b, h // g, jnp.minimum(ik, last), 0)
    else:
        def kv_index(b, h, iq, ik, g=group):
            return (b, h // g, ik, 0)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 1, block_q, pd),
                lambda b, h, iq, ik: (b, h, iq, 0),
            ),
            pl.BlockSpec((1, 1, block_k, pd), kv_index),
            pl.BlockSpec((1, 1, block_k, pd), kv_index),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_q, pd),
            lambda b, h, iq, ik: (b, h, iq, 0),
        ),
        out_shape=jax.ShapeDtypeStruct((batch, num_q_heads, pq, pd), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, LANE), jnp.float32),  # running max
            pltpu.VMEM((block_q, LANE), jnp.float32),  # running normalizer
            pltpu.VMEM((block_q, pd), jnp.float32),    # output accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qp, kp, vp)

    return out[:, :, :seq_q, :head_dim]


def attention_reference(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    sm_scale: Optional[float] = None,
    kv_len: Optional[int] = None,
) -> jax.Array:
    """XLA einsum attention with identical masking semantics (fallback +
    ground truth for kernel tests; also the backward-pass recompute)."""
    batch, num_q_heads, seq_q, head_dim = q.shape
    _, num_kv_heads, seq_k, _ = k.shape
    group = num_q_heads // num_kv_heads
    scale = sm_scale if sm_scale is not None else 1.0 / math.sqrt(head_dim)

    if group > 1:
        k = jnp.repeat(k, group, axis=1)
        v = jnp.repeat(v, group, axis=1)

    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if kv_len is not None and kv_len < seq_k:
        col = jnp.arange(seq_k)[None, None, None, :]
        s = jnp.where(col < kv_len, s, NEG_INF)
    if causal:
        row = jnp.arange(seq_q)[:, None]
        col = jnp.arange(seq_k)[None, :]
        s = jnp.where(col[None, None] <= row[None, None], s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)
    return out.astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _attention(q, k, v, causal, sm_scale, kv_len):
    # Dispatch on the platform this computation actually LOWERS for, not
    # the process default backend: under the axon tunnel the default is
    # "tpu" even when the enclosing jit targets a CPU mesh (virtual
    # 8-device tests / the driver's dryrun), and pallas_call would fail
    # there.  lax.platform_dependent resolves per lowering platform, so
    # the Pallas branch is only ever compiled for real TPU programs.
    return jax.lax.platform_dependent(
        q, k, v,
        tpu=functools.partial(
            flash_attention, causal=causal, sm_scale=sm_scale, kv_len=kv_len
        ),
        default=functools.partial(
            attention_reference,
            causal=causal, sm_scale=sm_scale, kv_len=kv_len,
        ),
    )


def _attention_fwd(q, k, v, causal, sm_scale, kv_len):
    return _attention(q, k, v, causal, sm_scale, kv_len), (q, k, v)


# dense backward is fine (and fastest) up to this many score elements per
# (batch, head); past it the [Sq, Sk] f32 score/softmax/grad buffers no
# longer fit HBM at training batch sizes, so the blockwise path takes over
_BWD_DENSE_MAX_SCORES = 1024 * 1024
# measured at the 62M QA-LM geometry (b16, seq 4096, v5e): 256-blocks
# 8.7 s/step, 512-blocks 1.87 s, 1024-blocks 1.78 s — 512 keeps ~all of
# the win at half the [B, H, blk, Sk] f32 block-buffer footprint
_BWD_BLOCK_Q = 512


def _bwd_dense(q, k, v, g, causal, scale, kv_len):
    """Full-matrix backward: exact softmax-attention gradients."""
    seq_q, seq_k = q.shape[2], k.shape[2]
    qf32, kf32, vf32, gf32 = (x.astype(jnp.float32) for x in (q, k, v, g))
    s = jnp.einsum("bhqd,bhkd->bhqk", qf32, kf32) * scale
    if kv_len is not None and kv_len < seq_k:
        col = jnp.arange(seq_k)[None, None, None, :]
        s = jnp.where(col < kv_len, s, NEG_INF)
    if causal:
        row = jnp.arange(seq_q)[:, None]
        col = jnp.arange(seq_k)[None, :]
        s = jnp.where(col[None, None] <= row[None, None], s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)

    dv = jnp.einsum("bhqk,bhqd->bhkd", p, gf32)
    dp = jnp.einsum("bhqd,bhkd->bhqk", gf32, vf32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bhqk,bhkd->bhqd", ds, kf32) * scale
    dk = jnp.einsum("bhqk,bhqd->bhkd", ds, qf32) * scale
    return dq, dk, dv


def _bwd_blockwise(q, k, v, g, causal, scale, kv_len, block_q):
    """Flash-style backward: scan over q-blocks, never materializing the
    [Sq, Sk] score matrix.  Peak residency is O(block_q * Sk) per (B, H),
    which is what lets seq-4096 training fit a 16 GB chip (the dense
    backward's four f32[B, H, 4096, 4096] buffers are ~43 GB at B=16).

    Standard flash-backward identity: with O the forward output and
    delta_i = rowsum(dO_i * O_i) = sum_k p_ik dp_ik, each block needs only
    its own rows of p/dp — dk/dv accumulate across blocks in the carry."""
    batch, num_q_heads, seq_q, head_dim = q.shape
    seq_k = k.shape[2]
    qf32, kf32, vf32, gf32 = (x.astype(jnp.float32) for x in (q, k, v, g))

    # delta via a forward recompute (flash kernel on TPU: VMEM-bounded)
    out = _attention(q, k, v, causal, scale, kv_len)
    delta = jnp.sum(gf32 * out.astype(jnp.float32), axis=-1)  # [B, H, Sq]

    n_blocks = -(-seq_q // block_q)
    pad = n_blocks * block_q - seq_q
    if pad:
        # zero dO on padded rows => their ds/dp vanish, so padded rows
        # contribute nothing to dk/dv and their dq rows are sliced away
        qf32 = jnp.pad(qf32, ((0, 0), (0, 0), (0, pad), (0, 0)))
        gf32 = jnp.pad(gf32, ((0, 0), (0, 0), (0, pad), (0, 0)))
        delta = jnp.pad(delta, ((0, 0), (0, 0), (0, pad)))

    col = jnp.arange(seq_k)
    valid_col = (col < kv_len) if (kv_len is not None and kv_len < seq_k) \
        else None

    def body(carry, idx):
        dk_acc, dv_acc = carry
        start = idx * block_q
        q_blk = jax.lax.dynamic_slice_in_dim(qf32, start, block_q, axis=2)
        g_blk = jax.lax.dynamic_slice_in_dim(gf32, start, block_q, axis=2)
        d_blk = jax.lax.dynamic_slice_in_dim(delta, start, block_q, axis=2)

        s = jnp.einsum("bhqd,bhkd->bhqk", q_blk, kf32) * scale
        if valid_col is not None:
            s = jnp.where(valid_col[None, None, None, :], s, NEG_INF)
        if causal:
            row = start + jnp.arange(block_q)
            s = jnp.where(col[None, :] <= row[:, None], s, NEG_INF)
        p = jax.nn.softmax(s, axis=-1)
        dp = jnp.einsum("bhqd,bhkd->bhqk", g_blk, vf32)
        ds = p * (dp - d_blk[..., None])
        dq_blk = jnp.einsum("bhqk,bhkd->bhqd", ds, kf32) * scale
        dk_acc = dk_acc + jnp.einsum("bhqk,bhqd->bhkd", ds, q_blk) * scale
        dv_acc = dv_acc + jnp.einsum("bhqk,bhqd->bhkd", p, g_blk)
        return (dk_acc, dv_acc), dq_blk

    zeros = jnp.zeros((batch, num_q_heads, seq_k, head_dim), jnp.float32)
    (dk, dv), dq_blocks = jax.lax.scan(
        body, (zeros, zeros), jnp.arange(n_blocks))
    # [n_blocks, B, H, block_q, D] -> [B, H, Sq, D]
    dq = jnp.moveaxis(dq_blocks, 0, 2).reshape(
        batch, num_q_heads, n_blocks * block_q, head_dim)[:, :, :seq_q]
    return dq, dk, dv


def _attention_bwd(causal, sm_scale, kv_len, res, g):
    """Recompute backward (XLA): exact softmax-attention gradients.

    Dense for small problems; blockwise (flash-style q-block scan) once
    the score matrix would dominate HBM — the seq-4096 QA-LM training
    OOM'd the dense form at batch 16 (round-5 fix)."""
    q, k, v = res
    batch, num_q_heads, seq_q, head_dim = q.shape
    _, num_kv_heads, seq_k, _ = k.shape
    group = num_q_heads // num_kv_heads
    scale = sm_scale if sm_scale is not None else 1.0 / math.sqrt(head_dim)

    kf = jnp.repeat(k, group, axis=1) if group > 1 else k
    vf = jnp.repeat(v, group, axis=1) if group > 1 else v

    if seq_q * seq_k <= _BWD_DENSE_MAX_SCORES:
        dq, dk, dv = _bwd_dense(q, kf, vf, g, causal, scale, kv_len)
    else:
        dq, dk, dv = _bwd_blockwise(q, kf, vf, g, causal, scale, kv_len,
                                    min(_BWD_BLOCK_Q, seq_q))

    if group > 1:
        dk = dk.reshape(batch, num_kv_heads, group, seq_k, head_dim).sum(2)
        dv = dv.reshape(batch, num_kv_heads, group, seq_k, head_dim).sum(2)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


_attention.defvjp(_attention_fwd, _attention_bwd)


def dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    sm_scale: Optional[float] = None,
    kv_len: Optional[int] = None,
) -> jax.Array:
    """Framework-wide attention entry point ([B, H, S, D] layout).

    Differentiable; uses the Pallas kernel on TPU forward, XLA elsewhere.
    """
    return _attention(q, k, v, causal, sm_scale, kv_len)
