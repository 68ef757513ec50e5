"""Ring attention: exact attention over sequence-sharded inputs.

Sequence parallelism for contexts that exceed one chip: q/k/v are sharded
along the sequence axis of a mesh; each ring step computes blockwise
attention against the locally-resident K/V chunk while `ppermute` rotates
K/V to the next device, and per-chunk results merge with the online-
softmax log-sum-exp rule — so memory per chip is O(S/n) and the K/V
transfer rides the ICI ring concurrently with compute.

The reference has no sequence parallelism at all (SURVEY §2.4/§5.7 — long
context is handled algorithmically); this provides the raw-token long-
video path as a first-class component.  Verified exact against full
attention on the virtual mesh.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

NEG_INF = -1e30


def _chunk_attention(
    q: jax.Array,          # [B, H, Sq, D]
    k: jax.Array,          # [B, H, Sk, D]
    v: jax.Array,
    q_offset: jax.Array,   # global position of q[..., 0, :]
    kv_offset: jax.Array,  # global position of k[..., 0, :]
    causal: bool,
    sm_scale: float,
) -> tuple[jax.Array, jax.Array]:
    """Local block attention; returns (unnormalized out, lse).

    ``out = softmax-numerator @ v`` with per-row log-sum-exp so chunks can
    be merged exactly across ring steps.
    """
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * sm_scale
    if causal:
        q_pos = q_offset + jnp.arange(q.shape[2])[:, None]
        k_pos = kv_offset + jnp.arange(k.shape[2])[None, :]
        scores = jnp.where(
            (k_pos <= q_pos)[None, None], scores, NEG_INF
        )
    row_max = jnp.max(scores, axis=-1)                       # [B, H, Sq]
    # fully-masked rows contribute nothing (lse -> -inf)
    safe_max = jnp.where(row_max <= NEG_INF / 2, 0.0, row_max)
    p = jnp.exp(scores - safe_max[..., None])
    p = jnp.where(scores <= NEG_INF / 2, 0.0, p)
    l = jnp.sum(p, axis=-1)                                  # [B, H, Sq]
    out = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)
    # normalize per chunk; the lse-weighted merge re-weights across chunks
    out = out.astype(jnp.float32) / jnp.maximum(l, 1e-30)[..., None]
    lse = jnp.where(l > 0, safe_max + jnp.log(jnp.maximum(l, 1e-30)),
                    NEG_INF)
    return out, lse


def _ring_body(
    q, k, v, *, axis_name: str, causal: bool, sm_scale: float
):
    """Runs INSIDE shard_map: local [B, H, S_loc, D] shards."""
    num_devices = jax.lax.psum(1, axis_name)
    my_index = jax.lax.axis_index(axis_name)
    seq_local = q.shape[2]
    perm = [(i, (i + 1) % num_devices) for i in range(num_devices)]

    def step(s, carry):
        out_acc, lse_acc, k_cur, v_cur = carry
        kv_index = (my_index - s) % num_devices
        out_i, lse_i = _chunk_attention(
            q, k_cur, v_cur,
            q_offset=my_index * seq_local,
            kv_offset=kv_index * seq_local,
            causal=causal,
            sm_scale=sm_scale,
        )
        new_lse = jnp.logaddexp(lse_acc, lse_i)
        # renormalize both accumulators onto the merged lse
        w_acc = jnp.exp(lse_acc - new_lse)[..., None]
        w_i = jnp.exp(lse_i - new_lse)[..., None]
        out_acc = out_acc * w_acc + out_i * w_i
        # keep rotating K/V around the ring (skip after the last step)
        k_next = jax.lax.ppermute(k_cur, axis_name, perm)
        v_next = jax.lax.ppermute(v_cur, axis_name, perm)
        return out_acc, new_lse, k_next, v_next

    batch, heads = q.shape[0], q.shape[1]
    init = (
        jnp.zeros((batch, heads, seq_local, q.shape[3]), jnp.float32),
        jnp.full((batch, heads, seq_local), NEG_INF, jnp.float32),
        k, v,
    )
    out, lse, _, _ = jax.lax.fori_loop(0, num_devices, step, init)
    return out.astype(q.dtype)


def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mesh: Mesh,
    axis_name: str = "data",
    causal: bool = True,
    sm_scale: Optional[float] = None,
) -> jax.Array:
    """Exact attention with q/k/v sequence-sharded over ``axis_name``.

    Args:
        q/k/v: [B, H, S, D] global arrays (S divisible by the axis size).
    Returns:
        [B, H, S, D] attention output, sequence-sharded like the inputs.
    """
    scale = sm_scale if sm_scale is not None else q.shape[-1] ** -0.5
    spec = P(None, None, axis_name, None)
    body = functools.partial(
        _ring_body, axis_name=axis_name, causal=causal, sm_scale=scale
    )
    shard_mapped = jax.shard_map(
        body, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )
    return shard_mapped(q, k, v)
