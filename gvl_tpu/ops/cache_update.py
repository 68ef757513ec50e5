"""In-place KV-cache append (Pallas, TPU).

The decode step appends one token's K/V per layer.  Expressed as
``dynamic_update_slice`` / ``.at[].set``, XLA materializes a NEW cache
buffer per step whenever donation fails to alias — and donation fails
exactly when the producing op's preferred layout differs from the
consumer's (measured round 2: mismatched V-cache layouts cost ~2 ms/token
at S_max=4096, a 20% decode tax; ROADMAP "Decode S_max sensitivity").

This kernel writes the single live row through a ``pallas_call`` whose
cache operand is **input-output aliased**: the output IS the input buffer,
so no copy exists to elide, and the layout is identical by construction.
Grid covers only the touched (batch, head) blocks — the untouched
S_max-1 rows are never read or written.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


SUBLANE = 8


def _append_kernel(pos_ref, new_ref, cache_ref, out_ref):
    # TPU blocks must span >=8 sublanes: the block is the 8-row window
    # containing the write position; the other 7 rows are rewritten with
    # their own (aliased) values
    b = pl.program_id(0)
    row = pos_ref[b] % SUBLANE
    rows = jax.lax.broadcasted_iota(
        jnp.int32, cache_ref[0, 0].shape, 0)
    out_ref[0, 0] = jnp.where(rows == row, new_ref[0, 0],
                              cache_ref[0, 0])


def cache_append(
    cache: jax.Array,       # [B, Hkv, S_max, D]
    new: jax.Array,         # [B, Hkv, D] — one token per slot
    positions: jax.Array,   # [B] write offsets (each slot's live length)
    *,
    interpret: bool = False,
) -> jax.Array:
    """Returns ``cache`` with ``new`` written at ``positions``, in place.

    Semantically equals
    ``cache.at[arange(B), :, positions, :].set(new)`` but guarantees the
    result aliases the input buffer (no per-step full-cache copy and no
    layout flip under ``lax.scan`` carries or donated jit arguments).
    """
    batch, num_kv_heads, s_max, head_dim = cache.shape
    if head_dim % LANE:
        # pad-free fast path only; odd head dims take the scatter path
        raise ValueError(f"head_dim {head_dim} must be a multiple of {LANE}")
    if s_max % SUBLANE:
        raise ValueError(f"S_max {s_max} must be a multiple of {SUBLANE}")
    # broadcast the new row across the 8-sublane block; the kernel
    # row-selects
    new4 = jnp.broadcast_to(new[:, :, None, :],
                            (batch, num_kv_heads, SUBLANE, head_dim))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(batch, num_kv_heads),
        in_specs=[
            pl.BlockSpec((1, 1, SUBLANE, head_dim),
                         lambda b, h, pos: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, SUBLANE, head_dim),
                         lambda b, h, pos: (b, h, pos[b] // SUBLANE, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, SUBLANE, head_dim),
                               lambda b, h, pos: (b, h, pos[b] // SUBLANE,
                                                  0)),
    )
    return pl.pallas_call(
        _append_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(cache.shape, cache.dtype),
        # operand 2 (the cache; index counts the scalar-prefetch arg) IS
        # the output buffer
        input_output_aliases={2: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(positions.astype(jnp.int32), new4, cache)


def cache_append_reference(
    cache: jax.Array, new: jax.Array, positions: jax.Array
) -> jax.Array:
    """Scatter semantics (ground truth / CPU path)."""
    batch = cache.shape[0]
    slot = jnp.arange(batch)
    return cache.at[slot, :, positions, :].set(new.astype(cache.dtype))


def _append_kernel_stacked(layer_ref, pos_ref, new_ref, cache_ref, out_ref):
    del layer_ref  # consumed by the index maps
    b = pl.program_id(0)
    row = pos_ref[b] % SUBLANE
    rows = jax.lax.broadcasted_iota(
        jnp.int32, cache_ref[0, 0, 0].shape, 0)
    out_ref[0, 0, 0] = jnp.where(rows == row, new_ref[0, 0],
                                 cache_ref[0, 0, 0])


def cache_append_stacked(
    cache: jax.Array,       # [L, B, Hkv, S_max, D] — ALL layers
    new: jax.Array,         # [B, Hkv, D]
    positions: jax.Array,   # [B]
    layer: jax.Array,       # scalar int32
    *,
    interpret: bool = False,
) -> jax.Array:
    """In-place append into layer ``layer`` of the STACKED cache.

    The scan-over-layers decode keeps the whole [L, ...] cache as a loop
    carry; this kernel touches only the 8-sublane window of the one
    (layer, slot, head) row being written, and the aliased output IS the
    carry buffer — so the carry never copies, whatever S_max is.
    """
    n_layers, batch, num_kv_heads, s_max, head_dim = cache.shape
    if head_dim % LANE:
        raise ValueError(f"head_dim {head_dim} must be a multiple of {LANE}")
    if s_max % SUBLANE:
        raise ValueError(f"S_max {s_max} must be a multiple of {SUBLANE}")
    new4 = jnp.broadcast_to(new[:, :, None, :],
                            (batch, num_kv_heads, SUBLANE, head_dim))

    cache_index = lambda b, h, lay, pos: (lay[0], b, h,
                                          pos[b] // SUBLANE, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(batch, num_kv_heads),
        in_specs=[
            pl.BlockSpec((1, 1, SUBLANE, head_dim),
                         lambda b, h, lay, pos: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, 1, SUBLANE, head_dim), cache_index),
        ],
        out_specs=pl.BlockSpec((1, 1, 1, SUBLANE, head_dim), cache_index),
    )
    return pl.pallas_call(
        _append_kernel_stacked,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(cache.shape, cache.dtype),
        # operand 3 (the cache; indices count the two scalar-prefetch
        # args) IS the output buffer
        input_output_aliases={3: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(jnp.reshape(layer, (1,)).astype(jnp.int32),
      positions.astype(jnp.int32), new4, cache)


def cache_append_stacked_reference(
    cache: jax.Array, new: jax.Array, positions: jax.Array,
    layer: jax.Array,
) -> jax.Array:
    """Scatter semantics into one layer of the stacked cache."""
    updated = cache_append_reference(cache[layer], new, positions)
    return cache.at[layer].set(updated)
