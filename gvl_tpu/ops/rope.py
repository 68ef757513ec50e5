"""Rotary position embeddings (GPT-NeoX half-rotation convention).

Used by the reasoning core (Qwen3-class) and any encoder that wants
relative positions.  Angles are computed once per (positions, dim, base)
and applied with the rotate-half identity; everything is shape-static and
fuses into the surrounding matmuls under XLA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rope_angles(
    positions: jax.Array, head_dim: int, base: float = 10000.0
) -> tuple[jax.Array, jax.Array]:
    """cos/sin tables for ``positions`` (any shape), each [..., head_dim]."""
    half = head_dim // 2
    freqs = base ** (-jnp.arange(0, half, dtype=jnp.float32) / half)
    angles = positions[..., None].astype(jnp.float32) * freqs  # [..., half]
    angles = jnp.concatenate([angles, angles], axis=-1)        # [..., D]
    return jnp.cos(angles), jnp.sin(angles)


def _rotate_half(x: jax.Array) -> jax.Array:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rope(
    x: jax.Array, cos: jax.Array, sin: jax.Array
) -> jax.Array:
    """Rotate ``x`` [..., S, D] by per-position cos/sin ([S, D] or broadcastable)."""
    # broadcast [S, D] tables over leading batch/head dims
    while cos.ndim < x.ndim:
        cos, sin = cos[None], sin[None]
    out = x * cos + _rotate_half(x) * sin
    return out.astype(x.dtype)
