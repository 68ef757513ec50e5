"""Transformer building blocks shared by all model families.

One configurable pre-norm block covers the whole zoo this framework ships:
LayerNorm+GELU encoders (SigLIP/VideoMAE/Whisper/Wav2Vec2-class) and
RMSNorm+SwiGLU decoders (Qwen3-class).  Attention routes through
:func:`gvl_tpu.ops.dot_product_attention` (Pallas flash kernel on TPU).

Naming is chosen to line up with the tensor-parallel sharding rules in
:mod:`gvl_tpu.parallel.sharding`: ``q/k/v_proj`` and ``gate/up/fc1`` are
column-parallel, ``o_proj`` and ``down/fc2`` are row-parallel.
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from gvl_tpu.ops.attention import dot_product_attention
from gvl_tpu.ops.rope import apply_rope


class RMSNorm(nn.Module):
    """Root-mean-square norm with f32 accumulation."""

    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        xf = x.astype(jnp.float32)
        norm = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + self.eps)
        return (norm * scale).astype(x.dtype)


def _make_norm(kind: str, eps: float) -> nn.Module:
    if kind == "rmsnorm":
        return RMSNorm(eps=eps)
    if kind == "layernorm":
        return nn.LayerNorm(epsilon=eps)
    raise ValueError(f"unknown norm kind: {kind}")


class Attention(nn.Module):
    """Multi-head (optionally grouped-query, cross-, rotary) attention.

    Input/output layout is [batch, seq, dim]; heads are split internally
    to the kernel's [B, H, S, D] layout.
    """

    num_heads: int
    num_kv_heads: Optional[int] = None   # None => MHA
    head_dim: Optional[int] = None       # None => dim // num_heads
    out_dim: Optional[int] = None        # None => input dim
    use_bias: bool = True
    causal: bool = False
    qk_norm: bool = False                # per-head RMSNorm on q/k (Qwen3)
    rope: bool = False
    rope_base: float = 10000.0
    dtype: Optional[jnp.dtype] = None
    quant: bool = False                  # W8A8 projections (int8 MXU)
    quant_static: bool = False           # calibrated static act scales

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        kv: Optional[jax.Array] = None,
        *,
        positions: Optional[jax.Array] = None,
        kv_len: Optional[int] = None,
    ) -> jax.Array:
        batch, seq_q, dim = x.shape
        kv_in = x if kv is None else kv
        seq_k = kv_in.shape[1]
        n_q = self.num_heads
        n_kv = self.num_kv_heads or n_q
        d_head = self.head_dim or dim // n_q
        d_out = self.out_dim or dim

        if self.quant:
            from gvl_tpu.nn.quant import W8A8Dense

            dense = lambda feats, name: W8A8Dense(
                feats, use_bias=self.use_bias,
                static_act=self.quant_static, name=name)
        else:
            dense = lambda feats, name: nn.DenseGeneral(
                feats, use_bias=self.use_bias, dtype=self.dtype, name=name
            )
        q = dense(n_q * d_head, "q_proj")(x)
        k = dense(n_kv * d_head, "k_proj")(kv_in)
        v = dense(n_kv * d_head, "v_proj")(kv_in)

        q = q.reshape(batch, seq_q, n_q, d_head)
        k = k.reshape(batch, seq_k, n_kv, d_head)
        v = v.reshape(batch, seq_k, n_kv, d_head)

        if self.qk_norm:
            q = RMSNorm(name="q_norm")(q)
            k = RMSNorm(name="k_norm")(k)

        if self.rope:
            from gvl_tpu.ops.rope import rope_angles

            pos_q = (
                positions
                if positions is not None
                else jnp.arange(seq_q, dtype=jnp.int32)
            )
            cos, sin = rope_angles(pos_q, d_head, self.rope_base)
            q = apply_rope(q.swapaxes(1, 2), cos, sin).swapaxes(1, 2)
            if kv is None:
                k = apply_rope(k.swapaxes(1, 2), cos, sin).swapaxes(1, 2)

        out = dot_product_attention(
            q.swapaxes(1, 2),
            k.swapaxes(1, 2),
            v.swapaxes(1, 2),
            causal=self.causal,
            kv_len=kv_len,
        ).swapaxes(1, 2)  # [B, S, H, D]

        out = out.reshape(batch, seq_q, n_q * d_head)
        return dense(d_out, "o_proj")(out)


class MlpGelu(nn.Module):
    """fc1 → activation → fc2 (encoder-family MLP)."""

    intermediate_dim: int
    use_bias: bool = True
    act: Callable = nn.gelu
    dtype: Optional[jnp.dtype] = None
    quant: bool = False
    quant_static: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.quant:
            from gvl_tpu.nn.quant import W8A8Dense

            dense = lambda feats, name: W8A8Dense(
                feats, use_bias=self.use_bias,
                static_act=self.quant_static, name=name)
        else:
            dense = lambda feats, name: nn.Dense(
                feats, use_bias=self.use_bias, dtype=self.dtype,
                name=name)
        dim = x.shape[-1]
        h = dense(self.intermediate_dim, "fc1")(x)
        h = self.act(h)
        return dense(dim, "fc2")(h)


class MlpSwiGLU(nn.Module):
    """gate/up/down SwiGLU MLP (decoder-family)."""

    intermediate_dim: int
    use_bias: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        dim = x.shape[-1]
        gate = nn.Dense(self.intermediate_dim, use_bias=self.use_bias,
                        dtype=self.dtype, name="gate_proj")(x)
        up = nn.Dense(self.intermediate_dim, use_bias=self.use_bias,
                      dtype=self.dtype, name="up_proj")(x)
        h = nn.silu(gate) * up
        return nn.Dense(dim, use_bias=self.use_bias, dtype=self.dtype,
                        name="down_proj")(h)


class TransformerBlock(nn.Module):
    """Pre-norm transformer layer, configurable into either family."""

    num_heads: int
    intermediate_dim: int
    num_kv_heads: Optional[int] = None
    head_dim: Optional[int] = None
    norm: str = "layernorm"          # "layernorm" | "rmsnorm"
    mlp: str = "gelu"                # "gelu" | "swiglu"
    causal: bool = False
    rope: bool = False
    rope_base: float = 10000.0
    qk_norm: bool = False
    use_bias: bool = True
    norm_eps: float = 1e-6
    dtype: Optional[jnp.dtype] = None
    quant: bool = False
    quant_static: bool = False

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        *,
        positions: Optional[jax.Array] = None,
        kv_len: Optional[int] = None,
    ) -> jax.Array:
        attn_in = _make_norm(self.norm, self.norm_eps)(x)
        x = x + Attention(
            num_heads=self.num_heads,
            num_kv_heads=self.num_kv_heads,
            head_dim=self.head_dim,
            use_bias=self.use_bias,
            causal=self.causal,
            rope=self.rope,
            rope_base=self.rope_base,
            qk_norm=self.qk_norm,
            dtype=self.dtype,
            quant=self.quant,
            quant_static=self.quant_static,
            name="attention",
        )(attn_in, positions=positions, kv_len=kv_len)

        mlp_in = _make_norm(self.norm, self.norm_eps)(x)
        if self.mlp == "swiglu":
            mlp_mod = MlpSwiGLU(self.intermediate_dim, use_bias=False,
                                dtype=self.dtype, name="mlp")
        else:
            mlp_mod = MlpGelu(self.intermediate_dim, use_bias=self.use_bias,
                              dtype=self.dtype, quant=self.quant,
                              quant_static=self.quant_static,
                              name="mlp")
        return x + mlp_mod(mlp_in)


class TransformerStack(nn.Module):
    """A stack of identical :class:`TransformerBlock` layers."""

    num_layers: int
    num_heads: int
    intermediate_dim: int
    num_kv_heads: Optional[int] = None
    head_dim: Optional[int] = None
    norm: str = "layernorm"
    mlp: str = "gelu"
    causal: bool = False
    rope: bool = False
    rope_base: float = 10000.0
    qk_norm: bool = False
    use_bias: bool = True
    norm_eps: float = 1e-6
    dtype: Optional[jnp.dtype] = None
    final_norm: bool = True

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        *,
        positions: Optional[jax.Array] = None,
        kv_len: Optional[int] = None,
    ) -> jax.Array:
        for i in range(self.num_layers):
            x = TransformerBlock(
                num_heads=self.num_heads,
                intermediate_dim=self.intermediate_dim,
                num_kv_heads=self.num_kv_heads,
                head_dim=self.head_dim,
                norm=self.norm,
                mlp=self.mlp,
                causal=self.causal,
                rope=self.rope,
                rope_base=self.rope_base,
                qk_norm=self.qk_norm,
                use_bias=self.use_bias,
                norm_eps=self.norm_eps,
                dtype=self.dtype,
                name=f"layers_{i}",
            )(x, positions=positions, kv_len=kv_len)
        if self.final_norm:
            x = _make_norm(self.norm, self.norm_eps)(x)
        return x
