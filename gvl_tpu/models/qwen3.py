"""Qwen3-class decoder LLM in Flax: the reasoning core, TPU-first.

Replaces the reference's HF Qwen3-VL + flash-attn-2 + PEFT stack
(`/root/reference/src/agent_core/qwen_reasoning_core.py:1803-1879`) with:

- GQA attention with per-head q/k RMSNorm (the Qwen3 signature) and RoPE;
- prefill through the Pallas flash kernel at bucketed prompt lengths;
- single-token decode against a static-shape KV cache (functional update,
  masked to the live length) — one jitted step reused for every token;
- LoRA adapters as extra (A, B) params on selected projections, either
  applied on the fly or merged into the base kernels for serving;
- tensor-parallel layout matching gvl_tpu.parallel.sharding.LLM_RULES;
- on-device temperature/top-k/top-p sampling;
- a converter from HF ``Qwen3ForCausalLM`` state dicts.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Any, NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from gvl_tpu.nn.layers import RMSNorm
from gvl_tpu.ops.attention import attention_reference, dot_product_attention
from gvl_tpu.ops.rope import apply_rope, rope_angles


def _rotate_half(x):
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


@dataclass(frozen=True)
class Qwen3Config:
    """Defaults sized for Qwen3-VL-8B's text decoder."""

    hidden_size: int = 4096
    num_layers: int = 36
    num_heads: int = 32
    num_kv_heads: int = 8
    head_dim: int = 128
    intermediate_size: int = 12288
    vocab_size: int = 151936
    rope_theta: float = 1_000_000.0
    rms_norm_eps: float = 1e-6
    tie_word_embeddings: bool = False
    max_cache_length: int = 8192
    scan_layers: bool = False  # nn.scan stack: 1-layer trace, [L,...] params
    # per-layer rematerialization (jax.checkpoint): drop layer activations
    # on the forward pass and recompute them in the backward — the
    # standard TPU FLOPs-for-HBM trade that lets long-sequence training
    # (e.g. the 62M QA-LM at max_len 4096, batch 16) fit one v5e chip's
    # 16 GB.  Forward-only inference is numerically unchanged.
    remat: bool = False
    # length-clamped Pallas decode attention.  Measured IN-MODEL at the
    # full 8B geometry (36L/4096d, int8 weights, v5e-1): 69.1 vs 52.0
    # tok/s at S_max=4096 (1.33x) and 86.3 vs 80.9 at S_max=1024 — the
    # round-1 "tie" was toy-scale fixed overhead.  Dispatch is keyed on
    # the lowering platform, so CPU meshes take the einsum automatically.
    use_decode_kernel: bool = True
    # single-token decode writes K/V through an input-output-ALIASED
    # Pallas kernel (gvl_tpu.ops.cache_update) instead of scatter/DUS:
    # the result provably shares the input buffer, so scan carries and
    # donated jit arguments never pay the S_max-proportional cache copy
    # (round-2 root cause of 68 vs 83 tok/s at S_max=4096).  CPU meshes
    # take the scatter reference via platform_dependent.
    use_cache_append_kernel: bool = True
    # speculative-decoding verification: multi-token chunks written at a
    # nonzero cache offset attend over the cached prefix + causal self
    # (default False = prefill semantics: causal over the chunk only)
    chunk_verify: bool = False
    # weight-only int8 serving: projection + lm_head kernels stored int8
    # with per-output-channel scales (dequant fuses into the matmul operand
    # read, so decode HBM traffic halves and the full 8B geometry fits one
    # v5e chip's 16 GB).  Inference-only — training stays bf16; quantize a
    # trained checkpoint with :func:`quantize_int8`.
    quant_int8: bool = False
    # LoRA (reference finetune config: r=32, alpha=64, 7 targets,
    # /root/reference/scripts/finetune_lora.py:35-51)
    lora_rank: int = 0
    lora_alpha: float = 64.0
    lora_targets: tuple[str, ...] = (
        "q_proj", "k_proj", "v_proj", "o_proj",
        "gate_proj", "up_proj", "down_proj",
    )

    @classmethod
    def qwen3_vl_8b(cls, **kw) -> "Qwen3Config":
        return cls(**kw)

    @classmethod
    def tiny(cls, **kw) -> "Qwen3Config":
        base = dict(hidden_size=64, num_layers=2, num_heads=4, num_kv_heads=2,
                    head_dim=16, intermediate_size=128, vocab_size=512,
                    max_cache_length=128)
        base.update(kw)
        return cls(**base)


class KVCache(NamedTuple):
    """Static-shape per-layer cache; ``length`` is the live prefix size."""

    k: tuple[jax.Array, ...]  # each [B, Hkv, S_max, D]
    v: tuple[jax.Array, ...]
    length: jax.Array         # [] int32

    @classmethod
    def zeros(cls, config: Qwen3Config, batch: int, dtype=jnp.bfloat16):
        shape = (batch, config.num_kv_heads, config.max_cache_length,
                 config.head_dim)
        if config.scan_layers:  # one stacked array per side
            stacked = (config.num_layers, *shape)
            return cls(k=jnp.zeros(stacked, dtype),
                       v=jnp.zeros(stacked, dtype),
                       length=jnp.zeros((), jnp.int32))
        k = tuple(jnp.zeros(shape, dtype) for _ in range(config.num_layers))
        return cls(k=k, v=tuple(jnp.zeros(shape, dtype) for _ in k),
                   length=jnp.zeros((), jnp.int32))


def _int8_kernel_init(key, shape, dtype=jnp.int8):
    """Random int8 kernel (geometry benches / pre-quantized loads)."""
    return jax.random.randint(key, shape, -127, 128, jnp.int32).astype(dtype)


class Int8Dense(nn.Module):
    """Weight-only int8 Dense: ``(x @ Q) * scale`` with per-output-channel
    scales.  The int8→bf16 convert fuses into the dot's operand read, so
    the kernel is streamed from HBM at 1 byte/param — the lever for
    bandwidth-bound decode.  Exact algebra: ``x @ (Q * s) == (x @ Q) * s``
    for a per-column ``s``.
    """

    features: int
    use_bias: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel_q = self.param(
            "kernel_q", _int8_kernel_init, (x.shape[-1], self.features))
        scale = self.param(
            "scale", nn.initializers.constant(1.0 / 127.0),
            (self.features,), jnp.float32)
        out = x @ kernel_q.astype(x.dtype)
        out = out * scale.astype(x.dtype)
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32)
            out = out + bias.astype(x.dtype)
        return out


class LoRADense(nn.Module):
    """Dense with optional low-rank delta: ``x W + scale * (x A) B``.

    ``quant`` stores the base kernel weight-only int8 (LoRA deltas, if
    any, stay bf16 — they are rank-tiny)."""

    features: int
    rank: int = 0
    alpha: float = 64.0
    use_bias: bool = False
    quant: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cls = Int8Dense if self.quant else nn.Dense
        out = cls(self.features, use_bias=self.use_bias, name="base")(x)
        if self.rank > 0:
            a = self.param(
                "lora_a", nn.initializers.normal(0.02), (x.shape[-1], self.rank)
            )
            b = self.param(
                "lora_b", nn.initializers.zeros, (self.rank, self.features)
            )
            out = out + (x @ a.astype(x.dtype)) @ b.astype(x.dtype) * (
                self.alpha / self.rank
            )
        return out


class Qwen3Attention(nn.Module):
    config: Qwen3Config

    def _dense(self, name: str, features: int) -> nn.Module:
        cfg = self.config
        rank = cfg.lora_rank if name in cfg.lora_targets else 0
        return LoRADense(features, rank=rank, alpha=cfg.lora_alpha,
                         quant=cfg.quant_int8, name=name)

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        positions: jax.Array,          # [S] absolute positions of x's tokens
        cache_k: Optional[jax.Array] = None,
        cache_v: Optional[jax.Array] = None,
        cache_len: Optional[jax.Array] = None,
        rope_cos_sin: Optional[tuple] = None,
        stacked_cache: Optional[tuple] = None,  # (k_all, v_all, layer_idx)
    ):
        cfg = self.config
        batch, seq, _ = x.shape
        n_q, n_kv, d = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

        q = self._dense("q_proj", n_q * d)(x).reshape(batch, seq, n_q, d)
        k = self._dense("k_proj", n_kv * d)(x).reshape(batch, seq, n_kv, d)
        v = self._dense("v_proj", n_kv * d)(x).reshape(batch, seq, n_kv, d)

        q = RMSNorm(eps=cfg.rms_norm_eps, name="q_norm")(q)
        k = RMSNorm(eps=cfg.rms_norm_eps, name="k_norm")(k)

        if rope_cos_sin is not None:
            # precomputed (e.g. interleaved mrope): [B, S, D]
            cos, sin = rope_cos_sin
            cos, sin = cos[:, None], sin[:, None]          # [B, 1, S, D]
        else:
            # positions: [S] (shared) or [B, S] (continuous batching)
            cos, sin = rope_angles(positions, d, cfg.rope_theta)
            if positions.ndim == 1:
                cos, sin = cos[None, None], sin[None, None]  # [1, 1, S, D]
            else:
                cos, sin = cos[:, None], sin[:, None]        # [B, 1, S, D]
        q = q.swapaxes(1, 2)                               # [B, Hq, S, D]
        k = k.swapaxes(1, 2)
        q = (q * cos + _rotate_half(q) * sin).astype(q.dtype)
        k = (k * cos + _rotate_half(k) * sin).astype(k.dtype)
        v = v.swapaxes(1, 2)

        if stacked_cache is not None:
            # scan-over-layers single-token decode: the WHOLE stacked
            # [L, B, Hkv, S, D] cache is a loop carry; this layer writes
            # its one row in place (aliased Pallas append) and attends
            # via the layer-indexed decode kernel — no per-layer slice
            # materialization, no scan-output restacking (the round-2
            # S_max-proportional decode tax, ROADMAP "Decode S_max
            # sensitivity")
            from gvl_tpu.ops.cache_update import (
                cache_append_stacked,
                cache_append_stacked_reference,
            )
            from gvl_tpu.ops.decode_attention import (
                decode_attention_stacked,
                decode_attention_stacked_reference,
            )

            k_all, v_all, layer_idx = stacked_cache
            pos = jnp.broadcast_to(
                jnp.atleast_1d(cache_len), (batch,)).astype(jnp.int32)
            k_all = jax.lax.platform_dependent(
                k_all, k.astype(k_all.dtype)[:, :, 0, :], pos, layer_idx,
                tpu=cache_append_stacked,
                default=cache_append_stacked_reference)
            v_all = jax.lax.platform_dependent(
                v_all, v.astype(v_all.dtype)[:, :, 0, :], pos, layer_idx,
                tpu=cache_append_stacked,
                default=cache_append_stacked_reference)
            lengths = pos + 1
            if cfg.use_decode_kernel:
                out = jax.lax.platform_dependent(
                    q[:, :, 0], k_all, v_all, lengths, layer_idx,
                    tpu=decode_attention_stacked,
                    default=decode_attention_stacked_reference,
                )[:, :, None, :]
            else:
                out = decode_attention_stacked_reference(
                    q[:, :, 0], k_all, v_all, lengths, layer_idx
                )[:, :, None, :]
            out = out.swapaxes(1, 2).reshape(batch, seq, n_q * d)
            return self._dense("o_proj", cfg.hidden_size)(out), k_all, v_all

        if cache_k is None:
            # teacher-forced path: causal flash over the sequence
            out = dot_product_attention(q, k, v, causal=True)
            new_k, new_v = k, v
        else:
            # cache_len: scalar (one sequence) or [B] (per-slot lengths)
            if seq == 1 and cfg.use_cache_append_kernel and d % 128 == 0:
                # single-token decode: IN-PLACE Pallas append.  The
                # scatter/DUS forms let XLA materialize a fresh cache
                # buffer whenever donation fails to alias (layout
                # mismatch) — measured ~2 ms/token at S_max=4096, a 20%
                # decode tax.  The aliased kernel writes the one live
                # row into the SAME buffer (gvl_tpu.ops.cache_update).
                from gvl_tpu.ops.cache_update import (
                    cache_append,
                    cache_append_reference,
                )

                pos = jnp.broadcast_to(
                    jnp.atleast_1d(cache_len), (batch,)).astype(jnp.int32)
                new_k = jax.lax.platform_dependent(
                    cache_k, k.astype(cache_k.dtype)[:, :, 0, :], pos,
                    tpu=cache_append, default=cache_append_reference)
                new_v = jax.lax.platform_dependent(
                    cache_v, v.astype(cache_v.dtype)[:, :, 0, :], pos,
                    tpu=cache_append, default=cache_append_reference)
            elif jnp.ndim(cache_len) == 0:
                new_k = jax.lax.dynamic_update_slice(
                    cache_k, k.astype(cache_k.dtype), (0, 0, cache_len, 0)
                )
                new_v = jax.lax.dynamic_update_slice(
                    cache_v, v.astype(cache_v.dtype), (0, 0, cache_len, 0)
                )
            elif seq == 1:
                # per-slot scatter (faster lowering than vmapped
                # dynamic_update_slice on TPU)
                slot = jnp.arange(batch)
                new_k = cache_k.at[slot, :, cache_len, :].set(
                    k.astype(cache_k.dtype)[:, :, 0, :])
                new_v = cache_v.at[slot, :, cache_len, :].set(
                    v.astype(cache_v.dtype)[:, :, 0, :])
            else:
                write = jax.vmap(
                    lambda ck, kk, start: jax.lax.dynamic_update_slice(
                        ck, kk, (0, start, 0))
                )
                new_k = write(cache_k, k.astype(cache_k.dtype), cache_len)
                new_v = write(cache_v, v.astype(cache_v.dtype), cache_len)
            if seq > 1 and cfg.chunk_verify:
                # speculative verification: the chunk sits at offset
                # cache_len, so each row attends over the cached prefix
                # plus its causal slice of the chunk
                start = jnp.broadcast_to(jnp.atleast_1d(cache_len), (batch,))
                rows = seq * (n_q // n_kv)
                from gvl_tpu.ops.decode_attention import (
                    chunk_attention,
                    chunk_attention_reference,
                )

                if cfg.use_decode_kernel and rows <= 512:
                    # platform resolved at lowering time: the Pallas kernel
                    # only compiles into TPU programs, never a CPU mesh
                    out = jax.lax.platform_dependent(
                        q, new_k, new_v, start,
                        tpu=chunk_attention,
                        default=chunk_attention_reference,
                    )
                else:
                    out = chunk_attention_reference(q, new_k, new_v, start)
            elif seq > 1:
                # prefill into an empty cache: causal flash over the prompt
                # only (rows past the true length are masked at decode time)
                out = dot_product_attention(q, k, v, causal=True)
            else:
                # single-token decode over the live prefix only
                lengths = jnp.broadcast_to(
                    jnp.atleast_1d(cache_len), (batch,)) + 1
                from gvl_tpu.ops.decode_attention import (
                    decode_attention,
                    decode_attention_reference,
                )

                if cfg.use_decode_kernel:
                    out = jax.lax.platform_dependent(
                        q[:, :, 0], new_k, new_v, lengths,
                        tpu=decode_attention,
                        default=decode_attention_reference,
                    )[:, :, None, :]
                else:
                    out = decode_attention_reference(
                        q[:, :, 0], new_k, new_v, lengths
                    )[:, :, None, :]

        out = out.swapaxes(1, 2).reshape(batch, seq, n_q * d)
        return self._dense("o_proj", cfg.hidden_size)(out), new_k, new_v


class Qwen3Mlp(nn.Module):
    config: Qwen3Config

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.config

        def dense(name, features):
            rank = cfg.lora_rank if name in cfg.lora_targets else 0
            return LoRADense(features, rank=rank, alpha=cfg.lora_alpha,
                             quant=cfg.quant_int8, name=name)

        gate = dense("gate_proj", cfg.intermediate_size)(x)
        up = dense("up_proj", cfg.intermediate_size)(x)
        return dense("down_proj", cfg.hidden_size)(nn.silu(gate) * up)


class Qwen3Layer(nn.Module):
    config: Qwen3Config

    @nn.compact
    def __call__(self, x, positions, cache_k=None, cache_v=None, cache_len=None,
                 rope_cos_sin=None, stacked_cache=None):
        cfg = self.config
        h = RMSNorm(eps=cfg.rms_norm_eps, name="input_norm")(x)
        attn, new_k, new_v = Qwen3Attention(cfg, name="self_attn")(
            h, positions, cache_k, cache_v, cache_len, rope_cos_sin,
            stacked_cache=stacked_cache,
        )
        x = x + attn
        h = RMSNorm(eps=cfg.rms_norm_eps, name="post_attn_norm")(x)
        return x + Qwen3Mlp(cfg, name="mlp")(h), new_k, new_v


class _ScanLayerBody(nn.Module):
    """nn.scan target.

    Two carry shapes select the mode: ``(x, positions, cache_len)`` with
    per-layer cache xs (prefill / training — ys restack the cache), or
    the 6-tuple ``(x, positions, cache_len, k_all, v_all, idx)`` where
    the WHOLE stacked cache rides the carry and each layer updates its
    slice in place (single-token decode — no ys, no restacking)."""

    config: Qwen3Config

    @nn.compact
    def __call__(self, carry, layer_cache):
        if len(carry) == 6:
            x, positions, cache_len, k_all, v_all, idx = carry
            x, k_all, v_all = Qwen3Layer(self.config, name="layer")(
                x, positions, cache_len=cache_len,
                stacked_cache=(k_all, v_all, idx),
            )
            return (x, positions, cache_len, k_all, v_all, idx + 1), None
        x, positions, cache_len = carry
        cache_k, cache_v = (None, None) if layer_cache is None else layer_cache
        x, new_k, new_v = Qwen3Layer(self.config, name="layer")(
            x, positions, cache_k, cache_v, cache_len
        )
        return (x, positions, cache_len), (new_k, new_v)


class Qwen3Model(nn.Module):
    """Decoder stack with optional KV cache and embedding injection.

    ``config.scan_layers`` switches the stack from an unrolled Python loop
    to ``nn.scan`` with layer-stacked params ([L, ...] leading axis): one
    traced layer regardless of depth, so a 36-layer model compiles in
    roughly 1/36th of the unrolled trace and the cache is one stacked
    array per side instead of 36.
    """

    config: Qwen3Config

    def setup(self):
        cfg = self.config
        self.embed_tokens = nn.Embed(cfg.vocab_size, cfg.hidden_size)
        if cfg.scan_layers:
            body = (nn.remat(_ScanLayerBody) if cfg.remat
                    else _ScanLayerBody)
            self.scanned = nn.scan(
                body,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                length=cfg.num_layers,
            )(cfg, name="layers")
        else:
            layer_cls = nn.remat(Qwen3Layer) if cfg.remat else Qwen3Layer
            self.decoder_layers = [
                layer_cls(cfg, name=f"layers_{i}")
                for i in range(cfg.num_layers)
            ]
        self.final_norm = RMSNorm(eps=cfg.rms_norm_eps)
        if not cfg.tie_word_embeddings:
            head_cls = Int8Dense if cfg.quant_int8 else nn.Dense
            self.lm_head = head_cls(cfg.vocab_size, use_bias=False)

    def __call__(
        self,
        tokens: Optional[jax.Array] = None,       # [B, S] int32
        *,
        inputs_embeds: Optional[jax.Array] = None,  # [B, S, D] overrides tokens
        positions: Optional[jax.Array] = None,
        cache: Optional[KVCache] = None,
        rope_cos_sin: Optional[tuple] = None,
        deepstack_embeds: Optional[jax.Array] = None,  # [L_ds, B, S, D]
    ):
        cfg = self.config
        x = inputs_embeds if inputs_embeds is not None else self.embed_tokens(tokens)
        seq = x.shape[1]
        if positions is None:
            positions = jnp.arange(seq, dtype=jnp.int32)

        if cfg.scan_layers:
            if (cache is not None and seq == 1
                    and cfg.use_cache_append_kernel
                    and cfg.head_dim % 128 == 0):
                # stacked-carry decode: cache rides the scan carry and
                # each layer row-updates its slice in place
                idx0 = jnp.zeros((), jnp.int32)
                (x, _, _, new_k, new_v, _), _ = self.scanned(
                    (x, positions, cache.length, cache.k, cache.v, idx0),
                    None,
                )
            else:
                cache_len = None if cache is None else cache.length
                xs = None if cache is None else (cache.k, cache.v)
                (x, _, _), (new_k, new_v) = self.scanned(
                    (x, positions, cache_len), xs
                )
        else:
            new_k_list, new_v_list = [], []
            for i, layer in enumerate(self.decoder_layers):
                if cache is None:
                    x, k, v = layer(x, positions, rope_cos_sin=rope_cos_sin)
                else:
                    x, k, v = layer(x, positions, cache.k[i], cache.v[i],
                                    cache.length, rope_cos_sin=rope_cos_sin)
                new_k_list.append(k)
                new_v_list.append(v)
                # DeepStack: add visual features after the first few layers
                if (deepstack_embeds is not None
                        and i < deepstack_embeds.shape[0]):
                    x = x + deepstack_embeds[i].astype(x.dtype)
            new_k, new_v = tuple(new_k_list), tuple(new_v_list)

        x = self.final_norm(x)
        if cfg.tie_word_embeddings:
            logits = self.embed_tokens.attend(x)
        else:
            logits = self.lm_head(x)

        new_cache = None
        if cache is not None:
            new_cache = KVCache(
                k=new_k, v=new_v, length=cache.length + seq
            )
        return logits, new_cache

    def embed_only(self, tokens: jax.Array) -> jax.Array:
        """Token embeddings (for host-side inputs_embeds splicing)."""
        return self.embed_tokens(tokens)


# --------------------------------------------------------------------------
# Generation
# --------------------------------------------------------------------------

def sample_logits(
    logits: jax.Array,
    rng: jax.Array,
    temperature: float = 0.7,
    top_p: float = 0.8,
    top_k: int = 20,
) -> jax.Array:
    """Temperature + top-k + nucleus sampling; argmax when temperature=0."""
    if temperature <= 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits.astype(jnp.float32) / temperature
    if top_k and top_k > 0:
        kth = jax.lax.top_k(logits, top_k)[0][..., -1:]
        logits = jnp.where(logits < kth, -1e30, logits)
    if top_p and top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # smallest set with cumulative prob >= top_p (always keep best)
        cutoff_idx = jnp.sum(cum < top_p, axis=-1, keepdims=True)
        cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx, axis=-1)
        logits = jnp.where(logits < cutoff, -1e30, logits)
    return jax.random.categorical(rng, logits, axis=-1).astype(jnp.int32)


class Qwen3Engine:
    """Prefill + streaming decode around :class:`Qwen3Model`.

    >>> engine = Qwen3Engine(config, variables)
    >>> for token in engine.stream(prompt_ids, max_new_tokens=64):
    ...     ...
    """

    PROMPT_BUCKETS = (128, 256, 512, 1024, 2048, 4096, 8192)

    def __init__(
        self,
        config: Qwen3Config,
        variables: dict,
        eos_token_id: int = 151645,  # <|im_end|>
        dtype=jnp.bfloat16,
        mesh=None,
    ):
        """``mesh``: when serving tensor-parallel (variables sharded over
        a ``model`` axis), pass the mesh so the KV cache gets an EXPLICIT
        NamedSharding consistent with the decode-attention consumer
        (kv-heads over ``model`` when divisible, replicated otherwise) and
        keeps it through every step via ``out_shardings`` — without this
        GSPMD infers a per-op cache sharding and falls back to involuntary
        full rematerialization (replicate + repartition the whole cache
        every decode step; VERDICT r3 #6)."""
        self.config = config
        self.variables = variables
        self.eos_token_id = eos_token_id
        self.model = Qwen3Model(config)
        self._dtype = dtype
        self._mesh = mesh
        self._jit_cache: dict = {}

    def _cache_sharding(self):
        """NamedSharding tree matching :meth:`KVCache.zeros`'s layout, or
        None when no mesh is configured."""
        if self._mesh is None:
            return None
        from jax.sharding import NamedSharding, PartitionSpec as P

        cfg = self.config
        model_size = dict(self._mesh.shape).get("model", 1)
        head_axis = ("model" if model_size > 1
                     and cfg.num_kv_heads % model_size == 0 else None)
        if cfg.scan_layers:  # [L, B, Hkv, S, D]
            spec = P(None, None, head_axis, None, None)
        else:                # [B, Hkv, S, D] per layer
            spec = P(None, head_axis, None, None)
        return NamedSharding(self._mesh, spec)

    def _shard_cache(self, cache: "KVCache") -> "KVCache":
        ns = self._cache_sharding()
        if ns is None:
            return cache
        put = lambda side: jax.tree.map(lambda a: jax.device_put(a, ns),
                                        side)
        return cache._replace(k=put(cache.k), v=put(cache.v))

    def _cache_out_shardings(self):
        """(token, cache) out_shardings pytree pinning the cache's
        sharding through prefill/step; None when no mesh."""
        ns = self._cache_sharding()
        if ns is None:
            return None
        n = self.config.num_layers
        sides = (ns if self.config.scan_layers
                 else tuple(ns for _ in range(n)))
        return (None, KVCache(k=sides, v=sides, length=None))

    def _prefill_fn(self, sampling: tuple):
        key = ("prefill", sampling)
        if key not in self._jit_cache:
            temperature, top_p, top_k = sampling

            @partial(jax.jit, donate_argnums=(2,),
                     out_shardings=self._cache_out_shardings())
            def prefill(variables, tokens, cache, embeds_prefix, true_len, rng):
                """Prompt (optionally with an injected multimodal embedding
                prefix) through the model; sample the first new token."""
                x = self.model.apply(
                    variables, tokens, method=Qwen3Model.embed_only
                )
                if embeds_prefix is not None:
                    x = jnp.concatenate(
                        [embeds_prefix.astype(x.dtype), x], axis=1
                    )
                positions = jnp.arange(x.shape[1], dtype=jnp.int32)
                logits, cache = self.model.apply(
                    variables, inputs_embeds=x, positions=positions, cache=cache
                )
                # right-padded prompt: real last token is at true_len - 1
                idx = jnp.full((logits.shape[0], 1, 1), true_len - 1)
                last = jnp.take_along_axis(logits, idx, axis=1)[:, 0]
                cache = cache._replace(length=true_len)
                token = sample_logits(last, rng, temperature, top_p, top_k)
                return token, cache

            self._jit_cache[key] = prefill
        return self._jit_cache[key]

    def _step_fn(self, sampling: tuple):
        key = ("step", sampling)
        if key not in self._jit_cache:
            temperature, top_p, top_k = sampling

            @partial(jax.jit, donate_argnums=(2,),
                     out_shardings=self._cache_out_shardings())
            def step(variables, token, cache, rng):
                positions = cache.length[None]
                logits, cache = self.model.apply(
                    variables, token[:, None], positions=positions, cache=cache
                )
                nxt = sample_logits(
                    logits[:, -1], rng, temperature, top_p, top_k
                )
                return nxt, cache

            self._jit_cache[key] = step
        return self._jit_cache[key]

    def _bucket(self, n: int) -> int:
        for b in self.PROMPT_BUCKETS:
            if n <= b:
                return min(b, self.config.max_cache_length)
        return self.config.max_cache_length

    def stream(
        self,
        prompt_ids: list[int] | np.ndarray,
        max_new_tokens: int = 512,
        temperature: float = 0.7,
        top_p: float = 0.8,
        top_k: int = 20,
        rng: Optional[jax.Array] = None,
        inputs_embeds_prefix: Optional[np.ndarray] = None,
    ):
        """Yield generated token ids one at a time (greedy if T=0)."""
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        ids = np.asarray(prompt_ids, np.int32)[None]
        prefix = (
            jnp.asarray(inputs_embeds_prefix, self._dtype)[None]
            if inputs_embeds_prefix is not None else None
        )
        n_prefix = 0 if prefix is None else prefix.shape[1]
        true_len = ids.shape[1] + n_prefix
        if true_len > self.config.max_cache_length:
            raise ValueError(
                f"prompt length {true_len} ({ids.shape[1]} tokens"
                f" + {n_prefix} embed-prefix rows) exceeds"
                f" max_cache_length={self.config.max_cache_length};"
                " truncate the context or raise Qwen3Config.max_cache_length"
            )
        # pad the token prompt so (prefix + tokens) hits a static bucket
        bucket = self._bucket(true_len)
        pad = bucket - true_len
        if pad:
            ids = np.pad(ids, ((0, 0), (0, pad)))

        sampling = (float(temperature), float(top_p), int(top_k))
        cache = self._shard_cache(
            KVCache.zeros(self.config, batch=1, dtype=self._dtype))
        rng, sub = jax.random.split(rng)
        token, cache = self._prefill_fn(sampling)(
            self.variables, jnp.asarray(ids), cache, prefix,
            jnp.int32(true_len), sub,
        )

        step = self._step_fn(sampling)
        for _ in range(max_new_tokens):
            tok = int(token[0])
            if tok == self.eos_token_id:
                return
            yield tok
            rng, sub = jax.random.split(rng)
            token, cache = step(self.variables, token, cache, sub)

    def generate(self, prompt_ids, **kw) -> list[int]:
        return list(self.stream(prompt_ids, **kw))


# --------------------------------------------------------------------------
# LoRA utilities
# --------------------------------------------------------------------------

def merge_lora(params: dict, config: Qwen3Config) -> dict:
    """Fold every (lora_a, lora_b) into its base kernel for serving."""
    scale = config.lora_alpha / max(config.lora_rank, 1)

    def walk(tree):
        if isinstance(tree, dict):
            if "lora_a" in tree and "base" in tree:
                merged = dict(tree["base"])
                merged["kernel"] = (
                    tree["base"]["kernel"]
                    + tree["lora_a"] @ tree["lora_b"] * scale
                )
                return {"base": merged}
            return {k: walk(v) for k, v in tree.items()}
        return tree

    return walk(params)


def quantize_int8(params: dict, config: Qwen3Config) -> dict:
    """bf16/f32 checkpoint → weight-only int8 params for a model built
    with ``config.quant_int8=True``.

    Symmetric per-output-channel quantization of every projection base
    kernel and the lm_head: ``scale = max|w| / 127`` along the input
    axis (axis -2, so layer-stacked ``scan_layers`` kernels quantize
    per-layer-per-column).  Merge LoRA first (:func:`merge_lora`) —
    quantized bases are inference-only.
    """
    if config.lora_rank > 0:
        params = merge_lora(params, config)

    def quantize_kernel(w):
        w = jnp.asarray(w, jnp.float32)
        amax = jnp.max(jnp.abs(w), axis=-2)
        scale = jnp.maximum(amax, 1e-8) / 127.0
        q = jnp.clip(
            jnp.round(w / scale[..., None, :]), -127, 127
        ).astype(jnp.int8)
        return q, scale

    def walk(tree, name=""):
        if isinstance(tree, dict):
            if "kernel" in tree and name in ("base", "lm_head"):
                q, scale = quantize_kernel(tree["kernel"])
                new = {"kernel_q": q, "scale": scale}
                new.update(
                    {k: v for k, v in tree.items() if k != "kernel"})
                return new
            return {k: walk(v, k) for k, v in tree.items()}
        return tree

    return walk(params)


# --------------------------------------------------------------------------
# HF conversion
# --------------------------------------------------------------------------

def _t(x) -> np.ndarray:
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)


def convert_hf_qwen3(state_dict: dict[str, Any], config: Qwen3Config) -> dict:
    """Map a HF ``Qwen3ForCausalLM`` state dict onto :class:`Qwen3Model`.

    Projection kernels land under ``<name>/base`` (the LoRADense layout);
    fresh LoRA params, when enabled, initialize to zero-delta.
    """
    sd = {k.removeprefix("model."): v for k, v in state_dict.items()}
    params: dict[str, Any] = {
        "embed_tokens": {"embedding": _t(sd["embed_tokens.weight"])},
        "final_norm": {"scale": _t(sd["norm.weight"])},
    }
    if not config.tie_word_embeddings:
        params["lm_head"] = {"kernel": _t(sd["lm_head.weight"]).T}
    for i in range(config.num_layers):
        pre = f"layers.{i}."
        proj = lambda name: {"base": {"kernel": _t(sd[pre + name + ".weight"]).T}}
        params[f"layers_{i}"] = {
            "input_norm": {"scale": _t(sd[pre + "input_layernorm.weight"])},
            "self_attn": {
                "q_proj": proj("self_attn.q_proj"),
                "k_proj": proj("self_attn.k_proj"),
                "v_proj": proj("self_attn.v_proj"),
                "o_proj": proj("self_attn.o_proj"),
                "q_norm": {"scale": _t(sd[pre + "self_attn.q_norm.weight"])},
                "k_norm": {"scale": _t(sd[pre + "self_attn.k_norm.weight"])},
            },
            "post_attn_norm": {
                "scale": _t(sd[pre + "post_attention_layernorm.weight"])
            },
            "mlp": {
                "gate_proj": proj("mlp.gate_proj"),
                "up_proj": proj("mlp.up_proj"),
                "down_proj": proj("mlp.down_proj"),
            },
        }
    if config.scan_layers:
        # stack per-layer trees into [L, ...] leaves under layers/layer
        per_layer = [params.pop(f"layers_{i}")
                     for i in range(config.num_layers)]
        params["layers"] = {
            "layer": jax.tree.map(lambda *xs: np.stack(xs), *per_layer)
        }
    return jax.tree.map(jnp.asarray, params)


def load_adapter_and_merge(
    base_config: Qwen3Config,
    base_variables: dict,
    adapter_dir: str,
) -> tuple[Qwen3Config, dict]:
    """Fold a trained LoRA adapter (npz + adapter_config.json) into the
    base weights for serving.  Returns (rank-0 config, merged variables)."""
    import json
    from pathlib import Path

    adapter_dir = Path(adapter_dir)
    meta = json.loads((adapter_dir / "adapter_config.json").read_text())
    lora_cfg = Qwen3Config(**{
        **{f.name: getattr(base_config, f.name)
           for f in base_config.__dataclass_fields__.values()},
        "lora_rank": int(meta["lora_rank"]),
        "lora_alpha": float(meta["lora_alpha"]),
        "lora_targets": tuple(meta.get("targets", base_config.lora_targets)),
    })
    model = Qwen3Model(lora_cfg)
    seed = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32)
    )["params"]

    def graft(dst, src):
        for key, value in src.items():
            if isinstance(value, dict):
                graft(dst[key], value)
            else:
                dst[key] = value

    import flax

    params = flax.core.unfreeze(seed)
    graft(params, base_variables["params"])

    adapter_path = adapter_dir / "adapter_final.npz"
    if not adapter_path.exists():
        candidates = sorted(adapter_dir.glob("adapter_step*.npz"))
        adapter_path = candidates[-1] if candidates else None
    if adapter_path is not None:
        with np.load(adapter_path) as z:
            flat = {k: z[k] for k in z.files}

        def load(tree, prefix=""):
            for key, value in list(tree.items()):
                path = f"{prefix}/{key}" if prefix else key
                if isinstance(value, dict):
                    load(value, path)
                elif path in flat:
                    if tuple(flat[path].shape) != tuple(value.shape):
                        # an adapter trained over a DIFFERENT base
                        # geometry (e.g. the v4 15M rung after the base
                        # checkpoint moved to v5 62M) would otherwise be
                        # grafted silently and explode inside merge_lora
                        raise ValueError(
                            f"adapter tensor {path} has shape "
                            f"{tuple(flat[path].shape)} but the base "
                            f"geometry expects {tuple(value.shape)}; "
                            f"the adapter in {adapter_dir} was trained "
                            "over an incompatible base checkpoint")
                    tree[key] = jnp.asarray(flat[path])

        load(params)

    merged = merge_lora(params, lora_cfg)
    base_cfg_plain = Qwen3Config(**{
        **{f.name: getattr(lora_cfg, f.name)
           for f in lora_cfg.__dataclass_fields__.values()},
        "lora_rank": 0,
    })
    return base_cfg_plain, {"params": merged}


def load_hf_qwen3(
    model_name_or_path: str, config: Optional[Qwen3Config] = None
) -> tuple[Qwen3Model, dict]:
    from transformers import Qwen3ForCausalLM

    model = Qwen3ForCausalLM.from_pretrained(model_name_or_path)
    hf = model.config
    config = config or Qwen3Config(
        hidden_size=hf.hidden_size,
        num_layers=hf.num_hidden_layers,
        num_heads=hf.num_attention_heads,
        num_kv_heads=hf.num_key_value_heads,
        head_dim=hf.head_dim,
        intermediate_size=hf.intermediate_size,
        vocab_size=hf.vocab_size,
        rope_theta=hf.rope_theta,
        rms_norm_eps=hf.rms_norm_eps,
        tie_word_embeddings=hf.tie_word_embeddings,
    )
    params = convert_hf_qwen3(model.state_dict(), config)
    return Qwen3Model(config), {"params": params}
