"""Whisper ASR (encoder-decoder) in Flax, TPU-first.

Log-mel (3000 frames = 30 s) → encoder states → greedy/temperature decode
with a static-shape KV cache inside ``lax.while_loop`` — the TPU
replacement for the reference's openai-whisper path
(`/root/reference/scripts/realtime_inference.py:525-602`).

Encoder: two 1-D convs (stride 1, 2) + sinusoidal positions + pre-norm
layers.  Decoder: learned positions, self-attention with cache,
cross-attention over encoder states.  Includes a HF ``WhisperModel``
converter.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from gvl_tpu.ops.attention import attention_reference, dot_product_attention

_gelu = partial(nn.gelu, approximate=False)


@dataclass(frozen=True)
class WhisperConfig:
    """Defaults: openai/whisper-base."""

    d_model: int = 512
    encoder_layers: int = 6
    decoder_layers: int = 6
    num_heads: int = 8
    ffn_dim: int = 2048
    num_mel_bins: int = 80
    max_source_positions: int = 1500
    max_target_positions: int = 448
    vocab_size: int = 51865
    layer_norm_eps: float = 1e-5
    # token ids (whisper-base vocabulary)
    decoder_start_token_id: int = 50258  # <|startoftranscript|>
    eos_token_id: int = 50257

    @classmethod
    def base(cls) -> "WhisperConfig":
        return cls()

    @classmethod
    def tiny_random(cls) -> "WhisperConfig":
        return cls(d_model=32, encoder_layers=1, decoder_layers=1,
                   num_heads=2, ffn_dim=64, num_mel_bins=16,
                   max_source_positions=100, max_target_positions=60,
                   vocab_size=51000)


def sinusoids(length: int, channels: int) -> np.ndarray:
    """Whisper's fixed encoder position embedding."""
    log_timescale = np.log(10000.0) / (channels // 2 - 1)
    inv = np.exp(-log_timescale * np.arange(channels // 2))
    scaled = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(scaled), np.cos(scaled)], axis=1).astype(np.float32)


class _MHA(nn.Module):
    """Whisper attention: q/v/out have bias, k does not."""

    d_model: int
    num_heads: int
    causal: bool = False

    def setup(self):
        self.q_proj = nn.Dense(self.d_model)
        self.k_proj = nn.Dense(self.d_model, use_bias=False)
        self.v_proj = nn.Dense(self.d_model)
        self.o_proj = nn.Dense(self.d_model)

    def _split(self, t):
        batch, seq = t.shape[:2]
        return t.reshape(batch, seq, self.num_heads, -1).swapaxes(1, 2)

    def __call__(self, x, kv=None, *, kv_len=None):
        source = x if kv is None else kv
        batch, seq_q = x.shape[:2]
        out = dot_product_attention(
            self._split(self.q_proj(x)),
            self._split(self.k_proj(source)),
            self._split(self.v_proj(source)),
            causal=self.causal, kv_len=kv_len,
        )
        return self.o_proj(
            out.swapaxes(1, 2).reshape(batch, seq_q, self.d_model))

    def project_kv(self, source):
        """Precompute split K/V (cross-attention cache)."""
        return self._split(self.k_proj(source)), self._split(self.v_proj(source))

    def attend_precomputed(self, x, k4, v4):
        batch, seq_q = x.shape[:2]
        out = dot_product_attention(self._split(self.q_proj(x)), k4, v4)
        return self.o_proj(
            out.swapaxes(1, 2).reshape(batch, seq_q, self.d_model))

    def decode_step(self, x1, cache_k, cache_v, pos):
        """One-token causal self-attention against a [B, H, T, Dh] cache."""
        import numpy as _np

        batch = x1.shape[0]
        q = self._split(self.q_proj(x1))                 # [B, H, 1, Dh]
        k1 = self._split(self.k_proj(x1))
        v1 = self._split(self.v_proj(x1))
        cache_k = jax.lax.dynamic_update_slice(
            cache_k, k1.astype(cache_k.dtype), (0, 0, pos, 0))
        cache_v = jax.lax.dynamic_update_slice(
            cache_v, v1.astype(cache_v.dtype), (0, 0, pos, 0))
        t_max = cache_k.shape[2]
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", q, cache_k,
            preferred_element_type=jnp.float32,
        ) / _np.sqrt(q.shape[-1])
        live = jnp.arange(t_max)[None, None, None, :] <= pos
        scores = jnp.where(live, scores, -1e30)
        probs = jax.nn.softmax(scores, axis=-1).astype(cache_v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, cache_v)
        out = out.swapaxes(1, 2).reshape(batch, 1, self.d_model)
        return self.o_proj(out), cache_k, cache_v


class _EncoderLayer(nn.Module):
    config: WhisperConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="attn_norm")(x)
        x = x + _MHA(cfg.d_model, cfg.num_heads, name="self_attn")(h)
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="ff_norm")(x)
        h = nn.Dense(cfg.ffn_dim, name="fc1")(h)
        h = _gelu(h)
        return x + nn.Dense(cfg.d_model, name="fc2")(h)


class WhisperEncoder(nn.Module):
    config: WhisperConfig

    @nn.compact
    def __call__(self, mel: jax.Array) -> jax.Array:
        """mel: [B, T, n_mels] (T = 3000 for 30 s) → [B, T//2, d]."""
        cfg = self.config
        k1 = self.param("conv1/kernel", nn.initializers.he_normal(),
                        (3, cfg.num_mel_bins, cfg.d_model))
        b1 = self.param("conv1/bias", nn.initializers.zeros, (cfg.d_model,))
        k2 = self.param("conv2/kernel", nn.initializers.he_normal(),
                        (3, cfg.d_model, cfg.d_model))
        b2 = self.param("conv2/bias", nn.initializers.zeros, (cfg.d_model,))

        conv = lambda x, k, s, b: jax.lax.conv_general_dilated(
            x, k.astype(x.dtype), (s,), [(1, 1)],
            dimension_numbers=("NWC", "WIO", "NWC"),
        ) + b.astype(x.dtype)
        x = _gelu(conv(mel, k1, 1, b1))
        x = _gelu(conv(x, k2, 2, b2))

        pos = jnp.asarray(sinusoids(cfg.max_source_positions, cfg.d_model))
        x = x + pos[None, : x.shape[1]].astype(x.dtype)
        for i in range(cfg.encoder_layers):
            x = _EncoderLayer(cfg, name=f"layers_{i}")(x)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="final_norm")(x)


class _DecoderLayer(nn.Module):
    config: WhisperConfig

    def setup(self):
        cfg = self.config
        self.self_norm = nn.LayerNorm(epsilon=cfg.layer_norm_eps)
        self.self_attn = _MHA(cfg.d_model, cfg.num_heads, causal=True)
        self.cross_norm = nn.LayerNorm(epsilon=cfg.layer_norm_eps)
        self.cross_attn = _MHA(cfg.d_model, cfg.num_heads)
        self.ff_norm = nn.LayerNorm(epsilon=cfg.layer_norm_eps)
        self.fc1 = nn.Dense(cfg.ffn_dim)
        self.fc2 = nn.Dense(cfg.d_model)

    def __call__(self, x, encoder_states, *, self_kv_len=None):
        x = x + self.self_attn(self.self_norm(x), kv_len=self_kv_len)
        x = x + self.cross_attn(self.cross_norm(x), encoder_states)
        return x + self.fc2(_gelu(self.fc1(self.ff_norm(x))))

    def precompute_cross(self, encoder_states):
        return self.cross_attn.project_kv(encoder_states)

    def decode_step(self, x1, cross_k, cross_v, cache_k, cache_v, pos):
        attn, cache_k, cache_v = self.self_attn.decode_step(
            self.self_norm(x1), cache_k, cache_v, pos)
        x1 = x1 + attn
        x1 = x1 + self.cross_attn.attend_precomputed(
            self.cross_norm(x1), cross_k, cross_v)
        x1 = x1 + self.fc2(_gelu(self.fc1(self.ff_norm(x1))))
        return x1, cache_k, cache_v


class WhisperDecoder(nn.Module):
    config: WhisperConfig

    def setup(self):
        cfg = self.config
        self.embed_tokens = self.param(
            "embed_tokens", nn.initializers.normal(0.02),
            (cfg.vocab_size, cfg.d_model),
        )
        self.embed_positions = self.param(
            "embed_positions", nn.initializers.normal(0.02),
            (cfg.max_target_positions, cfg.d_model),
        )
        self.dec_layers = [
            _DecoderLayer(cfg, name=f"layers_{i}")
            for i in range(cfg.decoder_layers)
        ]
        self.final_norm = nn.LayerNorm(epsilon=cfg.layer_norm_eps)

    def __call__(self, tokens, encoder_states, *, position_offset=0):
        cfg = self.config
        x = self.embed_tokens[tokens]
        seq = tokens.shape[1]
        x = x + jax.lax.dynamic_slice_in_dim(
            self.embed_positions, position_offset, seq, 0)[None]
        for layer in self.dec_layers:
            x = layer(x, encoder_states)
        x = self.final_norm(x)
        return x @ self.embed_tokens.T  # tied output head

    def precompute_cross(self, encoder_states):
        """Per-layer cross-attention K/V, computed once per utterance."""
        return [layer.precompute_cross(encoder_states)
                for layer in self.dec_layers]

    def decode_step(self, token, cross_kv, self_caches, pos):
        """One token through all layers with cached self/cross attention.

        self_caches: list of (k, v) [B, H, T_max, Dh] per layer.
        """
        x = self.embed_tokens[token][:, None, :]
        x = x + jax.lax.dynamic_slice_in_dim(
            self.embed_positions, pos, 1, 0)[None]
        new_caches = []
        for layer, (ck, cv), (xk, xv) in zip(
            self.dec_layers, cross_kv, self_caches
        ):
            x, xk, xv = layer.decode_step(x, ck, cv, xk, xv, pos)
            new_caches.append((xk, xv))
        x = self.final_norm(x)
        return (x @ self.embed_tokens.T)[:, 0], new_caches


class WhisperModel(nn.Module):
    """Teacher-forced forward (training / parity checks)."""

    config: WhisperConfig

    def setup(self):
        self.encoder = WhisperEncoder(self.config)
        self.decoder = WhisperDecoder(self.config)

    def __call__(self, mel, tokens):
        states = self.encoder(mel)
        return self.decoder(tokens, states)

    def encode(self, mel):
        return self.encoder(mel)

    def decode(self, tokens, encoder_states):
        return self.decoder(tokens, encoder_states)

    def precompute_cross(self, encoder_states):
        return self.decoder.precompute_cross(encoder_states)

    def decode_step(self, token, cross_kv, self_caches, pos):
        return self.decoder.decode_step(token, cross_kv, self_caches, pos)


def greedy_decode(
    model: WhisperModel,
    variables: dict,
    mel: jax.Array,
    prompt_tokens: jax.Array,
    max_new_tokens: int = 128,
) -> jax.Array:
    """Static-shape greedy decoding.

    Decodes into a fixed [B, prompt + max_new] buffer with a while_loop;
    finished rows (EOS emitted) keep emitting EOS.  Recomputes the decoder
    over the filled prefix each step (O(n²) but fully static — an
    incremental KV cache comes with the Qwen3 decode path).
    """
    cfg = model.config
    batch, prompt_len = prompt_tokens.shape
    total = prompt_len + max_new_tokens

    tokens = jnp.full((batch, total), cfg.eos_token_id, jnp.int32)
    tokens = jax.lax.dynamic_update_slice(tokens, prompt_tokens, (0, 0))
    states = model.apply(variables, mel, method=WhisperModel.encode)

    def cond(carry):
        i, tokens, done = carry
        return jnp.logical_and(i < total, ~jnp.all(done))

    def body(carry):
        i, tokens, done = carry
        logits = model.apply(
            variables, tokens, states, method=WhisperModel.decode
        )
        prev = jax.lax.dynamic_slice_in_dim(logits, i - 1, 1, axis=1)[:, 0]
        nxt = jnp.argmax(prev, axis=-1).astype(jnp.int32)
        nxt = jnp.where(done, cfg.eos_token_id, nxt)
        tokens = jax.lax.dynamic_update_slice_in_dim(
            tokens, nxt[:, None], i, axis=1
        )
        done = jnp.logical_or(done, nxt == cfg.eos_token_id)
        return i + 1, tokens, done

    _, tokens, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(prompt_len), tokens, jnp.zeros(batch, bool))
    )
    return tokens


def greedy_decode_cached(
    model: WhisperModel,
    variables: dict,
    mel: jax.Array,
    prompt_tokens: jax.Array,
    max_new_tokens: int = 128,
) -> jax.Array:
    """Incremental greedy decoding: cross K/V precomputed once, per-layer
    self-attention KV caches — O(n) per token instead of the O(n²)
    full-prefix recompute in :func:`greedy_decode`."""
    cfg = model.config
    batch, prompt_len = prompt_tokens.shape
    total = prompt_len + max_new_tokens
    d_head = cfg.d_model // cfg.num_heads

    states = model.apply(variables, mel, method=WhisperModel.encode)
    cross_kv = model.apply(
        variables, states, method=WhisperModel.precompute_cross
    )
    self_caches = [
        (jnp.zeros((batch, cfg.num_heads, total, d_head), states.dtype),
         jnp.zeros((batch, cfg.num_heads, total, d_head), states.dtype))
        for _ in range(cfg.decoder_layers)
    ]

    step = jax.jit(
        lambda vars_, token, cross, caches, pos: model.apply(
            vars_, token, cross, caches, pos,
            method=WhisperModel.decode_step,
        )
    )

    out = np.full((batch, total), cfg.eos_token_id, np.int32)
    out[:, :prompt_len] = np.asarray(prompt_tokens)
    done = np.zeros(batch, bool)
    # feed the prompt through the caches, then generate
    for i in range(total - 1):
        token = jnp.asarray(out[:, i], jnp.int32)
        logits, self_caches = step(
            variables, token, cross_kv, self_caches, jnp.int32(i))
        if i + 1 < prompt_len:
            continue  # teacher-forced prompt pass
        nxt = np.asarray(jnp.argmax(logits, axis=-1), np.int32)
        nxt = np.where(done, cfg.eos_token_id, nxt)
        out[:, i + 1] = nxt
        done |= nxt == cfg.eos_token_id
        if done.all():
            break
    return jnp.asarray(out)


# --------------------------------------------------------------------------
# HF conversion
# --------------------------------------------------------------------------

def _t(x) -> np.ndarray:
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)


def _attn(sd, pre):
    out = {
        "q_proj": {
            "kernel": _t(sd[pre + "q_proj.weight"]).T,
            "bias": _t(sd[pre + "q_proj.bias"]),
        },
        "k_proj": {"kernel": _t(sd[pre + "k_proj.weight"]).T},
        "v_proj": {
            "kernel": _t(sd[pre + "v_proj.weight"]).T,
            "bias": _t(sd[pre + "v_proj.bias"]),
        },
        "o_proj": {
            "kernel": _t(sd[pre + "out_proj.weight"]).T,
            "bias": _t(sd[pre + "out_proj.bias"]),
        },
    }
    return out


def _ln(sd, name):
    return {"scale": _t(sd[name + ".weight"]), "bias": _t(sd[name + ".bias"])}


def convert_hf_whisper(state_dict: dict[str, Any], config: WhisperConfig) -> dict:
    """Map a HF ``WhisperModel`` state dict onto :class:`WhisperModel`."""
    sd = state_dict
    enc: dict[str, Any] = {
        "conv1/kernel": _t(sd["encoder.conv1.weight"]).transpose(2, 1, 0),
        "conv1/bias": _t(sd["encoder.conv1.bias"]),
        "conv2/kernel": _t(sd["encoder.conv2.weight"]).transpose(2, 1, 0),
        "conv2/bias": _t(sd["encoder.conv2.bias"]),
        "final_norm": _ln(sd, "encoder.layer_norm"),
    }
    for i in range(config.encoder_layers):
        pre = f"encoder.layers.{i}."
        enc[f"layers_{i}"] = {
            "attn_norm": _ln(sd, pre + "self_attn_layer_norm"),
            "self_attn": _attn(sd, pre + "self_attn."),
            "ff_norm": _ln(sd, pre + "final_layer_norm"),
            "fc1": {
                "kernel": _t(sd[pre + "fc1.weight"]).T,
                "bias": _t(sd[pre + "fc1.bias"]),
            },
            "fc2": {
                "kernel": _t(sd[pre + "fc2.weight"]).T,
                "bias": _t(sd[pre + "fc2.bias"]),
            },
        }

    dec: dict[str, Any] = {
        "embed_tokens": _t(sd["decoder.embed_tokens.weight"]),
        "embed_positions": _t(sd["decoder.embed_positions.weight"]),
        "final_norm": _ln(sd, "decoder.layer_norm"),
    }
    for i in range(config.decoder_layers):
        pre = f"decoder.layers.{i}."
        dec[f"layers_{i}"] = {
            "self_norm": _ln(sd, pre + "self_attn_layer_norm"),
            "self_attn": _attn(sd, pre + "self_attn."),
            "cross_norm": _ln(sd, pre + "encoder_attn_layer_norm"),
            "cross_attn": _attn(sd, pre + "encoder_attn."),
            "ff_norm": _ln(sd, pre + "final_layer_norm"),
            "fc1": {
                "kernel": _t(sd[pre + "fc1.weight"]).T,
                "bias": _t(sd[pre + "fc1.bias"]),
            },
            "fc2": {
                "kernel": _t(sd[pre + "fc2.weight"]).T,
                "bias": _t(sd[pre + "fc2.bias"]),
            },
        }

    params = {"encoder": enc, "decoder": dec}
    return jax.tree.map(jnp.asarray, params)


def load_hf_whisper(
    model_name_or_path: str, config: Optional[WhisperConfig] = None
) -> tuple[WhisperModel, dict]:
    from transformers import WhisperModel as HFWhisper

    hf_model = HFWhisper.from_pretrained(model_name_or_path)
    hf = hf_model.config
    config = config or WhisperConfig(
        d_model=hf.d_model,
        encoder_layers=hf.encoder_layers,
        decoder_layers=hf.decoder_layers,
        num_heads=hf.encoder_attention_heads,
        ffn_dim=hf.encoder_ffn_dim,
        num_mel_bins=hf.num_mel_bins,
        max_source_positions=hf.max_source_positions,
        max_target_positions=hf.max_target_positions,
        vocab_size=hf.vocab_size,
        decoder_start_token_id=hf.decoder_start_token_id,
        eos_token_id=hf.eos_token_id,
    )
    params = convert_hf_whisper(hf_model.state_dict(), config)
    return WhisperModel(config), {"params": params}
