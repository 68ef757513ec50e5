"""MiniLM-class sentence encoder (BERT architecture) in Flax.

The reference retrieves timeline events semantically with
sentence-transformers all-MiniLM-L6-v2
(`/root/reference/src/agent_core/qwen_reasoning_core.py:1492-1528`).
This is the TPU-native equivalent: a post-LayerNorm BERT encoder with a
converter from HF ``BertModel`` state dicts, mean pooling over the
attention mask, and L2 normalization — the exact all-MiniLM-L6-v2
recipe.  Weights parity-tested against HF on random-init models;
point ``load_hf_minilm`` at a downloaded checkpoint directory for the
real thing.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


@dataclass(frozen=True)
class MiniLMConfig:
    """Defaults sized for all-MiniLM-L6-v2."""

    vocab_size: int = 30522
    hidden_size: int = 384
    num_layers: int = 6
    num_heads: int = 12
    intermediate_size: int = 1536
    max_position: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12

    @classmethod
    def tiny(cls, **kw) -> "MiniLMConfig":
        base = dict(vocab_size=512, hidden_size=32, num_layers=2,
                    num_heads=2, intermediate_size=64, max_position=64)
        base.update(kw)
        return cls(**base)


class BertLayer(nn.Module):
    config: MiniLMConfig

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array) -> jax.Array:
        cfg = self.config
        d, h = cfg.hidden_size, cfg.num_heads
        hd = d // h
        batch, seq, _ = x.shape

        q = nn.Dense(d, name="q")(x).reshape(batch, seq, h, hd)
        k = nn.Dense(d, name="k")(x).reshape(batch, seq, h, hd)
        v = nn.Dense(d, name="v")(x).reshape(batch, seq, h, hd)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(hd)
        scores = jnp.where(mask[:, None, None, :], scores, -1e30)
        probs = jax.nn.softmax(scores, axis=-1)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(batch, seq, d)
        attn = nn.Dense(d, name="attn_out")(ctx)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="attn_norm")(
            x + attn)

        ff = nn.Dense(cfg.intermediate_size, name="ff_in")(x)
        ff = nn.gelu(ff, approximate=False)
        ff = nn.Dense(d, name="ff_out")(ff)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="ff_norm")(
            x + ff)


class MiniLMModel(nn.Module):
    """BERT encoder; returns the last hidden state [B, S, D]."""

    config: MiniLMConfig

    @nn.compact
    def __call__(self, input_ids: jax.Array,
                 attention_mask: Optional[jax.Array] = None) -> jax.Array:
        cfg = self.config
        if attention_mask is None:
            attention_mask = jnp.ones_like(input_ids)
        mask = attention_mask.astype(bool)

        word = nn.Embed(cfg.vocab_size, cfg.hidden_size,
                        name="word_embeddings")(input_ids)
        positions = jnp.arange(input_ids.shape[1])
        pos = nn.Embed(cfg.max_position, cfg.hidden_size,
                       name="position_embeddings")(positions)[None]
        typ = nn.Embed(cfg.type_vocab_size, cfg.hidden_size,
                       name="token_type_embeddings")(
            jnp.zeros_like(input_ids))
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="embed_norm")(
            word + pos + typ)
        for i in range(cfg.num_layers):
            x = BertLayer(cfg, name=f"layer_{i}")(x, mask)
        return x


def mean_pool_normalize(hidden: jax.Array,
                        attention_mask: jax.Array) -> jax.Array:
    """sentence-transformers pooling: masked mean then L2 normalize."""
    mask = attention_mask[..., None].astype(hidden.dtype)
    summed = (hidden * mask).sum(axis=1)
    counts = jnp.maximum(mask.sum(axis=1), 1e-9)
    emb = summed / counts
    return emb / jnp.maximum(
        jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)


# --------------------------------------------------------------------------
# HF conversion
# --------------------------------------------------------------------------

def _t(x) -> np.ndarray:
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)


def convert_hf_bert(state_dict: dict[str, Any],
                    config: MiniLMConfig) -> dict:
    """HF ``BertModel`` state dict → MiniLMModel params."""
    sd = {k.removeprefix("bert."): v for k, v in state_dict.items()}

    def dense(prefix):
        return {"kernel": _t(sd[f"{prefix}.weight"]).T,
                "bias": _t(sd[f"{prefix}.bias"])}

    def norm(prefix):
        return {"scale": _t(sd[f"{prefix}.weight"]),
                "bias": _t(sd[f"{prefix}.bias"])}

    params = {
        "word_embeddings": {
            "embedding": _t(sd["embeddings.word_embeddings.weight"])},
        "position_embeddings": {
            "embedding": _t(sd["embeddings.position_embeddings.weight"])},
        "token_type_embeddings": {
            "embedding": _t(sd["embeddings.token_type_embeddings.weight"])},
        "embed_norm": norm("embeddings.LayerNorm"),
    }
    for i in range(config.num_layers):
        p = f"encoder.layer.{i}"
        params[f"layer_{i}"] = {
            "q": dense(f"{p}.attention.self.query"),
            "k": dense(f"{p}.attention.self.key"),
            "v": dense(f"{p}.attention.self.value"),
            "attn_out": dense(f"{p}.attention.output.dense"),
            "attn_norm": norm(f"{p}.attention.output.LayerNorm"),
            "ff_in": dense(f"{p}.intermediate.dense"),
            "ff_out": dense(f"{p}.output.dense"),
            "ff_norm": norm(f"{p}.output.LayerNorm"),
        }
    return jax.tree.map(jnp.asarray, params)


def load_hf_minilm(path: str) -> tuple["MiniLMModel", dict]:
    """Load a local HF checkpoint dir (e.g. all-MiniLM-L6-v2)."""
    import json
    from pathlib import Path

    cfg_doc = json.loads((Path(path) / "config.json").read_text())
    config = MiniLMConfig(
        vocab_size=cfg_doc["vocab_size"],
        hidden_size=cfg_doc["hidden_size"],
        num_layers=cfg_doc["num_hidden_layers"],
        num_heads=cfg_doc["num_attention_heads"],
        intermediate_size=cfg_doc["intermediate_size"],
        max_position=cfg_doc["max_position_embeddings"],
        type_vocab_size=cfg_doc.get("type_vocab_size", 2),
        layer_norm_eps=cfg_doc.get("layer_norm_eps", 1e-12),
    )
    try:
        from safetensors.numpy import load_file

        sd = load_file(str(Path(path) / "model.safetensors"))
    except Exception:
        import torch

        sd = torch.load(Path(path) / "pytorch_model.bin",
                        map_location="cpu", weights_only=True)
    model = MiniLMModel(config)
    return model, {"params": convert_hf_bert(sd, config)}


# --------------------------------------------------------------------------
# Sentence-encoder front end
# --------------------------------------------------------------------------

class MiniLMSentenceEncoder:
    """Drop-in for the retriever's TextEmbedder protocol.

    >>> enc = MiniLMSentenceEncoder.from_hf_checkpoint("path/to/minilm")
    >>> vecs = enc.encode(["boss defeated", "health restored"])
    """

    BUCKETS = (16, 32, 64, 128, 256)

    def __init__(self, model: MiniLMModel, variables: dict, tokenize):
        self.model = model
        self.variables = variables
        self._tokenize = tokenize

        @jax.jit
        def run(variables, ids, mask):
            hidden = model.apply(variables, ids, mask)
            return mean_pool_normalize(hidden, mask)

        self._run = run

    @classmethod
    def from_hf_checkpoint(cls, path: str) -> "MiniLMSentenceEncoder":
        from transformers import AutoTokenizer

        model, variables = load_hf_minilm(path)
        tokenizer = AutoTokenizer.from_pretrained(path)

        def tokenize(texts, max_len):
            out = tokenizer(list(texts), padding="max_length",
                            truncation=True, max_length=max_len,
                            return_tensors="np")
            return out["input_ids"], out["attention_mask"]

        return cls(model, variables, tokenize)

    def _bucket(self, n: int) -> int:
        for b in self.BUCKETS:
            if n <= b:
                return b
        return ((n + self.BUCKETS[-1] - 1)
                // self.BUCKETS[-1]) * self.BUCKETS[-1]

    # sentence-transformers' all-MiniLM-L6-v2 recipe truncates at 256
    # wordpieces (the BERT position table allows 512)
    MAX_TOKENS = 256

    def encode(self, texts) -> np.ndarray:
        texts = list(texts)
        if not texts:
            return np.zeros((0, self.model.config.hidden_size), np.float32)
        max_len = min(self.model.config.max_position, self.MAX_TOKENS)
        ids, mask = self._tokenize(texts, max_len)
        n = len(texts)
        padded = self._bucket(n)
        if padded != n:  # static batch buckets: compile once per bucket
            pad = ((0, padded - n), (0, 0))
            ids = np.pad(ids, pad)
            mask = np.pad(mask, pad)
            mask[n:, 0] = 1  # avoid fully-masked rows
        out = self._run(self.variables, jnp.asarray(ids, jnp.int32),
                        jnp.asarray(mask, jnp.int32))
        return np.asarray(out[:n], np.float32)
