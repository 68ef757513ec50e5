"""Multi-turn chat session with a persistent KV cache (prefix caching).

The reference (and our stateless :class:`~gvl_tpu.models.qwen3.Qwen3Engine`)
re-prefills the ENTIRE transcript on every turn — cost grows quadratically
with conversation length and dominates time-to-first-token.  A session
keeps its cache across turns and ingests only the transcript *delta*
(the new user turn) as one multi-token chunk at the current cache offset:
the ``chunk_verify`` attention mode (each chunk row attends over the
cached prefix plus its causal slice) makes a mid-cache chunked forward
exact, so turn N's prefill cost is O(new tokens), not O(transcript).

Chat transcripts are strictly append-only under the ChatML template, so
the previous turn's cache is always a valid prefix; a prompt that does
NOT extend the cached transcript resets the cache transparently.

Measured (tunnel-attached v5e, 170M-param model, 1k-token transcript):
outputs match the stateless engine token-for-token; latency ties because
at that scale the turn is RTT-bound, not prefill-bound.  The saving is
the prefill compute itself — ~2*P*T FLOPs — so it scales with model
size x transcript length (8B at a 4k transcript: ~0.6 s full re-prefill
vs ~10 ms delta ingest).

No reference counterpart (reference re-prefills per call:
``/root/reference/src/agent/reasoning_core.py`` generate path).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gvl_tpu.models.qwen3 import (
    KVCache,
    Qwen3Config,
    Qwen3Model,
    sample_logits,
)

DELTA_BUCKETS = (16, 32, 64, 128, 256, 512, 1024, 2048, 4096, 8192)


class Qwen3ChatSession:
    """Stateful wrapper: one conversation, one persistent KV cache.

    >>> session = Qwen3ChatSession(config, variables)
    >>> out1 = session.generate(turn1_ids, temperature=0.0)
    >>> out2 = session.generate(turn1_ids + out1 + turn2_ids)  # only the
    ...     # delta (out1 tail + turn2) is prefilled — see last_ingested

    Outputs are identical to a fresh :class:`Qwen3Engine` on the full
    transcript (same weights, f32-exact; bf16 near-tie argmax caveat as
    with speculative decoding).
    """

    def __init__(
        self,
        config: Qwen3Config,
        variables: dict,
        eos_token_id: int = 151645,
        dtype=jnp.bfloat16,
    ):
        self.config = dataclasses.replace(config, chunk_verify=True)
        self.variables = variables
        self.eos_token_id = eos_token_id
        self.model = Qwen3Model(self.config)
        self._dtype = dtype
        self._jit_cache: dict = {}
        self.cache: Optional[KVCache] = None
        self._cached: list[int] = []   # tokens whose K/V live in the cache
        self.last_ingested: int = 0    # delta size of the latest turn

    # ------------------------------------------------------------- jitted

    def _ingest_fn(self, size: int, sampling: tuple):
        key = ("ingest", size, sampling)
        if key not in self._jit_cache:
            temperature, top_p, top_k = sampling

            @partial(jax.jit, donate_argnums=(2,))
            def ingest(variables, tokens, cache, true_len, rng):
                positions = cache.length + jnp.arange(size, dtype=jnp.int32)
                logits, cache = self.model.apply(
                    variables, tokens, positions=positions, cache=cache)
                cache = cache._replace(
                    length=cache.length - (size - true_len))
                last = jnp.take_along_axis(
                    logits, jnp.full((1, 1, 1), true_len - 1), axis=1)[:, 0]
                token = sample_logits(last, rng, temperature, top_p, top_k)
                return token, cache

            self._jit_cache[key] = ingest
        return self._jit_cache[key]

    def _step_fn(self, sampling: tuple):
        key = ("step", sampling)
        if key not in self._jit_cache:
            temperature, top_p, top_k = sampling

            @partial(jax.jit, donate_argnums=(2,))
            def step(variables, token, cache, rng):
                logits, cache = self.model.apply(
                    variables, token[:, None],
                    positions=cache.length[None], cache=cache)
                nxt = sample_logits(
                    logits[:, -1], rng, temperature, top_p, top_k)
                return nxt, cache

            self._jit_cache[key] = step
        return self._jit_cache[key]

    # ------------------------------------------------------------- public

    def reset(self) -> None:
        self.cache = None
        self._cached = []

    def cache_nbytes(self) -> int:
        """Device bytes one live session pins (K+V, all layers)."""
        cfg = self.config
        return (2 * cfg.num_layers * cfg.num_kv_heads
                * cfg.max_cache_length * cfg.head_dim
                * jnp.dtype(self._dtype).itemsize)

    def release(self) -> None:
        """Free the device KV cache eagerly (server eviction path) —
        dropping the Python reference alone leaves HBM pinned until GC."""
        if self.cache is not None:
            leaves = jax.tree_util.tree_leaves((self.cache.k, self.cache.v))
            for buf in leaves:
                try:
                    buf.delete()
                except Exception:  # already donated/deleted
                    pass
        self.reset()

    def stream(
        self,
        prompt_ids: list[int] | np.ndarray,
        max_new_tokens: int = 512,
        temperature: float = 0.7,
        top_p: float = 0.8,
        top_k: int = 20,
        rng: Optional[jax.Array] = None,
    ):
        """Yield generated token ids; reuses the cached transcript prefix."""
        ids = [int(t) for t in np.asarray(prompt_ids).reshape(-1)]
        if len(ids) + max_new_tokens > self.config.max_cache_length:
            raise ValueError("prompt + max_new_tokens exceeds cache")
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        sampling = (float(temperature), float(top_p), int(top_k))

        if self.cache is None or ids[:len(self._cached)] != self._cached:
            # not an extension of the cached transcript: start over
            self.cache = KVCache.zeros(self.config, 1, self._dtype)
            self._cached = []
        delta = ids[len(self._cached):]
        if not delta:
            # same transcript re-asked: re-ingest the final token so there
            # are logits to sample from
            delta = ids[-1:]
            self._cached = self._cached[:-1]
            self.cache = self.cache._replace(length=self.cache.length - 1)
        self.last_ingested = len(delta)

        size = next((b for b in DELTA_BUCKETS if len(delta) <= b),
                    self.config.max_cache_length)
        size = min(size, self.config.max_cache_length)
        padded = jnp.asarray(
            [delta + [0] * (size - len(delta))], jnp.int32)
        rng, sub = jax.random.split(rng)
        token, self.cache = self._ingest_fn(size, sampling)(
            self.variables, padded, self.cache,
            jnp.int32(len(delta)), sub)
        self._cached = list(ids)

        step = self._step_fn(sampling)
        for _ in range(max_new_tokens):
            tok = int(token[0])
            if tok == self.eos_token_id:
                return
            yield tok
            self._cached.append(tok)
            rng, sub = jax.random.split(rng)
            token, self.cache = step(
                self.variables, token, self.cache, sub)

    def generate(self, prompt_ids, **kw) -> list[int]:
        return list(self.stream(prompt_ids, **kw))
