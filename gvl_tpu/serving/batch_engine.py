"""Continuous batching for the reasoning core.

Fixed decode slots (``Qwen3Config``-sized batch) with per-slot cache
lengths: every step decodes ALL live slots in one jitted program, finished
slots free immediately, and queued requests prefill into free slots
between steps — so throughput stays near ``slots × tok/s`` under load
instead of serializing requests (the reference generates one request at a
time through HF ``generate``).
"""

from __future__ import annotations

import itertools
import logging
from dataclasses import dataclass, field
from functools import partial
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gvl_tpu.models.qwen3 import (
    KVCache,
    Qwen3Config,
    Qwen3Model,
    sample_logits,
)

logger = logging.getLogger(__name__)


@dataclass
class Request:
    request_id: int
    prompt_ids: list[int]
    max_new_tokens: int = 128
    tokens: list[int] = field(default_factory=list)
    done: bool = False
    slot: Optional[int] = None


class ContinuousBatchingEngine:
    """Multi-slot decode over one shared KV cache.

    >>> engine = ContinuousBatchingEngine(cfg, variables, eos_token_id=2)
    >>> ids = [engine.submit(p) for p in prompts]
    >>> results = engine.run()           # {request_id: [token, ...]}
    """

    PROMPT_BUCKETS = (128, 256, 512, 1024, 2048, 4096, 8192)

    def __init__(
        self,
        config: Qwen3Config,
        variables: dict,
        eos_token_id: int = 151645,
        num_slots: int = 4,
        dtype=jnp.bfloat16,
        temperature: float = 0.0,
        top_p: float = 0.8,
        top_k: int = 20,
        rng: Optional[jax.Array] = None,
    ):
        if config.scan_layers:
            raise NotImplementedError(
                "continuous batching currently requires scan_layers=False")
        self.config = config
        self.variables = variables
        self.eos_token_id = eos_token_id
        self.num_slots = num_slots
        self._dtype = dtype
        self.model = Qwen3Model(config)
        self._sampling = (float(temperature), float(top_p), int(top_k))
        self._rng = rng if rng is not None else jax.random.PRNGKey(0)

        self.cache = KVCache(
            k=tuple(jnp.zeros(
                (num_slots, config.num_kv_heads, config.max_cache_length,
                 config.head_dim), dtype)
                for _ in range(config.num_layers)),
            v=tuple(jnp.zeros(
                (num_slots, config.num_kv_heads, config.max_cache_length,
                 config.head_dim), dtype)
                for _ in range(config.num_layers)),
            length=jnp.zeros((num_slots,), jnp.int32),
        )
        self._last_token = np.zeros((num_slots,), np.int32)
        self._slot_req: list[Optional[Request]] = [None] * num_slots
        self._queue: list[Request] = []
        self._requests: dict[int, Request] = {}
        self._ids = itertools.count()

        self._prefill_fn = self._build_prefill()
        self._step_fn = self._build_step()

    # ----------------------------------------------------------- jit bodies

    def _build_prefill(self):
        model = self.model
        cfg = self.config
        temperature, top_p, top_k = self._sampling

        @jax.jit
        def prefill(variables, tokens, true_len, rng):
            """Batch-1 prefill; returns first sampled token + small cache."""
            small = KVCache.zeros(cfg, batch=1, dtype=self._dtype)
            positions = jnp.arange(tokens.shape[1], dtype=jnp.int32)
            logits, small = model.apply(
                variables, tokens, positions=positions, cache=small
            )
            idx = jnp.full((1, 1, 1), true_len - 1)
            last = jnp.take_along_axis(logits, idx, axis=1)[:, 0]
            token = sample_logits(last, rng, temperature, top_p, top_k)
            return token[0], small

        return prefill

    def _build_step(self):
        model = self.model
        temperature, top_p, top_k = self._sampling

        @partial(jax.jit, donate_argnums=(2,))
        def step(variables, tokens, cache, active, rng):
            """One decode step for every slot; inactive slots frozen."""
            positions = cache.length[:, None]
            logits, new_cache = model.apply(
                variables, tokens[:, None], positions=positions, cache=cache
            )
            nxt = sample_logits(logits[:, -1], rng, temperature, top_p, top_k)
            nxt = jnp.where(active, nxt, tokens)
            # only active slots advance their cache length
            length = jnp.where(
                active, new_cache.length, new_cache.length - 1
            )
            return nxt, new_cache._replace(length=length)

        return step

    # -------------------------------------------------------------- public

    def submit(self, prompt_ids: list[int], max_new_tokens: int = 128) -> int:
        request = Request(
            request_id=next(self._ids),
            prompt_ids=list(prompt_ids),
            max_new_tokens=max_new_tokens,
        )
        self._requests[request.request_id] = request
        self._queue.append(request)
        return request.request_id

    def _bucket(self, n: int) -> int:
        for b in self.PROMPT_BUCKETS:
            if n <= b:
                return min(b, self.config.max_cache_length)
        return self.config.max_cache_length

    def _admit(self) -> None:
        """Prefill queued requests into free slots."""
        for slot in range(self.num_slots):
            if self._slot_req[slot] is not None or not self._queue:
                continue
            request = self._queue.pop(0)
            ids = np.asarray(request.prompt_ids, np.int32)[None]
            true_len = ids.shape[1]
            pad = self._bucket(true_len) - true_len
            if pad:
                ids = np.pad(ids, ((0, 0), (0, pad)))
            self._rng, sub = jax.random.split(self._rng)
            token, small = self._prefill_fn(
                self.variables, jnp.asarray(ids), jnp.int32(true_len), sub
            )
            # copy the prefilled rows into this slot of the shared cache
            new_k = tuple(
                jax.lax.dynamic_update_slice(big, s, (slot, 0, 0, 0))
                for big, s in zip(self.cache.k, small.k)
            )
            new_v = tuple(
                jax.lax.dynamic_update_slice(big, s, (slot, 0, 0, 0))
                for big, s in zip(self.cache.v, small.v)
            )
            length = self.cache.length.at[slot].set(true_len)
            self.cache = KVCache(k=new_k, v=new_v, length=length)
            first = int(token)
            request.slot = slot
            self._slot_req[slot] = request
            self._record_token(request, first)

    def _record_token(self, request: Request, token: int) -> None:
        if token == self.eos_token_id:
            request.done = True
        else:
            request.tokens.append(token)
            if len(request.tokens) >= request.max_new_tokens:
                request.done = True
        if request.done:
            self._slot_req[request.slot] = None
            request.slot = None
        else:
            self._last_token[request.slot] = token

    def step(self) -> dict[int, int]:
        """Admit queued work, run one batched decode step.

        Returns {request_id: token} for tokens produced this step.
        """
        self._admit()
        active_mask = np.asarray(
            [r is not None for r in self._slot_req], bool)
        if not active_mask.any():
            return {}
        self._rng, sub = jax.random.split(self._rng)
        tokens, self.cache = self._step_fn(
            self.variables, jnp.asarray(self._last_token), self.cache,
            jnp.asarray(active_mask), sub,
        )
        tokens = np.asarray(tokens)
        produced: dict[int, int] = {}
        for slot, request in enumerate(list(self._slot_req)):
            if request is None:
                continue
            token = int(tokens[slot])
            produced[request.request_id] = token
            self._record_token(request, token)
        return produced

    @property
    def has_work(self) -> bool:
        return bool(self._queue) or any(
            r is not None for r in self._slot_req)

    def run(self) -> dict[int, list[int]]:
        """Drive to completion; returns generated tokens per request."""
        while self.has_work:
            self.step()
        return {rid: r.tokens for rid, r in self._requests.items()}

    def generate_many(
        self, prompts: list[list[int]], max_new_tokens: int = 128
    ) -> list[list[int]]:
        ids = [self.submit(p, max_new_tokens) for p in prompts]
        results = self.run()
        return [results[i] for i in ids]
