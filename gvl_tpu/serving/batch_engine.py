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
    session_key: Optional[str] = None
    prefilled: int = 0         # tokens actually prefilled at admission
    error: Optional[str] = None  # set when THIS request's prefill failed


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
        mesh=None,
    ):
        """``mesh`` composes DP×TP in ONE jitted decode program: decode
        slots shard over the mesh's ``data`` axis (each replica group
        advances its own requests), weights over ``model`` (megatron
        specs; shard them with ``shard_pytree(…, LLM_RULES)`` before
        construction), and GSPMD inserts the collectives.  The reference
        lists multi-GPU serving as Future Work (`README.md:851-855`)."""
        self._mesh = mesh
        if mesh is not None:
            data_size = dict(mesh.shape).get("data", 1)
            if num_slots % max(data_size, 1):
                raise ValueError(
                    f"num_slots={num_slots} must divide over the data "
                    f"axis ({data_size})")
        self.config = config
        self.variables = variables
        self.eos_token_id = eos_token_id
        self.num_slots = num_slots
        self._dtype = dtype
        self.model = Qwen3Model(config)
        self._sampling = (float(temperature), float(top_p), int(top_k))
        self._rng = rng if rng is not None else jax.random.PRNGKey(0)

        self.reset_cache()   # builds cache + per-slot state
        self._queue: list[Request] = []
        self._requests: dict[int, Request] = {}
        self._ids = itertools.count()
        # (reset_cache also maintains the per-slot prefix-cache state:
        # tokens whose K/V live in each slot, and — for idle slots —
        # which session last owned the slot)
        self._slot_last_used: list[int] = [0] * num_slots
        self._ticks = 0

        import dataclasses as _dc

        self._chunk_model = Qwen3Model(
            _dc.replace(config, chunk_verify=True))
        self._step_fn = self._build_step()
        self._delta_fns: dict[int, object] = {}

    # ----------------------------------------------------------- jit bodies

    def _delta_prefill_fn(self, size: int):
        """Prefill a transcript DELTA into one slot at its cache offset.

        The chunk-verify model makes a multi-token chunk at a nonzero
        offset exact (rows attend cached prefix + causal self), so a
        returning session pays O(delta) prefill instead of O(transcript).
        """
        if size in self._delta_fns:
            return self._delta_fns[size]
        model = self._chunk_model
        temperature, top_p, top_k = self._sampling

        scan = self.config.scan_layers

        def slice_slot(sides, slot):
            """One slot's cache out of the all-slots arrays (tuple of
            [slots,...] per layer, or stacked [L, slots, ...])."""
            if scan:
                shape = sides.shape
                return jax.lax.dynamic_slice(
                    sides, (0, slot, 0, 0, 0), (shape[0], 1, *shape[2:]))
            shape = sides[0].shape
            return tuple(jax.lax.dynamic_slice(
                s, (slot, 0, 0, 0), (1, *shape[1:])) for s in sides)

        def restore_slot(big, small, slot):
            if scan:
                return jax.lax.dynamic_update_slice(
                    big, small, (0, slot, 0, 0, 0))
            return tuple(
                jax.lax.dynamic_update_slice(b, s, (slot, 0, 0, 0))
                for b, s in zip(big, small))

        @partial(jax.jit, donate_argnums=(1, 2))
        def delta_prefill(variables, k_all, v_all, lengths, slot, tokens,
                          true_len, rng):
            offset = lengths[slot]
            small = KVCache(
                k=slice_slot(k_all, slot),
                v=slice_slot(v_all, slot),
                length=offset,
            )
            positions = offset + jnp.arange(size, dtype=jnp.int32)
            logits, small = model.apply(
                variables, tokens, positions=positions, cache=small)
            idx = jnp.full((1, 1, 1), true_len - 1)
            last = jnp.take_along_axis(logits, idx, axis=1)[:, 0]
            token = sample_logits(last, rng, temperature, top_p, top_k)
            new_k = restore_slot(k_all, small.k, slot)
            new_v = restore_slot(v_all, small.v, slot)
            new_lengths = lengths.at[slot].set(offset + true_len)
            return token[0], new_k, new_v, new_lengths

        self._delta_fns[size] = delta_prefill
        return delta_prefill

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

    def submit(self, prompt_ids: list[int], max_new_tokens: int = 128,
               session_key: Optional[str] = None) -> int:
        """Queue a prompt. ``session_key`` enables per-slot prefix
        caching: when the same key returns with a prompt that EXTENDS its
        previous transcript, only the delta is prefilled.

        Raises ValueError when prompt + decode budget cannot fit the KV
        cache: past ``max_cache_length`` the .at[] scatter writes would be
        silently dropped (out-of-bounds drop semantics) while decode
        attention masks with length+1 rows — stale reads, wrong tokens.
        Rejecting here lets the HTTP layer return 400 instead of wedging.
        """
        need = len(prompt_ids) + max_new_tokens + 1
        if need > self.config.max_cache_length:
            raise ValueError(
                f"prompt ({len(prompt_ids)} tokens) + max_new_tokens "
                f"({max_new_tokens}) + 1 = {need} exceeds max_cache_length="
                f"{self.config.max_cache_length}"
            )
        request = Request(
            request_id=next(self._ids),
            prompt_ids=list(prompt_ids),
            max_new_tokens=max_new_tokens,
            session_key=session_key,
        )
        self._requests[request.request_id] = request
        self._queue.append(request)
        return request.request_id

    DELTA_BUCKETS = (8, 16, 32, 64) + PROMPT_BUCKETS

    def _bucket(self, n: int) -> int:
        for b in self.DELTA_BUCKETS:
            if n <= b:
                return min(b, self.config.max_cache_length)
        return self.config.max_cache_length

    def _pick_slot(self, request: Request) -> Optional[int]:
        """Session-affine slot choice; LRU eviction of idle reservations."""
        idle = [s for s in range(self.num_slots)
                if self._slot_req[s] is None]
        if not idle:
            return None
        if request.session_key is not None:
            for slot in idle:
                if self._slot_session[slot] == request.session_key:
                    return slot
        unreserved = [s for s in idle if self._slot_session[s] is None]
        if unreserved:
            return unreserved[0]
        return min(idle, key=lambda s: self._slot_last_used[s])

    def _admit(self) -> None:
        """Prefill queued requests into free slots (delta when the slot
        already caches a prefix of the prompt)."""
        while self._queue:
            request = self._queue[0]
            if request.done:    # failed/cancelled while queued
                self._queue.pop(0)
                continue
            slot = self._pick_slot(request)
            if slot is None:
                return
            self._queue.pop(0)
            prompt = request.prompt_ids
            cached = self._slot_cached[slot]
            reuse = (request.session_key is not None
                     and self._slot_session[slot] == request.session_key
                     and len(cached) <= len(prompt)
                     and prompt[:len(cached)] == cached
                     and len(prompt) + request.max_new_tokens + 1
                     <= self.config.max_cache_length)
            if reuse:
                # the delta prefill WRITES a full bucket at the cache
                # offset; if offset + bucket overruns S_max the
                # dynamic_update_slice start clamps and corrupts the
                # cached prefix — fall back to a fresh full prefill
                # (offset 0 always fits: prompt < S_max by the submit
                # check and buckets cap at S_max)
                trial_cached = cached if prompt[len(cached):] \
                    else cached[:-1]
                trial_delta_len = len(prompt) - len(trial_cached)
                if (len(trial_cached) + self._bucket(trial_delta_len)
                        > self.config.max_cache_length):
                    reuse = False
            if not reuse:
                # fresh slot: offset 0 (stale rows are masked + overwritten)
                self.cache = self.cache._replace(
                    length=self.cache.length.at[slot].set(0))
                cached = []
            delta = prompt[len(cached):]
            if not delta:       # prompt == cached transcript exactly
                delta = prompt[-1:]
                cached = cached[:-1]
                self.cache = self.cache._replace(
                    length=self.cache.length.at[slot].set(len(cached)))
            try:
                size = self._bucket(len(delta))
                padded = jnp.asarray(
                    [delta + [0] * (size - len(delta))], jnp.int32)
                self._rng, sub = jax.random.split(self._rng)
                token, new_k, new_v, new_lengths = \
                    self._delta_prefill_fn(size)(
                        self.variables, self.cache.k, self.cache.v,
                        self.cache.length, jnp.int32(slot), padded,
                        jnp.int32(len(delta)), sub)
            except Exception as exc:  # noqa: BLE001 — attribute to request
                # The failure belongs to THIS request (its delta traced a
                # new bucket / hit a bad shape); other live streams must
                # not pay for it.  A trace/lowering error leaves the cache
                # buffers alive (donation only consumes them at execution)
                # — other slots keep their prefixes.  Only an
                # execution-time failure after donation requires a
                # rebuild; detect via the donated buffers' liveness.
                logger.exception("prefill failed for request %d",
                                 request.request_id)
                request.error = f"prefill failed: {exc!r}"
                request.done = True
                probe = self.cache.k if self.config.scan_layers \
                    else self.cache.k[0]
                if probe.is_deleted():
                    self.reset_cache()
                else:
                    # the failed request owns no slot K/V; clear the
                    # session reservation so the slot is cleanly reusable
                    self._slot_session[slot] = None
                    self._slot_cached[slot] = []
                continue
            self.cache = KVCache(k=new_k, v=new_v, length=new_lengths)
            request.prefilled = len(delta)
            request.slot = slot
            self._slot_req[slot] = request
            self._slot_cached[slot] = list(prompt)
            self._slot_session[slot] = request.session_key
            self._ticks += 1
            self._slot_last_used[slot] = self._ticks
            self._record_token(request, int(token))

    def reset_cache(self) -> None:
        """Rebuild the KV cache and slot state from scratch.

        The recovery path after a runtime device failure: jitted calls
        donate the cache buffers, so a call that fails AFTER dispatch may
        leave ``self.cache`` pointing at deleted buffers — every further
        step would raise. Rebuilding loses all cached prefixes (sessions
        transparently re-prefill) but restores a serving-capable engine.
        """
        cfg = self.config
        dtype = self._dtype
        slot_shape = (self.num_slots, cfg.num_kv_heads,
                      cfg.max_cache_length, cfg.head_dim)
        if cfg.scan_layers:
            self.cache = KVCache(
                k=jnp.zeros((cfg.num_layers, *slot_shape), dtype),
                v=jnp.zeros((cfg.num_layers, *slot_shape), dtype),
                length=jnp.zeros((self.num_slots,), jnp.int32),
            )
        else:
            self.cache = KVCache(
                k=tuple(jnp.zeros(slot_shape, dtype)
                        for _ in range(cfg.num_layers)),
                v=tuple(jnp.zeros(slot_shape, dtype)
                        for _ in range(cfg.num_layers)),
                length=jnp.zeros((self.num_slots,), jnp.int32),
            )
        if self._mesh is not None:
            self.cache = self._shard_cache(self.cache)
        self._slot_req: list[Optional[Request]] = [None] * self.num_slots
        self._slot_cached: list[list[int]] = [
            [] for _ in range(self.num_slots)]
        self._slot_session: list[Optional[str]] = [None] * self.num_slots
        self._last_token = np.zeros((self.num_slots,), np.int32)

    def _shard_cache(self, cache: KVCache) -> KVCache:
        """Slots over ``data``, kv heads over ``model`` (where divisible);
        lengths replicated (tiny, host-updated per admission)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from gvl_tpu.parallel.sharding import _sanitize_spec

        mesh = self._mesh

        def put(arr, spec):
            clean = _sanitize_spec(spec, arr.shape, mesh)
            return jax.device_put(arr, NamedSharding(mesh, clean))

        slot_spec = P("data", "model", None, None)
        if self.config.scan_layers:
            stacked = P(None, "data", "model", None, None)
            return KVCache(
                k=put(cache.k, stacked), v=put(cache.v, stacked),
                length=put(cache.length, P()),
            )
        return KVCache(
            k=tuple(put(x, slot_spec) for x in cache.k),
            v=tuple(put(x, slot_spec) for x in cache.v),
            length=put(cache.length, P()),
        )

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
        # the token fed this step enters each active slot's cache
        for slot, request in enumerate(self._slot_req):
            if request is not None:
                self._slot_cached[slot].append(int(self._last_token[slot]))
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
