"""Speculative decoding: a small draft model proposes, the target verifies.

The draft model autoregressively proposes ``gamma`` tokens (cheap — small
model), then the target model scores the whole proposal in ONE chunked
forward pass against its KV cache (an MXU-friendly [1, gamma+1] verify
instead of gamma+1 sequential bandwidth-bound decode steps).  Greedy mode
accepts the longest prefix where the target's argmax agrees with the draft
and emits the target's argmax at the first disagreement as a bonus token —
the output is therefore EXACTLY the target model's greedy decode, only
faster.  Stochastic mode implements the standard rejection-sampling rule
(accept ``d_i`` with probability ``min(1, p(d_i)/q(d_i))``; on rejection
sample from ``norm(max(0, p - q))``) so the output distribution equals the
target model's.

TPU-first structure — TWO device dispatches per round, not gamma+2:

- ``draft_rollout``: catch-up ingest + all ``gamma`` proposal steps run
  inside one jitted ``lax.scan`` (no host round-trip between draft steps;
  over a remote tunnel each avoided dispatch saves a full RTT).
- ``verify``: the target chunk forward, the accept rule, AND the output
  token assembly all on device; the host reads back only
  ``(n_accept, tokens[gamma+1])``.

Both KV caches roll back between rounds by resetting the functional
``KVCache.length`` pointer — rejected rows past the pointer are masked out
of every read and overwritten by later writes, so rollback moves no data.

No reference counterpart: the reference decodes strictly one token per
forward (``/root/reference/src/agent/reasoning_core.py`` generate loop);
this is a TPU-first throughput feature (ROADMAP round-2 item 6).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from gvl_tpu.models.qwen3 import KVCache, Qwen3Config, Qwen3Model

PROMPT_BUCKETS = (8, 16, 32, 64, 128, 256, 512, 1024, 2048, 4096)


def _bucket(n: int, maximum: int) -> int:
    for b in PROMPT_BUCKETS:
        if n <= b:
            return min(b, maximum)
    return maximum


class SpeculativeEngine:
    """Draft-verify decoding around two :class:`Qwen3Model` instances.

    >>> engine = SpeculativeEngine(target_cfg, target_vars,
    ...                            draft_cfg, draft_vars, gamma=4)
    >>> tokens = engine.generate(prompt_ids, max_new_tokens=64,
    ...                          temperature=0.0)   # == target greedy
    >>> engine.last_stats["acceptance_rate"]

    Batch size 1 (the agent's interactive path).  ``chunk_verify=True``
    model instances are used for every multi-token forward (prefill is the
    ``start == 0`` special case), so one compiled chunk shape serves
    prefill, draft catch-up ingest, and target verification.
    """

    def __init__(
        self,
        target_config: Qwen3Config,
        target_variables: dict,
        draft_config: Qwen3Config,
        draft_variables: dict,
        gamma: int = 4,
        eos_token_id: int = 151645,
        dtype=jnp.bfloat16,
    ):
        if target_config.vocab_size != draft_config.vocab_size:
            raise ValueError("draft and target must share a vocabulary")
        self.gamma = int(gamma)
        self.eos_token_id = eos_token_id
        self._dtype = dtype
        self.target_config = dataclasses.replace(
            target_config, chunk_verify=True)
        self.draft_config = dataclasses.replace(
            draft_config, chunk_verify=True)
        self.target_model = Qwen3Model(self.target_config)
        self.draft_model = Qwen3Model(self.draft_config)
        self.target_variables = target_variables
        self.draft_variables = draft_variables
        self._jit_cache: dict = {}
        self.last_stats: dict = {}

    # ------------------------------------------------------------- jitted

    def _prefill_fn(self, size: int, temperature: float):
        """(vars, tokens[1,size], true_len, cache, rng) ->
        (first_token[], cache) — target prompt ingest + first choice."""
        key = ("prefill", size, temperature)
        if key in self._jit_cache:
            return self._jit_cache[key]
        model = self.target_model

        def fn(variables, tokens, true_len, cache, rng):
            positions = cache.length + jnp.arange(size, dtype=jnp.int32)
            logits, cache = model.apply(
                variables, tokens, positions=positions, cache=cache)
            cache = cache._replace(length=cache.length - (size - true_len))
            last = logits[0, true_len - 1].astype(jnp.float32)
            if temperature <= 0.0:
                first = jnp.argmax(last).astype(jnp.int32)
            else:
                first = jax.random.categorical(
                    rng, last / temperature).astype(jnp.int32)
            return first, cache

        self._jit_cache[key] = jax.jit(fn, donate_argnums=(3,))
        return self._jit_cache[key]

    def _rollout_fn(self, size: int, temperature: float):
        """Catch-up ingest + gamma proposals in ONE dispatch.

        (vars, delta[1,size], true_len, cache, rng) ->
        (draft_tokens[g], draft_probs[g, V|1], cache)

        The gamma-1 sequential proposal steps run under ``lax.scan`` with
        the KV cache as carry — static shapes, one compiled body, zero
        host round-trips between steps.
        """
        key = ("rollout", size, temperature)
        if key in self._jit_cache:
            return self._jit_cache[key]
        model = self.draft_model
        gamma = self.gamma

        def choose(logits, rng):
            logits = logits.astype(jnp.float32)
            if temperature <= 0.0:
                return (jnp.argmax(logits).astype(jnp.int32),
                        jnp.zeros((1,), jnp.float32))
            scaled = logits / temperature
            return (jax.random.categorical(rng, scaled).astype(jnp.int32),
                    jax.nn.softmax(scaled))

        def fn(variables, delta, true_len, cache, rng):
            positions = cache.length + jnp.arange(size, dtype=jnp.int32)
            logits, cache = model.apply(
                variables, delta, positions=positions, cache=cache)
            cache = cache._replace(length=cache.length - (size - true_len))
            rng, sub = jax.random.split(rng)
            tok0, q0 = choose(logits[0, true_len - 1], sub)

            def body(carry, step_rng):
                tok, cache = carry
                logits, cache = model.apply(
                    variables, tok[None, None],
                    positions=cache.length[None].astype(jnp.int32),
                    cache=cache)
                nxt, q = choose(logits[0, 0], step_rng)
                return (nxt, cache), (nxt, q)

            (_, cache), (toks, qs) = jax.lax.scan(
                body, (tok0, cache), jax.random.split(rng, gamma - 1))
            draft_tokens = jnp.concatenate([tok0[None], toks])
            draft_probs = jnp.concatenate([q0[None], qs], axis=0)
            return draft_tokens, draft_probs, cache

        self._jit_cache[key] = jax.jit(fn, donate_argnums=(3,))
        return self._jit_cache[key]

    def _verify_fn(self, temperature: float):
        """Target verify + accept rule + output assembly, all on device.

        (vars, last_token[], draft_tokens[g], draft_probs, cache, rng) ->
        (n_accept[], out_tokens[g+1], cache)

        ``out_tokens[: n_accept + 1]`` are the round's new tokens (accepted
        drafts plus the bonus/resample); the cache leaves with its length
        already rolled back to the committed prefix.
        """
        key = ("verify", temperature)
        if key in self._jit_cache:
            return self._jit_cache[key]
        model = self.target_model
        gamma = self.gamma

        def fn(variables, last_token, draft_tokens, draft_probs, cache,
               rng):
            chunk = jnp.concatenate([last_token[None], draft_tokens])[None]
            positions = cache.length + jnp.arange(
                gamma + 1, dtype=jnp.int32)
            logits, cache = model.apply(
                variables, chunk, positions=positions, cache=cache)
            logits = logits[0].astype(jnp.float32)       # [g+1, V]
            if temperature <= 0.0:
                t_choice = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                matches = draft_tokens == t_choice[:gamma]
                n_accept = jnp.sum(jnp.cumprod(
                    matches.astype(jnp.int32)))
                closer = t_choice[n_accept]
            else:
                p = jax.nn.softmax(logits / temperature, axis=-1)
                idx = jnp.arange(gamma)
                p_tok = p[idx, draft_tokens]
                q_tok = draft_probs[idx, draft_tokens]
                u = jax.random.uniform(rng, (gamma,))
                accept = u * q_tok < p_tok               # u < p/q
                n_accept = jnp.sum(jnp.cumprod(accept.astype(jnp.int32)))
                residual = jnp.maximum(p[:gamma] - draft_probs, 0.0)
                residual = residual / jnp.maximum(
                    residual.sum(-1, keepdims=True), 1e-30)
                fallback = jax.random.categorical(
                    jax.random.fold_in(rng, 1),
                    jnp.log(residual + 1e-30), axis=-1).astype(jnp.int32)
                bonus = jax.random.categorical(
                    jax.random.fold_in(rng, 2),
                    logits[gamma] / temperature).astype(jnp.int32)
                closer = jnp.where(n_accept == gamma, bonus,
                                   fallback[jnp.minimum(n_accept,
                                                        gamma - 1)])
            sel = jnp.arange(gamma + 1)
            padded = jnp.concatenate(
                [draft_tokens, jnp.zeros((1,), jnp.int32)])
            out_tokens = jnp.where(sel < n_accept, padded, closer)
            # roll back: of the g+1 rows written, only the old last token
            # plus the accepted drafts belong to the committed prefix
            cache = cache._replace(
                length=cache.length - (gamma + 1) + 1 + n_accept)
            return n_accept, out_tokens, cache

        self._jit_cache[key] = jax.jit(fn, donate_argnums=(4,))
        return self._jit_cache[key]

    # -------------------------------------------------------- draft hooks
    # Subclasses can replace the proposal mechanism (e.g. prompt-lookup
    # drafting needs no model at all); the verify pass is shared.

    def _draft_reset(self) -> None:
        """Called once per generate(): initialize draft-side state."""
        self._draft_cache = KVCache.zeros(self.draft_config, 1, self._dtype)
        self._draft_len = 0    # committed tokens the draft has processed

    def _draft_propose(self, committed: list[int], temperature: float,
                       rng: jax.Array):
        """Return (draft_tokens[g], draft_probs) for the next round.

        Base: catch-up ingest + gamma proposals in ONE fused dispatch.
        """
        delta = committed[self._draft_len:]
        size = _bucket(len(delta), self.draft_config.max_cache_length)
        draft_tokens, draft_probs, self._draft_cache = self._rollout_fn(
            size, temperature)(
            self.draft_variables, self._pad(delta, size),
            len(delta), self._draft_cache, rng)
        self._draft_len = len(committed)
        return draft_tokens, draft_probs

    def _draft_commit(self, n_accept: int) -> None:
        """Called after each verify round with the accepted count.

        Base: of the drafted rows, only the accepted ones that were fed
        as step inputs (d_1..d_{g-1}) keep valid K/V in the draft cache.
        """
        keep = min(n_accept, self.gamma - 1)
        self._draft_cache = self._draft_cache._replace(
            length=self._draft_cache.length - (self.gamma - 1) + keep)
        self._draft_len += keep

    # ----------------------------------------------------------- generate

    def _pad(self, ids: list[int], size: int) -> jax.Array:
        return jnp.asarray([ids + [0] * (size - len(ids))], jnp.int32)

    def generate(
        self,
        prompt_ids: list[int],
        max_new_tokens: int = 128,
        temperature: float = 0.0,
        rng: Optional[jax.Array] = None,
    ) -> list[int]:
        """Decode ``max_new_tokens`` (or until EOS); returns new tokens only.

        ``temperature == 0``: output is identical to the target model's
        greedy decode.  ``temperature > 0``: rejection-sampled so the
        output distribution matches target-only sampling (plain
        temperature softmax; top-k/top-p are not applied in speculative
        mode).

        Exactness caveat: "identical" holds when the verify chunk forward
        and the single-token decode produce bit-equal logits.  In float32
        they do (the CPU test suite asserts token-for-token equality);
        in bfloat16 on TPU the chunk einsum and the decode kernel reduce
        in different orders, so near-tie argmax positions can flip — with
        trained weights (real logit gaps) this is vanishingly rare, with
        random weights (near-uniform logits) it is common.
        """
        return list(self.stream(prompt_ids, max_new_tokens, temperature,
                                rng))

    def stream(
        self,
        prompt_ids: list[int],
        max_new_tokens: int = 128,
        temperature: float = 0.0,
        rng: Optional[jax.Array] = None,
        top_p: Optional[float] = None,     # accepted for engine-API
        top_k: Optional[int] = None,       # compat; not applied (doc'd)
        inputs_embeds_prefix=None,
    ):
        """Yield new tokens (tokens land in bursts of up to gamma+1 per
        verify round).  Same semantics/caveats as :meth:`generate`."""
        if inputs_embeds_prefix is not None:
            raise ValueError(
                "speculative decoding does not support embedding-prefix "
                "injection; use the plain engine for that path")
        gamma = self.gamma
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        tcfg, dcfg = self.target_config, self.draft_config
        if len(prompt_ids) + max_new_tokens + gamma + 1 > min(
                tcfg.max_cache_length, dcfg.max_cache_length):
            raise ValueError("prompt + max_new_tokens exceeds cache")

        target_cache = KVCache.zeros(tcfg, 1, self._dtype)
        verify = self._verify_fn(temperature)
        self._draft_reset()

        # --- target prefill: cache then holds K/V for committed[:-1] ----
        size = _bucket(len(prompt_ids), tcfg.max_cache_length)
        rng, sub = jax.random.split(rng)
        first, target_cache = self._prefill_fn(size, temperature)(
            self.target_variables, self._pad(list(prompt_ids), size),
            len(prompt_ids), target_cache, sub)
        committed = list(prompt_ids) + [int(first)]
        generated = [committed[-1]]
        rounds = drafted = accepted = 0
        yield committed[-1]

        while (len(generated) < max_new_tokens
               and generated[-1] != self.eos_token_id):
            rng, sub = jax.random.split(rng)
            draft_tokens, draft_probs = self._draft_propose(
                committed, temperature, sub)
            drafted += gamma

            # --- one dispatch: verify + accept + assemble ----------------
            rng, sub = jax.random.split(rng)
            n_accept, out_tokens, target_cache = verify(
                self.target_variables,
                jnp.asarray(committed[-1], jnp.int32),
                draft_tokens, draft_probs, target_cache, sub)
            # ONE device->host transfer per round (each sync pays a full
            # RTT on remote-attached TPU)
            n_accept, out_tokens = jax.device_get((n_accept, out_tokens))
            n_accept = int(n_accept)
            new_tokens = [int(t) for t in out_tokens[:n_accept + 1]]
            accepted += n_accept
            rounds += 1
            self._draft_commit(n_accept)

            for tok in new_tokens:
                committed.append(tok)
                generated.append(tok)
                yield tok
                if (tok == self.eos_token_id
                        or len(generated) >= max_new_tokens):
                    break

        self.last_stats = {
            "rounds": rounds,
            "drafted": drafted,
            "accepted": accepted,
            "acceptance_rate": accepted / drafted if drafted else 0.0,
            "tokens_per_round": (
                (len(generated) - 1) / rounds if rounds else 0.0),
        }


class PromptLookupEngine(SpeculativeEngine):
    """Draft-model-free speculation: drafts are copied from the transcript.

    Prompt-lookup decoding: find the most recent earlier occurrence of the
    last ``ngram`` committed tokens and propose the ``gamma`` tokens that
    followed it.  The target's verify pass (inherited) guarantees the
    output: greedy == target-only greedy regardless of proposal quality,
    and stochastic mode stays distribution-correct because the proposal
    distribution is a point mass (accept ``d_i`` with probability
    ``p(d_i)``; resample from ``norm(max(0, p - onehot))`` on rejection).

    Wins when generation quotes its context — exactly the gameplay-QA
    shape (answers cite timeline lines, HUD strings, entity names).  Zero
    extra weights, zero draft forward passes: one target dispatch per
    round plus host-side list matching.

    >>> engine = PromptLookupEngine(cfg, variables, gamma=8, ngram=3)
    >>> tokens = engine.generate(prompt_ids, temperature=0.0)
    """

    def __init__(
        self,
        target_config: Qwen3Config,
        target_variables: dict,
        gamma: int = 8,
        ngram: int = 3,
        eos_token_id: int = 151645,
        dtype=jnp.bfloat16,
    ):
        super().__init__(target_config, target_variables,
                         target_config, target_variables,
                         gamma=gamma, eos_token_id=eos_token_id,
                         dtype=dtype)
        self.ngram = int(ngram)

    def _draft_reset(self) -> None:  # no draft model, no draft cache
        pass

    def _draft_commit(self, n_accept: int) -> None:
        pass

    def _ngram_draft(self, committed: list[int]) -> list[int]:
        """gamma guesses: continuation of the latest earlier match of the
        final ngram (falling back to shorter ngrams, then repetition)."""
        gamma = self.gamma
        for n in range(min(self.ngram, len(committed) - 1), 0, -1):
            tail = committed[-n:]
            # scan right-to-left for the most recent earlier occurrence
            for i in range(len(committed) - n - 1, -1, -1):
                if committed[i:i + n] == tail:
                    continuation = committed[i + n:i + n + gamma]
                    if continuation:
                        return (continuation
                                + continuation[-1:] * (gamma
                                                       - len(continuation)))
        # no match anywhere: repeat the last token (a guess is free —
        # the verify pass corrects it)
        return committed[-1:] * gamma

    def _draft_propose(self, committed: list[int], temperature: float,
                       rng: jax.Array):
        draft = jnp.asarray(self._ngram_draft(committed), jnp.int32)
        if temperature <= 0.0:
            probs = jnp.zeros((self.gamma, 1), jnp.float32)
        else:
            # point-mass proposal: q(d_i) = 1
            probs = jax.nn.one_hot(
                draft, self.target_config.vocab_size, dtype=jnp.float32)
        return draft, probs
