"""Train the HiCo hierarchical compressor offline (self-supervised).

The reference's compressor ships untrained random queries
(`/root/reference/src/temporal/internvideo_hico_module.py:184-282` —
nn.Parameter init, no training anywhere in the tree).  This gives the
own-design compressor actual compression behavior with no downloads:

- **reconstruction**: an auxiliary linear decoder must rebuild the full
  frame-token sequence from the few compressed clip tokens (MSE), so
  the learned queries are forced to pack sequence information instead
  of attending arbitrarily;
- **contrastive alignment** (InfoNCE): each sequence's clip token must
  identify its own frame set among the batch, keeping compressed tokens
  discriminative rather than collapsed.

Training data is procedurally generated feature sequences with the
statistics the cache actually sees: smooth temporal random walks with
occasional event jumps.  The auxiliary decoder is dropped at save time;
``outputs/hico_params.npz`` holds compressor variables only and is
auto-loaded by :class:`gvl_tpu.temporal.TemporalCompressionModule`.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from gvl_tpu.temporal.hico import HiCoConfig, HierarchicalCompressor

logger = logging.getLogger(__name__)


@dataclass
class HicoTrainConfig:
    steps: int = 800
    batch_size: int = 32
    frames_per_clip: int = 16
    clip_tokens: int = 4          # compressed tokens per clip
    learning_rate: float = 2e-4
    seed: int = 0
    log_every: int = 100
    temperature: float = 0.1      # InfoNCE


def make_sequences(rng: np.random.Generator, batch: int, frames: int,
                   dim: int) -> np.ndarray:
    """[B, T, D] smooth random walks + event jumps, unit-ish scale."""
    base = rng.standard_normal((batch, 1, dim)).astype(np.float32)
    drift = rng.standard_normal((batch, frames, dim)).astype(np.float32)
    drift = np.cumsum(drift, axis=1) * 0.15
    seqs = base + drift
    # events: a burst added to a random suffix of some sequences
    for b in range(batch):
        if rng.random() < 0.5:
            t0 = rng.integers(1, frames)
            seqs[b, t0:] += rng.standard_normal(dim).astype(np.float32) * 1.5
    return seqs / np.sqrt(dim)


class _TrainWrapper(nn.Module):
    """Compressor + throwaway reconstruction decoder."""

    config: HiCoConfig
    frames: int
    clip_tokens: int

    @nn.compact
    def __call__(self, seqs: jax.Array):
        comp = HierarchicalCompressor(self.config, name="compressor")
        clip = comp.compress_frames_to_clip(seqs, self.clip_tokens)
        recon = nn.Dense(self.frames * self.config.hidden_dim,
                         name="decoder")(clip.reshape(clip.shape[0], -1))
        recon = recon.reshape(seqs.shape)
        return clip, recon


def train_hico(
    model_cfg: Optional[HiCoConfig] = None,
    cfg: Optional[HicoTrainConfig] = None,
) -> dict:
    """Returns trained COMPRESSOR variables (decoder stripped)."""
    import optax

    model_cfg = model_cfg or HiCoConfig()
    cfg = cfg or HicoTrainConfig()
    wrapper = _TrainWrapper(model_cfg, cfg.frames_per_clip, cfg.clip_tokens)
    rng = np.random.default_rng(cfg.seed)

    dummy = jnp.zeros((1, cfg.frames_per_clip, model_cfg.hidden_dim))
    variables = wrapper.init(jax.random.PRNGKey(cfg.seed), dummy)
    tx = optax.adamw(optax.cosine_decay_schedule(
        cfg.learning_rate, cfg.steps))
    opt_state = tx.init(variables["params"])
    tau = cfg.temperature

    @jax.jit
    def step(params, opt_state, seqs):
        def loss_fn(params):
            clip, recon = wrapper.apply({"params": params}, seqs)
            mse = jnp.mean((recon - seqs) ** 2)
            # InfoNCE: pooled clip token vs mean frame token, in-batch
            a = clip.mean(axis=1)
            b = seqs.mean(axis=1)
            a = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
            b = b / jnp.linalg.norm(b, axis=-1, keepdims=True)
            logits = (a @ b.T) / tau
            labels = jnp.arange(a.shape[0])
            nce = optax.softmax_cross_entropy_with_integer_labels(
                logits, labels).mean()
            return mse + 0.1 * nce

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    # device-stage a pool of batches (remote-link discipline)
    n_unique = min(cfg.steps, 64)
    pool = [jax.device_put(jnp.asarray(make_sequences(
        rng, cfg.batch_size, cfg.frames_per_clip, model_cfg.hidden_dim)))
        for _ in range(n_unique)]

    params = variables["params"]
    for i in range(cfg.steps):
        params, opt_state, loss = step(params, opt_state,
                                       pool[i % n_unique])
        if cfg.log_every and (i % cfg.log_every == 0 or i == cfg.steps - 1):
            logger.info("step %d loss %.4f", i, float(loss))
    return {"params": params["compressor"]}


def evaluate_hico(
    variables: dict,
    model_cfg: Optional[HiCoConfig] = None,
    cfg: Optional[HicoTrainConfig] = None,
    n_batches: int = 8,
    seed: int = 999,
) -> dict:
    """Held-out: in-batch retrieval accuracy of clip tokens (does the
    compressed token identify its own sequence?) + baseline 1/B."""
    model_cfg = model_cfg or HiCoConfig()
    cfg = cfg or HicoTrainConfig()
    comp = HierarchicalCompressor(model_cfg)
    rng = np.random.default_rng(seed)
    run = jax.jit(lambda v, x: comp.apply(
        v, x, cfg.clip_tokens,
        method=HierarchicalCompressor.compress_frames_to_clip))

    correct = total = 0
    for _ in range(n_batches):
        seqs = make_sequences(rng, cfg.batch_size, cfg.frames_per_clip,
                              model_cfg.hidden_dim)
        clip = np.asarray(run(variables, jnp.asarray(seqs)))
        a = clip.mean(axis=1)
        b = seqs.mean(axis=1)
        a = a / np.linalg.norm(a, axis=-1, keepdims=True)
        b = b / np.linalg.norm(b, axis=-1, keepdims=True)
        pred = np.argmax(a @ b.T, axis=-1)
        correct += int((pred == np.arange(len(pred))).sum())
        total += len(pred)
    return {"retrieval_acc": correct / total,
            "chance": 1.0 / cfg.batch_size, "n": total}
