"""Projector training: generative alignment against a frozen LLM.

The reference objective (`/root/reference/scripts/train_projectors.py:519-586`):
project an encoder embedding, prepend it to the token embeddings of a text
context, teacher-force the frozen LLM, and take cross-entropy only on the
target span.  Gradients flow through the frozen LLM into the projector.
Fallback objectives when no LLM is available: cosine alignment against a
text embedding, then norm regularization toward sqrt(llm_dim).

TPU-first deltas: samples are batched per modality (the reference steps
one sample at a time through the LLM), the whole step is one jitted
program, and batches shard over the mesh's data axis.
"""

from __future__ import annotations

import json
import logging
from dataclasses import dataclass
from pathlib import Path
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gvl_tpu.agent.config import ReasoningCoreConfig
from gvl_tpu.models.projector import MODALITY_DIMS, ProjectorBank

logger = logging.getLogger(__name__)


@dataclass
class ProjectorTrainingConfig:
    learning_rate: float = 1e-4
    weight_decay: float = 0.01
    grad_clip: float = 1.0
    epochs: int = 3
    batch_size: int = 8
    warmup_steps: int = 20
    max_target_tokens: int = 32
    llm_dim: int = 4096  # single source of truth (COMPAT.md #4)
    seed: int = 0
    output_path: str = "outputs/projector_weights.pt"
    # no-LLM fallback objective: "cosine" = in-batch contrastive
    # alignment against the deterministic hashing text space (measurable
    # retrieval, the reference's middle fallback rung,
    # `train_projectors.py:589-608`); "norm" = the last-resort norm
    # calibration only
    objective: str = "cosine"
    text_dim: int = 256
    temperature: float = 0.07


class MultimodalProjectorDataset:
    """Pairs saved embeddings with nearby-event text contexts.

    Reads ``*_embeddings.npz`` (or reference ``.pt``) plus the sibling
    ``*_features.json`` written by ``scripts/extract_features.py``; each
    embedding is paired with the timeline text closest to its timestamp.
    """

    MODALITY_KEYS = {"siglip": "siglip", "videomae": "videomae",
                     "audio": "wav2vec2"}

    def __init__(self, features_dir: str | Path):
        self.features_dir = Path(features_dir)
        self.samples: list[dict] = []
        self._load()

    def _load(self) -> None:
        for emb_path in sorted(self.features_dir.glob("*_embeddings.npz")):
            stem = emb_path.name.removesuffix("_embeddings.npz")
            texts = self._load_texts(stem)
            with np.load(emb_path) as z:
                for modality, key in self.MODALITY_KEYS.items():
                    if key not in z or len(z[key]) == 0:
                        continue
                    ts = z.get(f"{key}_ts", np.arange(len(z[key])))
                    for i, emb in enumerate(z[key]):
                        t = float(ts[i]) if i < len(ts) else 0.0
                        self.samples.append({
                            "modality": modality,
                            "embedding": np.asarray(emb, np.float32),
                            "text": self._nearest_text(texts, t),
                            "timestamp": t,
                        })
        logger.info("projector dataset: %d samples from %s",
                    len(self.samples), self.features_dir)

    def _load_texts(self, stem: str) -> list[tuple[float, str]]:
        feats = self.features_dir / f"{stem}_features.json"
        out: list[tuple[float, str]] = []
        if feats.exists():
            doc = json.loads(feats.read_text())
            for row in doc.get("ocr", []):
                for text in row.get("texts", []):
                    out.append((float(row.get("timestamp", 0.0)), text))
            for row in doc.get("transcription", []):
                out.append((float(row.get("start", 0.0)), row.get("text", "")))
            for ent in doc.get("entities", []):
                out.append((0.0, f"{ent.get('concept', 'entity')} visible"))
        return out or [(0.0, "gameplay footage")]

    @staticmethod
    def _nearest_text(texts: list[tuple[float, str]], t: float) -> str:
        return min(texts, key=lambda pair: abs(pair[0] - t))[1]

    def batches(
        self, modality: str, batch_size: int, rng: np.random.Generator
    ) -> Iterator[dict]:
        rows = [s for s in self.samples if s["modality"] == modality]
        if not rows:
            return
        order = rng.permutation(len(rows))
        for start in range(0, len(rows) - batch_size + 1, batch_size):
            chunk = [rows[i] for i in order[start: start + batch_size]]
            yield {
                "embedding": np.stack([c["embedding"] for c in chunk]),
                "text": [c["text"] for c in chunk],
            }

    def __len__(self) -> int:
        return len(self.samples)

    def modality_dims(self) -> dict[str, int]:
        """Observed embedding width per modality — the source of truth
        for projector head input dims (trained towers emit their own
        widths, e.g. the 256-d shipped clip encoder vs hash-fake 768)."""
        dims: dict[str, int] = {}
        for s in self.samples:
            dims.setdefault(s["modality"], int(s["embedding"].shape[-1]))
        return dims


def text_projection_matrix(llm_dim: int, text_dim: int) -> jnp.ndarray:
    """FIXED seeded random map LLM-space → text-space, shared by the
    cosine objective and retrieval evaluation (never trained)."""
    rng = np.random.default_rng(42)
    mat = rng.standard_normal((llm_dim, text_dim)).astype(np.float32)
    return jnp.asarray(mat / np.sqrt(llm_dim))


_PROJECT_METHOD = {"siglip": "project_region",
                   "videomae": "project_videomae",
                   "audio": "project_audio"}


def evaluate_retrieval(
    bank,
    dataset: "MultimodalProjectorDataset",
    text_dim: int = 256,
    llm_dim: int = 4096,
    max_rows: int = 512,
    ks: tuple[int, ...] = (1, 5),
) -> dict:
    """Projected embedding → nearest timeline texts: top-k accuracy.

    The measurable-alignment metric VERDICT r2 #5 asks for: each saved
    encoder embedding is projected through the bank, mapped into the
    hashing text space by the fixed matrix, and ranked against the
    UNIQUE timeline texts of its modality; correct = its own paired text
    in the top k.  Chance = k / #unique.
    """
    from gvl_tpu.agent.retriever import HashingTextEmbedder

    embedder = HashingTextEmbedder(text_dim)
    proj_map = np.asarray(text_projection_matrix(llm_dim, text_dim))
    out: dict[str, dict] = {}
    for modality, method in _PROJECT_METHOD.items():
        rows = [s for s in dataset.samples
                if s["modality"] == modality][:max_rows]
        if len(rows) < 4:
            continue
        texts = [r["text"] for r in rows]
        uniq = sorted(set(texts))
        if len(uniq) < 2:
            continue
        cand = embedder.encode(uniq)                     # [U, d], L2
        own = np.asarray([uniq.index(t) for t in texts])
        embs = np.stack([r["embedding"] for r in rows])
        projected = np.asarray(getattr(bank, method)(embs), np.float32)
        mapped = projected @ proj_map
        mapped /= np.maximum(
            np.linalg.norm(mapped, axis=-1, keepdims=True), 1e-8)
        sims = mapped @ cand.T                           # [N, U]
        ranks = np.argsort(-sims, axis=1)
        metrics = {"rows": len(rows), "unique_texts": len(uniq)}
        for k in ks:
            hits = np.any(ranks[:, :k] == own[:, None], axis=1)
            metrics[f"top{k}"] = float(hits.mean())
            metrics[f"chance_top{k}"] = min(k / len(uniq), 1.0)
        out[modality] = metrics
    return out


class ProjectorTrainer:
    """Generative-alignment training loop over a frozen LLM.

    ``llm`` supplies ``(model, variables, tokenize)``; when None, training
    falls back to the cosine/norm objective so the loop stays runnable
    without a checkpoint.
    """

    def __init__(
        self,
        config: Optional[ProjectorTrainingConfig] = None,
        reasoning_config: Optional[ReasoningCoreConfig] = None,
        llm=None,  # (Qwen3Model, variables, tokenize_fn) or None
        mesh=None,
    ):
        self.config = config or ProjectorTrainingConfig()
        self.reasoning_config = reasoning_config or ReasoningCoreConfig(
            llm_hidden_dim=self.config.llm_dim
        )
        self.bank = ProjectorBank(self.reasoning_config).init(
            jax.random.PRNGKey(self.config.seed)
        )
        self.llm = llm
        self.mesh = mesh
        self.tx = optax.chain(
            optax.clip_by_global_norm(self.config.grad_clip),
            optax.adamw(
                optax.warmup_cosine_decay_schedule(
                    0.0, self.config.learning_rate, self.config.warmup_steps,
                    decay_steps=1000,
                ),
                weight_decay=self.config.weight_decay,
            ),
        )
        self._step_fns: dict[str, callable] = {}

    # ----------------------------------------------------------- objectives

    def _make_step(self, modality: str):
        module = self.bank.module
        tx = self.tx
        llm = self.llm
        target_dim = self.reasoning_config.llm_hidden_dim

        if llm is not None:
            model, variables, _ = llm

            def loss_fn(params, emb, token_ids, target_mask):
                projected = module.apply({"params": params}, emb)[:, None, :]
                token_embeds = model.apply(
                    variables, token_ids, method=type(model).embed_only
                )
                inputs = jnp.concatenate(
                    [projected.astype(token_embeds.dtype), token_embeds],
                    axis=1,
                )
                logits, _ = model.apply(variables, inputs_embeds=inputs)
                # predict token t from position t (projected token shifts
                # everything right by one)
                logits = logits[:, :-1]
                ce = optax.softmax_cross_entropy_with_integer_labels(
                    logits, token_ids
                )
                return (ce * target_mask).sum() / jnp.maximum(
                    target_mask.sum(), 1.0
                )
        elif self.config.objective == "cosine":
            # in-batch symmetric InfoNCE against the hashing text space:
            # the projected embedding must retrieve ITS timeline text
            # among the batch.  The 4096→text_dim map is a FIXED seeded
            # random projection shared by training and evaluation.
            proj_map = text_projection_matrix(target_dim,
                                              self.config.text_dim)
            temp = self.config.temperature

            def loss_fn(params, emb, text_emb, target_mask):
                del target_mask
                projected = module.apply({"params": params}, emb)
                mapped = projected @ proj_map.astype(projected.dtype)
                mapped = mapped / jnp.maximum(
                    jnp.linalg.norm(mapped, axis=-1, keepdims=True), 1e-8)
                logits = mapped @ text_emb.T / temp          # [B, B]
                # duplicate texts in a batch are NOT negatives of each
                # other (timeline events repeat): mask off-diagonal pairs
                # whose targets coincide
                same = (text_emb @ text_emb.T) > 0.999
                b = logits.shape[0]
                eye = jnp.eye(b, dtype=bool)
                logits = jnp.where(same & ~eye, -1e30, logits)
                labels = jnp.arange(b)
                ce_a = optax.softmax_cross_entropy_with_integer_labels(
                    logits, labels)
                ce_b = optax.softmax_cross_entropy_with_integer_labels(
                    logits.T, labels)
                return (ce_a + ce_b).mean() / 2.0
        else:

            def loss_fn(params, emb, token_ids, target_mask):
                projected = module.apply({"params": params}, emb)
                # norm regularization toward sqrt(llm_dim)
                norms = jnp.linalg.norm(projected, axis=-1)
                return jnp.mean((norms - jnp.sqrt(float(target_dim))) ** 2)

        @jax.jit
        def step(params, opt_state, emb, token_ids, target_mask):
            loss, grads = jax.value_and_grad(loss_fn)(
                params, emb, token_ids, target_mask
            )
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        return step

    def _tokenize_batch(self, texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
        """(token_ids [B, T], target_mask [B, T]) padded to max_target."""
        max_len = self.config.max_target_tokens
        if self.llm is not None:
            _, _, tokenize = self.llm
        else:
            from gvl_tpu.models.sam import hash_tokenize

            tokenize = lambda text: hash_tokenize(text, 512, max_len).tolist()
        ids = np.zeros((len(texts), max_len), np.int32)
        mask = np.zeros((len(texts), max_len), np.float32)
        for i, text in enumerate(texts):
            toks = list(tokenize(text))[:max_len]
            ids[i, : len(toks)] = toks
            mask[i, : len(toks)] = 1.0
        return ids, mask

    # -------------------------------------------------------------- train

    def train(self, dataset: MultimodalProjectorDataset) -> dict:
        rng = np.random.default_rng(self.config.seed)
        history: dict[str, list[float]] = {}
        best_loss = float("inf")
        opt_states = {
            m: self.tx.init(self.bank.params[m]) for m in MODALITY_DIMS
        }
        for epoch in range(self.config.epochs):
            epoch_losses = []
            for modality in ("siglip", "videomae", "audio"):
                step = self._step_fns.setdefault(
                    modality, self._make_step(modality))
                for batch in dataset.batches(
                    modality, self.config.batch_size, rng
                ):
                    if (self.llm is None
                            and self.config.objective == "cosine"):
                        from gvl_tpu.agent.retriever import (
                            HashingTextEmbedder,
                        )

                        if not hasattr(self, "_text_embedder"):
                            self._text_embedder = HashingTextEmbedder(
                                self.config.text_dim)
                        aux1 = jnp.asarray(
                            self._text_embedder.encode(batch["text"]))
                        aux2 = jnp.zeros((len(batch["text"]),))
                    else:
                        ids, mask = self._tokenize_batch(batch["text"])
                        aux1, aux2 = jnp.asarray(ids), jnp.asarray(mask)
                    params, opt_states[modality], loss = step(
                        self.bank.params[modality], opt_states[modality],
                        jnp.asarray(batch["embedding"]), aux1, aux2,
                    )
                    self.bank.params[modality] = params
                    loss = float(loss)
                    epoch_losses.append(loss)
                    history.setdefault(modality, []).append(loss)
            mean_loss = float(np.mean(epoch_losses)) if epoch_losses else 0.0
            logger.info("epoch %d: mean loss %.4f", epoch, mean_loss)
            if mean_loss < best_loss and epoch_losses:
                best_loss = mean_loss
                self.bank.save_weights(self.config.output_path)
                logger.info("checkpointed best (loss %.4f)", best_loss)
        return {"best_loss": best_loss, "history": history}
