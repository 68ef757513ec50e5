"""LoRA supervised fine-tuning of the reasoning core.

The reference regime (`/root/reference/scripts/finetune_lora.py`):
chat-format Q&A pairs, r=32/α=64 on all 7 projection targets, lr 2e-5,
bf16, gradient accumulation 8, max_len 4096, prompt tokens masked out of
the loss.  Here the step is one jitted program with an optax-masked
optimizer touching only LoRA params, data-parallel over the mesh when one
is supplied.
"""

from __future__ import annotations

import json
import logging
from dataclasses import dataclass, field
from pathlib import Path
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gvl_tpu.models.qwen3 import Qwen3Config, Qwen3Model

logger = logging.getLogger(__name__)


@dataclass
class LoraTrainingConfig:
    lora_rank: int = 32
    lora_alpha: float = 64.0
    learning_rate: float = 2e-5
    grad_accum_steps: int = 8
    epochs: int = 3
    batch_size: int = 1
    max_seq_len: int = 4096
    grad_clip: float = 1.0
    seed: int = 0
    output_dir: str = "outputs/lora_adapter"
    save_steps: int = 50
    save_total_limit: int = 3
    targets: tuple[str, ...] = (
        "q_proj", "k_proj", "v_proj", "o_proj",
        "gate_proj", "up_proj", "down_proj",
    )


def load_chat_training_data(path: str | Path) -> list[dict]:
    """Validate chat-format pairs: each sample has user+assistant turns."""
    doc = json.loads(Path(path).read_text())
    rows = doc if isinstance(doc, list) else doc.get("data", [])
    out = []
    for i, row in enumerate(rows):
        messages = row.get("messages", row.get("conversations", []))
        roles = [m.get("role", m.get("from")) for m in messages]
        if "user" not in roles or "assistant" not in roles:
            logger.warning("sample %d missing user/assistant turns; skipped", i)
            continue
        out.append({"messages": [
            {"role": m.get("role", m.get("from")),
             "content": m.get("content", m.get("value", ""))}
            for m in messages
        ]})
    logger.info("loaded %d valid chat samples from %s", len(out), path)
    return out


def lora_mask(params) -> dict:
    """Pytree mask selecting only lora_a/lora_b leaves."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: any(
            getattr(k, "key", "") in ("lora_a", "lora_b") for k in path
        ),
        params,
    )


class LoraTrainer:
    """SFT loop updating only LoRA adapters of a (frozen) base model."""

    def __init__(
        self,
        model: Qwen3Model,
        params: dict,
        tokenize: Callable[[str], list[int]],
        config: Optional[LoraTrainingConfig] = None,
        mesh=None,
    ):
        if model.config.lora_rank <= 0:
            raise ValueError(
                "model must be built with lora_rank > 0 for LoRA training"
            )
        self.model = model
        self.params = params
        self.tokenize = tokenize
        self.config = config or LoraTrainingConfig()
        self.mesh = mesh

        schedule = optax.cosine_decay_schedule(
            self.config.learning_rate, decay_steps=1000
        )
        inner = optax.chain(
            optax.clip_by_global_norm(self.config.grad_clip),
            optax.adamw(schedule),
        )
        labels = jax.tree.map(
            lambda is_lora: "lora" if is_lora else "frozen",
            lora_mask(self.params),
        )
        self.tx = optax.MultiSteps(
            optax.multi_transform(
                {"lora": inner, "frozen": optax.set_to_zero()}, labels
            ),
            every_k_schedule=self.config.grad_accum_steps,
        )
        self.opt_state = self.tx.init(self.params)
        self._step = self._build_step()
        self._global_step = 0
        self._checkpoints: list[Path] = []

    # ------------------------------------------------------------ batching

    def encode_sample(self, sample: dict) -> Optional[dict]:
        """Tokenize a chat sample; labels = -100 outside assistant spans."""
        ids: list[int] = []
        labels: list[int] = []
        for message in sample["messages"]:
            text = f"<|{message['role']}|>{message['content']}\n"
            toks = list(self.tokenize(text))
            ids.extend(toks)
            if message["role"] == "assistant":
                labels.extend(toks)
            else:
                labels.extend([-100] * len(toks))
        if not ids:
            return None
        max_len = self.config.max_seq_len
        ids, labels = ids[:max_len], labels[:max_len]
        pad = max_len - len(ids)
        return {
            "input_ids": np.asarray(ids + [0] * pad, np.int32),
            "labels": np.asarray(labels + [-100] * pad, np.int32),
        }

    def _build_step(self):
        model, tx = self.model, self.tx

        def loss_fn(params, input_ids, labels):
            logits, _ = model.apply({"params": params}, input_ids)
            logits = logits[:, :-1]
            targets = labels[:, 1:]
            mask = (targets != -100).astype(jnp.float32)
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits, jnp.maximum(targets, 0)
            )
            return (ce * mask).sum() / jnp.maximum(mask.sum(), 1.0)

        @jax.jit
        def step(params, opt_state, input_ids, labels):
            loss, grads = jax.value_and_grad(loss_fn)(
                params, input_ids, labels)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        return step

    # --------------------------------------------------------------- train

    def dry_run(self, data: list[dict]) -> dict:
        """Validate data + tokenization without touching the model."""
        encoded = [self.encode_sample(s) for s in data]
        valid = [e for e in encoded if e is not None]
        lengths = [int((e["labels"] != -100).sum()) for e in valid]
        return {
            "num_samples": len(data),
            "num_valid": len(valid),
            "mean_target_tokens": float(np.mean(lengths)) if lengths else 0.0,
        }

    def train(self, data: list[dict]) -> dict:
        rng = np.random.default_rng(self.config.seed)
        losses = []
        encoded = [e for e in (self.encode_sample(s) for s in data) if e]
        if not encoded:
            return {"steps": 0, "final_loss": None}
        for epoch in range(self.config.epochs):
            order = rng.permutation(len(encoded))
            for start in range(0, len(encoded), self.config.batch_size):
                chunk = [encoded[i] for i in
                         order[start: start + self.config.batch_size]]
                input_ids = jnp.stack([c["input_ids"] for c in chunk])
                labels = jnp.stack([c["labels"] for c in chunk])
                self.params, self.opt_state, loss = self._step(
                    self.params, self.opt_state, input_ids, labels)
                losses.append(float(loss))
                self._global_step += 1
                if self._global_step % self.config.save_steps == 0:
                    self.save_adapter()
            logger.info("epoch %d: loss %.4f", epoch,
                        float(np.mean(losses[-len(encoded):])))
        self.save_adapter(final=True)
        return {"steps": self._global_step, "final_loss": losses[-1]}

    # ---------------------------------------------------------- checkpoint

    def extract_adapter(self) -> dict[str, np.ndarray]:
        """Flat {path: array} of only the LoRA params."""
        flat = {}

        def walk(tree, prefix=""):
            for key, value in tree.items():
                path = f"{prefix}/{key}" if prefix else key
                if isinstance(value, dict):
                    walk(value, path)
                elif key in ("lora_a", "lora_b"):
                    flat[path] = np.asarray(value)

        walk(self.params)
        return flat

    def save_adapter(self, final: bool = False) -> Path:
        out_dir = Path(self.config.output_dir)
        out_dir.mkdir(parents=True, exist_ok=True)
        name = "adapter_final.npz" if final else (
            f"adapter_step{self._global_step:06d}.npz")
        path = out_dir / name
        np.savez_compressed(path, **self.extract_adapter())
        (out_dir / "adapter_config.json").write_text(json.dumps({
            "lora_rank": self.model.config.lora_rank,
            "lora_alpha": self.model.config.lora_alpha,
            "targets": list(self.model.config.lora_targets),
        }, indent=2))
        if not final:
            self._checkpoints.append(path)
            while len(self._checkpoints) > self.config.save_total_limit:
                victim = self._checkpoints.pop(0)
                victim.unlink(missing_ok=True)
        return path

    def load_adapter(self, path: str | Path) -> None:
        with np.load(path) as z:
            flat = {k: z[k] for k in z.files}

        def walk(tree, prefix=""):
            for key, value in list(tree.items()):
                p = f"{prefix}/{key}" if prefix else key
                if isinstance(value, dict):
                    walk(value, p)
                elif p in flat:
                    tree[key] = jnp.asarray(flat[p])

        walk(self.params)
