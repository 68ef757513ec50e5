"""Train a byte-level timeline-QA language model from scratch.

The reference's reasoning capability comes from downloaded Qwen3-VL-8B
weights (`/root/reference/src/agent_core/qwen_reasoning_core.py:
1803-1879`).  With zero egress, this module trains the repo's OWN
:class:`~gvl_tpu.models.qwen3.Qwen3Model` (a ~4M-param byte-level
config) on procedurally generated grounded-QA transcripts, so the full
agent stack — prompt assembly → Qwen3Engine prefill/decode → streaming →
answer parsing — runs with REAL learned weights end to end and scores
nonzero on the synthetic Phase-1 gate.

Samples are rendered in the exact ChatML byte format
:class:`~gvl_tpu.agent.core.Qwen3ChatBackend` produces with
:class:`~gvl_tpu.models.byte_tokenizer.ByteTokenizer`, with the real
agent system prompt most of the time, so train and serve distributions
match.  Loss is masked to the assistant answer span (+ EOS).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gvl_tpu.models.byte_tokenizer import BOS_ID, EOS_ID, PAD_ID, ByteTokenizer
from gvl_tpu.models.qwen3 import Qwen3Config, Qwen3Model

logger = logging.getLogger(__name__)

ENTITIES = ("player", "enemy", "boss", "item")
DISTRACTOR_OPTIONS = ("wizard", "dragon", "chest", "portal", "turret",
                      "npc", "merchant", "trap")
AUDIO_EVENTS = ("impact sound", "background music", "UI chime",
                "ambient noise", "voice chatter")
HUD_WORDS = ("HP", "MP", "SCORE", "GOLD", "AMMO", "LV")


def qa_lm_config(**kw) -> Qwen3Config:
    """The shipped QA-LM geometry (~4M params, byte vocab)."""
    base = dict(
        hidden_size=256, num_layers=4, num_heads=4, num_kv_heads=2,
        head_dim=64, intermediate_size=1024,
        vocab_size=ByteTokenizer.vocab_size, max_cache_length=4096,
        rope_theta=100_000.0, tie_word_embeddings=False)
    base.update(kw)
    return Qwen3Config(**base)


# --------------------------------------------------------------------------
# Procedural grounded-QA samples
# --------------------------------------------------------------------------

def _mmss(seconds: int) -> str:
    return f"{seconds // 60:02d}:{seconds % 60:02d}"


@dataclass
class QASample:
    system: str
    context_lines: list[str]
    question: str
    answer: str            # full assistant text incl. "**Answer:** ..."
    ground_truth: str      # canonical truth for scoring
    family: str = ""

    def user_text(self) -> str:
        # byte-exact match of ReasoningCore.build_prompt → Qwen3ChatBackend
        # rendering: context parts and the question part are flattened
        # with "\n" and the question part starts with "\n## Question"
        ctx = "\n".join(self.context_lines)
        return f"## Timeline Context\n{ctx}\n\n## Question\n{self.question}"


_SHORT_SYSTEMS = (
    "You are a gameplay video analyst. Answer from the timeline.",
    "Answer questions about the video using the provided context.",
    "sys",
)

_DEFAULT_SYSTEM: Optional[str] = None


def _default_system() -> str:
    global _DEFAULT_SYSTEM
    if _DEFAULT_SYSTEM is None:
        from gvl_tpu.agent.config import ReasoningCoreConfig

        _DEFAULT_SYSTEM = ReasoningCoreConfig().system_prompt
    return _DEFAULT_SYSTEM


def _timeline(rng: np.random.Generator) -> tuple[list[str], dict]:
    """Random timeline lines + a fact dict questions draw from."""
    n_events = int(rng.integers(6, 14))
    times = np.sort(rng.choice(np.arange(1, 580), n_events, replace=False))
    present = list(rng.choice(ENTITIES, rng.integers(1, 4), replace=False))
    facts: dict = {"present": present, "first_seen": {}, "ocr": [],
                   "audio": [], "counts": dict.fromkeys(ENTITIES, 0)}
    lines = []
    for t in times:
        t = int(t)
        kind = rng.random()
        if kind < 0.55:
            ent = str(rng.choice(present))
            desc = str(rng.choice((
                f"{ent} detected", f"{ent} moving right",
                f"{ent} moving left", f"{ent} appears near the center")))
            lines.append(f"[{_mmss(t)}] {desc}")
            facts["counts"][ent] += 1
            facts["first_seen"].setdefault(ent, t)
        elif kind < 0.75:
            word = str(rng.choice(HUD_WORDS))
            if rng.random() < 0.5:
                text = f"{word} {rng.integers(1, 999)}/{rng.integers(1, 999)}"
            else:
                text = f"{word} {rng.integers(0, 9999)}"
            lines.append(f'[{_mmss(t)}] (Text: "{text}")')
            facts["ocr"].append((t, text))
        else:
            ev = str(rng.choice(AUDIO_EVENTS))
            lines.append(f"[{_mmss(t)}] (Audio: {ev})")
            facts["audio"].append((t, ev))
    # every "present" entity must actually be grounded by ≥1 timeline
    # line — answers citing an unmentioned entity would train the model
    # to hallucinate (and fail the Phase-1 grounding gate)
    for ent in present:
        if ent not in facts["first_seen"]:
            t = int(rng.integers(1, 580))
            lines.append(f"[{_mmss(t)}] {ent} detected")
            facts["first_seen"][ent] = t
            facts["counts"][ent] += 1
    lines.sort()  # "[MM:SS]" prefixes sort chronologically under 1 h
    return lines, facts


def generate_qa_sample(rng: np.random.Generator) -> QASample:
    lines, facts = _timeline(rng)
    present = facts["present"]
    system = (_default_system() if rng.random() < 0.7
              else str(rng.choice(_SHORT_SYSTEMS)))
    family = rng.random()

    if family < 0.25:  # binary presence
        if rng.random() < 0.5:
            ent = str(rng.choice(present))
            t = facts["first_seen"].get(ent)
            cite = f" ([{_mmss(t)}])" if t is not None else ""
            answer, truth = f"**Answer:** Yes{cite}", "Yes"
        else:
            absent = [e for e in ENTITIES if e not in present] or ["dragon"]
            ent = str(rng.choice(absent))
            answer, truth = ("**Answer:** No — the timeline never "
                             f"mentions a {ent}.", "No")
        question = (f"Does a {ent} appear at any point in this video? "
                    "Answer Yes or No.")
        return QASample(system, lines, question, answer, truth, "binary")

    if family < 0.5:  # MCQ: which entity appears
        others = [e for e in present if e != "player"]
        if not others:   # force a non-player entity into the timeline
            ent = str(rng.choice([e for e in ENTITIES if e != "player"]))
            t = int(rng.integers(1, 580))
            lines.append(f"[{_mmss(t)}] {ent} detected")
            lines.sort()
            facts["first_seen"].setdefault(ent, t)
            others = [ent]
        correct = str(rng.choice(others))
        wrong = list(rng.choice(
            [d for d in DISTRACTOR_OPTIONS], 3, replace=False))
        options = wrong + [correct]
        rng.shuffle(options)
        letter = chr(ord("A") + options.index(correct))
        question = ("Besides the player, which of the following entities "
                    "appears in this video?\n\nOptions:")
        for i, option in enumerate(options):
            question += f"\n{chr(ord('A') + i)}) {option}"
        question += "\n\nAnswer with the letter of the correct option."
        t = facts["first_seen"].get(correct)
        cite = f" ([{_mmss(t)}])" if t is not None else ""
        answer = f"**Answer:** {letter}) {correct}{cite}"
        return QASample(system, lines, question, answer, letter, "mcq")

    if family < 0.7:  # first-appearance timestamp
        ent = str(rng.choice(list(facts["first_seen"])
                             or present))
        t = facts["first_seen"].get(ent)
        if t is None:
            t = int(rng.integers(1, 580))
            lines.insert(0, f"[{_mmss(t)}] {ent} detected")
            facts["first_seen"][ent] = t
        question = (f"At what timestamp is the {ent} first detected? "
                    "Answer with the [MM:SS] timestamp.")
        answer = f"**Answer:** [{_mmss(t)}]"
        return QASample(system, lines, question, answer,
                        f"[{_mmss(t)}]", "timestamp")

    if family < 0.9 and facts["ocr"]:  # OCR value read
        t, text = facts["ocr"][int(rng.integers(0, len(facts["ocr"])))]
        question = (f"What does the on-screen text show at [{_mmss(t)}]?")
        answer = f'**Answer:** "{text}"'
        return QASample(system, lines, question, answer, text, "ocr")

    # audio event at timestamp (fallback family)
    if facts["audio"]:
        t, ev = facts["audio"][int(rng.integers(0, len(facts["audio"])))]
    else:
        t, ev = int(rng.integers(1, 580)), str(rng.choice(AUDIO_EVENTS))
        lines.append(f"[{_mmss(t)}] (Audio: {ev})")
        lines.sort()
    question = f"What audio event occurs at [{_mmss(t)}]?"
    answer = f"**Answer:** {ev}"
    return QASample(system, lines, question, answer, ev, "audio")


# --------------------------------------------------------------------------
# ChatML byte rendering (must match Qwen3ChatBackend._render fallback)
# --------------------------------------------------------------------------

def render_chatml(system: str, user: str, assistant: str = "") -> str:
    parts = [f"<|im_start|>system\n{system}<|im_end|>\n",
             f"<|im_start|>user\n{user}<|im_end|>\n",
             "<|im_start|>assistant\n"]
    return "".join(parts) + assistant


def encode_sample(sample: QASample, tokenizer: ByteTokenizer,
                  max_len: int) -> tuple[np.ndarray, np.ndarray, int]:
    """(tokens [max_len], loss_mask [max_len], prompt_len).

    tokens = BOS + prompt bytes + answer bytes + EOS, PAD-padded; the
    loss mask covers the answer span + EOS only.  Overlong samples trim
    timeline lines from the FRONT (keeping recency, like the agent's
    char-budget truncation)."""
    while True:
        prompt = render_chatml(sample.system, sample.user_text())
        prompt_ids = [BOS_ID] + tokenizer.encode(prompt)
        answer_ids = tokenizer.encode(sample.answer) + [EOS_ID]
        if len(prompt_ids) + len(answer_ids) <= max_len:
            break
        if len(sample.context_lines) > 2:
            sample.context_lines = sample.context_lines[1:]
        else:  # pathological: hard-trim the prompt
            prompt_ids = prompt_ids[: max_len - len(answer_ids)]
            break
    ids = prompt_ids + answer_ids
    tokens = np.full(max_len, PAD_ID, np.int32)
    tokens[: len(ids)] = ids
    mask = np.zeros(max_len, np.float32)
    mask[len(prompt_ids): len(ids)] = 1.0
    return tokens, mask, len(prompt_ids)


@dataclass
class QATrainConfig:
    steps: int = 6000
    batch_size: int = 16
    max_len: int = 2560
    learning_rate: float = 3e-4
    warmup: int = 200
    weight_decay: float = 0.01
    seed: int = 0
    pool_size: int = 8192
    log_every: int = 200
    model: Qwen3Config = field(default_factory=qa_lm_config)


def train_qa_lm(cfg: Optional[QATrainConfig] = None) -> dict:
    """Returns trained params for ``Qwen3Model(cfg.model)``."""
    import optax

    cfg = cfg or QATrainConfig()
    tokenizer = ByteTokenizer()
    rng = np.random.default_rng(cfg.seed)
    model = Qwen3Model(cfg.model)

    logger.info("rendering %d samples...", cfg.pool_size)
    pool_tokens = np.zeros((cfg.pool_size, cfg.max_len), np.int32)
    pool_mask = np.zeros((cfg.pool_size, cfg.max_len), np.float32)
    for i in range(cfg.pool_size):
        tokens, mask, _ = encode_sample(
            generate_qa_sample(rng), tokenizer, cfg.max_len)
        pool_tokens[i], pool_mask[i] = tokens, mask

    params = model.init(jax.random.PRNGKey(cfg.seed),
                        jnp.zeros((1, 8), jnp.int32))["params"]
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    logger.info("model params: %.2fM", n_params / 1e6)

    warmup = min(cfg.warmup, max(cfg.steps // 10, 1))
    schedule = optax.warmup_cosine_decay_schedule(
        0.0, cfg.learning_rate, warmup, cfg.steps)
    tx = optax.adamw(schedule, weight_decay=cfg.weight_decay)
    opt_state = tx.init(params)

    @jax.jit
    def step_fn(params, opt_state, tokens, mask):
        def loss_fn(p):
            logits, _ = model.apply({"params": p}, tokens)
            targets = tokens[:, 1:]
            tmask = mask[:, 1:]
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits[:, :-1].astype(jnp.float32), targets)
            return (ce * tmask).sum() / jnp.maximum(tmask.sum(), 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    # pre-stage the pool on device in chunks? pool is 8192*2560*4 B
    # ≈ 84 MB tokens + 84 MB mask — device_put whole, index per step
    dev_tokens = jax.device_put(pool_tokens)
    dev_mask = jax.device_put(pool_mask)

    @jax.jit
    def gather(idx):
        return dev_tokens[idx], dev_mask[idx]

    for i in range(cfg.steps):
        idx = jnp.asarray(rng.integers(0, cfg.pool_size, cfg.batch_size))
        tokens, mask = gather(idx)
        params, opt_state, loss = step_fn(params, opt_state, tokens, mask)
        if cfg.log_every and (i % cfg.log_every == 0 or i == cfg.steps - 1):
            logger.info("qa-lm step %d loss %.4f", i, float(loss))
    return params


# --------------------------------------------------------------------------
# Evaluation / checkpoint
# --------------------------------------------------------------------------

def evaluate_qa_lm(
    params: dict,
    model_cfg: Optional[Qwen3Config] = None,
    n_samples: int = 50,
    seed: int = 1234,
    max_new_tokens: int = 48,
) -> dict:
    """Held-out grounded-QA accuracy through the REAL Qwen3Engine
    decode path (greedy)."""
    from gvl_tpu.models.qwen3 import Qwen3Engine

    model_cfg = model_cfg or qa_lm_config()
    tokenizer = ByteTokenizer()
    engine = Qwen3Engine(model_cfg, {"params": params},
                         eos_token_id=EOS_ID)
    rng = np.random.default_rng(seed)
    per_family: dict[str, list[int]] = {}
    for _ in range(n_samples):
        sample = generate_qa_sample(rng)
        # same front-trim budget as training
        tokens, _, prompt_len = encode_sample(
            sample, tokenizer, 2560)
        ids = [int(t) for t in tokens[:prompt_len]]
        out = engine.generate(ids, max_new_tokens=max_new_tokens,
                              temperature=0.0)
        text = tokenizer.decode(out)
        ok = _answer_correct(text, sample)
        per_family.setdefault(sample.family, []).append(int(ok))
    by_family = {f: float(np.mean(v)) for f, v in per_family.items()}
    overall = float(np.mean([x for v in per_family.values() for x in v]))
    return {"accuracy": overall, "by_family": by_family, "n": n_samples}


def _answer_correct(text: str, sample: QASample) -> bool:
    import re

    m = re.search(r"\*\*Answer:\*\*\s*(.+)", text, re.DOTALL)
    got = (m.group(1) if m else text).strip().split("\n")[0]
    truth = sample.ground_truth.strip()
    if sample.family == "mcq":
        lm = re.search(r"\b([A-H])\)", got)
        return bool(lm) and lm.group(1) == truth
    return truth.lower() in got.lower()


def save_qa_lm(params: dict, out_dir,
               config: Optional[Qwen3Config] = None) -> None:
    import json
    from dataclasses import asdict
    from pathlib import Path

    from gvl_tpu.utils.checkpoints import save_flat_npz

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    cfg = config or qa_lm_config()
    (out / "qa_lm_config.json").write_text(json.dumps({
        k: v for k, v in asdict(cfg).items()
        if k != "lora_targets"}, indent=2))
    save_flat_npz(params, out / "params.npz")


def load_qa_lm(ckpt_dir) -> tuple[Qwen3Config, dict]:
    import json
    from pathlib import Path

    from gvl_tpu.utils.checkpoints import load_flat_npz

    ckpt = Path(ckpt_dir)
    raw = json.loads((ckpt / "qa_lm_config.json").read_text())
    raw.pop("lora_targets", None)
    cfg = Qwen3Config(**{k: v for k, v in raw.items()
                         if k in Qwen3Config.__dataclass_fields__})
    return cfg, load_flat_npz(ckpt / "params.npz")


def is_qa_lm_checkpoint(path) -> bool:
    from pathlib import Path

    return bool(path) and (Path(path) / "qa_lm_config.json").exists()
