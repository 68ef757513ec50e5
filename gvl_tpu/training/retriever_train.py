"""Self-trained semantic-retrieval text embedder (the MiniLM-class rung).

The reference retrieves timeline events semantically with
all-MiniLM-L6-v2 (`/root/reference/src/agent_core/qwen_reasoning_core.py:
1492-1528`); with zero egress the JAX MiniLM port has no weights to
load, so semantic retrieval has been riding the n-gram
HashingTextEmbedder — purely lexical, no paraphrase ability ("the hero"
can never match "player detected").  This module trains a small
byte-level text tower (the same :class:`SigLIPTextTower` architecture
the mini-SigLIP rung uses) contrastively on procedurally generated
(query, event-description) pairs with a synonym-rich paraphrase
vocabulary, giving the retriever a real trained rung between the HF
MiniLM checkpoint and hashing.

Scope note (honest): a 256-vocab byte tower learns the paraphrase map
it is trained on — synonyms OUTSIDE the training vocabulary still need
the real MiniLM rung.  The measurable capability is: paraphrase queries
over held-out timelines retrieve the right event where hashing is at
chance, at unchanged lexical-query accuracy.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from typing import Optional, Sequence

import numpy as np

logger = logging.getLogger(__name__)

# ------------------------------------------------------------------
# Paraphrase vocabulary (the trained synonym map)
# ------------------------------------------------------------------

ENTITY_SYNONYMS: dict[str, tuple[str, ...]] = {
    "player": ("hero", "protagonist", "main character", "avatar",
               "the character you control"),
    "enemy": ("foe", "villain", "monster", "opponent", "hostile"),
    "boss": ("boss monster", "final boss", "big bad", "miniboss"),
    "item": ("pickup", "loot", "collectible", "object", "power-up"),
}
HUD_SYNONYMS: dict[str, tuple[str, ...]] = {
    "HP": ("health", "hit points", "life"),
    "MP": ("mana", "magic points", "energy"),
    "SCORE": ("points", "score counter"),
    "GOLD": ("money", "coins", "currency"),
    "AMMO": ("ammunition", "bullets", "rounds"),
    "LV": ("level", "character level", "rank"),
}
AUDIO_SYNONYMS: dict[str, tuple[str, ...]] = {
    "impact sound": ("hit", "crash", "bang", "thud"),
    "background music": ("soundtrack", "music", "song", "bgm"),
    "UI chime": ("notification sound", "menu beep", "interface chime"),
    "ambient noise": ("background sound", "room tone", "ambience"),
    "voice chatter": ("talking", "voices", "dialogue", "speech"),
}
MOTIONS = ("moving up", "moving down", "moving left", "moving right",
           "moving up-right", "moving up-left", "moving down-right",
           "moving down-left")
MOTION_SYNONYMS: dict[str, tuple[str, ...]] = {
    "moving up": ("heading upward", "going up", "ascending"),
    "moving down": ("heading downward", "going down", "descending"),
    "moving left": ("heading left", "going left", "westward"),
    "moving right": ("heading right", "going right", "eastward"),
    "moving up-right": ("heading up and right", "going northeast"),
    "moving up-left": ("heading up and left", "going northwest"),
    "moving down-right": ("heading down and right", "going southeast"),
    "moving down-left": ("heading down and left", "going southwest"),
}
SPEECH_LINES = (
    "follow me to the gate", "enemy ahead take cover",
    "press the button now", "we need more supplies",
    "the bridge is out", "meet me at the tower",
    "watch out for the trap", "grab the key and run",
    "the door is locked", "reinforcements are coming",
    "head for the exit", "light the torch first",
    "save your ammo", "check the map again",
    "the boss is weak to fire", "use the potion now",
    "climb the ladder quickly", "wait for my signal",
    "they went through the tunnel", "defend the base",
)

_DETECT_TEMPLATES = (
    "when does the {e} appear", "when is the {e} first seen",
    "where is the {e}", "show me the {e}", "is there a {e} visible",
    "find the {e} on screen",
)
_MOTION_TEMPLATES = (
    "which way does the {e} go", "where is the {e} {m}",
    "is the {e} {m}", "track the {e} while it is {m}",
)
_OCR_TEMPLATES = (
    "what is the {w} value", "how much {w} is left",
    "read the {w} counter", "what does the {w} display say",
)
_AUDIO_TEMPLATES = (
    "when does the {a} play", "identify the {a}",
    "is there a {a} in the audio", "what time is the {a}",
)
_SPEECH_TEMPLATES = (
    "who said {s}", "when did someone say {s}",
    "find the line about {s}",
)
_ATTACK_TEMPLATES = (
    "who attacks the {b}", "what happened to the {b}",
    "why did the {b} get destroyed", "when is the {b} hit",
)
_COPY_TEMPLATES = (
    "find the event about {w}", "when does {w} happen",
    "tell me about {w}", "what is {w}", "show the {w} line",
)

_SYLLABLES = ("ba", "be", "bo", "da", "de", "do", "ka", "ke", "ko",
              "la", "le", "lo", "ma", "me", "mo", "na", "ne", "no",
              "ra", "re", "ro", "sa", "se", "so", "ta", "te", "to",
              "va", "ve", "vo", "za", "ze", "zo", "chi", "sha", "ga")


def _random_word(rng: np.random.Generator) -> str:
    n = int(rng.integers(2, 5))
    return "".join(str(rng.choice(_SYLLABLES)) for _ in range(n))


def _syn(rng: np.random.Generator, word: str, table: dict,
         paraphrase: bool) -> str:
    """The literal word (lexical regime) or a trained synonym."""
    if paraphrase:
        opts = table[word]
        return str(opts[int(rng.integers(0, len(opts)))])
    return word.lower()


def make_pair(rng: np.random.Generator,
              paraphrase_prob: float = 0.5) -> tuple[str, str, str]:
    """One (query, event-description, uniqueness-key) pair.

    The key dedupes confusable targets within a batch so in-batch
    InfoNCE negatives are true negatives.  Family 6 ("copy") pairs
    never-repeating random words with queries quoting them verbatim —
    it teaches GENERIC byte-level lexical matching, so the trained
    tower keeps hashing's ability to rank unseen words by overlap
    instead of trading it for the synonym skill."""
    fam = int(rng.integers(0, 7))
    para = bool(rng.random() < paraphrase_prob)
    ents = list(ENTITY_SYNONYMS)
    if fam == 0:  # detection
        e = str(rng.choice(ents))
        q = str(rng.choice(_DETECT_TEMPLATES)).format(
            e=_syn(rng, e, ENTITY_SYNONYMS, para))
        return q, f"{e} detected", f"det:{e}"
    if fam == 1:  # motion (the trained clip-encoder's event format)
        e = str(rng.choice(ents))
        m = str(rng.choice(MOTIONS))
        q = str(rng.choice(_MOTION_TEMPLATES)).format(
            e=_syn(rng, e, ENTITY_SYNONYMS, para),
            m=_syn(rng, m, MOTION_SYNONYMS, para))
        return q, f"{e} {m}", f"mot:{e}"
    if fam == 2:  # HUD text (OCR)
        w = str(rng.choice(list(HUD_SYNONYMS)))
        val = (f"{rng.integers(1, 999)}/{rng.integers(1, 999)}"
               if rng.random() < 0.5 else f"{rng.integers(0, 9999)}")
        q = str(rng.choice(_OCR_TEMPLATES)).format(
            w=_syn(rng, w, HUD_SYNONYMS, para))
        return q, f"{w} {val}", f"ocr:{w}"
    if fam == 3:  # audio event
        a = str(rng.choice(list(AUDIO_SYNONYMS)))
        q = str(rng.choice(_AUDIO_TEMPLATES)).format(
            a=_syn(rng, a, AUDIO_SYNONYMS, para))
        return q, a, f"aud:{a}"
    if fam == 4:  # speech
        s = str(rng.choice(SPEECH_LINES))
        frag = " ".join(s.split()[-2:])  # quote the tail fragment
        q = str(rng.choice(_SPEECH_TEMPLATES)).format(s=frag)
        return q, s, f"sp:{s}"
    if fam == 5:  # attack / causal
        a, b = rng.choice(ents, 2, replace=False)
        q = str(rng.choice(_ATTACK_TEMPLATES)).format(
            b=_syn(rng, str(b), ENTITY_SYNONYMS, para))
        return q, f"(Event: {a} attacks {b})", f"atk:{b}"
    # copy: verbatim lexical matching on never-repeating random words
    words = [_random_word(rng) for _ in range(int(rng.integers(2, 5)))]
    desc = " ".join(words)
    pick = rng.choice(words, size=min(len(words),
                                      int(rng.integers(1, 3))),
                      replace=False)
    q = str(rng.choice(_COPY_TEMPLATES)).format(w=" ".join(pick))
    return q, desc, f"cp:{desc}"


def make_batch(rng: np.random.Generator, n: int,
               paraphrase_prob: float = 0.5) -> tuple[list[str],
                                                      list[str]]:
    """n pairs with batch-unique target keys (true in-batch negatives)."""
    queries, descs, seen = [], [], set()
    attempts = 0
    while len(queries) < n and attempts < n * 30:
        attempts += 1
        q, d, key = make_pair(rng, paraphrase_prob)
        if key in seen:
            continue
        seen.add(key)
        queries.append(q)
        descs.append(d)
    return queries, descs


# ------------------------------------------------------------------
# Model / training
# ------------------------------------------------------------------

def retriever_text_config(**kw):
    from gvl_tpu.models.siglip import SigLIPTextConfig

    base = dict(hidden_size=256, intermediate_size=1024, num_layers=4,
                num_heads=4, vocab_size=256, max_position=64,
                projection_size=256)
    base.update(kw)
    return SigLIPTextConfig(**base)


def tokenize(texts: Sequence[str], max_position: int = 64) -> np.ndarray:
    from gvl_tpu.training.siglip_train import byte_tokenize

    return byte_tokenize(texts, max_position)


@dataclass
class RetrieverTrainConfig:
    steps: int = 3000
    batch_size: int = 36  # ≤ max distinct target keys (43)
    learning_rate: float = 3e-4
    weight_decay: float = 1e-4
    temperature: float = 0.07
    seed: int = 0
    log_every: int = 200
    paraphrase_prob: float = 0.5
    model: object = field(default_factory=retriever_text_config)


def train_retriever(cfg: Optional[RetrieverTrainConfig] = None,
                    init_params: Optional[dict] = None) -> dict:
    """Returns trained SigLIPTextTower params."""
    import jax
    import jax.numpy as jnp
    import optax

    from gvl_tpu.models.siglip import SigLIPTextTower

    cfg = cfg or RetrieverTrainConfig()
    model = SigLIPTextTower(cfg.model)
    rng = np.random.default_rng(cfg.seed)

    dummy = jnp.zeros((1, cfg.model.max_position), jnp.int32)
    params = init_params or model.init(
        jax.random.PRNGKey(cfg.seed), dummy)["params"]
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    logger.info("retriever params: %.2fM", n_params / 1e6)

    tx = optax.adamw(optax.cosine_decay_schedule(
        cfg.learning_rate, cfg.steps), weight_decay=cfg.weight_decay)
    opt_state = tx.init(params)
    inv_t = 1.0 / cfg.temperature

    @jax.jit
    def step(params, opt_state, q_ids, d_ids):
        def loss_fn(p):
            zq = model.apply({"params": p}, q_ids)["pooled"]
            zd = model.apply({"params": p}, d_ids)["pooled"]
            zq = zq / jnp.linalg.norm(zq, axis=-1, keepdims=True)
            zd = zd / jnp.linalg.norm(zd, axis=-1, keepdims=True)
            logits = (zq @ zd.T) * inv_t
            labels = jnp.arange(logits.shape[0])
            ce = optax.softmax_cross_entropy_with_integer_labels
            # symmetric: query→desc and desc→query
            return 0.5 * (ce(logits, labels).mean()
                          + ce(logits.T, labels).mean())

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    for i in range(cfg.steps):
        queries, descs = make_batch(rng, cfg.batch_size,
                                    cfg.paraphrase_prob)
        q_ids = jnp.asarray(tokenize(queries, cfg.model.max_position))
        d_ids = jnp.asarray(tokenize(descs, cfg.model.max_position))
        params, opt_state, loss = step(params, opt_state, q_ids, d_ids)
        if cfg.log_every and (i % cfg.log_every == 0 or i == cfg.steps - 1):
            logger.info("retriever step %d loss %.4f", i, float(loss))
    return jax.device_get(params)


# ------------------------------------------------------------------
# Evaluation: retrieval over held-out timelines vs the hashing baseline
# ------------------------------------------------------------------

def _eval_timeline(rng: np.random.Generator,
                   n_events: int = 12) -> tuple[list[str], int, str, str]:
    """(descriptions, target index, paraphrase query, lexical query)."""
    descs, keys = [], set()
    pairs = []
    while len(descs) < n_events:
        q_par, d, key = make_pair(rng, paraphrase_prob=1.0)
        if key in keys:
            continue
        keys.add(key)
        if key.startswith(("cp:", "sp:")):
            # copy/speech queries quote the description verbatim —
            # paraphrase and lexical regimes coincide
            q_lex = q_par
        else:
            # a lexical twin of the same target key
            rng2 = np.random.default_rng(int(rng.integers(0, 2 ** 31)))
            while True:
                q_lex, _d2, key2 = make_pair(rng2, paraphrase_prob=0.0)
                if key2 == key:
                    break
        descs.append(d)
        pairs.append((q_par, q_lex))
    t = int(rng.integers(0, n_events))
    return descs, t, pairs[t][0], pairs[t][1]


def evaluate_retriever(
    embedder,
    n_timelines: int = 50,
    n_events: int = 12,
    seed: int = 1234,
) -> dict:
    """Top-1/top-5 retrieval per query regime for ANY TextEmbedder
    (trained tower or the hashing baseline — same protocol)."""
    rng = np.random.default_rng(seed)
    hits = {"paraphrase_top1": [], "paraphrase_top5": [],
            "lexical_top1": [], "lexical_top5": []}
    for _ in range(n_timelines):
        descs, t, q_par, q_lex = _eval_timeline(rng, n_events)
        z_d = embedder.encode(descs)
        z_d = z_d / np.maximum(
            np.linalg.norm(z_d, axis=-1, keepdims=True), 1e-12)
        for regime, q in (("paraphrase", q_par), ("lexical", q_lex)):
            z_q = embedder.encode([q])[0]
            z_q = z_q / max(float(np.linalg.norm(z_q)), 1e-12)
            order = np.argsort(-(z_d @ z_q))
            hits[f"{regime}_top1"].append(int(order[0] == t))
            hits[f"{regime}_top5"].append(int(t in order[:5]))
    out = {k: float(np.mean(v)) for k, v in hits.items()}
    out["n"] = n_timelines
    return out


# ------------------------------------------------------------------
# Checkpoint I/O + inference rung
# ------------------------------------------------------------------

def save_retriever(params: dict, out_dir, model_cfg=None,
                   metrics: Optional[dict] = None) -> None:
    import json
    from dataclasses import asdict
    from pathlib import Path

    from gvl_tpu.utils.checkpoints import save_flat_npz

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    save_flat_npz(params, out / "params.npz")
    meta = {"model": asdict(model_cfg or retriever_text_config())}
    if metrics:
        meta["metrics"] = metrics
    (out / "retriever_config.json").write_text(json.dumps(meta, indent=2))


def load_retriever(ckpt_dir):
    import json
    from pathlib import Path

    from gvl_tpu.models.siglip import SigLIPTextConfig
    from gvl_tpu.utils.checkpoints import load_flat_npz

    ckpt = Path(ckpt_dir)
    raw = json.loads((ckpt / "retriever_config.json").read_text())
    cfg = SigLIPTextConfig(**{
        k: v for k, v in raw["model"].items()
        if k in SigLIPTextConfig.__dataclass_fields__})
    return cfg, load_flat_npz(ckpt / "params.npz")


def is_trained_retriever_checkpoint(path) -> bool:
    from pathlib import Path

    return bool(path) and (Path(path) / "retriever_config.json").exists()


class TrainedTextEmbedder:
    """TextEmbedder protocol over the self-trained tower (normalized)."""

    def __init__(self, model_cfg, params: dict):
        import jax

        from gvl_tpu.models.siglip import SigLIPTextTower

        self.config = model_cfg
        self.dim = model_cfg.projection_size
        model = SigLIPTextTower(model_cfg)

        def run(params, ids):
            import jax.numpy as jnp

            z = model.apply({"params": params}, ids)["pooled"]
            return z / jnp.linalg.norm(z, axis=-1, keepdims=True)

        self._run = jax.jit(run)
        self._params = params

    def encode(self, texts: Sequence[str]) -> np.ndarray:
        if not len(texts):
            return np.zeros((0, self.dim), np.float32)
        ids = tokenize(list(texts), self.config.max_position)
        return np.asarray(self._run(self._params, ids), np.float32)

    @classmethod
    def from_dir(cls, ckpt_dir) -> "TrainedTextEmbedder":
        cfg, params = load_retriever(ckpt_dir)
        return cls(cfg, params)
