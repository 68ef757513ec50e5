"""Self-trained temporal clip encoder (the VideoMAE-class trained rung).

The reference extracts VideoMAE clip embeddings with a real HF model
(`/root/reference/scripts/realtime_inference.py:339-381`); its only
weights-free behavior is nothing at all.  This module trains the SAME
JAX tower the HF rung uses (:class:`gvl_tpu.models.videomae
.VideoMAEEncoder`, at mini scale) fully offline on procedurally
animated scenes, so the temporal family gets a real trained capability
rung between the HF checkpoint and the deterministic hash fake — the
same ladder position the self-trained ASR/OCR/segmenter/mini-SigLIP
artifacts occupy for their families.

Supervision is chosen so the embedding must encode what a SINGLE frame
cannot: the primary entity's motion direction (9-way: static + 8
compass), its concept kind (shared with the segmenter's concept
signatures), and an appearance event (none / appears mid-clip /
vanishes mid-clip).  A frame-shuffled control quantifies how much of
the direction signal is genuinely temporal: shuffling frames destroys
motion order, so direction accuracy on moving clips must collapse
toward chance if (and only if) the model learned temporal features.

Style families mirror ``segmenter_train`` (base / aug domain
randomization / never-trained holdout rendering) so out-of-style
transfer is measurable with the same protocol.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from typing import Optional

import numpy as np

from gvl_tpu.training.segmenter_train import CONCEPT_SPECS, _draw_styled

logger = logging.getLogger(__name__)

CONCEPTS = tuple(CONCEPT_SPECS)

# 9-way motion label: index 0 is static, then 8 compass directions as
# (dx, dy) unit steps (y grows downward, "N" = up).
DIRECTIONS: tuple[tuple[str, tuple[float, float]], ...] = (
    ("static", (0.0, 0.0)),
    ("N", (0.0, -1.0)),
    ("NE", (0.707, -0.707)),
    ("E", (1.0, 0.0)),
    ("SE", (0.707, 0.707)),
    ("S", (0.0, 1.0)),
    ("SW", (-0.707, 0.707)),
    ("W", (-1.0, 0.0)),
    ("NW", (-0.707, -0.707)),
)
DIRECTION_NAMES = tuple(name for name, _ in DIRECTIONS)
EVENTS = ("none", "appears", "vanishes")

# compass → timeline-event phrasing ("the player moving up-right")
DIRECTION_PHRASES = {
    "static": "holding position", "N": "moving up",
    "NE": "moving up-right", "E": "moving right",
    "SE": "moving down-right", "S": "moving down",
    "SW": "moving down-left", "W": "moving left",
    "NW": "moving up-left",
}

# ImageNet normalization — identical to the HF-rung preprocessing in
# gvl_tpu/temporal/clip_encoder.py, so the trained tower slots into the
# same inference wrapper.
_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


# --------------------------------------------------------------------------
# Procedural animated clips with ground truth
# --------------------------------------------------------------------------

def _background(rng: np.random.Generator, size: int, n_frames: int,
                style: str) -> np.ndarray:
    """[T, S, S, 3] uint8 backgrounds per style family."""
    if style == "holdout":
        # checkerboard — never sampled in training (segmenter playbook)
        cell = int(rng.integers(12, 22))
        yy, xx = np.mgrid[0:size, 0:size]
        checker = ((yy // cell + xx // cell) % 2).astype(np.float32)
        a, b = rng.uniform(20, 60), rng.uniform(70, 110)
        base = (a + (b - a) * checker)[..., None].repeat(3, axis=-1)
    elif style == "aug" and rng.random() < 0.5:
        # vertical gradient
        lo, hi = rng.uniform(10, 50), rng.uniform(60, 120)
        col = np.linspace(lo, hi, size, dtype=np.float32)
        base = col[:, None, None].repeat(size, 1).repeat(3, 2)
    elif style == "aug" and rng.random() < 0.5:
        # mosaic blocks
        cell = int(rng.integers(16, 33))
        n = size // cell + 1
        blocks = rng.uniform(15, 95, (n, n, 3)).astype(np.float32)
        base = np.kron(blocks, np.ones((cell, cell, 1), np.float32))
        base = base[:size, :size]
    else:
        base = np.full((size, size, 3), rng.uniform(15, 70), np.float32)
    frames = np.empty((n_frames, size, size, 3), np.float32)
    for t in range(n_frames):
        noise = rng.normal(0.0, 4.0, (size, size, 1)).astype(np.float32)
        gain = 1.0
        if style == "aug":
            gain = float(rng.uniform(0.9, 1.1))  # per-frame flicker
        frames[t] = np.clip(base * gain + noise, 0, 255)
    return frames.astype(np.uint8)


def make_clip(
    rng: np.random.Generator,
    size: int = 112,
    n_frames: int = 16,
    style: str = "base",
) -> tuple[np.ndarray, dict]:
    """One animated clip: (uint8 [T, S, S, 3], labels).

    labels = {"direction": int, "kind": int, "event": int}.  The primary
    entity carries the segmenter's concept signature (shape + base
    color); distractors are concept-free gray shapes with their own
    motion, so the model must BIND motion to the concept entity rather
    than pool global flow.
    """
    clip = _background(rng, size, n_frames, style)

    dir_idx = int(rng.integers(0, len(DIRECTIONS)))
    _, (ux, uy) = DIRECTIONS[dir_idx]
    speed = 0.0 if dir_idx == 0 else float(rng.uniform(2.0, 4.5))
    r = int(rng.integers(9, 16))

    event_idx = int(rng.integers(0, len(EVENTS)))
    # event frame: keep ≥1/4 of the clip on each side so both the
    # before- and after-state are visible (and short test clips stay
    # valid)
    k_lo = max(1, n_frames // 4)
    k_hi = max(k_lo + 1, n_frames - n_frames // 4)
    k = int(rng.integers(k_lo, k_hi)) if event_idx else 0

    # start position such that the full trajectory stays in bounds
    dx, dy = ux * speed, uy * speed
    margin = r + 2
    lo_x = margin + max(0.0, -dx * (n_frames - 1))
    hi_x = size - margin - max(0.0, dx * (n_frames - 1))
    lo_y = margin + max(0.0, -dy * (n_frames - 1))
    hi_y = size - margin - max(0.0, dy * (n_frames - 1))
    if hi_x <= lo_x or hi_y <= lo_y:  # too fast for the canvas: slow down
        speed *= 0.6
        dx, dy = ux * speed, uy * speed
        lo_x = margin + max(0.0, -dx * (n_frames - 1))
        hi_x = size - margin - max(0.0, dx * (n_frames - 1))
        lo_y = margin + max(0.0, -dy * (n_frames - 1))
        hi_y = size - margin - max(0.0, dy * (n_frames - 1))
    x0 = float(rng.uniform(lo_x, max(lo_x + 1.0, hi_x)))
    y0 = float(rng.uniform(lo_y, max(lo_y + 1.0, hi_y)))

    kind_idx = int(rng.integers(0, len(CONCEPTS)))
    shape, color = CONCEPT_SPECS[CONCEPTS[kind_idx]]
    color = np.asarray(color, np.uint8)

    # concept-free moving distractors (mid-gray: outside every concept's
    # color signature)
    distractors = []
    for _ in range(int(rng.integers(0, 3))):
        g = rng.uniform(90, 150, 3)
        d_dir = DIRECTIONS[int(rng.integers(1, len(DIRECTIONS)))][1]
        d_speed = float(rng.uniform(1.0, 3.0))
        distractors.append((
            str(rng.choice(["square", "triangle", "ellipse", "diamond"])),
            np.clip(g, 0, 255).astype(np.uint8),
            float(rng.uniform(margin, size - margin)),
            float(rng.uniform(margin, size - margin)),
            int(rng.integers(7, 13)),
            d_dir[0] * d_speed, d_dir[1] * d_speed,
        ))

    scratch = np.zeros((size, size), bool)
    for t in range(n_frames):
        frame = clip[t]
        for d_shape, d_col, d_x0, d_y0, d_r, ddx, ddy in distractors:
            cx = int(np.clip(d_x0 + ddx * t, d_r, size - d_r - 1))
            cy = int(np.clip(d_y0 + ddy * t, d_r, size - d_r - 1))
            scratch[:] = False
            _draw_styled(d_shape, frame, scratch, cx, cy, d_r,
                         d_col, rng, style)
        visible = (event_idx == 0 or
                   (event_idx == 1 and t >= k) or
                   (event_idx == 2 and t < k))
        if visible:
            scratch[:] = False
            _draw_styled(shape, frame, scratch,
                         int(round(x0 + dx * t)), int(round(y0 + dy * t)),
                         r, color, rng, style)
        if style == "holdout":  # wide gamma warp, never trained
            gamma = 0.6 + 0.8 * ((t * 37) % 7) / 6.0
            frame[:] = (np.clip(frame.astype(np.float32) / 255.0, 0, 1)
                        ** gamma * 255).astype(np.uint8)
    labels = {"direction": dir_idx, "kind": kind_idx, "event": event_idx}
    return clip, labels


def make_batch(rng: np.random.Generator, n: int, size: int, n_frames: int,
               styles: tuple[str, ...]) -> tuple[np.ndarray, np.ndarray,
                                                 np.ndarray, np.ndarray]:
    clips, dirs, kinds, events = [], [], [], []
    for _ in range(n):
        style = styles[int(rng.integers(0, len(styles)))]
        clip, lab = make_clip(rng, size, n_frames, style)
        clips.append(clip)
        dirs.append(lab["direction"])
        kinds.append(lab["kind"])
        events.append(lab["event"])
    return (np.stack(clips), np.asarray(dirs, np.int32),
            np.asarray(kinds, np.int32), np.asarray(events, np.int32))


# --------------------------------------------------------------------------
# Model: the real VideoMAE tower at mini scale + task heads
# --------------------------------------------------------------------------

def mini_videomae_config(**kw):
    from gvl_tpu.models.videomae import VideoMAEConfig

    defaults = dict(hidden_size=256, intermediate_size=1024, num_layers=6,
                    num_heads=4, image_size=112, patch_size=16,
                    num_frames=16, tubelet_size=2)
    defaults.update(kw)
    return VideoMAEConfig(**defaults)


def build_classifier(model_cfg):
    import flax.linen as nn

    from gvl_tpu.models.videomae import VideoMAEEncoder

    class ClipClassifier(nn.Module):
        """Encoder + linear task heads on the mean-pooled clip token."""

        def setup(self):
            self.encoder = VideoMAEEncoder(model_cfg)
            self.dir_head = nn.Dense(len(DIRECTIONS))
            self.kind_head = nn.Dense(len(CONCEPTS))
            self.event_head = nn.Dense(len(EVENTS))

        def __call__(self, video):
            emb = self.encoder(video)["clip_embedding"]
            return (emb, self.dir_head(emb), self.kind_head(emb),
                    self.event_head(emb))

    return ClipClassifier()


@dataclass
class ClipTrainConfig:
    steps: int = 4000
    batch_size: int = 16
    learning_rate: float = 3e-4
    weight_decay: float = 1e-4
    seed: int = 0
    log_every: int = 200
    # device-resident uint8 batch pool (host→device uploads bound remote
    # chips; ~1.2 GB at the defaults)
    pool_batches: int = 128
    styles: tuple[str, ...] = ("base", "aug")
    model: object = field(default_factory=mini_videomae_config)


def _normalize(pixels_u8, jnp):
    x = pixels_u8.astype(jnp.float32) / 255.0
    return (x - jnp.asarray(_MEAN)) / jnp.asarray(_STD)


def train_clip_encoder(cfg: Optional[ClipTrainConfig] = None,
                       init_params: Optional[dict] = None) -> dict:
    """Returns trained classifier params (encoder under ``encoder``)."""
    import jax
    import jax.numpy as jnp
    import optax

    cfg = cfg or ClipTrainConfig()
    model_cfg = cfg.model
    model = build_classifier(model_cfg)
    rng = np.random.default_rng(cfg.seed)

    dummy = jnp.zeros((1, model_cfg.num_frames, model_cfg.image_size,
                       model_cfg.image_size, 3))
    params = init_params or model.init(
        jax.random.PRNGKey(cfg.seed), dummy)["params"]
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree.leaves(params))
    logger.info("clip classifier params: %.2fM", n_params / 1e6)

    tx = optax.adamw(optax.cosine_decay_schedule(
        cfg.learning_rate, cfg.steps), weight_decay=cfg.weight_decay)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, clips_u8, dirs, kinds, events):
        def loss_fn(p):
            x = _normalize(clips_u8, jnp).astype(jnp.bfloat16)
            _, d_log, k_log, e_log = model.apply({"params": p}, x)
            ce = optax.softmax_cross_entropy_with_integer_labels
            return (ce(d_log.astype(jnp.float32), dirs).mean()
                    + ce(k_log.astype(jnp.float32), kinds).mean()
                    + ce(e_log.astype(jnp.float32), events).mean())

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    n_unique = min(cfg.steps, cfg.pool_batches)
    pool = []
    for _ in range(n_unique):
        b = make_batch(rng, cfg.batch_size, model_cfg.image_size,
                       model_cfg.num_frames, cfg.styles)
        pool.append(tuple(jax.device_put(a) for a in b))

    for i in range(cfg.steps):
        clips, dirs, kinds, events = pool[i % n_unique]
        params, opt_state, loss = step(params, opt_state, clips, dirs,
                                       kinds, events)
        if cfg.log_every and (i % cfg.log_every == 0 or i == cfg.steps - 1):
            logger.info("clip step %d loss %.4f", i, float(loss))
    return jax.device_get(params)


# --------------------------------------------------------------------------
# Evaluation (held-out styles + frame-shuffled temporal control)
# --------------------------------------------------------------------------

def evaluate_clip_encoder(
    params: dict,
    model_cfg=None,
    n_clips: int = 160,
    seed: int = 1234,
    style: str = "base",
    shuffle_frames: bool = False,
) -> dict:
    """Per-factor accuracy; ``shuffle_frames=True`` is the temporal
    control (direction accuracy restricted to moving clips should
    collapse toward chance ≈ 1/8 if features are genuinely temporal)."""
    import jax
    import jax.numpy as jnp

    model_cfg = model_cfg or mini_videomae_config()
    model = build_classifier(model_cfg)
    rng = np.random.default_rng(seed)

    @jax.jit
    def run(params, clips_u8):
        x = _normalize(clips_u8, jnp).astype(jnp.bfloat16)
        _, d_log, k_log, e_log = model.apply({"params": params}, x)
        return (jnp.argmax(d_log, -1), jnp.argmax(k_log, -1),
                jnp.argmax(e_log, -1))

    batch = 16
    hits = {"direction": [], "kind": [], "event": []}
    moving_hits = []
    for start in range(0, n_clips, batch):
        n = min(batch, n_clips - start)
        clips, dirs, kinds, events = make_batch(
            rng, n, model_cfg.image_size, model_cfg.num_frames, (style,))
        if shuffle_frames:
            for ci in range(n):
                clips[ci] = clips[ci][rng.permutation(clips.shape[1])]
        d, k, e = (np.asarray(a) for a in run(params, jnp.asarray(clips)))
        hits["direction"] += list(d == dirs)
        hits["kind"] += list(k == kinds)
        hits["event"] += list(e == events)
        moving = dirs != 0
        moving_hits += list((d == dirs)[moving])
    out = {f"{name}_acc": float(np.mean(v)) for name, v in hits.items()}
    out["direction_acc_moving"] = float(np.mean(moving_hits))
    out["n"] = n_clips
    return out


# --------------------------------------------------------------------------
# Checkpoint I/O + the inference rung
# --------------------------------------------------------------------------

def save_clip_encoder(params: dict, out_dir, model_cfg=None,
                      metrics: Optional[dict] = None) -> None:
    import json
    from dataclasses import asdict
    from pathlib import Path

    from gvl_tpu.utils.checkpoints import save_flat_npz

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    save_flat_npz(params, out / "params.npz")
    model_cfg = model_cfg or mini_videomae_config()
    meta = {"model": asdict(model_cfg),
            "directions": list(DIRECTION_NAMES),
            "concepts": list(CONCEPTS),
            "events": list(EVENTS)}
    if metrics:
        meta["metrics"] = metrics
    (out / "videomae_config.json").write_text(json.dumps(meta, indent=2))


def load_clip_encoder(ckpt_dir):
    """→ (model_cfg, classifier_params)."""
    import json
    from pathlib import Path

    from gvl_tpu.models.videomae import VideoMAEConfig
    from gvl_tpu.utils.checkpoints import load_flat_npz

    ckpt = Path(ckpt_dir)
    raw = json.loads((ckpt / "videomae_config.json").read_text())
    cfg = VideoMAEConfig(**{
        k: v for k, v in raw["model"].items()
        if k in VideoMAEConfig.__dataclass_fields__})
    return cfg, load_flat_npz(ckpt / "params.npz")


def is_trained_clip_checkpoint(path) -> bool:
    from pathlib import Path

    return bool(path) and (Path(path) / "videomae_config.json").exists()


class TrainedClipEncoder:
    """Inference rung over the self-trained checkpoint.

    Same interface as the HF-rung/`HashClipEncoder`
    (``encode_clip``/``encode_clips``), plus ``classify_clips`` exposing
    the trained heads — the pipeline uses those to emit textual motion
    events ("player moving W") into the timeline, a capability the
    hash fake cannot provide.
    """

    def __init__(self, model_cfg, params: dict):
        import jax
        import jax.nn as jnn
        import jax.numpy as jnp

        self.config = model_cfg
        self.dim = model_cfg.hidden_size
        model = build_classifier(model_cfg)

        def run(params, pixels_u8):
            x = _normalize(pixels_u8, jnp).astype(jnp.bfloat16)
            emb, d_log, k_log, e_log = model.apply({"params": params}, x)
            return (emb.astype(jnp.float32),
                    jnn.softmax(d_log.astype(jnp.float32), -1),
                    jnn.softmax(k_log.astype(jnp.float32), -1),
                    jnn.softmax(e_log.astype(jnp.float32), -1))

        self._run = jax.jit(run)
        self._params = params

    def _prepare(self, clip: np.ndarray) -> np.ndarray:
        from gvl_tpu.runtime.native import resize_image

        cfg = self.config
        frames = [resize_image(np.ascontiguousarray(f),
                               cfg.image_size, cfg.image_size)
                  for f in clip]
        while len(frames) < cfg.num_frames:  # short tail: repeat last
            frames.append(frames[-1])
        return np.stack(frames[:cfg.num_frames])

    def encode_clips(self, clips) -> np.ndarray:
        if not len(clips):
            return np.zeros((0, self.dim), np.float32)
        batch = np.stack([self._prepare(c) for c in clips])
        emb, _, _, _ = self._run(self._params, batch)
        return np.asarray(emb)

    def encode_clip(self, clip: np.ndarray) -> np.ndarray:
        return self.encode_clips([clip])[0]

    def classify_clips(self, clips) -> list[dict]:
        """[{'direction': (name, p), 'kind': (name, p),
        'event': (name, p)}] per clip."""
        if not len(clips):
            return []
        batch = np.stack([self._prepare(c) for c in clips])
        _, d_p, k_p, e_p = self._run(self._params, batch)
        d_p, k_p, e_p = np.asarray(d_p), np.asarray(k_p), np.asarray(e_p)
        out = []
        for i in range(len(clips)):
            di, ki, ei = int(d_p[i].argmax()), int(k_p[i].argmax()), \
                int(e_p[i].argmax())
            out.append({
                "direction": (DIRECTION_NAMES[di], float(d_p[i][di])),
                "kind": (CONCEPTS[ki], float(k_p[i][ki])),
                "event": (EVENTS[ei], float(e_p[i][ei])),
            })
        return out

    @classmethod
    def from_dir(cls, ckpt_dir) -> "TrainedClipEncoder":
        cfg, params = load_clip_encoder(ckpt_dir)
        return cls(cfg, params)
