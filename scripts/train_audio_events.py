#!/usr/bin/env python
"""Train the audio event classifier on procedural audio and save an npz.

Fully offline: windows are synthesized per class (speech-like harmonics,
chords, impact bursts, UI beeps, colored-noise ambience, silence) — the
OCR/segmenter playbook applied to sound.  The reference's model-driven
event path prompts a downloaded audio LLM instead
(`/root/reference/src/audio/qwen_audio_processor.py:474-548`).

The shipped checkpoint is picked up automatically by the presets
(``AudioConfig.event_checkpoint = outputs/audio_event_params.npz``).

Usage:
    python scripts/train_audio_events.py --out outputs/audio_event_params.npz
"""

from __future__ import annotations

import argparse
import logging
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from gvl_tpu.utils.jax_setup import setup_jax

setup_jax()

from gvl_tpu.audio.event_model import (  # noqa: E402
    EventModelConfig,
    evaluate_event_model,
    save_event_params,
    train_event_model,
)

logger = logging.getLogger("train_audio_events")


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--out", default="outputs/audio_event_params.npz")
    parser.add_argument("--steps", type=int, default=3000)
    parser.add_argument("--batch-size", type=int, default=64)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--pool-size", type=int, default=4096)
    parser.add_argument("--eval-samples", type=int, default=900)
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO,
                        format="%(levelname)s %(name)s: %(message)s")

    config = EventModelConfig()
    t0 = time.time()
    params = train_event_model(
        config, steps=args.steps, batch_size=args.batch_size,
        learning_rate=args.lr, seed=args.seed, pool_size=args.pool_size,
        log_every=200)
    logger.info("trained in %.1f s", time.time() - t0)

    metrics = evaluate_event_model(params, config,
                                   n_samples=args.eval_samples)
    logger.info("held-out synthetic eval: acc=%.3f per-class=%s",
                metrics["accuracy"], metrics["per_class_recall"])

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    save_event_params(params, out)
    logger.info("saved %s (%.1f MB)", out, out.stat().st_size / 2**20)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
