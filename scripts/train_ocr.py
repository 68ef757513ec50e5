#!/usr/bin/env python
"""Train the JAX OCR det+rec nets on synthetic HUD text and save an npz.

Fully offline: samples are PIL-rendered strings (health bars, damage
numbers, timers, currency).  The reference downloads PaddleOCR's
pretrained CNNs instead (``/root/reference/src/perception/
ocr_pipeline.py:241-297``); this trains an equivalent-role pair from
scratch.

The default configuration is the round-3 UNIFIED model: the v2
recognizer (wider convs + transformer context) on the combined
clean+multifont curriculum, and a detector trained against noisy
backgrounds and entity-shaped distractors — one checkpoint for both
regimes instead of round 2's two forks.

Usage:
    python scripts/train_ocr.py --out outputs/ocr_params.npz
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

from gvl_tpu.perception.ocr_model import (  # noqa: E402
    OCRModelConfig,
    save_ocr_params,
    train_detector,
    train_recognizer,
)

logger = logging.getLogger("train_ocr")


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--out", default="outputs/ocr_params.npz")
    parser.add_argument("--rec-steps", type=int, default=12000)
    parser.add_argument("--det-steps", type=int, default=2000)
    parser.add_argument("--batch-size", type=int, default=64)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--arch", default="v2", choices=["crnn", "v2"],
                        help="recognizer architecture (v2 = conv + "
                             "transformer context, the unified default)")
    parser.add_argument("--pool-size", type=int, default=30000,
                        help="pre-rendered crop pool (0 = render every "
                             "batch on the fly; PIL is the bottleneck)")
    parser.add_argument("--fonts", dest="fonts", action="store_true",
                        default=True,
                        help="combined clean+multifont curriculum "
                             "(default; the unified checkpoint)")
    parser.add_argument("--no-fonts", dest="fonts", action="store_false",
                        help="default PIL font only — the round-2 "
                             "clean-HUD configuration")
    parser.add_argument("--distractors", dest="distractors",
                        action="store_true", default=True,
                        help="detector curriculum: noisy backgrounds + "
                             "entity-shaped clutter (default)")
    parser.add_argument("--no-distractors", dest="distractors",
                        action="store_false")
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO,
                        format="%(levelname)s %(name)s: %(message)s")

    config = OCRModelConfig(rec_arch=args.arch)
    t0 = time.time()
    logger.info("training %s recognizer (%d steps, charset %d chars)",
                args.arch, args.rec_steps, len(config.charset))
    rec = train_recognizer(
        config, steps=args.rec_steps, batch_size=args.batch_size,
        learning_rate=args.lr, seed=args.seed, log_every=500,
        use_fonts=args.fonts, pool_size=args.pool_size)
    logger.info("training detector (%d steps, distractors=%s)",
                args.det_steps, args.distractors)
    det = train_detector(
        config, steps=args.det_steps, batch_size=8,
        learning_rate=args.lr, seed=args.seed + 1, log_every=250,
        distractors=args.distractors, use_fonts=args.fonts)
    from gvl_tpu.perception.ocr_model import evaluate_recognizer

    for fonts in (False, True):
        metrics = evaluate_recognizer(rec, config, use_fonts=fonts)
        logger.info("held-out exact match (%s): %s",
                    "multi-font" if fonts else "default font", metrics)
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    save_ocr_params({"detector": det, "recognizer": rec}, str(out))
    logger.info("saved %s (%.0fs total); use with "
                "OCRConfig(backend='jax', checkpoint=%r)",
                out, time.time() - t0, str(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
