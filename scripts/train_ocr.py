#!/usr/bin/env python
"""Train the JAX OCR det+rec nets on synthetic HUD text and save an npz.

Fully offline: samples are PIL-rendered strings (health bars, damage
numbers, timers, currency).  The reference downloads PaddleOCR's
pretrained CNNs instead (``/root/reference/src/perception/
ocr_pipeline.py:241-297``); this trains an equivalent-role pair from
scratch in minutes.

Usage:
    python scripts/train_ocr.py --out outputs/ocr_params.npz \
        --rec-steps 2000 --det-steps 600
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
    parser.add_argument("--rec-steps", type=int, default=2000)
    parser.add_argument("--det-steps", type=int, default=600)
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--fonts", dest="fonts", action="store_true",
                        default=True,
                        help="train on the multi-font curriculum (default)")
    parser.add_argument("--no-fonts", dest="fonts", action="store_false",
                        help="train on the default PIL font only — this is "
                             "the configuration that produced the shipped "
                             "clean-HUD checkpoint outputs/ocr_params.npz")
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO,
                        format="%(levelname)s %(name)s: %(message)s")

    config = OCRModelConfig()
    t0 = time.time()
    logger.info("training recognizer (%d steps, charset %d chars)",
                args.rec_steps, len(config.charset))
    rec = train_recognizer(
        config, steps=args.rec_steps, batch_size=args.batch_size,
        learning_rate=args.lr, seed=args.seed, log_every=200,
        use_fonts=args.fonts)
    logger.info("training detector (%d steps)", args.det_steps)
    det = train_detector(
        config, steps=args.det_steps, batch_size=8,
        learning_rate=args.lr, seed=args.seed + 1, log_every=100)
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
