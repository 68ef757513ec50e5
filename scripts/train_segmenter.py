#!/usr/bin/env python
"""Train the promptable segmenter on synthetic gameplay scenes → npz.

Fully offline (the OCR playbook applied to segmentation): procedurally
generated scenes with known ground-truth masks give the text prompts
real grounding on the synthetic-gameplay domain.  The reference instead
loads SAM3's downloaded pretrained weights
(`/root/reference/src/perception/sam_concept_segmenter.py:190-260`).

The shipped checkpoint is picked up automatically by the presets
(``PerceptionConfig.sam_checkpoint = outputs/sam_params.npz`` with
``sam_backend="auto"``).

Usage:
    python scripts/train_segmenter.py --out outputs/sam_params.npz \
        --steps 1500
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

from gvl_tpu.models.sam import SamConfig, save_segmenter_npz  # noqa: E402
from gvl_tpu.training.segmenter_train import (  # noqa: E402
    SegTrainConfig,
    evaluate_segmenter,
    train_segmenter,
)

logger = logging.getLogger("train_segmenter")


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--out", default="outputs/sam_params.npz")
    parser.add_argument("--steps", type=int, default=1500)
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--lr", type=float, default=3e-4)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--eval-scenes", type=int, default=32)
    parser.add_argument("--styles", nargs="*", default=["base", "aug"],
                        help="training style families ('holdout' is the "
                             "out-of-distribution eval family — do not "
                             "train on it)")
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO,
                        format="%(levelname)s %(name)s: %(message)s")
    if "holdout" in args.styles:
        parser.error("'holdout' is the held-out eval family")

    model_cfg = SamConfig()
    train_cfg = SegTrainConfig(
        image_size=model_cfg.image_size, steps=args.steps,
        batch_size=args.batch_size, learning_rate=args.lr, seed=args.seed,
        styles=tuple(args.styles))
    t0 = time.time()
    variables = train_segmenter(model_cfg, train_cfg)
    logger.info("trained in %.1f s", time.time() - t0)

    for style in ("base", "holdout"):
        metrics = evaluate_segmenter(variables, model_cfg,
                                     n_scenes=args.eval_scenes,
                                     style=style)
        logger.info("held-out synthetic eval (%s style): %s",
                    style, metrics)

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    save_segmenter_npz(variables, out)
    logger.info("saved %s (%.1f MB)", out, out.stat().st_size / 2**20)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
