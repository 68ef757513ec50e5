#!/usr/bin/env python
"""Train the mini SigLIP vision+text contrastive model from scratch.

Fully offline: (region crop, caption) pairs are procedurally generated
(gvl_tpu.training.siglip_train), giving the perception stack a REAL
learned image-text embedding space — the offline rung of the ladder the
reference tops with downloaded SigLIP2-so400m weights
(`/root/reference/src/perception/siglip_semantic_encoder.py:178-244`).

The checkpoint wires into the standard preset ladder:
    PerceptionConfig(siglip_checkpoint="outputs/minisiglip")
auto-routes region encoding through the trained towers.

Usage:
    python scripts/train_siglip.py --out outputs/minisiglip
"""

from __future__ import annotations

import argparse
import json
import logging
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from gvl_tpu.utils.jax_setup import setup_jax

setup_jax()

from gvl_tpu.training.siglip_train import (  # noqa: E402
    SigLIPTrainConfig,
    evaluate_minisiglip,
    save_minisiglip,
    train_minisiglip,
)

logger = logging.getLogger("train_siglip")


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--out", default="outputs/minisiglip")
    parser.add_argument("--steps", type=int, default=4000)
    parser.add_argument("--batch-size", type=int, default=64)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--eval-crops", type=int, default=160)
    parser.add_argument("--composed-frac", type=float, default=0.0,
                        help="fraction of compositional noun×template "
                        "captions. Default 0 reproduces the SHIPPED "
                        "checkpoint; 0.5 was measured and REJECTED "
                        "(paraphrase det 0.24/0.28 vs 0.27/0.44 for the "
                        "fixed pools + prompt ensemble — see ROADMAP)")
    parser.add_argument("--text-pretrain-steps", type=int, default=0,
                        help="corpus-backed text-tower pretraining "
                        "(gvl_tpu.training.text_corpus) before VL "
                        "alignment — the zero-egress stand-in for the "
                        "reference's pretrained text encoder")
    parser.add_argument("--text-corpus-weight", type=float, default=0.0,
                        help="auxiliary word-context loss weight during "
                        "VL training (keeps the pretrained synonym "
                        "geometry from collapsing)")
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO,
                        format="%(levelname)s %(name)s: %(message)s")

    cfg = SigLIPTrainConfig(steps=args.steps, batch_size=args.batch_size,
                            learning_rate=args.lr, seed=args.seed,
                            composed_frac=args.composed_frac,
                            text_pretrain_steps=args.text_pretrain_steps,
                            text_corpus_weight=args.text_corpus_weight)
    t0 = time.time()
    variables = train_minisiglip(cfg)
    logger.info("trained in %.1f s", time.time() - t0)

    metrics = {}
    for style in ("base", "aug", "holdout"):
        m = evaluate_minisiglip(variables, cfg.vision, cfg.text,
                                n_crops=args.eval_crops, style=style,
                                canvas=cfg.canvas)
        metrics[style] = m
        logger.info("%s: zero-shot=%.3f entity=%.3f negative=%.3f "
                    "margin=%.3f", style, m["zero_shot_acc"],
                    m["entity_acc"], m["negative_acc"], m["margin"])

    save_minisiglip(variables, args.out, cfg.vision, cfg.text,
                    metrics=metrics)
    (Path(args.out) / "metrics.json").write_text(json.dumps({
        "zero_shot": metrics, "steps": args.steps,
        "seed": args.seed, "composed_frac": args.composed_frac,
        "text_pretrain_steps": args.text_pretrain_steps,
        "text_corpus_weight": args.text_corpus_weight},
        indent=2))
    logger.info("saved %s", args.out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
