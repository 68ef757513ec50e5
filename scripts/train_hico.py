#!/usr/bin/env python
"""Train the HiCo hierarchical compressor offline → npz artifact.

Self-supervised on procedural feature sequences (reconstruction +
in-batch contrastive); the saved checkpoint is auto-loaded by
TemporalCompressionModule.  The reference ships this compressor
UNTRAINED (`internvideo_hico_module.py:184-282` — raw nn.Parameter
init).

Usage:
    python scripts/train_hico.py --out outputs/hico_params.npz
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

from gvl_tpu.temporal.hico import HiCoConfig, save_hico_npz  # noqa: E402
from gvl_tpu.training.hico_train import (  # noqa: E402
    HicoTrainConfig,
    evaluate_hico,
    train_hico,
)

logger = logging.getLogger("train_hico")


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--out", default="outputs/hico_params.npz")
    parser.add_argument("--steps", type=int, default=800)
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--lr", type=float, default=2e-4)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO,
                        format="%(levelname)s %(name)s: %(message)s")

    model_cfg = HiCoConfig()
    train_cfg = HicoTrainConfig(
        steps=args.steps, batch_size=args.batch_size,
        learning_rate=args.lr, seed=args.seed)
    t0 = time.time()
    variables = train_hico(model_cfg, train_cfg)
    logger.info("trained in %.1f s", time.time() - t0)

    metrics = evaluate_hico(variables, model_cfg, train_cfg)
    logger.info("held-out eval: %s", metrics)

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    save_hico_npz(variables, out)
    logger.info("saved %s (%.1f MB)", out, out.stat().st_size / 2**20)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
