#!/usr/bin/env python
"""Train the semantic-retrieval text embedder (MiniLM-class rung).

Fully offline: contrastive (query, timeline-event-description) pairs
with a synonym-rich paraphrase vocabulary
(gvl_tpu.training.retriever_train), so hybrid retrieval gets a REAL
trained semantic rung — paraphrase queries ("the hero", "the
soundtrack") retrieve events hashing can only match lexically.  The
reference uses all-MiniLM-L6-v2 here
(`/root/reference/src/agent_core/qwen_reasoning_core.py:1492-1528`).

Usage:
    python scripts/train_retriever.py --out outputs/retriever
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

from gvl_tpu.training.retriever_train import (  # noqa: E402
    RetrieverTrainConfig,
    TrainedTextEmbedder,
    evaluate_retriever,
    load_retriever,
    save_retriever,
    train_retriever,
)

logger = logging.getLogger("train_retriever")


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--out", default="outputs/retriever")
    parser.add_argument("--steps", type=int, default=3000)
    parser.add_argument("--batch-size", type=int, default=36)
    parser.add_argument("--lr", type=float, default=3e-4)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--eval-timelines", type=int, default=50)
    parser.add_argument("--init-from", default=None, metavar="CKPT_DIR")
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO,
                        format="%(levelname)s %(name)s: %(message)s")

    cfg = RetrieverTrainConfig(steps=args.steps,
                               batch_size=args.batch_size,
                               learning_rate=args.lr, seed=args.seed)
    init_params = None
    if args.init_from:
        prev_cfg, init_params = load_retriever(args.init_from)
        cfg.model = prev_cfg
        logger.info("warm-starting from %s", args.init_from)

    t0 = time.time()
    params = train_retriever(cfg, init_params=init_params)
    logger.info("trained in %.1f s", time.time() - t0)

    trained = TrainedTextEmbedder(cfg.model, params)
    metrics = {"trained": evaluate_retriever(
        trained, n_timelines=args.eval_timelines)}
    # the baseline this rung must beat on paraphrase (and match on
    # lexical): the n-gram hashing embedder
    from gvl_tpu.agent.retriever import HashingTextEmbedder

    metrics["hashing_baseline"] = evaluate_retriever(
        HashingTextEmbedder(256), n_timelines=args.eval_timelines)
    for name, m in metrics.items():
        logger.info("%s: paraphrase top1=%.3f top5=%.3f | lexical "
                    "top1=%.3f top5=%.3f", name, m["paraphrase_top1"],
                    m["paraphrase_top5"], m["lexical_top1"],
                    m["lexical_top5"])

    save_retriever(params, args.out, model_cfg=cfg.model, metrics=metrics)
    logger.info("saved %s", args.out)

    # disk re-eval before shipping
    disk = evaluate_retriever(TrainedTextEmbedder.from_dir(args.out),
                              n_timelines=args.eval_timelines)
    logger.info("disk re-eval: paraphrase top1=%.3f lexical top1=%.3f",
                disk["paraphrase_top1"], disk["lexical_top1"])
    metrics["disk_reeval"] = disk
    meta_path = Path(args.out) / "retriever_config.json"
    raw = json.loads(meta_path.read_text())
    raw["metrics"] = metrics
    meta_path.write_text(json.dumps(raw, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
