#!/usr/bin/env python
"""Train the mini Whisper ASR from scratch on procedural speech.

Fully offline: utterances are synthesized with a fixed char→formant
mapping under per-speaker nuisance variation (pitch, rate, vocal-tract
scale, noise, background game audio), so transcription — not
memorization — is the only way to reduce loss.  The reference's speech
rung downloads openai-whisper instead
(`/root/reference/scripts/realtime_inference.py:525-602`); this ~10M
model is the trained rung of that ladder and evaluates on a
never-trained speaker family (the segmenter out-of-style protocol).

The shipped checkpoint is picked up automatically by the presets
(``AudioConfig.asr_checkpoint = outputs/asr``) whenever no real HF
Whisper directory resolves above it.

Usage:
    python scripts/train_asr.py --out outputs/asr
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

from gvl_tpu.training.asr_train import (  # noqa: E402
    ASRTrainConfig,
    evaluate_asr,
    load_asr,
    save_asr,
    train_asr,
)

logger = logging.getLogger("train_asr")


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--out", default="outputs/asr")
    parser.add_argument("--steps", type=int, default=9000)
    parser.add_argument("--batch-size", type=int, default=24)
    parser.add_argument("--lr", type=float, default=3e-4)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--eval-samples", type=int, default=64)
    parser.add_argument("--init-from", default=None, metavar="CKPT_DIR",
                        help="warm-start from an existing asr checkpoint")
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO,
                        format="%(levelname)s %(name)s: %(message)s")

    cfg = ASRTrainConfig(steps=args.steps, batch_size=args.batch_size,
                         learning_rate=args.lr, seed=args.seed)
    init_params = None
    if args.init_from:
        prev_cfg, init_params = load_asr(args.init_from)
        cfg.model = prev_cfg
        logger.info("warm-starting from %s", args.init_from)

    t0 = time.time()
    params = train_asr(cfg, init_params=init_params)
    logger.info("trained in %.1f s", time.time() - t0)

    metrics = {}
    for profile in ("base", "holdout"):
        m = evaluate_asr(params, cfg.model, n_utterances=args.eval_samples,
                         profile=profile)
        metrics[profile] = m
        logger.info("%s speakers: exact=%.3f cer=%.3f wer=%.3f (n=%d)",
                    profile, m["exact_match"], m["cer"], m["wer"], m["n"])

    save_asr(params, args.out, config=cfg.model, metrics=metrics)
    logger.info("saved %s", args.out)

    # disk-verification pass in the same process (the save→load
    # roundtrip itself; the QA-LM regression taught us to re-measure
    # every artifact from disk before shipping)
    disk_cfg, disk_params = load_asr(args.out)
    disk = evaluate_asr(disk_params, disk_cfg,
                        n_utterances=args.eval_samples, profile="base")
    logger.info("disk re-eval (base): exact=%.3f cer=%.3f",
                disk["exact_match"], disk["cer"])
    metrics["disk_reeval_base"] = disk
    meta_path = Path(args.out) / "asr_config.json"
    raw = json.loads(meta_path.read_text())
    raw["metrics"] = metrics
    meta_path.write_text(json.dumps(raw, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
