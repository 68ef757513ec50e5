#!/usr/bin/env python
"""LoRA SFT on chat-format Q&A data.

CLI parity with `/root/reference/scripts/finetune_lora.py` (r=32/α=64,
7 targets, lr 2e-5, grad-accum 8, ``--dry-run`` validates data+tokenization
only).
"""

from __future__ import annotations

import argparse
import json
import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from gvl_tpu.utils.jax_setup import setup_jax

setup_jax()

logger = logging.getLogger("finetune_lora")


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--data", default=None,
                        help="chat-format training JSON")
    parser.add_argument("--qa-lm", default=None, metavar="BASE_DIR",
                        help="LoRA-tune the self-trained byte QA LM "
                             "(scripts/train_qa_lm.py checkpoint) on the "
                             "held-out causal family; streams generated "
                             "samples instead of --data")
    parser.add_argument("--steps", type=int, default=1500,
                        help="--qa-lm mode: LoRA SFT steps")
    parser.add_argument("--eval-samples", type=int, default=60,
                        help="--qa-lm mode: held-out eval size per arm")
    parser.add_argument("--output-dir", default="outputs/lora_adapter")
    parser.add_argument("--llm-checkpoint", default=None,
                        help="HF Qwen3 checkpoint dir; a tiny random model "
                             "is used without it (pipeline validation)")
    parser.add_argument("--epochs", type=int, default=3)
    parser.add_argument("--lr", type=float, default=2e-5)
    parser.add_argument("--lora-rank", type=int, default=32)
    parser.add_argument("--lora-alpha", type=float, default=64.0)
    parser.add_argument("--max-seq-len", type=int, default=4096)
    parser.add_argument("--dry-run", action="store_true")
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO,
                        format="%(levelname)s %(name)s: %(message)s")

    if args.qa_lm:
        return _finetune_qa_lm(args)

    if not args.data:
        print("--data is required (or use --qa-lm)")
        return 1

    from gvl_tpu.training import (
        LoraTrainer, LoraTrainingConfig, load_chat_training_data,
    )

    data = load_chat_training_data(args.data)
    if not data:
        print("no valid training samples")
        return 1

    import jax

    from gvl_tpu.models.qwen3 import Qwen3Config, Qwen3Model

    if args.llm_checkpoint:
        from transformers import AutoTokenizer

        from gvl_tpu.models.qwen3 import convert_hf_qwen3, load_hf_qwen3

        base_model, variables = load_hf_qwen3(args.llm_checkpoint)
        cfg = Qwen3Config(
            **{**base_model.config.__dict__,
               "lora_rank": args.lora_rank, "lora_alpha": args.lora_alpha},
        )
        model = Qwen3Model(cfg)
        # graft base weights into a fresh lora-enabled tree
        seed = model.init(jax.random.PRNGKey(0),
                          jax.numpy.zeros((1, 8), jax.numpy.int32))["params"]

        def graft(dst, src):
            for key, value in src.items():
                if isinstance(value, dict):
                    graft(dst[key], value)
                else:
                    dst[key] = value

        import flax

        seed = flax.core.unfreeze(seed)
        graft(seed, variables["params"])
        params = seed
        tokenizer = AutoTokenizer.from_pretrained(args.llm_checkpoint)
        tokenize = tokenizer.encode
    else:
        cfg = Qwen3Config.tiny(lora_rank=args.lora_rank,
                               lora_alpha=args.lora_alpha,
                               max_cache_length=args.max_seq_len)
        model = Qwen3Model(cfg)
        params = model.init(jax.random.PRNGKey(0),
                            jax.numpy.zeros((1, 8), jax.numpy.int32))["params"]
        from gvl_tpu.models.sam import hash_tokenize

        tokenize = lambda text: hash_tokenize(text, cfg.vocab_size, 64).tolist()

    trainer = LoraTrainer(
        model, params, tokenize,
        LoraTrainingConfig(
            lora_rank=args.lora_rank, lora_alpha=args.lora_alpha,
            learning_rate=args.lr, epochs=args.epochs,
            max_seq_len=min(args.max_seq_len, 512 if not args.llm_checkpoint
                            else args.max_seq_len),
            output_dir=args.output_dir,
        ),
    )

    if args.dry_run:
        print(json.dumps(trainer.dry_run(data), indent=2))
        return 0

    result = trainer.train(data)
    print(f"done: {result['steps']} steps, final loss "
          f"{result['final_loss']:.4f} -> {args.output_dir}")
    return 0


def _finetune_qa_lm(args) -> int:
    """Capability-grade LoRA: adapter teaches the trained byte QA LM the
    held-out causal family; base→LoRA delta + base-family regression are
    measured through the real engine and stored in adapter_config.json."""
    import json
    import time
    from dataclasses import replace

    from gvl_tpu.models.qwen3 import merge_lora
    from gvl_tpu.training.qa_lm_train import (
        LoraQAConfig,
        evaluate_qa_lm,
        load_qa_lm,
        save_qa_lm_adapter,
        train_qa_lm_lora,
    )

    from gvl_tpu.models.qwen3 import Qwen3Engine
    from gvl_tpu.training.qa_lm_train import EOS_ID

    base_cfg, base_params = load_qa_lm(args.qa_lm)
    logger.info("eval base model (no adapter)...")
    base_engine = Qwen3Engine(base_cfg, {"params": base_params},
                              eos_token_id=EOS_ID)
    base_causal = evaluate_qa_lm(base_params, base_cfg,
                                 n_samples=args.eval_samples,
                                 families=("causal",), engine=base_engine)
    base_mix = evaluate_qa_lm(base_params, base_cfg,
                              n_samples=args.eval_samples,
                              engine=base_engine)
    logger.info("base: causal=%.3f mix=%.3f",
                base_causal["accuracy"], base_mix["accuracy"])

    lora_lr = args.lr if args.lr != 2e-5 else LoraQAConfig.learning_rate
    cfg = LoraQAConfig(steps=args.steps, learning_rate=lora_lr,
                       lora_rank=args.lora_rank, lora_alpha=args.lora_alpha)
    t0 = time.time()
    lora_cfg, lora_params = train_qa_lm_lora(args.qa_lm, cfg)
    logger.info("lora trained in %.1f s", time.time() - t0)

    merged = merge_lora(lora_params, lora_cfg)
    cfg0 = replace(lora_cfg, lora_rank=0)
    lora_engine = Qwen3Engine(cfg0, {"params": merged},
                              eos_token_id=EOS_ID)
    lora_causal = evaluate_qa_lm(merged, cfg0,
                                 n_samples=args.eval_samples,
                                 families=("causal",), engine=lora_engine)
    lora_mix = evaluate_qa_lm(merged, cfg0, n_samples=args.eval_samples,
                              engine=lora_engine)

    metrics = {
        "base_causal": base_causal, "base_mix": base_mix,
        "lora_causal": lora_causal, "lora_mix": lora_mix,
        "steps": cfg.steps, "lr": cfg.learning_rate,
    }
    save_qa_lm_adapter(lora_params, args.output_dir, lora_cfg,
                       base_dir=args.qa_lm, metrics=metrics)
    print(json.dumps({
        "causal_accuracy": {"base": base_causal["accuracy"],
                            "lora": lora_causal["accuracy"]},
        "base_family_accuracy": {"base": base_mix["accuracy"],
                                 "lora": lora_mix["accuracy"]},
        "adapter": args.output_dir,
    }, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
