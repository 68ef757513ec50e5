#!/usr/bin/env python
"""Serve the gameplay-video QA pipeline over HTTP.

(The reference ships this file EMPTY — `/root/reference/scripts/deploy_api.py`
is 0 bytes; see SURVEY.md §1.)
"""

from __future__ import annotations

import argparse
import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from gvl_tpu.utils.jax_setup import setup_jax

setup_jax()

from gvl_tpu.config import load_preset
from gvl_tpu.serving import create_server


def _attach_llm(service, checkpoint: str, num_slots: int,
                int8: bool = False, tp: int = 1, dp: int = 1) -> None:
    """Load an HF Qwen3 checkpoint and serve it through the shared
    continuous-batching engine (``POST /generate``).

    ``int8`` quantizes the loaded weights per-output-channel
    (weight-only) — decode HBM traffic halves and an 8B model fits one
    v5e chip; see ``gvl_tpu.models.qwen3.quantize_int8``."""
    from transformers import AutoTokenizer

    from gvl_tpu.models.qwen3 import load_hf_qwen3
    from gvl_tpu.serving import ContinuousBatchingEngine, EngineServer

    model, variables = load_hf_qwen3(checkpoint)
    if int8:
        import dataclasses

        from gvl_tpu.models.qwen3 import Qwen3Model, quantize_int8

        qparams = quantize_int8(variables["params"], model.config)
        model = Qwen3Model(dataclasses.replace(
            model.config, quant_int8=True, lora_rank=0))
        variables = {"params": qparams}
    mesh = None
    if tp > 1 or dp > 1:
        from gvl_tpu.parallel import build_mesh
        from gvl_tpu.parallel.sharding import LLM_RULES, shard_pytree

        # one mesh composes both: decode slots shard over `data`
        # (replica groups), weights over `model` (megatron TP specs) —
        # LLM_RULES leave the data axis out of weight specs, so weights
        # replicate across replicas automatically
        mesh = build_mesh(data=dp, model=tp)
        variables = {"params": shard_pytree(
            variables["params"], mesh, LLM_RULES)}
        logging.getLogger(__name__).info(
            "LLM dp×tp serving over %s", dict(mesh.shape))
    try:
        tokenizer = AutoTokenizer.from_pretrained(checkpoint)
    except Exception:  # weights-only checkpoint: serve prompt_ids
        logging.getLogger(__name__).warning(
            "no tokenizer at %s — /generate accepts prompt_ids only",
            checkpoint)
        tokenizer = None
    eos = (tokenizer.eos_token_id if tokenizer is not None else None)
    eos = eos if eos is not None else 151645
    engine = ContinuousBatchingEngine(
        model.config, variables, eos_token_id=eos, num_slots=num_slots,
        mesh=mesh)

    def session_factory():
        from gvl_tpu.models.session import Qwen3ChatSession

        return Qwen3ChatSession(model.config, variables, eos_token_id=eos)

    service.attach_engine(EngineServer(engine), tokenizer=tokenizer,
                          session_factory=session_factory)


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "--host", default="127.0.0.1",
        help="bind address (default loopback — the API is unauthenticated "
             "and /process reads local paths; put a reverse proxy with "
             "auth in front before binding 0.0.0.0)")
    parser.add_argument("--port", type=int, default=8080)
    parser.add_argument("--preset", default="light",
                        choices=["light", "standard", "full"])
    parser.add_argument("--llm-checkpoint", default=None,
                        help="Qwen3 checkpoint dir; enables POST /generate "
                             "backed by the continuous-batching engine")
    parser.add_argument("--num-slots", type=int, default=8,
                        help="concurrent decode slots for /generate")
    parser.add_argument("--int8", action="store_true",
                        help="weight-only int8 quantize the LLM after "
                             "load (halves decode HBM traffic; 8B fits "
                             "one v5e chip)")
    parser.add_argument("--tp", type=int, default=1,
                        help="tensor-parallel degree: shard the LLM over "
                             "this many devices (megatron partition specs "
                             "over the model mesh axis)")
    parser.add_argument("--dp", type=int, default=1,
                        help="data-parallel replicas: decode slots shard "
                             "over the mesh's data axis (dp×tp must "
                             "divide the attached device count; num-slots "
                             "must divide dp)")
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO,
                        format="%(levelname)s %(name)s: %(message)s")
    server = create_server(args.host, args.port, load_preset(args.preset))
    if args.llm_checkpoint:
        _attach_llm(server.service, args.llm_checkpoint, args.num_slots,
                    int8=args.int8, tp=args.tp, dp=args.dp)
    logging.getLogger(__name__).info(
        "serving on %s:%d", args.host, args.port)
    server.serve_forever()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
