"""Round benchmark: prints ONE JSON line for the driver.

Headline metric: SigLIP2-so400m tower throughput (img/s, the upper bound
on perception) with ``vs_baseline`` against the BASELINE.json target of
300 perception fps/chip.  The same line carries the honest companions in
``extra``:

- ``perception_e2e_fps`` — frames/s through the REAL pipelined perception
  stack (JAX segmenter + tracking → region SigLIP encodes → JAX OCR →
  timeline/KB ingest) on a synthetic clip.  The tower number is the
  ceiling; this is the pipeline.
- ``decode_tok_s_8b`` — MEASURED single-stream decode at the full
  Qwen3-VL-8B text geometry (36 layers, d=4096, GQA 32/8), weight-only
  int8 (the bf16 model does not fit one v5e's 16 GB), S_max=4096 KV.
  Random weights; geometry and compute are real.
- ``decode_tok_s_8b_batch8`` — aggregate across 8 decode slots
  (S_max=1024 to fit the batched KV), the continuous-batching regime.
- ``ttft_ms_8b`` — 512-token prompt prefill + first sampled token at the
  same 8B-int8 geometry.

Timing methodology: the remote-TPU tunnel makes per-call host timing
unreliable (dispatch returns in ~20 us, a host readback costs a ~30 ms
round trip), so compute is chained K times inside one jitted lax.scan
with a carry-data dependence and per-call time is the slope between two
chain lengths.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

TARGET_FPS_PER_CHIP = 300.0  # BASELINE.md: >=300 fps/chip on v5e
TARGET_DECODE_TOK_S = 30.0   # BASELINE.md: >=30 tok/s 8B decode
BATCH = 8

ON_TPU = jax.default_backend() == "tpu"


def chain_seconds(apply_fn, params, x, reps: int, iters: int = 2) -> float:
    """Wall time of ``reps`` chained forwards inside one jit."""

    @jax.jit
    def runner(params, x):
        def body(carry, _):
            out = apply_fn(params, x + carry)
            return (out.mean() * 1e-6).astype(x.dtype), ()

        acc, _ = jax.lax.scan(body, jnp.zeros((), x.dtype), None, length=reps)
        return acc.astype(jnp.float32)

    float(runner(params, x))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        float(runner(params, x))
    return (time.perf_counter() - t0) / iters


# ------------------------------------------------------------------ tower

def bench_siglip_tower() -> tuple[float, float]:
    """(fused_img_s, bf16_img_s): the headline is the Pallas-fused W8A8
    tower (``NaFlexConfig.quant_fused``, pooled cosine vs bf16 ≥ 0.9998
    measured at so400m shapes) — enabled by default in every preset via
    ``PerceptionConfig.siglip_fused`` and routed through
    ``build_siglip_encoder`` for so400m/HF towers; the bf16 tower rides
    along as the unquantized companion."""
    from gvl_tpu.models.siglip import SigLIPVisionConfig, SigLIPVisionTower

    cfg = SigLIPVisionConfig.so400m()
    tower = SigLIPVisionTower(cfg)
    rng = jax.random.PRNGKey(0)
    dtype = jnp.bfloat16 if ON_TPU else jnp.float32

    params = jax.jit(tower.init)(rng, jnp.ones((1, 384, 384, 3), dtype))
    params = jax.tree.map(lambda a: a.astype(dtype), params)
    x = jax.random.normal(rng, (BATCH, 384, 384, 3), dtype)

    apply_fn = lambda p, xb: tower.apply(p, xb, pool=True)["pooled"]
    lo, hi = (4, 24) if ON_TPU else (1, 3)
    per_batch = (
        chain_seconds(apply_fn, params, x, hi)
        - chain_seconds(apply_fn, params, x, lo)
    ) / (hi - lo)
    bf16_fps = BATCH / per_batch
    if not ON_TPU:  # fused path == XLA reference off-TPU; skip the rerun
        return bf16_fps, bf16_fps

    from gvl_tpu.models.siglip_fused import (
        prepare_fused_siglip,
        siglip_fused_apply,
    )

    fused = prepare_fused_siglip(
        jax.tree.map(lambda a: a.astype(jnp.bfloat16), params["params"]),
        cfg, x[:4].astype(jnp.bfloat16))
    fused_fn = lambda f, xb: siglip_fused_apply(f, xb, cfg,
                                                pool=True)["pooled"]
    per_batch_f = (
        chain_seconds(fused_fn, fused, x, hi)
        - chain_seconds(fused_fn, fused, x, lo)
    ) / (hi - lo)
    return BATCH / per_batch_f, bf16_fps


# ------------------------------------------------- end-to-end perception

def bench_perception_e2e(n_frames: int = 48) -> tuple[float, dict]:
    """Frames/s through the end-to-end perception stack (batched chunks,
    segmentation pipelined one chunk ahead of host tracking).

    Returns (fps, backends): the second element SAYS which backend ran
    each stage — on CPU the encoders are deterministic fakes and the
    number is NOT comparable to the TPU figure (VERDICT r2 weak #8)."""
    from gvl_tpu.config import load_preset
    from gvl_tpu.fusion import KnowledgeBaseBuilder, TimelineIndexer
    from gvl_tpu.io.video import SyntheticVideo
    from gvl_tpu.perception import build_perception_stack, run_batched_perception

    config = load_preset("light")
    config.perception.use_sam = True   # measure the FULL visual stack
    if ON_TPU:
        config.perception.sam_backend = "jax"  # trained ckpt if present
        config.perception.siglip_backend = "jax"
        # pin the so400m geometry (metric continuity across rounds):
        # the preset default now auto-resolves the trained mini tower,
        # which is far cheaper and would change this metric's meaning
        config.perception.siglip_checkpoint = None
    else:  # CPU fallback must still emit a line quickly: fake encoders
        config.perception.sam_backend = "fake"
        config.perception.siglip_backend = "fake"
        n_frames = min(n_frames, 16)
    config.perception.sam3_fps = config.inference.fps  # segment every frame

    video = SyntheticVideo("bench_clip", duration=n_frames / 2.0, fps=2.0,
                           width=640, height=480)
    frames = [(i / 2.0, video.frame(i)) for i in range(n_frames)]

    # offline-throughput regime: the whole clip is one chunk (dispatch +
    # readback amortized; chunk=8 costs ~15% on the tunnel-attached v5e)
    chunk = n_frames
    stack = build_perception_stack(config)
    # warm on the SAME clip so every region/recognizer bucket the timed
    # pass hits is compiled (steady-state throughput, not cold start)
    run_batched_perception(frames, config, TimelineIndexer(),
                           KnowledgeBaseBuilder(), chunk=chunk,
                           segmenter=stack[0], encoder=stack[1],
                           ocr=stack[2])
    best = 0.0
    for _ in range(3):
        stack[0].reset()
        timeline, kb = TimelineIndexer(), KnowledgeBaseBuilder()
        t0 = time.perf_counter()
        run_batched_perception(frames, config, timeline, kb, chunk=chunk,
                               segmenter=stack[0], encoder=stack[1],
                               ocr=stack[2])
        best = max(best, n_frames / (time.perf_counter() - t0))
    backends = {
        "segmenter": type(getattr(stack[0], "backend", None)).__name__,
        "siglip": type(getattr(stack[1], "backend", None)).__name__,
        "ocr": type(getattr(stack[2], "engine", None)).__name__,
        "chunk": chunk,
        "region_resolution": stack[1].config.region_resolution,
        "clip": f"{n_frames}f 640x480 synthetic, 4 concepts, "
                f"segment every frame",
    }
    return best, backends


def bench_perception_dp_split(n_frames: int = 48) -> dict:
    """Measured terms of the multi-chip perception projection
    (VERDICT r4 #8): split one e2e perception pass into device time
    (segmentation/encode/OCR programs — embarrassingly parallel over a
    ``data`` mesh axis, zero cross-chip collectives) and host time
    (tracking/NMS/timeline/KB ingest — the serial term).  The N-chip
    fleet rate is then the measured Amdahl bound
    ``n_frames / (t_host + t_device / N)``, with DP correctness proven
    separately (dryrun_multichip shards frames over an 8-device virtual
    mesh and the sharded segmenter matches single-device bitwise).

    Method: run the identical pass twice — once normally, once with the
    device work async-dispatched but never synchronized until one final
    block — so (total − dispatch-side) isolates the host share without
    instrumenting every stage.  Simpler and robust on the tunnel: time
    a DEVICE-ONLY replay (same programs, host consumption skipped) and
    subtract."""
    from gvl_tpu.config import load_preset
    from gvl_tpu.fusion import KnowledgeBaseBuilder, TimelineIndexer
    from gvl_tpu.io.video import SyntheticVideo
    from gvl_tpu.perception import build_perception_stack, run_batched_perception

    config = load_preset("light")
    config.perception.use_sam = True
    config.perception.sam_backend = "jax"
    config.perception.siglip_backend = "jax"
    config.perception.siglip_checkpoint = None
    config.perception.sam3_fps = config.inference.fps

    video = SyntheticVideo("bench_clip", duration=n_frames / 2.0, fps=2.0,
                           width=640, height=480)
    frames = [(i / 2.0, video.frame(i)) for i in range(n_frames)]
    stack = build_perception_stack(config)
    run_batched_perception(frames, config, TimelineIndexer(),
                           KnowledgeBaseBuilder(), chunk=n_frames,
                           segmenter=stack[0], encoder=stack[1],
                           ocr=stack[2])

    def timed_pass():
        stack[0].reset()
        t0 = time.perf_counter()
        run_batched_perception(frames, config, TimelineIndexer(),
                               KnowledgeBaseBuilder(), chunk=n_frames,
                               segmenter=stack[0], encoder=stack[1],
                               ocr=stack[2])
        return time.perf_counter() - t0

    total = min(timed_pass() for _ in range(3))

    # device-only: the segmentation program IS the dominant device cost;
    # time it alone via the backend's raw batch call
    backend = getattr(stack[0], "backend", None)
    images = [f for _, f in frames]
    concepts = ["player", "enemy", "boss", "item"]
    if backend is None or not hasattr(backend, "__call__"):
        return {}
    backend(images[:4], concepts, [0, 1, 2, 3])  # warm
    t0 = time.perf_counter()
    backend(images, concepts, list(range(n_frames)))
    t_seg = time.perf_counter() - t0
    t_host = max(total - t_seg, 1e-6)
    fleet8 = n_frames / (t_host + t_seg / 8.0)
    return {
        "perception_device_s_per_clip": round(t_seg, 3),
        "perception_host_s_per_clip": round(t_host, 3),
        "perception_fleet_fps_8chip_amdahl": round(fleet8, 1),
    }


# ------------------------------------------------------------ 8B decode

def _build_8b_int8(max_cache_length: int):
    from gvl_tpu.models.qwen3 import Qwen3Config, Qwen3Model

    cfg = Qwen3Config(quant_int8=True, scan_layers=True,
                      max_cache_length=max_cache_length)
    model = Qwen3Model(cfg)
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32)))

    def fill(s):
        if s.dtype == jnp.int8:
            return jnp.ones(s.shape, jnp.int8)
        if s.dtype == jnp.float32 and len(s.shape) >= 2:
            return jnp.full(s.shape, 1e-3, jnp.bfloat16)
        return jnp.full(s.shape, 0.01, s.dtype)

    variables = jax.tree.map(fill, shapes)
    jax.block_until_ready(variables)
    return cfg, model, variables


def _decode_per_step(model, cfg, variables, batch, reps_pair=(4, 16)):
    from gvl_tpu.models.qwen3 import KVCache, sample_logits

    cache = KVCache.zeros(cfg, batch=batch, dtype=jnp.bfloat16)
    token = jnp.zeros((batch,), jnp.int32)
    rng = jax.random.PRNGKey(0)
    out_t = {}
    for reps in reps_pair:
        @jax.jit
        def run(variables, token, cache, rng, reps=reps):
            def body(carry, _):
                token, cache, rng = carry
                positions = (cache.length[None] if cache.length.ndim == 0
                             else cache.length[:, None])
                logits, cache = model.apply(
                    variables, token[:, None], positions=positions,
                    cache=cache)
                rng, sub = jax.random.split(rng)
                nxt = sample_logits(logits[:, -1], sub, 0.0, 1.0, 1)
                return (nxt, cache, rng), ()

            (token, cache, rng), _ = jax.lax.scan(
                body, (token, cache, rng), None, length=reps)
            return token

        float(run(variables, token, cache, rng)[0])  # compile
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(variables, token, cache, rng)[0])
            ts.append(time.perf_counter() - t0)
        out_t[reps] = min(ts)
    lo, hi = reps_pair
    return (out_t[hi] - out_t[lo]) / (hi - lo)


def bench_decode_8b() -> dict:
    from gvl_tpu.models.qwen3 import KVCache, sample_logits

    out = {}
    cfg, model, variables = _build_8b_int8(4096)
    per_tok = _decode_per_step(model, cfg, variables, batch=1)
    out["decode_tok_s_8b"] = round(1.0 / per_tok, 1)

    # TTFT: 512-token prefill + first sampled token, host-observed
    tokens = jnp.zeros((1, 512), jnp.int32)
    cache = KVCache.zeros(cfg, batch=1, dtype=jnp.bfloat16)

    @jax.jit
    def prefill(variables, tokens, cache, rng):
        positions = jnp.arange(tokens.shape[1], dtype=jnp.int32)
        logits, cache = model.apply(
            variables, tokens, positions=positions, cache=cache)
        return sample_logits(logits[:, -1], rng, 0.0, 1.0, 1)

    rng = jax.random.PRNGKey(0)
    float(prefill(variables, tokens, cache, rng)[0])
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(prefill(variables, tokens, cache, rng)[0])
        ts.append(time.perf_counter() - t0)
    out["ttft_ms_8b"] = round(sorted(ts)[len(ts) // 2] * 1e3, 1)

    del variables
    cfg8, model8, variables8 = _build_8b_int8(1024)
    per_step = _decode_per_step(model8, cfg8, variables8, batch=8)
    out["decode_tok_s_8b_batch8"] = round(8.0 / per_step, 1)

    # TTFT p50 through the serving stack (EngineServer + continuous
    # batching): submit → first streamed token, host-observed
    from gvl_tpu.serving.batch_engine import ContinuousBatchingEngine
    from gvl_tpu.serving.engine_server import EngineServer

    engine = ContinuousBatchingEngine(
        cfg8, {"params": variables8["params"]}, eos_token_id=-1,
        num_slots=2, temperature=0.0)
    server = EngineServer(engine)
    prompt = list(range(500))
    ts = []
    for i in range(5):
        t0 = time.perf_counter()
        stream = server.submit_stream(prompt[:-1] + [i], max_new_tokens=2)
        next(iter(stream))
        ts.append(time.perf_counter() - t0)
    server.shutdown()
    # first request pays compilation; p50 of the rest
    out["ttft_ms_8b_served_p50"] = round(
        sorted(ts[1:])[len(ts[1:]) // 2] * 1e3, 1)
    return out


def bench_qa_lm(n_samples: int = 32,
                seeds: tuple = (77, 1234, 2026)) -> dict:
    """Held-out grounded-QA accuracy of the shipped self-trained byte LM
    (outputs/qa_lm) through REAL greedy engine decode — the
    trained-weights capability rung of the reasoning ladder.  Mean over
    ≥3 seeds at n≥32 each (VERDICT r3 #10 / r4 weak #8); the
    pipeline-rendered serving distribution rides along."""
    from pathlib import Path

    if not Path("outputs/qa_lm/qa_lm_config.json").exists():
        return {}
    from gvl_tpu.models.qwen3 import Qwen3Engine
    from gvl_tpu.training.qa_lm_train import (
        EOS_ID,
        evaluate_qa_lm,
        load_qa_lm,
    )

    cfg, params = load_qa_lm("outputs/qa_lm")
    engine = Qwen3Engine(cfg, {"params": params}, eos_token_id=EOS_ID)
    max_len = min(cfg.max_cache_length, 4096)
    accs = [evaluate_qa_lm(params, cfg, n_samples=n_samples, seed=s,
                           engine=engine, max_len=max_len)["accuracy"]
            for s in seeds]
    pipe = [evaluate_qa_lm(params, cfg, n_samples=n_samples, seed=s,
                           engine=engine, pipeline=True,
                           max_len=max_len)["accuracy"]
            for s in seeds[:2]]
    return {"qa_lm_heldout_acc": round(float(np.mean(accs)), 3),
            "qa_lm_heldout_acc_by_seed": [round(a, 3) for a in accs],
            "qa_lm_pipeline_acc": round(float(np.mean(pipe)), 3),
            "qa_lm_heldout_n": n_samples * len(seeds)}


def bench_asr(n_utterances: int = 32) -> dict:
    """Exact-match / CER of the shipped self-trained byte ASR
    (outputs/asr) on never-trained holdout-profile speakers."""
    from pathlib import Path

    if not Path("outputs/asr/asr_config.json").exists():
        return {}
    from gvl_tpu.training.asr_train import evaluate_asr, load_asr

    cfg, params = load_asr("outputs/asr")
    m = evaluate_asr(params, cfg, n_utterances=n_utterances,
                     profile="holdout")
    return {"asr_holdout_exact": round(m["exact_match"], 3),
            "asr_holdout_cer": round(m["cer"], 3)}


def bench_open_vocab(n_scenes: int = 8) -> dict:
    """Grounded open-vocab segmentation capability of the fully offline
    composite (trained segmenter proposals × trained mini-SigLIP
    naming) — canonical prompts, base-style scenes."""
    from pathlib import Path

    if not (Path("outputs/minisiglip/minisiglip_config.json").exists()
            and Path("outputs/sam_params.npz").exists()):
        return {}
    from gvl_tpu.perception.open_vocab import OpenVocabSamBackend
    from gvl_tpu.training.siglip_train import evaluate_open_vocab

    # the SHIPPED serving path: prompts resolve through the trained
    # retrieval lexicon before vision scoring (open_vocab.
    # LexiconPromptResolver — VERDICT r3 #7); the raw-tower numbers ride
    # along as the true zero-shot holdout of the byte text tower alone
    backend = OpenVocabSamBackend.from_trained_checkpoints(
        "outputs/sam_params.npz", "outputs/minisiglip")
    raw = OpenVocabSamBackend.from_trained_checkpoints(
        "outputs/sam_params.npz", "outputs/minisiglip", retriever_dir=None)
    m = evaluate_open_vocab(backend, n_scenes=n_scenes, style="base")
    from gvl_tpu.training.siglip_train import UNSEEN_PROMPTS

    p = evaluate_open_vocab(backend, n_scenes=n_scenes, style="base",
                            prompts=UNSEEN_PROMPTS)
    praw = evaluate_open_vocab(raw, n_scenes=n_scenes, style="base",
                               prompts=UNSEEN_PROMPTS)
    return {"open_vocab_det_correct": round(m["det_correct"], 3),
            "open_vocab_label_acc": round(m["label_acc"], 3),
            "open_vocab_paraphrase_det": round(p["det_correct"], 3),
            "open_vocab_paraphrase_label_acc": round(p["label_acc"], 3),
            "open_vocab_paraphrase_det_raw_tower":
                round(praw["det_correct"], 3),
            "open_vocab_paraphrase_label_raw_tower":
                round(praw["label_acc"], 3)}


def bench_retriever(n_timelines: int = 24) -> dict:
    """Paraphrase vs lexical retrieval top-1 of the shipped self-trained
    embedder (outputs/retriever) next to the hashing baseline on the
    SAME held-out timelines."""
    from pathlib import Path

    if not Path("outputs/retriever/retriever_config.json").exists():
        return {}
    from gvl_tpu.agent.retriever import HashingTextEmbedder
    from gvl_tpu.training.retriever_train import (
        TrainedTextEmbedder,
        evaluate_retriever,
    )

    m = evaluate_retriever(TrainedTextEmbedder.from_dir(
        "outputs/retriever"), n_timelines=n_timelines)
    h = evaluate_retriever(HashingTextEmbedder(256),
                           n_timelines=n_timelines)
    return {"retriever_paraphrase_top1": round(m["paraphrase_top1"], 3),
            "retriever_lexical_top1": round(m["lexical_top1"], 3),
            "retriever_hashing_paraphrase_top1":
                round(h["paraphrase_top1"], 3)}


def bench_clip_encoder(n_clips: int = 48) -> dict:
    """Motion/kind/event accuracy of the shipped self-trained temporal
    clip encoder (outputs/videomae) on held-out clips + the
    frame-shuffled temporal control."""
    from pathlib import Path

    if not Path("outputs/videomae/videomae_config.json").exists():
        return {}
    from gvl_tpu.training.videomae_train import (
        evaluate_clip_encoder,
        load_clip_encoder,
    )

    cfg, params = load_clip_encoder("outputs/videomae")
    m = evaluate_clip_encoder(params, cfg, n_clips=n_clips, style="base")
    ctrl = evaluate_clip_encoder(params, cfg, n_clips=n_clips,
                                 style="base", shuffle_frames=True)
    return {"clip_direction_acc": round(m["direction_acc"], 3),
            "clip_kind_acc": round(m["kind_acc"], 3),
            "clip_event_acc": round(m["event_acc"], 3),
            "clip_shuffled_direction_acc":
                round(ctrl["direction_acc_moving"], 3)}


def main() -> None:
    from gvl_tpu.utils.jax_setup import setup_jax

    setup_jax()   # persistent TPU compile cache across driver runs
    tower_fps, bf16_fps = bench_siglip_tower()
    e2e_fps, e2e_backends = bench_perception_e2e()
    extra = {"siglip_bf16_img_s": round(bf16_fps, 1),
             "perception_e2e_fps": round(e2e_fps, 1),
             "perception_backends": e2e_backends}
    if ON_TPU:
        extra.update(bench_perception_dp_split())
        extra.update(bench_decode_8b())
        extra["decode_vs_target"] = round(
            extra["decode_tok_s_8b"] / TARGET_DECODE_TOK_S, 2)
        extra.update(bench_qa_lm())
        extra.update(bench_open_vocab())
        extra.update(bench_asr())
        extra.update(bench_retriever())
        extra.update(bench_clip_encoder())

    print(json.dumps({
        "metric": "siglip_so400m_images_per_sec_per_chip",
        "value": round(tower_fps, 1),
        "unit": f"img/s (384x384 fused W8A8 serving path, batch {BATCH}, "
                f"1 chip)",
        "vs_baseline": round(tower_fps / TARGET_FPS_PER_CHIP, 3),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
