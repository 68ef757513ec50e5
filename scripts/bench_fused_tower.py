#!/usr/bin/env python
"""Measure the Pallas-fused W8A8 SigLIP tower vs bf16 / XLA-int8.

Chain-timed per bench.py methodology.  Also spot-checks that the fused
output matches the static-act XLA tower (cosine of pooled embeddings)
on-device, so the speedup is not bought with wrong numerics.
"""

from __future__ import annotations

import sys
import time
from dataclasses import replace
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from gvl_tpu.utils.jax_setup import setup_jax

setup_jax()  # persistent compile cache: tunnel compiles cost minutes

import jax
import jax.numpy as jnp
import numpy as np

BATCH = 8


def chain_time(apply_fn, args, reps_pair=(4, 20), iters: int = 3) -> float:
    out = {}
    for reps in reps_pair:
        @jax.jit
        def runner(*args, reps=reps):
            def body(carry, _):
                # cast the carry to the operand dtype: f32 + bf16
                # promotes to f32 and would silently benchmark an
                # f32 tower (half MXU rate)
                y = apply_fn(*args[:-1],
                             args[-1] + carry.astype(args[-1].dtype))
                return (y.mean() * 1e-6).astype(jnp.float32), ()

            acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                                  length=reps)
            return acc

        float(runner(*args))
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            float(runner(*args))
            ts.append(time.perf_counter() - t0)
        out[reps] = min(ts)
    lo, hi = reps_pair
    return (out[hi] - out[lo]) / (hi - lo)


def main() -> None:
    from gvl_tpu.models.siglip import (
        SigLIPVisionConfig,
        SigLIPVisionTower,
        calibrate_siglip_int8,
        quantize_siglip_int8,
    )
    from gvl_tpu.models.siglip_fused import (
        fuse_siglip_int8,
        siglip_fused_apply,
    )

    print("backend:", jax.default_backend())
    cfg = SigLIPVisionConfig.so400m()
    tower = SigLIPVisionTower(cfg)
    key = jax.random.PRNGKey(0)
    params = jax.jit(tower.init)(key, jnp.ones((1, 384, 384, 3),
                                               jnp.bfloat16))
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    pix = jax.random.normal(key, (BATCH, 384, 384, 3), jnp.bfloat16) * 0.5

    # bf16 baseline
    f_bf = lambda p, x: tower.apply(p, x, pool=True)["pooled"]
    if "--skip-bf16" not in sys.argv:
        t = chain_time(f_bf, (params, pix))
        print(f"tower bf16:        {t * 1e3:7.2f} ms  "
              f"{BATCH / t:6.1f} img/s")

    # fused
    qparams = quantize_siglip_int8(params["params"])
    sparams = calibrate_siglip_int8(cfg, qparams, pix)
    fused = fuse_siglip_int8(sparams, cfg)

    f_fused = lambda f, x: siglip_fused_apply(f, x, cfg, pool=True)["pooled"]
    t = chain_time(f_fused, (fused, pix))
    print(f"tower fused int8:  {t * 1e3:7.2f} ms  {BATCH / t:6.1f} img/s")

    if "--packed" in sys.argv:
        packed = fuse_siglip_int8(sparams, cfg, packed_attention=True)
        tp = chain_time(f_fused, (packed, pix))
        print(f"tower packed int8: {tp * 1e3:7.2f} ms  "
              f"{BATCH / tp:6.1f} img/s")
        import numpy as _np

        a = _np.asarray(jax.jit(f_fused)(fused, pix), _np.float32)
        bq = _np.asarray(jax.jit(f_fused)(packed, pix), _np.float32)
        cosp = (a * bq).sum(-1) / (_np.linalg.norm(a, axis=-1)
                                   * _np.linalg.norm(bq, axis=-1) + 1e-9)
        print(f"pooled cosine packed-vs-padded:    min {cosp.min():.5f}")
        if tp < t:
            fused, t = packed, tp

    if "--pieces" in sys.argv:
        _bench_pieces(fused, cfg)
    if "--blocks" in sys.argv:
        _sweep_tower_blocks(fused, cfg, pix)

    # numerics check vs the static XLA tower on-device
    static_tower = SigLIPVisionTower(replace(cfg, quant_int8=True,
                                             quant_static_act=True))
    want = jax.jit(lambda p, x: static_tower.apply(
        {"params": p}, x, pool=True)["pooled"])(sparams, pix)
    got = jax.jit(f_fused)(fused, pix)
    w = np.asarray(want, np.float32)
    g = np.asarray(got, np.float32)
    cos = (w * g).sum(-1) / (np.linalg.norm(w, axis=-1)
                             * np.linalg.norm(g, axis=-1) + 1e-9)
    print(f"pooled cosine fused-vs-static-XLA: min {cos.min():.5f} "
          f"mean {cos.mean():.5f}")

    if "--skip-bf16" not in sys.argv:
        bf = jax.jit(f_bf)(params, pix)
        b = np.asarray(bf, np.float32)
        cos_bf = (b * g).sum(-1) / (np.linalg.norm(b, axis=-1)
                                    * np.linalg.norm(g, axis=-1) + 1e-9)
        print(f"pooled cosine fused-vs-bf16:       min {cos_bf.min():.5f} "
              f"mean {cos_bf.mean():.5f}")


def _sweep_tower_blocks(fused: dict, cfg, pix) -> None:
    """Greedy per-op block search measured on the WHOLE tower (isolated
    op sweeps overstate ~2x via cross-iteration pipelining).  Candidate
    block_m values are drawn from the ACTUAL divisors of the padded row
    count (B·Sp = 2^8·23 at SEQ_PAD=32 has no 512/1024/3072 divisors —
    a fixed candidate list silently degrades through _pick_block)."""
    import gvl_tpu.models.siglip_fused as sf

    seq = (cfg.image_size // cfg.patch_size) ** 2
    m_rows = BATCH * ((seq + sf.SEQ_PAD - 1) // sf.SEQ_PAD * sf.SEQ_PAD)
    m_divs = sorted(d for d in range(32, m_rows + 1, 32)
                    if m_rows % d == 0)

    def m_near(target: int, k: int = 3) -> list[int]:
        return sorted(m_divs, key=lambda d: abs(d - target))[:k]

    candidates = {
        "qkv": [(m, n) for m in m_near(2944) for n in (256, 512)],
        "o": [(m, n) for m in m_near(1024) for n in (384, 1152)],
        "fc1": [(m, n) for m in m_near(512) for n in (512, 256)],
        "fc2": [(m, n) for m in m_near(512) for n in (1024, 512)],
    }
    attn_candidates = [1024, 368, 184]

    def tower_time() -> float:
        f = lambda fu, x: sf.siglip_fused_apply(fu, x, cfg,
                                                pool=True)["pooled"]
        return chain_time(f, (fused, pix), reps_pair=(4, 16), iters=3)

    base = tower_time()
    print(f"  start {dict(sf.BLOCKS)} attn_q={sf.ATTN_BLOCK_Q}: "
          f"{base * 1e3:.2f} ms")
    for op, cands in candidates.items():
        best_t, best_c = base, sf.BLOCKS[op]
        for cand in cands:
            if cand == sf.BLOCKS[op]:
                continue
            prev = sf.BLOCKS[op]
            sf.BLOCKS[op] = cand
            try:
                t = tower_time()
            except Exception as exc:
                print(f"  {op}={cand}: FAIL {type(exc).__name__}")
                sf.BLOCKS[op] = prev
                continue
            mark = " *" if t < best_t else ""
            print(f"  {op}={cand}: {t * 1e3:.2f} ms{mark}")
            if t < best_t:
                best_t, best_c = t, cand
            sf.BLOCKS[op] = prev
        sf.BLOCKS[op] = best_c
        base = best_t
    for bq in attn_candidates:
        if bq == sf.ATTN_BLOCK_Q:
            continue
        prev = sf.ATTN_BLOCK_Q
        sf.ATTN_BLOCK_Q = bq
        t = tower_time()
        mark = " *" if t < base else ""
        print(f"  attn_q={bq}: {t * 1e3:.2f} ms{mark}")
        if t < base:
            base = t
        else:
            sf.ATTN_BLOCK_Q = prev
    print(f"  best {dict(sf.BLOCKS)} attn_q={sf.ATTN_BLOCK_Q}: "
          f"{base * 1e3:.2f} ms  {BATCH / base:.1f} img/s")


def _bench_pieces(fused: dict, cfg) -> None:
    """Chain-time each sub-op of one fused layer at tower shapes."""
    from gvl_tpu.models.siglip_fused import DH_PAD, SEQ_PAD, _round_up
    from gvl_tpu.ops.quant_matmul import (
        attention_fused_qkv,
        ln_quant,
        quant_static,
        w8a8_matmul,
    )

    lp = fused["layers"][0]
    b, s, d = BATCH, (384 // cfg.patch_size) ** 2, cfg.hidden_size
    sp = _round_up(s, SEQ_PAD)
    mp = b * sp
    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.normal(size=(mp, d)), jnp.bfloat16)
    xq = jnp.asarray(rng.integers(-127, 128, (mp, d)), jnp.int8)
    hq = jnp.asarray(rng.integers(-127, 128, (mp, lp["w1"].shape[1])),
                     jnp.int8)
    qkvb = jnp.asarray(
        rng.normal(size=(mp, 3 * cfg.num_heads * DH_PAD)), jnp.bfloat16)
    sm = 1.0 / float(np.sqrt(d // cfg.num_heads))

    # chain_time folds the loop carry into the LAST positional arg, so
    # each piece is a plain function of its operands
    pieces = {
        "ln_quant [Mp,D]": (
            lambda a: ln_quant(a.astype(jnp.bfloat16), lp["ln1_g"], lp["ln1_b"], lp["ln1_inv"])
            .astype(jnp.float32).mean(), (h,)),
        "w8a8 qkv": (
            lambda a: w8a8_matmul(a.astype(jnp.int8), lp["w_qkv"],
                                  lp["s_qkv"], lp["b_qkv"]).mean(),
            (xq,)),
        "w8a8 o+residual": (
            lambda a, r: w8a8_matmul(
                a.astype(jnp.int8), lp["w_o"], lp["s_o"], lp["b_o"],
                epilogue="residual", residual=r.astype(jnp.bfloat16)
            ).mean(),
            (jnp.asarray(rng.integers(-127, 128,
                                      (mp, lp["w_o"].shape[0])), jnp.int8),
             h)),
        "w8a8 fc1 gelu_quant": (
            lambda a: w8a8_matmul(
                a.astype(jnp.int8), lp["w1"], lp["s1"], lp["b1"],
                epilogue="gelu_quant", out_scale_inv=lp["gelu_inv"])
            .astype(jnp.float32).mean(), (xq,)),
        "w8a8 fc2+residual": (
            lambda a, r: w8a8_matmul(
                a.astype(jnp.int8), lp["w2"], lp["s2"], lp["b2"],
                epilogue="residual", residual=r.astype(jnp.bfloat16)
            ).mean(), (hq, h)),
        "quant_static [Mp,D]": (
            lambda a: quant_static(a.astype(jnp.bfloat16), lp["attn_inv"])
            .astype(jnp.float32).mean(), (h,)),
        "attention fused-qkv": (
            lambda a: attention_fused_qkv(
                a.astype(jnp.bfloat16), batch=b, seq_pad=sp, kv_len=s,
                num_heads=cfg.num_heads, dh_pad=DH_PAD,
                sm_scale=sm).mean(), (qkvb,)),
    }
    total = 0.0
    for name, (fn, args) in pieces.items():
        t = chain_time(fn, args, reps_pair=(8, 40))
        total += t
        print(f"  {name:24s} {t * 1e3:7.3f} ms")
    print(f"  additive layer total     {total * 1e3:7.3f} ms x 27 = "
          f"{total * 27 * 1e3:.1f} ms")


if __name__ == "__main__":
    main()
