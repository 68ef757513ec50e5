#!/usr/bin/env python
"""Component-level breakdown of the SigLIP so400m tower on the TPU.

VERDICT r3 #1: the graded tower number has been flat at ~197 img/s for
three rounds; ROADMAP pins the sustained matmul rate at 53-56% of peak
and records that W8A8 lowering only realizes 1.04-1.12x of the measured
1.7-2.0x dot-level int8 gain.  Before writing any kernel, this script
answers WHERE the time goes: it chain-times each sub-computation of one
encoder layer at the real shapes (B=8, S=729, D=1152, MLP 4304, 16
heads x 72) and builds an additive model to compare against the
measured whole-tower time.

Methodology: per bench.py — the tunnel makes per-call host timing
unreliable, so each op is chained K times inside one jitted lax.scan
with a carry data-dependence; per-call time is the slope between two
chain lengths.
"""

from __future__ import annotations

import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

B, S, D, DI, H, DH = 8, 729, 1152, 4304, 16, 72
M = B * S  # 5832 rows

LAYERS = 27


def chain_time(fn, args, reps_pair=(8, 32), iters: int = 3) -> float:
    """Seconds per call, slope-timed."""
    out = {}
    for reps in reps_pair:
        @jax.jit
        def runner(*args, reps=reps):
            def body(carry, _):
                y = fn(*args, carry)
                return y.astype(jnp.float32), ()

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


def carry_bf16(x, carry):
    return x + carry.astype(x.dtype)


def main() -> None:
    rng = np.random.default_rng(0)
    print("backend:", jax.default_backend())

    xf = jnp.asarray(rng.normal(size=(M, D)), jnp.bfloat16)
    w_qkv = jnp.asarray(rng.normal(size=(D, 3 * D)) * 0.02, jnp.bfloat16)
    w_o = jnp.asarray(rng.normal(size=(D, D)) * 0.02, jnp.bfloat16)
    w1 = jnp.asarray(rng.normal(size=(D, DI)) * 0.02, jnp.bfloat16)
    w2 = jnp.asarray(rng.normal(size=(DI, D)) * 0.02, jnp.bfloat16)

    q8 = lambda w: jnp.clip(jnp.round(w.astype(jnp.float32) * 50), -127,
                            127).astype(jnp.int8)
    x8, w_qkv8, w_o8, w18, w28 = map(q8, (xf, w_qkv, w_o, w1, w2))
    h8 = q8(jnp.asarray(rng.normal(size=(M, DI)) * 0.3, jnp.bfloat16))
    hf = jnp.asarray(rng.normal(size=(M, DI)), jnp.bfloat16)

    results: dict[str, float] = {}

    def bench(name, fn, args, flops=None):
        t = chain_time(fn, args)
        results[name] = t
        rate = f"  {flops / t / 1e12:7.1f} T/s" if flops else ""
        print(f"{name:34s} {t * 1e3:8.3f} ms{rate}")

    # ---- bf16 matmuls at layer shapes
    def f_dense(x, w, carry):
        y = carry_bf16(x, carry) @ w
        return y.mean()

    bench("bf16 qkv [M,D]x[D,3D]", f_dense, (xf, w_qkv),
          2.0 * M * D * 3 * D)
    bench("bf16 out [M,D]x[D,D]", f_dense, (xf, w_o), 2.0 * M * D * D)
    bench("bf16 fc1 [M,D]x[D,DI]", f_dense, (xf, w1), 2.0 * M * D * DI)
    bench("bf16 fc2 [M,DI]x[DI,D]", f_dense, (hf, w2), 2.0 * M * DI * D)

    # ---- int8 pure dots, same shapes
    def f_dot8(x, w, carry):
        x = (x + carry.astype(jnp.int8)).astype(jnp.int8)
        y = jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return y.astype(jnp.float32).mean()

    bench("int8 qkv dot", f_dot8, (x8, w_qkv8), 2.0 * M * D * 3 * D)
    bench("int8 out dot", f_dot8, (x8, w_o8), 2.0 * M * D * D)
    bench("int8 fc1 dot", f_dot8, (x8, w18), 2.0 * M * D * DI)
    bench("int8 fc2 dot", f_dot8, (h8, w28), 2.0 * M * DI * D)

    # ---- elementwise / norm pieces
    def f_ln(x, carry):
        y = jax.nn.standardize(carry_bf16(x, carry).astype(jnp.float32),
                               axis=-1)
        return y.astype(jnp.bfloat16).mean()

    bench("LayerNorm [M,D] (f32 math)", f_ln, (xf,))

    def f_gelu(h, carry):
        return jax.nn.gelu(carry_bf16(h, carry), approximate=True).mean()

    bench("GELU [M,DI]", f_gelu, (hf,))

    def f_quant_dyn(x, carry):
        xq = carry_bf16(x, carry).astype(jnp.float32)
        amax = jnp.max(jnp.abs(xq), axis=-1, keepdims=True)
        s = jnp.maximum(amax, 1e-8) / 127.0
        q = jnp.clip(jnp.round(xq / s), -127, 127).astype(jnp.int8)
        return q.astype(jnp.float32).mean()

    bench("dyn quantize [M,D] (amax+div)", f_quant_dyn, (xf,))

    def f_quant_static(x, carry):
        xq = carry_bf16(x, carry).astype(jnp.float32)
        q = jnp.clip(jnp.round(xq * 50.0), -127, 127).astype(jnp.int8)
        return q.astype(jnp.float32).mean()

    bench("static quantize [M,D]", f_quant_static, (xf,))
    bench("static quantize [M,DI]", f_quant_static, (hf,))

    # ---- W8A8Dense as shipped (static + dynamic) at fc1 shape
    def f_w8a8_static(x, w, scale, carry):
        xq = carry_bf16(x, carry).astype(jnp.float32)
        q = jnp.clip(jnp.round(xq * 50.0), -127, 127).astype(jnp.int8)
        y = jax.lax.dot_general(q, w, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        y = y.astype(jnp.float32) * (1.0 / 50.0) * scale[None, :]
        return jax.nn.gelu(y, approximate=True).astype(jnp.bfloat16).mean()

    scale1 = jnp.full((DI,), 0.01, jnp.float32)
    bench("W8A8 fc1 static+dequant+gelu", f_w8a8_static, (xf, w18, scale1),
          2.0 * M * D * DI)

    # ---- attention at tower shape (through the framework kernel)
    from gvl_tpu.ops.attention import dot_product_attention

    qh = jnp.asarray(rng.normal(size=(B, H, S, DH)), jnp.bfloat16)

    def f_attn(q, carry):
        q = q + carry.astype(q.dtype)
        o = dot_product_attention(q, q, q)
        return o.mean()

    bench("attention BxHxSxD 8x16x729x72", f_attn, (qh,),
          4.0 * B * H * S * S * DH)

    # plain XLA einsum attention for comparison
    def f_attn_xla(q, carry):
        q = q + carry.astype(q.dtype)
        s = jnp.einsum("bhsd,bhtd->bhst", q, q,
                       preferred_element_type=jnp.float32)
        p = jax.nn.softmax(s / np.sqrt(DH), axis=-1).astype(q.dtype)
        o = jnp.einsum("bhst,bhtd->bhsd", p, q)
        return o.mean()

    bench("attention (plain XLA)", f_attn_xla, (qh,),
          4.0 * B * H * S * S * DH)

    # ---- whole tower, three modes
    from gvl_tpu.models.siglip import (
        SigLIPVisionConfig,
        SigLIPVisionTower,
        quantize_siglip_int8,
    )

    cfg = SigLIPVisionConfig.so400m()
    tower = SigLIPVisionTower(cfg)
    key = jax.random.PRNGKey(0)
    params = jax.jit(tower.init)(key, jnp.ones((1, 384, 384, 3),
                                               jnp.bfloat16))
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    pix = jax.random.normal(key, (B, 384, 384, 3), jnp.bfloat16)

    def f_tower(p, x, carry):
        out = tower.apply(p, x + carry.astype(x.dtype), pool=True)["pooled"]
        return (out.mean() * 1e-6)

    t = chain_time(f_tower, (params, pix), reps_pair=(4, 16))
    results["tower bf16"] = t
    print(f"{'tower bf16':34s} {t * 1e3:8.3f} ms  -> "
          f"{B / t:6.1f} img/s")

    qparams = {"params": quantize_siglip_int8(params["params"])}
    from dataclasses import replace

    tower_q = SigLIPVisionTower(replace(cfg, quant_int8=True))

    def f_tower_q(p, x, carry):
        out = tower_q.apply(p, x + carry.astype(x.dtype),
                            pool=True)["pooled"]
        return (out.mean() * 1e-6)

    t = chain_time(f_tower_q, (qparams, pix), reps_pair=(4, 16))
    results["tower int8 dynamic"] = t
    print(f"{'tower int8 dynamic':34s} {t * 1e3:8.3f} ms  -> "
          f"{B / t:6.1f} img/s")

    from gvl_tpu.models.siglip import calibrate_siglip_int8

    sparams = calibrate_siglip_int8(cfg, qparams["params"], pix)
    tower_s = SigLIPVisionTower(replace(cfg, quant_int8=True,
                                        quant_static_act=True))

    def f_tower_s(p, x, carry):
        out = tower_s.apply({"params": p}, x + carry.astype(x.dtype),
                            pool=True)["pooled"]
        return (out.mean() * 1e-6)

    t = chain_time(f_tower_s, (sparams, pix), reps_pair=(4, 16))
    results["tower int8 static"] = t
    print(f"{'tower int8 static':34s} {t * 1e3:8.3f} ms  -> "
          f"{B / t:6.1f} img/s")

    # ---- additive models
    per_layer_bf16 = (results["bf16 qkv [M,D]x[D,3D]"]
                      + results["bf16 out [M,D]x[D,D]"]
                      + results["bf16 fc1 [M,D]x[D,DI]"]
                      + results["bf16 fc2 [M,DI]x[DI,D]"]
                      + results["attention BxHxSxD 8x16x729x72"]
                      + 2 * results["LayerNorm [M,D] (f32 math)"]
                      + results["GELU [M,DI]"])
    print(f"\nadditive bf16 layer: {per_layer_bf16 * 1e3:.3f} ms x {LAYERS}"
          f" = {per_layer_bf16 * LAYERS * 1e3:.1f} ms "
          f"(measured tower {results['tower bf16'] * 1e3:.1f} ms)")

    per_layer_int8 = (results["int8 qkv dot"] + results["int8 out dot"]
                      + results["int8 fc1 dot"] + results["int8 fc2 dot"]
                      + results["attention BxHxSxD 8x16x729x72"]
                      + 2 * results["LayerNorm [M,D] (f32 math)"]
                      + results["GELU [M,DI]"]
                      + 2 * results["static quantize [M,D]"]
                      + results["static quantize [M,DI]"]
                      + results["static quantize [M,D]"])
    print(f"additive int8-static layer: {per_layer_int8 * 1e3:.3f} ms x "
          f"{LAYERS} = {per_layer_int8 * LAYERS * 1e3:.1f} ms "
          f"(measured {results['tower int8 static'] * 1e3:.1f} ms)")


if __name__ == "__main__":
    main()
