#!/usr/bin/env python
"""Block-size sweep for the fused W8A8 matmul at tower shapes.

Finds (block_m, block_n) per (K, N) shape; the defaults in
ops/quant_matmul.py should match the winners here.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from gvl_tpu.ops.quant_matmul import w8a8_matmul_pallas

M = 6144  # 8 x Sp(768)


def chain_time(fn, args, reps_pair=(8, 40), iters=3):
    out = {}
    for reps in reps_pair:
        @jax.jit
        def runner(*args, reps=reps):
            def body(carry, _):
                a0 = (args[0] + carry.astype(jnp.int8)).astype(jnp.int8)
                return fn(a0, *args[1:]).astype(jnp.float32), ()

            acc, _ = jax.lax.scan(
                body, jnp.zeros((), jnp.float32), None, length=reps)
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
    rng = np.random.default_rng(0)
    print("backend:", jax.default_backend())
    shapes = [
        ("qkv-pad", 1152, 6144, "none"),
        ("o-pad", 2048, 1152, "none"),
        ("fc1", 1152, 4352, "gelu_quant"),
        ("fc2", 4352, 1152, "none"),
    ]
    for name, k, n, epi in shapes:
        x = jnp.asarray(rng.integers(-127, 128, (M, k)), jnp.int8)
        w = jnp.asarray(rng.integers(-127, 128, (k, n)), jnp.int8)
        scale = jnp.full((n,), 1e-3, jnp.float32)
        bias = jnp.zeros((n,), jnp.float32)
        flops = 2.0 * M * k * n
        best = None
        for bm in (512, 1024, 2048, 3072):
            if M % bm:
                continue
            for bn in (256, 384, 512, 1024):
                kw = dict(epilogue=epi)
                if epi == "gelu_quant":
                    kw["out_scale_inv"] = jnp.float32(40.0)
                try:
                    fn = lambda a, bm=bm, bn=bn, kw=kw: w8a8_matmul_pallas(
                        a, w, scale, bias, block_m=bm, block_n=bn, **kw
                    ).astype(jnp.float32).mean()
                    t = chain_time(fn, (x,))
                except Exception as exc:
                    print(f"  {name} bm={bm} bn={bn}: FAIL "
                          f"{type(exc).__name__}")
                    continue
                rate = flops / t / 1e12
                tag = ""
                if best is None or t < best[0]:
                    best = (t, bm, bn)
                    tag = " *"
                print(f"  {name} bm={bm} bn={bn}: {t * 1e3:7.3f} ms "
                      f"({rate:6.1f} TOP/s){tag}")
        print(f"{name}: best bm={best[1]} bn={best[2]} "
              f"{best[0] * 1e3:.3f} ms")


if __name__ == "__main__":
    main()
