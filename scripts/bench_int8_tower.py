#!/usr/bin/env python
"""Measure int8 vs bf16 matmul throughput at SigLIP tower shapes.

Round-2 note said "int8 XLA dot == bf16 speed" on the tunnel chip; the
v5e MXU's int8 peak is 2x bf16, so if a direct measurement shows the
int8 path winning, a quantized tower is the lever that closes the
197 -> 300 img/s headline gap.  Chain-timed per bench.py methodology
(host timing on the tunnel is unreliable; time the slope between two
chain lengths inside one jit).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def chain_time(fn, args, reps: int, iters: int = 3) -> float:
    @jax.jit
    def runner(*args):
        def body(carry, _):
            out = fn(*args, carry)
            return (out * 1e-9).astype(jnp.float32), ()

        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                              length=reps)
        return acc

    float(runner(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        float(runner(*args))
    return (time.perf_counter() - t0) / iters


def bench_dot(m: int, k: int, n: int) -> dict:
    rng = np.random.default_rng(0)
    out = {}

    a_bf = jnp.asarray(rng.normal(size=(m, k)), jnp.bfloat16)
    b_bf = jnp.asarray(rng.normal(size=(k, n)), jnp.bfloat16)

    def f_bf16(a, b, carry):
        y = (a + carry.astype(jnp.bfloat16)) @ b
        return y.mean().astype(jnp.float32)

    a_i8 = jnp.asarray(rng.integers(-127, 127, (m, k)), jnp.int8)
    b_i8 = jnp.asarray(rng.integers(-127, 127, (k, n)), jnp.int8)

    def f_int8(a, b, carry):
        # carry-dependence via a cheap int add on a
        a = (a + carry.astype(jnp.int8)).astype(jnp.int8)
        y = jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        return y.astype(jnp.float32).mean()

    flops = 2.0 * m * k * n
    for name, fn, args in (("bf16", f_bf16, (a_bf, b_bf)),
                           ("int8", f_int8, (a_i8, b_i8))):
        t16 = chain_time(fn, args, 16)
        t64 = chain_time(fn, args, 64)
        per_call = (t64 - t16) / 48
        out[name] = {"ms": per_call * 1e3,
                     "tflops": flops / per_call / 1e12}
    out["speedup"] = out["bf16"]["ms"] / out["int8"]["ms"]
    return out


def main() -> None:
    print("backend:", jax.default_backend())
    # SigLIP so400m MLP shapes at batch 8 x 730 tokens (384^2/14^2 + 1)
    shapes = [
        (5840, 1152, 4304),   # MLP up
        (5840, 4304, 1152),   # MLP down
        (5840, 1152, 3456),   # fused qkv
        (4096, 4096, 4096),   # square reference point
    ]
    for m, k, n in shapes:
        r = bench_dot(m, k, n)
        print(f"[{m}x{k}x{n}] bf16 {r['bf16']['ms']:.3f} ms "
              f"({r['bf16']['tflops']:.1f} TF/s) | int8 "
              f"{r['int8']['ms']:.3f} ms ({r['int8']['tflops']:.1f} "
              f"TOP/s) | speedup {r['speedup']:.2f}x")


if __name__ == "__main__":
    main()
