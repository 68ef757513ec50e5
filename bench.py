"""Round benchmark: prints ONE JSON line for the driver.

Current headline metric: fused flash-attention throughput on one chip,
with vs_baseline = speedup over the XLA einsum attention path (the stand-in
for the reference's flash-attn-2 dependency).  This will switch to
perception fps/chip (SigLIP path) once the vision encoder lands.

Timing methodology: the remote-TPU tunnel makes per-call host timing
unreliable (dispatch returns in ~20 us, a host readback costs a ~30 ms
round trip), so kernels are chained K times inside one jitted lax.scan and
the per-kernel time is the slope between two chain lengths.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


def timed_chain(fn, init, reps: int, warm: int = 1, iters: int = 3) -> float:
    """Mean wall time of a jitted scan chaining ``fn`` ``reps`` times."""

    @jax.jit
    def run(x):
        def body(carry, _):
            return fn(carry), ()

        out, _ = jax.lax.scan(body, x, None, length=reps)
        return out.astype(jnp.float32).sum()

    for _ in range(warm):
        float(run(init))
    t0 = time.perf_counter()
    for _ in range(iters):
        float(run(init))
    return (time.perf_counter() - t0) / iters


def per_call_seconds(fn, init, lo: int = 10, hi: int = 110) -> float:
    """Per-invocation seconds via the (hi - lo) chain-length slope."""
    return (timed_chain(fn, init, hi) - timed_chain(fn, init, lo)) / (hi - lo)


def main() -> None:
    from gvl_tpu.ops.attention import attention_reference, flash_attention

    b, h, s, d = 4, 16, 2048, 128
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (b, h, s, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.fold_in(key, 1), (b, h, s, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.fold_in(key, 2), (b, h, s, d), jnp.bfloat16)

    on_tpu = jax.default_backend() == "tpu"
    fused_fn = flash_attention if on_tpu else attention_reference

    t_fused = per_call_seconds(
        lambda a: fused_fn(a, k, v, causal=True).astype(a.dtype), q
    )
    t_ref = per_call_seconds(
        lambda a: attention_reference(a, k, v, causal=True).astype(a.dtype), q
    )

    causal_flops = 4 * b * h * s * s * d * 0.5
    tflops = causal_flops / t_fused / 1e12

    print(json.dumps({
        "metric": "flash_attention_causal_tflops",
        "value": round(tflops, 2),
        "unit": "TFLOP/s (useful, b4 h16 s2048 d128 bf16)",
        "vs_baseline": round(t_ref / t_fused, 3),
    }))


if __name__ == "__main__":
    main()
