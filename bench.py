"""Round benchmark: prints ONE JSON line for the driver.

Headline metric: perception-encoder throughput — SigLIP2-so400m-patch14-384
(the perception workhorse, 428M params) images/sec on one chip, bf16,
batch 8.  ``vs_baseline`` is the fraction of the BASELINE.json target of
300 perception fps/chip.

Timing methodology: the remote-TPU tunnel makes per-call host timing
unreliable (dispatch returns in ~20 us, a host readback costs a ~30 ms
round trip), so the model is chained K times inside one jitted lax.scan
with a carry-data dependence (otherwise XLA hoists the loop-invariant
forward out of the scan) and per-call time is the slope between two chain
lengths.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

TARGET_FPS_PER_CHIP = 300.0  # BASELINE.md: >=300 fps/chip on v5e
BATCH = 8


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


def main() -> None:
    from gvl_tpu.models.siglip import SigLIPVisionConfig, SigLIPVisionTower

    cfg = SigLIPVisionConfig.so400m()
    tower = SigLIPVisionTower(cfg)
    rng = jax.random.PRNGKey(0)
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32

    params = jax.jit(tower.init)(rng, jnp.ones((1, 384, 384, 3), dtype))
    params = jax.tree.map(lambda a: a.astype(dtype), params)
    x = jax.random.normal(rng, (BATCH, 384, 384, 3), dtype)

    apply_fn = lambda p, xb: tower.apply(p, xb, pool=True)["pooled"]

    if jax.default_backend() == "tpu":
        lo, hi = 4, 24
    else:  # keep the CPU fallback fast enough to emit a line
        lo, hi = 1, 3

    per_batch = (
        chain_seconds(apply_fn, params, x, hi)
        - chain_seconds(apply_fn, params, x, lo)
    ) / (hi - lo)
    fps = BATCH / per_batch

    print(json.dumps({
        "metric": "siglip_so400m_images_per_sec_per_chip",
        "value": round(fps, 1),
        "unit": f"img/s (384x384 bf16, batch {BATCH}, 1 chip)",
        "vs_baseline": round(fps / TARGET_FPS_PER_CHIP, 3),
    }))


if __name__ == "__main__":
    main()
