"""W8A8 quantized projection: int8 activations × int8 weights on the MXU.

The v5e MXU runs int8×int8→int32 at 2× the bf16 FLOP rate (measured
~326-370 TOP/s vs ~160-190 TF/s at SigLIP tower shapes on this chip,
`scripts/bench_int8_tower.py`), so a compute-bound encoder tower gets a
near-2× throughput lever that weight-only int8 (:class:`gvl_tpu.models
.qwen3.Int8Dense`, which dequantizes into a bf16 dot) cannot reach —
weight-only targets HBM bandwidth, W8A8 targets FLOPs.

Recipe (standard symmetric dynamic quantization):
- weights: per-output-channel scale, pre-quantized offline by
  :func:`quantize_kernels_int8` (``scale_w = max|w| / 127`` over the
  input axis);
- activations: per-row (per-token) dynamic scale computed in the
  forward pass (``scale_x = max|x| / 127`` over the feature axis) —
  cheap (one reduction) and robust for post-LayerNorm encoder
  activations;
- ``y = (x_q @ w_q) * scale_x * scale_w`` accumulated in int32, exact
  algebra apart from the rounding.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def _int8_kernel_init(key, shape, dtype=jnp.int8):
    del key
    return jnp.zeros(shape, jnp.int8)


class W8A8Dense(nn.Module):
    """Drop-in Dense running the matmul on the int8 MXU path.

    Parameters are ``kernel_q`` (int8, [in, out]) + ``scale``
    (f32, [out]) + optional ``bias`` — produced from a bf16/f32
    checkpoint by :func:`quantize_kernels_int8`.

    Activation quantization modes:
    - dynamic (default): per-row ``max|x|/127`` computed in the forward
      — robust, but the reduction is VPU-bound and costs real tower
      throughput (measured: the dot's 2x shrinks to ~1.1x end-to-end);
    - static (``static_act=True``): a calibrated per-layer ``act_scale``
      param — quantize becomes a fusable elementwise op.  Calibrate by
      running the dynamic tower with ``mutable=["calibration"]`` (this
      module sows its observed amax) and baking the scales with
      :func:`bake_act_scales`.
    """

    features: int
    use_bias: bool = True
    static_act: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_dim = x.shape[-1]
        kernel_q = self.param("kernel_q", _int8_kernel_init,
                              (in_dim, self.features))
        scale = self.param("scale", nn.initializers.constant(1.0 / 127.0),
                           (self.features,), jnp.float32)
        lead = x.shape[:-1]
        x2 = x.reshape(-1, in_dim)
        xf = x2.astype(jnp.float32)
        if self.static_act:
            act_scale = self.param(
                "act_scale", nn.initializers.constant(1.0 / 127.0),
                (), jnp.float32)
            sx = act_scale
        else:
            amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
            if self.is_mutable_collection("calibration"):
                self.sow("calibration", "amax", jnp.max(amax),
                         reduce_fn=lambda a, b: jnp.maximum(a, b),
                         init_fn=lambda: jnp.zeros((), jnp.float32))
            sx = jnp.maximum(amax, 1e-8) / 127.0
        xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
        y = jax.lax.dot_general(
            xq, kernel_q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        y = y.astype(jnp.float32) * sx * scale[None, :]
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias[None, :]
        return y.reshape(*lead, self.features).astype(x.dtype)


def bake_act_scales(params: dict, calibration: dict) -> dict:
    """Write calibrated ``act_scale`` params (observed amax / 127) into a
    W8A8 tree, for a model rebuilt with ``static_act=True``.

    ``calibration`` is the collection returned by an apply with
    ``mutable=["calibration"]`` on the dynamic-quant model (same tree
    shape: each quantized dense holds ``{"amax": (value,)}``)."""
    import numpy as np

    def walk(p, c):
        if isinstance(p, dict):
            out = {}
            for k, v in p.items():
                if (isinstance(v, dict) and "kernel_q" in v
                        and isinstance(c, dict) and k in c):
                    amax = c[k]["amax"]
                    amax = float(np.max(np.asarray(
                        amax[0] if isinstance(amax, (tuple, list))
                        else amax)))
                    nv = dict(v)
                    nv["act_scale"] = jnp.asarray(
                        max(amax, 1e-8) / 127.0, jnp.float32)
                    out[k] = nv
                else:
                    out[k] = walk(v, c.get(k, {})
                                  if isinstance(c, dict) else {})
            return out
        return p

    return walk(params, calibration)


def quantize_kernels_int8(params, kernel_names: Sequence[str] = (
        "q_proj", "k_proj", "v_proj", "o_proj", "fc1", "fc2")) -> dict:
    """bf16/f32 param tree → W8A8 tree: every ``kernel`` directly under
    a module named in ``kernel_names`` becomes ``kernel_q`` + ``scale``
    (symmetric per-output-channel).  Everything else passes through."""

    def quantize_kernel(w):
        w = jnp.asarray(w, jnp.float32)
        amax = jnp.max(jnp.abs(w), axis=-2)
        scale = jnp.maximum(amax, 1e-8) / 127.0
        q = jnp.clip(jnp.round(w / scale[..., None, :]),
                     -127, 127).astype(jnp.int8)
        return q, scale

    def walk(tree, name=""):
        if isinstance(tree, dict):
            if "kernel" in tree and name in kernel_names:
                q, scale = quantize_kernel(tree["kernel"])
                new = {"kernel_q": q, "scale": scale}
                new.update({k: jnp.asarray(v, jnp.float32)
                            for k, v in tree.items() if k != "kernel"})
                return new
            return {k: walk(v, k) for k, v in tree.items()}
        return tree

    return walk(params)
