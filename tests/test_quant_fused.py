"""Fused W8A8 kernels (ops.quant_matmul) + fused SigLIP serving path.

Kernel correctness runs the Pallas bodies in interpret mode against the
XLA references (identical integer algebra → exact for int8 outputs);
the tower-level test checks the fused path reproduces the already-
verified static-act XLA tower within bf16 rounding.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gvl_tpu.ops.quant_matmul import (
    ln_quant_pallas,
    ln_quant_reference,
    quant_static_pallas,
    quant_static_reference,
    w8a8_matmul_pallas,
    w8a8_matmul_reference,
)

RNG = np.random.default_rng(0)


def _int8(shape):
    return jnp.asarray(RNG.integers(-127, 128, shape), jnp.int8)


class TestW8A8Matmul:
    M, K, N = 64, 128, 256

    def _operands(self):
        x = _int8((self.M, self.K))
        w = _int8((self.K, self.N))
        scale = jnp.asarray(RNG.uniform(1e-4, 1e-3, self.N), jnp.float32)
        bias = jnp.asarray(RNG.normal(size=self.N) * 0.1, jnp.float32)
        return x, w, scale, bias

    def test_plain_epilogue(self):
        x, w, scale, bias = self._operands()
        got = w8a8_matmul_pallas(x, w, scale, bias, interpret=True)
        ref = w8a8_matmul_reference(x, w, scale, bias)
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(ref, np.float32),
                                   rtol=1e-2, atol=0.25)

    def test_no_bias(self):
        x, w, scale, _ = self._operands()
        got = w8a8_matmul_pallas(x, w, scale, interpret=True)
        ref = w8a8_matmul_reference(x, w, scale)
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(ref, np.float32),
                                   rtol=1e-2, atol=0.25)

    def test_residual_epilogue(self):
        x, w, scale, bias = self._operands()
        res = jnp.asarray(RNG.normal(size=(self.M, self.N)), jnp.bfloat16)
        got = w8a8_matmul_pallas(x, w, scale, bias, epilogue="residual",
                                 residual=res, interpret=True)
        ref = w8a8_matmul_reference(x, w, scale, bias,
                                    epilogue="residual", residual=res)
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(ref, np.float32),
                                   rtol=1e-2, atol=0.25)

    def test_gelu_quant_epilogue_exact_int8(self):
        x, w, scale, bias = self._operands()
        inv = jnp.float32(37.5)
        got = w8a8_matmul_pallas(x, w, scale, bias, epilogue="gelu_quant",
                                 out_scale_inv=inv, interpret=True)
        ref = w8a8_matmul_reference(x, w, scale, bias,
                                    epilogue="gelu_quant",
                                    out_scale_inv=inv)
        assert got.dtype == jnp.int8
        # rounding ties at .5 may differ by 1 between VPU and XLA paths
        assert int(jnp.sum(jnp.abs(got.astype(jnp.int32)
                                   - ref.astype(jnp.int32)) > 1)) == 0

    def test_blocking_covers_ragged_grid(self):
        x = _int8((96, 128))   # 96 rows: block_m shrinks to a divisor
        w = _int8((128, 384))
        scale = jnp.full((384,), 1e-3, jnp.float32)
        got = w8a8_matmul_pallas(x, w, scale, block_m=64, block_n=256,
                                 interpret=True)
        ref = w8a8_matmul_reference(x, w, scale)
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(ref, np.float32), rtol=1e-2, atol=0.25)

    def test_alignment_guard(self):
        with pytest.raises(ValueError):
            w8a8_matmul_pallas(_int8((60, 128)), _int8((128, 128)),
                               jnp.ones((128,), jnp.float32),
                               interpret=True)


class TestLnQuant:
    def test_matches_reference(self):
        x = jnp.asarray(RNG.normal(size=(64, 256)) * 2.0, jnp.bfloat16)
        g = jnp.asarray(RNG.uniform(0.5, 1.5, 256), jnp.float32)
        b = jnp.asarray(RNG.normal(size=256) * 0.1, jnp.float32)
        inv = jnp.float32(40.0)
        got = ln_quant_pallas(x, g, b, inv, interpret=True)
        ref = ln_quant_reference(x, g, b, inv)
        assert got.dtype == jnp.int8
        diff = np.abs(np.asarray(got, np.int32) - np.asarray(ref, np.int32))
        assert diff.max() <= 1  # rsqrt rounding at quantize boundaries

    def test_quant_static(self):
        x = jnp.asarray(RNG.normal(size=(64, 128)), jnp.bfloat16)
        got = quant_static_pallas(x, jnp.float32(50.0), interpret=True)
        ref = quant_static_reference(x, jnp.float32(50.0))
        diff = np.abs(np.asarray(got, np.int32) - np.asarray(ref, np.int32))
        assert diff.max() <= 1


class TestFusedSigLIP:
    def test_matches_static_xla_tower(self):
        """Fused serving path == calibrated static-act XLA tower (the
        accuracy-verified baseline) within bf16/rounding tolerance."""
        from dataclasses import replace

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

        cfg = SigLIPVisionConfig(hidden_size=128, intermediate_size=192,
                                 num_layers=2, num_heads=4, image_size=56)
        tower = SigLIPVisionTower(cfg)
        key = jax.random.PRNGKey(0)
        pix = jax.random.uniform(key, (2, 56, 56, 3), jnp.float32)
        params = tower.init(key, jnp.ones((1, 56, 56, 3)))["params"]

        qparams = quantize_siglip_int8(params)
        sparams = calibrate_siglip_int8(cfg, qparams, pix)
        static_tower = SigLIPVisionTower(
            replace(cfg, quant_int8=True, quant_static_act=True))
        want = static_tower.apply({"params": sparams}, pix, pool=True)

        fused = fuse_siglip_int8(sparams, cfg)
        got = siglip_fused_apply(fused, pix, cfg, pool=True)

        w = np.asarray(want["pooled"], np.float32)
        g = np.asarray(got["pooled"], np.float32)
        # int8 requantization boundaries differ by at most 1 LSB between
        # the two pipelines; cosine similarity is the capability metric
        cos = (w * g).sum(-1) / (np.linalg.norm(w, axis=-1)
                                 * np.linalg.norm(g, axis=-1) + 1e-9)
        assert cos.min() > 0.995, cos

    def test_off_size_bucket_resizes_pos_embed(self):
        from gvl_tpu.models.siglip import (
            SigLIPVisionConfig,
            SigLIPVisionTower,
        )
        from gvl_tpu.models.siglip_fused import (
            prepare_fused_siglip,
            siglip_fused_apply,
        )

        cfg = SigLIPVisionConfig(hidden_size=128, intermediate_size=192,
                                 num_layers=1, num_heads=4, image_size=56)
        tower = SigLIPVisionTower(cfg)
        key = jax.random.PRNGKey(1)
        params = tower.init(key, jnp.ones((1, 56, 56, 3)))["params"]
        calib = jax.random.uniform(key, (1, 56, 56, 3), jnp.float32)
        fused = prepare_fused_siglip(params, cfg, calib)
        out = siglip_fused_apply(
            fused, jnp.ones((1, 28, 28, 3), jnp.float32), cfg)
        assert out["pooled"].shape == (1, cfg.hidden_size)
        assert np.isfinite(np.asarray(out["pooled"], np.float32)).all()


class TestPackedQKVAttention:
    def test_matches_reference_with_kv_mask(self):
        """Unpadded head_dim (72-style) exercises the in-kernel DMA
        pad path; query rows past kv_len are garbage and excluded."""
        from gvl_tpu.ops.quant_matmul import (
            attention_qkv_packed_pallas,
            attention_qkv_packed_reference,
        )

        b, sp, s, h, dh = 2, 64, 57, 4, 72
        qkv = jnp.asarray(RNG.normal(size=(b * sp, 3 * h * dh)),
                          jnp.bfloat16)
        kw = dict(batch=b, seq_pad=sp, kv_len=s, num_heads=h, head_dim=dh,
                  sm_scale=0.125)
        got = attention_qkv_packed_pallas(qkv, interpret=True, **kw)
        ref = attention_qkv_packed_reference(qkv, **kw)
        g = np.asarray(got, np.float32).reshape(b, sp, h * dh)[:, :s]
        r = np.asarray(ref, np.float32).reshape(b, sp, h * dh)[:, :s]
        np.testing.assert_allclose(g, r, rtol=2e-2, atol=2e-2)

    def test_lane_aligned_head_dim(self):
        from gvl_tpu.ops.quant_matmul import (
            attention_qkv_packed_pallas,
            attention_qkv_packed_reference,
        )

        b, sp, h, dh = 1, 128, 2, 128
        qkv = jnp.asarray(RNG.normal(size=(b * sp, 3 * h * dh)),
                          jnp.bfloat16)
        kw = dict(batch=b, seq_pad=sp, kv_len=sp, num_heads=h,
                  head_dim=dh, sm_scale=0.1)
        got = attention_qkv_packed_pallas(qkv, interpret=True, **kw)
        ref = attention_qkv_packed_reference(qkv, **kw)
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(ref, np.float32),
                                   rtol=2e-2, atol=2e-2)


class TestPackedMultiheadAttention:
    def test_matches_reference_unaligned_head_dim(self):
        """dh=48 (not a lane multiple) through the in-register-sliced
        packed kernel; garbage query rows past kv_len excluded."""
        from gvl_tpu.ops.quant_matmul import (
            attention_packed_multihead_pallas,
            attention_qkv_packed_reference,
        )

        b, sp, s, h, dh = 2, 64, 57, 8, 48
        qkv = jnp.asarray(RNG.normal(size=(b * sp, 3 * h * dh)),
                          jnp.bfloat16)
        kw = dict(batch=b, seq_pad=sp, kv_len=s, num_heads=h,
                  head_dim=dh, sm_scale=0.125)
        got = attention_packed_multihead_pallas(qkv, interpret=True, **kw)
        ref = attention_qkv_packed_reference(qkv, **kw)
        g = np.asarray(got, np.float32).reshape(b, sp, h * dh)[:, :s]
        r = np.asarray(ref, np.float32).reshape(b, sp, h * dh)[:, :s]
        np.testing.assert_allclose(g, r, rtol=2e-2, atol=2e-2)

    def test_int8_epilogue(self):
        from gvl_tpu.ops.quant_matmul import (
            attention_packed_multihead_pallas,
            attention_qkv_packed_reference,
        )

        b, sp, h, dh = 1, 32, 4, 96
        qkv = jnp.asarray(RNG.normal(size=(b * sp, 3 * h * dh)),
                          jnp.bfloat16)
        kw = dict(batch=b, seq_pad=sp, kv_len=sp, num_heads=h,
                  head_dim=dh, sm_scale=0.1)
        got = attention_packed_multihead_pallas(
            qkv, interpret=True, out_scale_inv=jnp.float32(40.0), **kw)
        assert got.dtype == jnp.int8
        ref = attention_qkv_packed_reference(qkv, **kw)
        want = np.clip(np.round(np.asarray(ref, np.float32) * 40.0),
                       -127, 127)
        diff = np.abs(np.asarray(got, np.int32) - want)
        assert diff.max() <= 1

    def test_packed_tower_matches_padded(self):
        """fuse_siglip_int8(packed_attention=True) == the padded fused
        tower (same calibration) within rounding, at a toy geometry
        whose head_dim is NOT a lane multiple."""
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

        cfg = SigLIPVisionConfig(hidden_size=128, intermediate_size=192,
                                 num_layers=2, num_heads=4, image_size=56)
        tower = SigLIPVisionTower(cfg)
        key = jax.random.PRNGKey(0)
        pix = jax.random.uniform(key, (2, 56, 56, 3), jnp.float32)
        params = tower.init(key, jnp.ones((1, 56, 56, 3)))["params"]
        qparams = quantize_siglip_int8(params)
        sparams = calibrate_siglip_int8(cfg, qparams, pix)

        padded = siglip_fused_apply(
            fuse_siglip_int8(sparams, cfg), pix, cfg, pool=True)
        packed = siglip_fused_apply(
            fuse_siglip_int8(sparams, cfg, packed_attention=True),
            pix, cfg, pool=True)
        a = np.asarray(padded["pooled"], np.float32)
        b = np.asarray(packed["pooled"], np.float32)
        cos = (a * b).sum(-1) / (np.linalg.norm(a, axis=-1)
                                 * np.linalg.norm(b, axis=-1) + 1e-9)
        assert cos.min() > 0.999, cos
