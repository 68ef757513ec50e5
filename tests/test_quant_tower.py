"""W8A8 int8 tower path: numerics, ladder wiring, trained-weights delta.

The int8 MXU runs ~2x bf16 FLOPs on v5e (scripts/bench_int8_tower.py);
these tests pin the quantization algebra and that the accuracy cost is
negligible — including on the REAL trained mini-SigLIP weights when the
artifact is shipped.
"""

from dataclasses import replace

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from gvl_tpu.models.siglip import (
    SigLIPVisionConfig,
    SigLIPVisionTower,
    quantize_siglip_int8,
)
from gvl_tpu.nn.quant import W8A8Dense, quantize_kernels_int8


class TestW8A8Dense:
    def test_matches_dense_within_quant_error(self):
        import flax.linen as nn

        rng = jax.random.PRNGKey(0)
        x = jax.random.normal(rng, (4, 7, 96))
        dense = nn.Dense(64)
        params = dense.init(rng, x)["params"]
        ref = dense.apply({"params": params}, x)

        qparams = quantize_kernels_int8({"proj": params}, ("proj",))["proj"]
        out = W8A8Dense(64).apply({"params": qparams}, x)
        assert out.shape == ref.shape
        rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
        assert rel < 0.03, rel

    def test_quantize_only_named_modules(self):
        import flax.linen as nn

        rng = jax.random.PRNGKey(1)
        x = jnp.ones((1, 8))
        params = {
            "fc1": nn.Dense(4).init(rng, x)["params"],
            "other": nn.Dense(4).init(rng, x)["params"],
        }
        q = quantize_kernels_int8(params, ("fc1",))
        assert "kernel_q" in q["fc1"] and "scale" in q["fc1"]
        assert "kernel" in q["other"]


class TestQuantTower:
    def test_tiny_tower_parity(self):
        cfg = SigLIPVisionConfig.tiny()
        tower = SigLIPVisionTower(cfg)
        rng = jax.random.PRNGKey(0)
        x = jax.random.normal(rng, (2, 56, 56, 3))
        variables = tower.init(rng, x)
        ref = tower.apply(variables, x, pool=True)["pooled"]

        qtower = SigLIPVisionTower(replace(cfg, quant_int8=True))
        qparams = quantize_siglip_int8(variables["params"])
        out = qtower.apply({"params": qparams}, x, pool=True)["pooled"]
        ref_n, out_n = np.asarray(ref), np.asarray(out)
        cos = float((ref_n * out_n).sum()
                    / (np.linalg.norm(ref_n) * np.linalg.norm(out_n)))
        assert cos > 0.995, cos

    def test_preset_flag_builds_quant_backend(self):
        from gvl_tpu.config import load_preset
        from gvl_tpu.perception.batch import build_siglip_encoder

        config = load_preset("light")
        config.perception.siglip_backend = "jax"
        config.perception.siglip_checkpoint = None
        config.perception.siglip_int8 = True
        # tiny tower for test speed: monkeypatch so400m to tiny
        import gvl_tpu.models.siglip as siglip_mod

        orig = siglip_mod.SigLIPVisionConfig.so400m
        siglip_mod.SigLIPVisionConfig.so400m = classmethod(
            lambda cls: cls.tiny(image_size=56))
        try:
            enc = build_siglip_encoder(config)
        finally:
            siglip_mod.SigLIPVisionConfig.so400m = orig
        assert enc.backend.tower.config.quant_int8
        leaves = jax.tree.leaves(enc.backend.variables)
        assert any(a.dtype == jnp.int8 for a in leaves)

    def test_trained_minisiglip_int8_zero_shot_delta(self):
        """On the SHIPPED trained weights, int8 zero-shot accuracy must
        be within 2 points of bf16 — the honest accuracy-cost bound for
        making int8 the serving default."""
        from gvl_tpu.training.siglip_train import (
            evaluate_minisiglip,
            is_minisiglip_checkpoint,
            load_minisiglip,
        )

        if not is_minisiglip_checkpoint("outputs/minisiglip"):
            pytest.skip("shipped mini-SigLIP artifact not present")
        _, variables, vision_cfg, text_cfg = load_minisiglip(
            "outputs/minisiglip")
        base = evaluate_minisiglip(variables, vision_cfg, text_cfg,
                                   n_crops=64)
        qvars = {"params": dict(variables["params"])}
        qvars["params"]["vision"] = quantize_siglip_int8(
            variables["params"]["vision"])
        quant = evaluate_minisiglip(qvars,
                                    replace(vision_cfg, quant_int8=True),
                                    text_cfg, n_crops=64)
        assert quant["zero_shot_acc"] >= base["zero_shot_acc"] - 0.02, (
            base, quant)
