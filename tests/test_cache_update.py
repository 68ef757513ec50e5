"""In-place Pallas cache append: parity with the scatter reference."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax

from gvl_tpu.ops.cache_update import cache_append, cache_append_reference


class TestCacheAppend:
    def test_interpret_parity(self):
        rng = np.random.RandomState(0)
        cache = jnp.asarray(rng.randn(3, 4, 256, 128), jnp.float32)
        new = jnp.asarray(rng.randn(3, 4, 128), jnp.float32)
        pos = jnp.asarray([0, 17, 255], jnp.int32)
        ref = cache_append_reference(cache, new, pos)
        got = cache_append(cache, new, pos, interpret=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_untouched_rows_preserved(self):
        rng = np.random.RandomState(1)
        cache = jnp.asarray(rng.randn(1, 2, 64, 128), jnp.bfloat16)
        new = jnp.asarray(rng.randn(1, 2, 128), jnp.bfloat16)
        pos = jnp.asarray([5], jnp.int32)
        got = np.asarray(cache_append(cache, new, pos, interpret=True),
                         np.float32)
        orig = np.asarray(cache, np.float32)
        np.testing.assert_array_equal(got[:, :, :5], orig[:, :, :5])
        np.testing.assert_array_equal(got[:, :, 6:], orig[:, :, 6:])
        np.testing.assert_array_equal(
            got[:, :, 5], np.asarray(new, np.float32))

    def test_odd_head_dim_rejected(self):
        cache = jnp.zeros((1, 1, 16, 72))
        with pytest.raises(ValueError, match="head_dim"):
            cache_append(cache, jnp.zeros((1, 1, 72)),
                         jnp.zeros((1,), jnp.int32))


class TestStackedKernels:
    def test_append_stacked_interpret_parity(self):
        from gvl_tpu.ops.cache_update import (
            cache_append_stacked,
            cache_append_stacked_reference,
        )

        rng = np.random.RandomState(0)
        cache = jnp.asarray(rng.randn(3, 2, 4, 64, 128), jnp.float32)
        new = jnp.asarray(rng.randn(2, 4, 128), jnp.float32)
        pos = jnp.asarray([7, 33], jnp.int32)
        for layer in (0, 1, 2):
            ref = cache_append_stacked_reference(
                cache, new, pos, jnp.int32(layer))
            got = cache_append_stacked(cache, new, pos, jnp.int32(layer),
                                       interpret=True)
            np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_decode_stacked_interpret_parity(self):
        from gvl_tpu.ops.decode_attention import (
            decode_attention_stacked,
            decode_attention_stacked_reference,
        )

        rng = np.random.RandomState(1)
        L, B, Hkv, S, D, G = 3, 2, 2, 512, 128, 4
        k_all = jnp.asarray(rng.randn(L, B, Hkv, S, D), jnp.float32)
        v_all = jnp.asarray(rng.randn(L, B, Hkv, S, D), jnp.float32)
        q = jnp.asarray(rng.randn(B, Hkv * G, D), jnp.float32)
        lengths = jnp.asarray([17, 300], jnp.int32)
        for layer in (0, 2):
            ref = decode_attention_stacked_reference(
                q, k_all, v_all, lengths, jnp.int32(layer))
            got = decode_attention_stacked(
                q, k_all, v_all, lengths, jnp.int32(layer),
                interpret=True)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       atol=2e-5, rtol=2e-5)


class TestStackedCarryDecode:
    def test_scan_engine_stacked_carry_matches_unrolled(self):
        """scan_layers decode (stacked-carry in-place path on the
        reference branch) equals the unrolled engine token-for-token."""
        import dataclasses

        import jax as _jax

        from gvl_tpu.models.qwen3 import Qwen3Config, Qwen3Engine, Qwen3Model

        cfg = Qwen3Config.tiny(max_cache_length=64, head_dim=128,
                               hidden_size=256, num_heads=4, num_kv_heads=2)
        model = Qwen3Model(cfg)
        variables = {"params": model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))["params"]}
        expected = Qwen3Engine(cfg, variables, eos_token_id=-1,
                               dtype=jnp.float32).generate(
            [5, 2, 9, 1], max_new_tokens=6, temperature=0.0)

        params = variables["params"]
        layer_names = sorted(
            (k for k in params if k.startswith("layers_")),
            key=lambda s: int(s.split("_")[1]))
        stacked = _jax.tree.map(
            lambda *xs: jnp.stack(xs), *[params[n] for n in layer_names])
        scan_params = {k: v for k, v in params.items()
                       if not k.startswith("layers_")}
        scan_params["layers"] = {"layer": stacked}
        cfg_scan = dataclasses.replace(cfg, scan_layers=True)
        got = Qwen3Engine(cfg_scan, {"params": scan_params},
                          eos_token_id=-1, dtype=jnp.float32).generate(
            [5, 2, 9, 1], max_new_tokens=6, temperature=0.0)
        assert got == expected


class TestDecodePathParity:
    def test_model_decode_same_with_and_without_append_kernel(self):
        """CPU: both settings take the reference path via
        platform_dependent — tokens must be identical (the flag only
        changes the TPU lowering)."""
        import dataclasses

        from gvl_tpu.models.qwen3 import Qwen3Config, Qwen3Engine, Qwen3Model

        cfg_on = Qwen3Config.tiny(max_cache_length=64, head_dim=128,
                                  hidden_size=256, num_heads=2,
                                  num_kv_heads=2)
        model = Qwen3Model(cfg_on)
        variables = {"params": model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))["params"]}
        out_on = Qwen3Engine(cfg_on, variables, eos_token_id=-1,
                             dtype=jnp.float32).generate(
            [3, 1, 4], max_new_tokens=6, temperature=0.0)
        cfg_off = dataclasses.replace(cfg_on,
                                      use_cache_append_kernel=False)
        out_off = Qwen3Engine(cfg_off, variables, eos_token_id=-1,
                              dtype=jnp.float32).generate(
            [3, 1, 4], max_new_tokens=6, temperature=0.0)
        assert out_on == out_off
