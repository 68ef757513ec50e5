"""Mesh construction and sharding rules on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from gvl_tpu.config import load_preset
from gvl_tpu.parallel import (
    MeshManager,
    build_mesh,
    shard_pytree,
)
from gvl_tpu.parallel.sharding import LLM_RULES, ShardingRules, sharding_tree


@pytest.fixture(scope="module")
def devices():
    return jax.devices()


class TestMesh:
    def test_eight_devices_available(self, devices):
        assert len(devices) == 8

    def test_exact_fit(self):
        mesh = build_mesh(2, 4)
        assert mesh.shape == {"data": 2, "model": 4}

    def test_shrinks_to_fit(self):
        mesh = build_mesh(4, 4)  # 16 requested, 8 available
        assert mesh.shape["data"] * mesh.shape["model"] == 8
        assert mesh.shape["model"] == 4  # model axis preserved

    def test_single_device(self):
        mm = MeshManager.single_device()
        assert mm.num_devices == 1

    def test_strict_raises(self):
        with pytest.raises(ValueError):
            build_mesh(3, 3, strict=True)

    def test_from_preset(self):
        mm = MeshManager.from_preset(load_preset("full"))
        assert mm.data_size == 2 and mm.model_size == 4
        assert "8" in mm.describe()

    def test_pad_batch(self):
        mm = MeshManager.from_preset(load_preset("full"))
        assert mm.pad_batch(3) == 4
        assert mm.pad_batch(4) == 4


class TestShardingRules:
    def test_llm_rules_match(self):
        assert LLM_RULES.spec("model/layers_0/attention/q_proj/kernel") == P(None, "model")
        assert LLM_RULES.spec("model/layers_0/attention/o_proj/kernel") == P("model", None)
        assert LLM_RULES.spec("model/layers_0/mlp/down_proj/kernel") == P("model", None)
        assert LLM_RULES.spec("model/layers_0/input_norm/scale") == P()

    def test_first_match_wins(self):
        rules = ShardingRules([(r"a/b", P("model")), (r"a", P("data"))])
        assert rules.spec("a/b") == P("model")
        assert rules.spec("a/c") == P("data")

    def test_shard_pytree_places_leaves(self):
        mesh = build_mesh(2, 4)
        params = {
            "attention": {"q_proj": {"kernel": jnp.zeros((64, 128))}},
            "norm": {"scale": jnp.ones((64,))},
        }
        sharded = shard_pytree(params, mesh, LLM_RULES)
        qk = sharded["attention"]["q_proj"]["kernel"]
        assert qk.sharding.spec == P(None, "model")
        # each model-shard holds 128/4 = 32 columns
        shard_shapes = {s.data.shape for s in qk.addressable_shards}
        assert shard_shapes == {(64, 32)}
        assert sharded["norm"]["scale"].sharding.spec == P()

    def test_non_divisible_axis_dropped(self):
        mesh = build_mesh(2, 4)
        params = {"attention": {"q_proj": {"kernel": jnp.zeros((64, 130))}}}
        tree = sharding_tree(params, mesh, LLM_RULES)
        assert tree["attention"]["q_proj"]["kernel"].spec == P()

    def test_scan_stacked_params_right_aligned(self):
        mesh = build_mesh(2, 4)
        params = {"attention": {"q_proj": {"kernel": jnp.zeros((12, 64, 128))}}}
        tree = sharding_tree(params, mesh, LLM_RULES)
        assert tree["attention"]["q_proj"]["kernel"].spec == P(None, None, "model")

    def test_data_parallel_matmul_executes(self):
        """pjit a toy step over the 2x4 mesh and check it runs + matches."""
        mesh = build_mesh(2, 4)
        mm = MeshManager(mesh)
        w = jnp.eye(16, dtype=jnp.float32) * 2.0
        x = jnp.arange(8 * 16, dtype=jnp.float32).reshape(8, 16)
        xs = jax.device_put(x, mm.data_sharding(2))
        ws = jax.device_put(w, mm.replicated_sharding())

        @jax.jit
        def step(x, w):
            return x @ w

        out = step(xs, ws)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x) * 2.0)


class TestDataParallelPerception:
    """Frames shard over the mesh's data axis; results match 1-device."""

    def test_segmenter_dp_matches_single(self):
        import numpy as np

        from gvl_tpu.parallel import build_mesh
        from gvl_tpu.perception.segmenter import (
            JaxSegmenterBackend,
            SAMConfig,
        )

        config = SAMConfig(image_size=64)
        single = JaxSegmenterBackend(config)
        mesh = build_mesh(data=8, model=1)
        dp = JaxSegmenterBackend(config, variables=single.variables,
                                 mesh=mesh)
        rng = np.random.RandomState(0)
        frames = [rng.randint(0, 255, (48, 64, 3), np.uint8)
                  for _ in range(5)]   # 5 % 8 != 0: exercises padding
        concepts = ["player", "enemy"]
        a = single(frames, concepts, list(range(5)))
        b = dp(frames, concepts, list(range(5)))
        assert len(a) == len(b) == 5
        for fa, fb in zip(a, b):
            for ca, cb in zip(fa, fb):
                assert len(ca) == len(cb)
                for da, db in zip(ca, cb):
                    np.testing.assert_array_equal(
                        da["mask"].mask, db["mask"].mask)
                    assert da["mask"].confidence == pytest.approx(
                        db["mask"].confidence, abs=1e-5)

    def test_siglip_dp_matches_single(self):
        import numpy as np

        from gvl_tpu.models.siglip import SigLIPVisionConfig, SigLIPVisionTower
        from gvl_tpu.parallel import build_mesh
        from gvl_tpu.perception.semantic import JaxSigLIPBackend

        cfg = SigLIPVisionConfig.tiny(image_size=56)
        tower = SigLIPVisionTower(cfg)
        variables = jax.jit(tower.init)(
            jax.random.PRNGKey(0), jnp.ones((1, 56, 56, 3)))
        single = JaxSigLIPBackend(tower, variables, dtype="float32")
        mesh = build_mesh(data=8, model=1)
        dp = JaxSigLIPBackend(tower, variables, dtype="float32", mesh=mesh)
        rng = np.random.RandomState(1)
        batch = rng.randint(0, 255, (6, 56, 56, 3)).astype(np.uint8)
        _, ref = single(batch)
        _, out = dp(batch)
        assert out.shape == ref.shape == (6, cfg.hidden_size)
        np.testing.assert_allclose(out, ref, atol=1e-5)


class TestInt8TPSharding:
    def test_int8_tp_decode_matches_unsharded(self):
        """TP-sharded int8 model == unsharded int8 (virtual 8-dev mesh)."""
        import dataclasses

        import numpy as np

        from gvl_tpu.models.qwen3 import (
            Qwen3Config,
            Qwen3Engine,
            Qwen3Model,
            quantize_int8,
        )
        from gvl_tpu.parallel import build_mesh
        from gvl_tpu.parallel.sharding import LLM_RULES, shard_pytree

        cfg = Qwen3Config.tiny(max_cache_length=64)
        model = Qwen3Model(cfg)
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 8), jnp.int32))["params"]
        qparams = quantize_int8(params, cfg)
        cfg_q = dataclasses.replace(cfg, quant_int8=True)

        ref = Qwen3Engine(cfg_q, {"params": qparams}, eos_token_id=-1,
                          dtype=jnp.float32)
        expected = ref.generate([7, 3, 99], max_new_tokens=6,
                                temperature=0.0)

        mesh = build_mesh(data=1, model=8)
        sharded = shard_pytree(qparams, mesh, LLM_RULES)
        # every int8 kernel got a real (non-replicated) model sharding
        from jax.sharding import PartitionSpec as P

        flat = jax.tree_util.tree_leaves_with_path(sharded)
        q_specs = [leaf.sharding.spec for path, leaf in flat
                   if getattr(path[-1], "key", "") == "kernel_q"]
        assert q_specs and all(
            "model" in str(spec) for spec in q_specs)

        tp = Qwen3Engine(cfg_q, {"params": sharded}, eos_token_id=-1,
                         dtype=jnp.float32)
        assert tp.generate([7, 3, 99], max_new_tokens=6,
                           temperature=0.0) == expected

    def test_tp_stacked_carry_decode_matches_unsharded(self):
        """The stacked-carry in-place decode path (scan_layers +
        use_cache_append_kernel + head_dim 128, the round-3 default at
        8B geometry) under model-parallel sharding of the kv-head axis
        must equal both the unsharded stacked engine and the
        non-stacked path.  Closes the ROADMAP TP caveat at executed
        (not just AOT-lowered) level — CPU mesh takes the reference
        kernels via platform_dependent, so this validates the GSPMD
        partitioning of the stacked cache carry."""
        import dataclasses

        from gvl_tpu.models.qwen3 import Qwen3Config, Qwen3Engine
        from gvl_tpu.parallel import build_mesh
        from gvl_tpu.parallel.sharding import LLM_RULES, shard_pytree

        cfg = Qwen3Config.tiny(
            hidden_size=128, num_heads=8, num_kv_heads=4, head_dim=128,
            intermediate_size=256, vocab_size=512, max_cache_length=64,
            scan_layers=True, use_cache_append_kernel=True)
        assert cfg.head_dim % 128 == 0  # stacked-carry branch condition

        from gvl_tpu.models.qwen3 import Qwen3Model

        params = Qwen3Model(cfg).init(
            jax.random.PRNGKey(1), jnp.zeros((1, 8), jnp.int32))["params"]

        ref = Qwen3Engine(cfg, {"params": params}, eos_token_id=-1,
                          dtype=jnp.float32)
        expected = ref.generate([7, 3, 99], max_new_tokens=6,
                                temperature=0.0)

        # non-stacked path agrees (flag off)
        cfg_off = dataclasses.replace(cfg, use_cache_append_kernel=False)
        off = Qwen3Engine(cfg_off, {"params": params}, eos_token_id=-1,
                          dtype=jnp.float32)
        assert off.generate([7, 3, 99], max_new_tokens=6,
                            temperature=0.0) == expected

        # kv-heads (4) divide the model axis (4): real head partition
        mesh = build_mesh(data=2, model=4)
        sharded = shard_pytree(params, mesh, LLM_RULES)
        q_specs = [
            leaf.sharding.spec
            for path, leaf in jax.tree_util.tree_leaves_with_path(sharded)
            if getattr(path[-1], "key", "") == "kernel"
            and any(getattr(p, "key", "") == "k_proj" for p in path)
        ]
        assert q_specs and all("model" in str(s) for s in q_specs)

        tp = Qwen3Engine(cfg, {"params": sharded}, eos_token_id=-1,
                         dtype=jnp.float32)
        assert tp.generate([7, 3, 99], max_new_tokens=6,
                           temperature=0.0) == expected


class TestInitDistributed:
    def test_single_process_noop(self, monkeypatch):
        from gvl_tpu.parallel import init_distributed

        for var in ("JAX_COORDINATOR_ADDRESS", "TPU_WORKER_HOSTNAMES",
                    "MEGASCALE_COORDINATOR_ADDRESS"):
            monkeypatch.delenv(var, raising=False)
        assert init_distributed() is False  # no coordinator: no-op


class TestCacheShardingPreserved:
    """VERDICT r3 #6: the KV cache's explicit NamedSharding must survive
    a decode step (no GSPMD involuntary rematerialization of the cache —
    the sharding is pinned via Qwen3Engine out_shardings)."""

    def test_stacked_cache_sharding_through_decode_step(self):
        from gvl_tpu.models.qwen3 import (
            KVCache,
            Qwen3Config,
            Qwen3Engine,
            Qwen3Model,
        )
        from gvl_tpu.parallel import build_mesh
        from gvl_tpu.parallel.sharding import LLM_RULES, shard_pytree

        mesh = build_mesh(1, 4)
        cfg = Qwen3Config.tiny(num_heads=8, num_kv_heads=8, head_dim=16,
                               scan_layers=True, max_cache_length=64)
        model = Qwen3Model(cfg)
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 4), jnp.int32))["params"]
        engine = Qwen3Engine(cfg, {"params": shard_pytree(
            params, mesh, LLM_RULES)}, eos_token_id=-1,
            dtype=jnp.float32, mesh=mesh)

        want = engine._cache_sharding()
        assert "model" in str(want.spec)
        cache = engine._shard_cache(
            KVCache.zeros(cfg, batch=1, dtype=jnp.float32))
        assert cache.k.sharding.is_equivalent_to(want, cache.k.ndim)

        step = engine._step_fn((0.0, 1.0, 1))
        token = jnp.zeros((1,), jnp.int32)
        _, new_cache = step(engine.variables, token, cache,
                            jax.random.PRNGKey(0))
        assert new_cache.k.sharding.is_equivalent_to(want, new_cache.k.ndim)
        assert new_cache.v.sharding.is_equivalent_to(want, new_cache.v.ndim)

    def test_tp_decode_matches_unsharded_with_mesh(self):
        from gvl_tpu.models.qwen3 import Qwen3Config, Qwen3Engine, Qwen3Model
        from gvl_tpu.parallel import build_mesh
        from gvl_tpu.parallel.sharding import LLM_RULES, shard_pytree

        cfg = Qwen3Config.tiny(num_heads=8, num_kv_heads=8, head_dim=16)
        model = Qwen3Model(cfg)
        params = model.init(jax.random.PRNGKey(1),
                            jnp.zeros((1, 4), jnp.int32))["params"]
        ref = Qwen3Engine(cfg, {"params": params}, eos_token_id=-1,
                          dtype=jnp.float32)
        expected = ref.generate([5, 9, 2], max_new_tokens=5, temperature=0.0)
        mesh = build_mesh(2, 4)
        tp = Qwen3Engine(cfg, {"params": shard_pytree(params, mesh,
                                                      LLM_RULES)},
                         eos_token_id=-1, dtype=jnp.float32, mesh=mesh)
        assert tp.generate([5, 9, 2], max_new_tokens=5,
                           temperature=0.0) == expected
