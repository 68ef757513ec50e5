"""Shared transformer blocks: shapes, param naming, both families."""

import jax
import jax.numpy as jnp
import numpy as np

from gvl_tpu.nn import Attention, RMSNorm, TransformerBlock, TransformerStack
from gvl_tpu.parallel import build_mesh
from gvl_tpu.parallel.sharding import LLM_RULES, VIT_RULES, sharding_tree, tree_paths
from jax.sharding import PartitionSpec as P


class TestBlocks:
    def test_rmsnorm_unit_scale(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 16)) * 5
        mod = RMSNorm()
        params = mod.init(jax.random.PRNGKey(1), x)
        y = mod.apply(params, x)
        rms = np.sqrt(np.mean(np.asarray(y) ** 2, axis=-1))
        np.testing.assert_allclose(rms, 1.0, atol=1e-4)

    def test_attention_self_and_cross(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 10, 64))
        ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 7, 64))
        mod = Attention(num_heads=4)
        params = mod.init(jax.random.PRNGKey(2), x)
        self_out = mod.apply(params, x)
        cross_out = mod.apply(params, x, ctx)
        assert self_out.shape == x.shape
        assert cross_out.shape == x.shape
        assert not np.allclose(np.asarray(self_out), np.asarray(cross_out))

    def test_gqa_param_shapes(self):
        x = jnp.zeros((1, 4, 128))
        mod = Attention(num_heads=8, num_kv_heads=2, head_dim=32,
                        use_bias=False, qk_norm=True, rope=True)
        params = mod.init(jax.random.PRNGKey(0), x)["params"]
        assert params["q_proj"]["kernel"].shape == (128, 256)
        assert params["k_proj"]["kernel"].shape == (128, 64)
        assert params["q_norm"]["scale"].shape == (32,)

    def test_decoder_block_param_names_match_llm_rules(self):
        block = TransformerBlock(
            num_heads=4, intermediate_dim=128, norm="rmsnorm", mlp="swiglu",
            causal=True, rope=True, qk_norm=True, use_bias=False,
        )
        params = block.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 64)))
        mesh = build_mesh(2, 4)
        tree = sharding_tree(params, mesh, LLM_RULES)
        flat = dict(zip(tree_paths(params), jax.tree.leaves(tree)))
        qk = next(v for k, v in flat.items() if "q_proj/kernel" in k)
        down = next(v for k, v in flat.items() if "down_proj/kernel" in k)
        assert qk.spec == P(None, "model")
        assert down.spec == P("model")

    def test_encoder_block_param_names_match_vit_rules(self):
        block = TransformerBlock(num_heads=4, intermediate_dim=128)
        params = block.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 64)))
        mesh = build_mesh(2, 4)
        tree = sharding_tree(params, mesh, VIT_RULES)
        flat = dict(zip(tree_paths(params), jax.tree.leaves(tree)))
        fc1 = next(v for k, v in flat.items() if "fc1/kernel" in k)
        assert fc1.spec == P(None, "model")

    def test_stack_forward_and_causality(self):
        stack = TransformerStack(
            num_layers=2, num_heads=4, intermediate_dim=128,
            norm="rmsnorm", mlp="swiglu", causal=True, rope=True,
            use_bias=False,
        )
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 12, 64))
        params = stack.init(jax.random.PRNGKey(1), x)
        y1 = stack.apply(params, x)
        # causality: perturbing a late token must not change early outputs
        x2 = x.at[:, 8:].set(0.0)
        y2 = stack.apply(params, x2)
        np.testing.assert_allclose(np.asarray(y1[:, :8]), np.asarray(y2[:, :8]),
                                   atol=1e-5)
        assert not np.allclose(np.asarray(y1[:, 8:]), np.asarray(y2[:, 8:]))

    def test_stack_jits(self):
        stack = TransformerStack(num_layers=2, num_heads=2, intermediate_dim=64)
        x = jnp.ones((2, 6, 32))
        params = stack.init(jax.random.PRNGKey(0), x)
        y = jax.jit(stack.apply)(params, x)
        assert y.shape == x.shape
