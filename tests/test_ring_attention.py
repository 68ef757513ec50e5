"""Ring attention (sequence parallel) vs full attention on the 8-dev mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from gvl_tpu.ops.attention import attention_reference
from gvl_tpu.ops.ring_attention import ring_attention
from gvl_tpu.parallel import build_mesh


def make_qkv(b=2, h=4, s=256, d=32, seed=0):
    key = jax.random.PRNGKey(seed)
    kq, kk, kv = jax.random.split(key, 3)
    return (jax.random.normal(kq, (b, h, s, d)),
            jax.random.normal(kk, (b, h, s, d)),
            jax.random.normal(kv, (b, h, s, d)))


@pytest.fixture(scope="module")
def mesh():
    return build_mesh(8, 1)  # 8-way sequence axis named "data"


class TestRingAttention:
    @pytest.mark.parametrize("causal", [True, False])
    def test_matches_full_attention(self, mesh, causal):
        q, k, v = make_qkv()
        out = ring_attention(q, k, v, mesh, axis_name="data", causal=causal)
        ref = attention_reference(q, k, v, causal=causal)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    def test_sharded_inputs_stay_sharded(self, mesh):
        q, k, v = make_qkv()
        spec = NamedSharding(mesh, P(None, None, "data", None))
        q, k, v = (jax.device_put(x, spec) for x in (q, k, v))
        out = jax.jit(
            lambda q, k, v: ring_attention(q, k, v, mesh, causal=True)
        )(q, k, v)
        assert out.sharding.spec == P(None, None, "data", None)
        ref = attention_reference(
            np.asarray(q), np.asarray(k), np.asarray(v), causal=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    def test_causal_first_token_attends_self_only(self, mesh):
        q, k, v = make_qkv(s=64)
        out = ring_attention(q, k, v, mesh, causal=True)
        np.testing.assert_allclose(
            np.asarray(out[:, :, 0]), np.asarray(v[:, :, 0]), atol=1e-5)

    def test_grad_flows(self, mesh):
        q, k, v = make_qkv(b=1, h=2, s=64, d=16)

        def loss(q, k, v):
            return jnp.sum(
                ring_attention(q, k, v, mesh, causal=True) ** 2)

        def ref_loss(q, k, v):
            return jnp.sum(attention_reference(q, k, v, causal=True) ** 2)

        g = jax.grad(loss)(q, k, v)
        g_ref = jax.grad(ref_loss)(q, k, v)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                                   atol=1e-3, rtol=1e-3)
