"""Decode-attention kernel (interpret mode) vs masked-einsum reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gvl_tpu.ops.decode_attention import (
    decode_attention,
    decode_attention_reference,
)


def setup(b=2, hq=8, hkv=2, s_max=256, d=64, seed=0):
    key = jax.random.PRNGKey(seed)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, hq, d))
    k = jax.random.normal(kk, (b, hkv, s_max, d))
    v = jax.random.normal(kv, (b, hkv, s_max, d))
    return q, k, v


class TestDecodeAttention:
    @pytest.mark.parametrize("lengths", [[1, 1], [100, 37], [256, 256]])
    def test_matches_reference(self, lengths):
        q, k, v = setup()
        lens = jnp.asarray(lengths, jnp.int32)
        out = decode_attention(q, k, v, lens, block_k=64, interpret=True)
        ref = decode_attention_reference(q, k, v, lens)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    def test_unequal_lengths_isolated_per_slot(self):
        """Slot b only sees its own prefix: changing slot 1's tail must not
        affect slot 0's output."""
        q, k, v = setup()
        lens = jnp.asarray([50, 200], jnp.int32)
        out_a = decode_attention(q, k, v, lens, block_k=64, interpret=True)
        k2 = k.at[1, :, 100:].set(999.0)
        v2 = v.at[1, :, 100:].set(999.0)
        out_b = decode_attention(q, k2, v2, lens, block_k=64, interpret=True)
        np.testing.assert_array_equal(np.asarray(out_a[0]),
                                      np.asarray(out_b[0]))
        assert not np.allclose(np.asarray(out_a[1]), np.asarray(out_b[1]))

    def test_beyond_length_ignored(self):
        """Garbage past the live prefix never leaks into the output."""
        q, k, v = setup()
        lens = jnp.asarray([64, 128], jnp.int32)
        k_dirty = k.at[:, :, 130:].set(jnp.nan)
        v_dirty = v.at[:, :, 130:].set(jnp.nan)
        out = decode_attention(q, k_dirty, v_dirty, lens, block_k=64,
                               interpret=True)
        assert np.isfinite(np.asarray(out)).all()

    def test_gqa_grouping_matches_mha(self):
        """Hkv == Hq degenerates to plain per-head attention."""
        q, k, v = setup(hq=4, hkv=4)
        lens = jnp.asarray([128, 77], jnp.int32)
        out = decode_attention(q, k, v, lens, block_k=64, interpret=True)
        ref = decode_attention_reference(q, k, v, lens)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    def test_bf16(self):
        q, k, v = (x.astype(jnp.bfloat16) for x in setup())
        lens = jnp.asarray([100, 200], jnp.int32)
        out = decode_attention(q, k, v, lens, block_k=64, interpret=True)
        ref = decode_attention_reference(q, k, v, lens)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            atol=3e-2, rtol=3e-2)
