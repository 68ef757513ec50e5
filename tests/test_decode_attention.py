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


class TestChunkKernel:
    """Length-clamped chunk kernel (interpret mode) vs the masked einsum."""

    def _mk(self, batch=2, hkv=2, group=2, s_max=256, chunk=5, d=64, seed=0):
        rng = np.random.default_rng(seed)
        q = jnp.asarray(rng.standard_normal(
            (batch, hkv * group, chunk, d)), jnp.float32)
        k = jnp.asarray(rng.standard_normal(
            (batch, hkv, s_max, d)), jnp.float32)
        v = jnp.asarray(rng.standard_normal(
            (batch, hkv, s_max, d)), jnp.float32)
        return q, k, v

    def test_matches_reference(self):
        from gvl_tpu.ops.decode_attention import (
            chunk_attention, chunk_attention_reference)

        q, k, v = self._mk()
        start = jnp.asarray([37, 128], jnp.int32)
        got = chunk_attention(q, k, v, start, block_k=64, interpret=True)
        want = chunk_attention_reference(q, k, v, start)
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    def test_start_zero_pure_causal(self):
        from gvl_tpu.ops.decode_attention import (
            chunk_attention, chunk_attention_reference)

        q, k, v = self._mk(chunk=8, seed=3)
        start = jnp.zeros((2,), jnp.int32)
        got = chunk_attention(q, k, v, start, block_k=64, interpret=True)
        want = chunk_attention_reference(q, k, v, start)
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    def test_garbage_past_live_region_ignored(self):
        from gvl_tpu.ops.decode_attention import chunk_attention

        q, k, v = self._mk(seed=5)
        start = jnp.asarray([10, 60], jnp.int32)
        out_a = chunk_attention(q, k, v, start, block_k=64, interpret=True)
        # poison keys/values beyond each row's reachable region
        k2 = k.at[0, :, 16:].set(1e9).at[1, :, 66:].set(-1e9)
        v2 = v.at[0, :, 16:].set(1e9).at[1, :, 66:].set(-1e9)
        out_b = chunk_attention(q, k2, v2, start, block_k=64,
                                interpret=True)
        np.testing.assert_allclose(out_a, out_b, rtol=1e-6, atol=1e-6)

    def test_row_guard(self):
        from gvl_tpu.ops.decode_attention import chunk_attention

        q, k, v = self._mk(chunk=5)
        big_q = jnp.zeros((2, 4, 512, 64), jnp.float32)  # rows = 1024
        with pytest.raises(ValueError):
            chunk_attention(big_q, k, v, jnp.zeros((2,), jnp.int32),
                            interpret=True)
