"""Flash-attention kernel vs XLA reference (interpret mode on CPU)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gvl_tpu.ops.attention import (
    attention_reference,
    dot_product_attention,
    flash_attention,
)
from gvl_tpu.ops.rope import apply_rope, rope_angles

flash_interp = functools.partial(flash_attention, interpret=True)


def rand_qkv(key, b, hq, hkv, sq, sk, d, dtype=jnp.float32):
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, hq, sq, d), dtype)
    k = jax.random.normal(kk, (b, hkv, sk, d), dtype)
    v = jax.random.normal(kv, (b, hkv, sk, d), dtype)
    return q, k, v


class TestFlashKernel:
    @pytest.mark.parametrize("causal", [False, True])
    def test_matches_reference_aligned(self, causal):
        q, k, v = rand_qkv(jax.random.PRNGKey(0), 2, 4, 4, 256, 256, 128)
        out = flash_interp(q, k, v, causal=causal)
        ref = attention_reference(q, k, v, causal=causal)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    def test_unaligned_seq_and_head_dim(self):
        # 72 = SigLIP-so400m head dim; 200/190 exercise seq padding
        q, k, v = rand_qkv(jax.random.PRNGKey(1), 1, 2, 2, 200, 190, 72)
        out = flash_interp(q, k, v)
        ref = attention_reference(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    def test_gqa_grouping(self):
        q, k, v = rand_qkv(jax.random.PRNGKey(2), 1, 8, 2, 128, 128, 64)
        out = flash_interp(q, k, v, causal=True)
        ref = attention_reference(q, k, v, causal=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    def test_kv_len_masks_padded_keys(self):
        q, k, v = rand_qkv(jax.random.PRNGKey(3), 1, 2, 2, 128, 256, 64)
        out = flash_interp(q, k, v, kv_len=100)
        ref = attention_reference(q, k[:, :, :100], v[:, :, :100])
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    def test_bfloat16_io(self):
        q, k, v = rand_qkv(jax.random.PRNGKey(4), 1, 2, 2, 128, 128, 128,
                           dtype=jnp.bfloat16)
        out = flash_interp(q, k, v, causal=True)
        assert out.dtype == jnp.bfloat16
        ref = attention_reference(q.astype(jnp.float32), k.astype(jnp.float32),
                                  v.astype(jnp.float32), causal=True)
        np.testing.assert_allclose(np.asarray(out, dtype=np.float32),
                                   np.asarray(ref), atol=3e-2, rtol=3e-2)

    def test_causal_first_row_attends_only_self(self):
        q, k, v = rand_qkv(jax.random.PRNGKey(5), 1, 1, 1, 128, 128, 64)
        out = flash_interp(q, k, v, causal=True)
        np.testing.assert_allclose(
            np.asarray(out[0, 0, 0]), np.asarray(v[0, 0, 0]), atol=1e-5
        )


class TestDispatcherAndGrad:
    def test_cpu_dispatch_runs_reference(self):
        q, k, v = rand_qkv(jax.random.PRNGKey(6), 1, 2, 2, 64, 64, 32)
        out = dot_product_attention(q, k, v, causal=True)
        ref = attention_reference(q, k, v, causal=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)

    def test_gradients_match_autodiff(self):
        q, k, v = rand_qkv(jax.random.PRNGKey(7), 1, 2, 1, 32, 48, 16)

        def loss_custom(q, k, v):
            return jnp.sum(dot_product_attention(q, k, v, causal=True) ** 2)

        def loss_ref(q, k, v):
            return jnp.sum(attention_reference(q, k, v, causal=True) ** 2)

        g_custom = jax.grad(loss_custom, argnums=(0, 1, 2))(q, k, v)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for gc, gr in zip(g_custom, g_ref):
            np.testing.assert_allclose(np.asarray(gc), np.asarray(gr),
                                       atol=1e-4, rtol=1e-4)

    def test_jit_compiles(self):
        q, k, v = rand_qkv(jax.random.PRNGKey(8), 1, 2, 2, 64, 64, 32)
        f = jax.jit(lambda q, k, v: dot_product_attention(q, k, v))
        out = f(q, k, v)
        assert out.shape == q.shape

    @pytest.mark.parametrize("causal,kv_len", [(True, None), (False, None),
                                               (False, 40), (True, 50)])
    def test_blockwise_backward_matches_dense(self, causal, kv_len):
        """The flash-style q-block-scan backward (used automatically once
        the score matrix would dominate HBM — e.g. seq-4096 QA-LM
        training) must produce the same gradients as the dense path,
        including on a seq that does NOT divide the block size."""
        from gvl_tpu.ops.attention import _bwd_blockwise, _bwd_dense

        key = jax.random.PRNGKey(11)
        q, k, v = rand_qkv(key, 2, 3, 3, 53, 61, 16)  # uneven seqs
        g = jax.random.normal(jax.random.fold_in(key, 1), q.shape,
                              dtype=q.dtype)
        scale = 1.0 / np.sqrt(q.shape[-1])
        dense = _bwd_dense(q, k, v, g, causal, scale, kv_len)
        block = _bwd_blockwise(q, k, v, g, causal, scale, kv_len,
                               block_q=16)  # 53 % 16 != 0 → pad branch
        for d, b in zip(dense, block):
            np.testing.assert_allclose(np.asarray(b), np.asarray(d),
                                       atol=1e-4, rtol=1e-4)

    def test_blockwise_backward_gqa_end_to_end(self):
        """Force the blockwise path through the public custom_vjp by
        shrinking the dense-score threshold; gradients must match the
        pure-XLA reference including the GQA group-sum."""
        from gvl_tpu.ops import attention as attn_mod

        q, k, v = rand_qkv(jax.random.PRNGKey(12), 1, 4, 2, 48, 64, 16)

        def loss_custom(q, k, v):
            return jnp.sum(dot_product_attention(q, k, v, causal=True) ** 2)

        def loss_ref(q, k, v):
            return jnp.sum(attention_reference(q, k, v, causal=True) ** 2)

        old = attn_mod._BWD_DENSE_MAX_SCORES
        attn_mod._BWD_DENSE_MAX_SCORES = 1  # force blockwise
        try:
            g_custom = jax.grad(loss_custom, argnums=(0, 1, 2))(q, k, v)
        finally:
            attn_mod._BWD_DENSE_MAX_SCORES = old
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for gc, gr in zip(g_custom, g_ref):
            np.testing.assert_allclose(np.asarray(gc), np.asarray(gr),
                                       atol=1e-4, rtol=1e-4)


class TestRope:
    def test_rope_preserves_norm(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 16, 64))
        cos, sin = rope_angles(jnp.arange(16), 64)
        y = apply_rope(x, cos, sin)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(x), axis=-1),
            np.linalg.norm(np.asarray(y), axis=-1),
            rtol=1e-5,
        )

    def test_rope_relative_property(self):
        """<rope(q,m), rope(k,n)> depends only on m-n."""
        d = 32
        q = jax.random.normal(jax.random.PRNGKey(1), (d,))
        k = jax.random.normal(jax.random.PRNGKey(2), (d,))

        def dot_at(m, n):
            cq, sq = rope_angles(jnp.array([m]), d)
            ck, sk = rope_angles(jnp.array([n]), d)
            qr = apply_rope(q[None], cq, sq)[0]
            kr = apply_rope(k[None], ck, sk)[0]
            return float(jnp.dot(qr, kr))

        assert abs(dot_at(5, 3) - dot_at(12, 10)) < 1e-4
        assert abs(dot_at(5, 3) - dot_at(6, 3)) > 1e-4
