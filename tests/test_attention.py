"""Flash attention kernel (interpret mode) vs jnp reference."""

import numpy as np
import jax.numpy as jnp

from text_similarity_tpu.ops.attention import attention_reference, flash_attention


def _qkv(b=2, s=128, h=4, d=32, seed=0):
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(b, s, h, d), jnp.float32) * 0.5
    k = jnp.asarray(rng.randn(b, s, h, d), jnp.float32) * 0.5
    v = jnp.asarray(rng.randn(b, s, h, d), jnp.float32)
    return q, k, v


def test_flash_matches_reference_full_mask():
    q, k, v = _qkv()
    ref = attention_reference(q, k, v)
    out = flash_attention(q, k, v, block_q=64, block_k=64, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_flash_matches_reference_padded():
    q, k, v = _qkv(seed=1)
    mask = np.ones((2, 128), np.int32)
    mask[0, 100:] = 0
    mask[1, 64:] = 0
    m = jnp.asarray(mask)
    ref = np.asarray(attention_reference(q, k, v, m))
    out = np.asarray(flash_attention(q, k, v, m, block_q=64, block_k=64, interpret=True))
    keep = mask.astype(bool)
    np.testing.assert_allclose(out[keep], ref[keep], atol=1e-5)
