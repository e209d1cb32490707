"""Flash attention kernel (interpret mode) vs jnp reference."""

import numpy as np
import jax
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


def test_windowed_flash_matches_banded_reference():
    q, k, v = _qkv(seed=2)
    mask = np.ones((2, 128), np.int32)
    mask[1, 96:] = 0
    m = jnp.asarray(mask)
    ref = np.asarray(
        attention_reference(q, k, v, m, window=24, global_cls=False)
    )
    out = np.asarray(
        flash_attention(
            q, k, v, m, block_q=32, block_k=32, interpret=True, window=24
        )
    )
    keep = mask.astype(bool)
    np.testing.assert_allclose(out[keep], ref[keep], atol=1e-5)


def test_banded_reference_global_cls():
    q, k, v = _qkv(seed=3)
    full = np.asarray(attention_reference(q, k, v))
    band = np.asarray(
        attention_reference(q, k, v, window=8, global_cls=True)
    )
    # CLS (pos 0) attends everything → identical to full attention there
    np.testing.assert_allclose(band[:, 0], full[:, 0], atol=1e-5)
    # far positions differ (banded)
    assert not np.allclose(band[:, 64], full[:, 64])


def test_encoder_with_attention_window():
    from text_similarity_tpu.core.config import ARCH_PRESETS
    from text_similarity_tpu.core.precision import FP32_PRECISION
    from text_similarity_tpu.models import init_params, encoder_forward

    arch = ARCH_PRESETS["tiny-test"].replace(attention_window=8)
    params = init_params(jax.random.PRNGKey(0), arch)
    ids = jnp.asarray(
        np.random.RandomState(0).randint(5, arch.vocab_size, (2, 32)), jnp.int32
    )
    mask = jnp.ones((2, 32), jnp.int32)
    out = encoder_forward(params, ids, mask, arch=arch, precision=FP32_PRECISION)
    assert np.isfinite(np.asarray(out.last_hidden_state)).all()
    # local attention: changing a token far outside the window must not
    # change position 0's first-layer... use single layer arch for locality
    arch1 = arch.replace(num_layers=1)
    p1 = init_params(jax.random.PRNGKey(0), arch1)
    o1 = encoder_forward(p1, ids, mask, arch=arch1, precision=FP32_PRECISION)
    ids2 = ids.at[:, 31].set(7)
    o2 = encoder_forward(p1, ids2, mask, arch=arch1, precision=FP32_PRECISION)
    np.testing.assert_allclose(
        np.asarray(o1.last_hidden_state[:, 0]),
        np.asarray(o2.last_hidden_state[:, 0]),
        atol=1e-5,
    )
