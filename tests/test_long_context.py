"""Performer linear attention + ring attention (context parallelism)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from text_similarity_tpu.core.mesh import make_mesh, SEQ_AXIS
from text_similarity_tpu.ops.attention import attention_reference
from text_similarity_tpu.ops.performer import (
    orthogonal_random_features,
    performer_attention,
    performer_attention_causal,
)
from text_similarity_tpu.ops.ring_attention import ring_attention


def _qkv(b=2, s=64, h=2, d=32, seed=0, scale=0.3):
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(b, s, h, d) * scale, jnp.float32)
    k = jnp.asarray(rng.randn(b, s, h, d) * scale, jnp.float32)
    v = jnp.asarray(rng.randn(b, s, h, d), jnp.float32)
    return q, k, v


def test_performer_approximates_softmax():
    q, k, v = _qkv()
    proj = orthogonal_random_features(jax.random.PRNGKey(0), 256, 32)
    approx = np.asarray(performer_attention(q, k, v, proj))
    exact = np.asarray(attention_reference(q, k, v))
    # FAVOR+ is unbiased; with 256 features correlation should be high
    corr = np.corrcoef(approx.ravel(), exact.ravel())[0, 1]
    assert corr > 0.9, corr


def test_performer_respects_mask():
    q, k, v = _qkv(seed=1)
    mask = np.ones((2, 64), np.int32)
    mask[:, 40:] = 0
    proj = orthogonal_random_features(jax.random.PRNGKey(0), 128, 32)
    out_full = performer_attention(q, k, v, proj, jnp.asarray(mask))
    # masked keys must not influence the output: change them, output same
    k2 = k.at[:, 40:].set(99.0)
    v2 = v.at[:, 40:].set(-99.0)
    out_changed = performer_attention(q, k2, v2, proj, jnp.asarray(mask))
    np.testing.assert_allclose(
        np.asarray(out_full), np.asarray(out_changed), atol=1e-5
    )


def test_performer_causal_matches_exact_causal():
    """Chunked causal FAVOR+ must equal the O(n²) masked linear attention
    computed with the same features."""
    q, k, v = _qkv(b=1, s=96, h=2, d=16, seed=2)
    proj = orthogonal_random_features(jax.random.PRNGKey(1), 64, 16)
    out = np.asarray(performer_attention_causal(q, k, v, proj, chunk=32))

    # oracle: explicit causal-masked feature attention
    from text_similarity_tpu.ops.performer import softmax_kernel_features

    qf = np.asarray(softmax_kernel_features(q, proj, True))
    kf = np.asarray(softmax_kernel_features(k, proj, False))
    vn = np.asarray(v)
    s = np.einsum("bchm,bkhm->bhck", qf, kf)
    tri = np.tril(np.ones((96, 96)))
    s = s * tri[None, None]
    num = np.einsum("bhck,bkhd->bchd", s, vn)
    den = np.maximum(s.sum(-1).transpose(0, 2, 1), 1e-9)
    oracle = num / den[..., None]
    np.testing.assert_allclose(out, oracle, atol=1e-4, rtol=1e-3)


def test_performer_encoder_forward_runs():
    from text_similarity_tpu.core.config import ARCH_PRESETS
    from text_similarity_tpu.core.precision import FP32_PRECISION
    from text_similarity_tpu.models import init_params, encoder_forward

    arch = ARCH_PRESETS["tiny-test"].replace(
        attention_type="performer", performer_features=32
    )
    params = init_params(jax.random.PRNGKey(0), arch)
    ids = jnp.asarray(
        np.random.RandomState(0).randint(5, arch.vocab_size, (2, 24)), jnp.int32
    )
    mask = jnp.ones((2, 24), jnp.int32)
    out = encoder_forward(
        params, ids, mask, arch=arch, precision=FP32_PRECISION
    )
    assert np.isfinite(np.asarray(out.last_hidden_state)).all()


def test_ring_attention_matches_single_device(eight_devices):
    mesh = make_mesh(data=1, model=1, seq=8, index=1)
    b, s, h, d = 2, 128, 2, 16  # 16 tokens per device
    q, k, v = _qkv(b=b, s=s, h=h, d=d, seed=3)
    mask = np.ones((b, s), np.int32)
    mask[0, 100:] = 0
    m = jnp.asarray(mask)

    ref = np.asarray(attention_reference(q, k, v, m))

    fn = shard_map(
        lambda q_, k_, v_, m_: ring_attention(q_, k_, v_, m_, SEQ_AXIS),
        mesh=mesh,
        in_specs=(
            P(None, SEQ_AXIS, None, None),
            P(None, SEQ_AXIS, None, None),
            P(None, SEQ_AXIS, None, None),
            P(None, SEQ_AXIS),
        ),
        out_specs=P(None, SEQ_AXIS, None, None),
    )
    out = np.asarray(jax.jit(fn)(q, k, v, m))
    keep = mask.astype(bool)
    np.testing.assert_allclose(out[keep], ref[keep], atol=1e-5)


def test_ring_attention_gradients_match(eight_devices):
    """CP training capability: gradients through the ring (ppermute chain)
    must match single-device attention gradients."""
    mesh = make_mesh(data=1, model=1, seq=8, index=1)
    b, s, h, d = 1, 64, 2, 16
    q, k, v = _qkv(b=b, s=s, h=h, d=d, seed=5)
    m = jnp.ones((b, s), jnp.int32)

    def loss_ref(qkv):
        q_, k_, v_ = qkv
        return jnp.sum(attention_reference(q_, k_, v_, m) ** 2)

    ring_fn = shard_map(
        lambda q_, k_, v_, m_: ring_attention(q_, k_, v_, m_, SEQ_AXIS),
        mesh=mesh,
        in_specs=(
            P(None, SEQ_AXIS, None, None),
            P(None, SEQ_AXIS, None, None),
            P(None, SEQ_AXIS, None, None),
            P(None, SEQ_AXIS),
        ),
        out_specs=P(None, SEQ_AXIS, None, None),
    )

    def loss_ring(qkv):
        q_, k_, v_ = qkv
        return jnp.sum(ring_fn(q_, k_, v_, m) ** 2)

    g_ref = jax.grad(loss_ref)((q, k, v))
    g_ring = jax.grad(loss_ring)((q, k, v))
    for a, b_ in zip(g_ref, g_ring):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=2e-4, rtol=1e-3
        )


def test_relu_kernel_matches_quadratic_oracle():
    """Generalized (ReLU) kernel: linear-attention associativity must give
    the same result as the explicit quadratic form."""
    from text_similarity_tpu.ops.performer import (
        performer_attention, relu_kernel_features,
        orthogonal_random_features,
    )

    rng = np.random.RandomState(0)
    b, s, h, d, m = 2, 16, 2, 8, 16
    q = jnp.asarray(rng.randn(b, s, h, d), jnp.float32)
    k = jnp.asarray(rng.randn(b, s, h, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, s, h, d), jnp.float32)
    proj = orthogonal_random_features(jax.random.PRNGKey(0), m, d)
    out = np.asarray(performer_attention(q, k, v, proj, kernel="relu"))
    qf = np.asarray(relu_kernel_features(q, proj))
    kf = np.asarray(relu_kernel_features(k, proj))
    scores = np.einsum("bshm,bthm->bhst", qf, kf)
    expect = np.einsum("bhst,bthd->bshd", scores, np.asarray(v))
    expect /= np.maximum(scores.sum(-1), 1e-9).transpose(0, 2, 1)[..., None]
    np.testing.assert_allclose(out, expect, atol=1e-4)


def test_performer_feature_redraw_boundaries():
    from text_similarity_tpu.ops.performer import redraw_features

    key = jax.random.PRNGKey(42)
    p0 = np.asarray(redraw_features(key, 0, every=10, num_features=16, dim=8))
    p9 = np.asarray(redraw_features(key, 9, every=10, num_features=16, dim=8))
    p10 = np.asarray(redraw_features(key, 10, every=10, num_features=16, dim=8))
    np.testing.assert_array_equal(p0, p9)      # same epoch → same features
    assert not np.allclose(p0, p10)            # redraw at the boundary


def test_performer_local_global_mixed_heads():
    from text_similarity_tpu.ops.attention import (
        attention_reference, multi_head_attention,
    )
    from text_similarity_tpu.ops.performer import orthogonal_random_features

    rng = np.random.RandomState(1)
    b, s, h, d = 2, 32, 4, 8
    q = jnp.asarray(rng.randn(b, s, h, d), jnp.float32) * 0.3
    k = jnp.asarray(rng.randn(b, s, h, d), jnp.float32) * 0.3
    v = jnp.asarray(rng.randn(b, s, h, d), jnp.float32)
    proj = orthogonal_random_features(jax.random.PRNGKey(0), 32, d)

    # ALL heads local → exactly the banded reference
    out_all = multi_head_attention(
        q, k, v, impl="performer", performer_proj=proj,
        performer_local_heads=h, performer_local_window=8,
    )
    ref = attention_reference(q, k, v, window=8, global_cls=False)
    np.testing.assert_allclose(
        np.asarray(out_all), np.asarray(ref), atol=1e-5
    )

    # mixed: local heads equal the banded reference, global heads equal
    # pure performer
    out_mix = multi_head_attention(
        q, k, v, impl="performer", performer_proj=proj,
        performer_local_heads=2, performer_local_window=8,
    )
    np.testing.assert_allclose(
        np.asarray(out_mix[:, :, :2]), np.asarray(ref[:, :, :2]), atol=1e-5
    )
    out_perf = multi_head_attention(
        q, k, v, impl="performer", performer_proj=proj,
    )
    np.testing.assert_allclose(
        np.asarray(out_mix[:, :, 2:]), np.asarray(out_perf[:, :, 2:]),
        atol=1e-5,
    )


def test_encoder_performer_relu_and_redraw_run():
    from text_similarity_tpu.core.config import ARCH_PRESETS
    from text_similarity_tpu.core.precision import FP32_PRECISION
    from text_similarity_tpu.models import init_params, encoder_forward

    arch = ARCH_PRESETS["tiny-test"].replace(
        attention_type="performer", performer_kernel="relu",
        performer_redraw_every=5, performer_local_heads=1,
        performer_local_window=4,
    )
    p = init_params(jax.random.PRNGKey(0), arch)
    ids = jnp.asarray(
        np.random.RandomState(0).randint(5, arch.vocab_size, (2, 16)),
        jnp.int32,
    )
    mask = jnp.ones((2, 16), jnp.int32)
    o1 = encoder_forward(p, ids, mask, arch=arch, precision=FP32_PRECISION,
                         performer_step=0)
    o2 = encoder_forward(p, ids, mask, arch=arch, precision=FP32_PRECISION,
                         performer_step=7)
    a = np.asarray(o1.last_hidden_state)
    b_ = np.asarray(o2.last_hidden_state)
    assert np.isfinite(a).all() and np.isfinite(b_).all()
    # different feature epochs → (slightly) different outputs
    assert not np.allclose(a, b_)


def test_ring_attention_fully_masked_row_outputs_zero(eight_devices):
    """A fully-padded batch row must output exactly 0 (review regression:
    finite NEG_INF made p=exp(0)=1 so the l==0 guard never fired)."""
    mesh = make_mesh(data=1, model=1, seq=8, index=1)
    b, s, h, d = 2, 64, 2, 16
    q, k, v = _qkv(b=b, s=s, h=h, d=d, seed=9)
    mask = np.ones((b, s), np.int32)
    mask[1, :] = 0          # row 1 is entirely padding
    m = jnp.asarray(mask)
    fn = shard_map(
        lambda q_, k_, v_, m_: ring_attention(q_, k_, v_, m_, SEQ_AXIS),
        mesh=mesh,
        in_specs=(
            P(None, SEQ_AXIS, None, None),
            P(None, SEQ_AXIS, None, None),
            P(None, SEQ_AXIS, None, None),
            P(None, SEQ_AXIS),
        ),
        out_specs=P(None, SEQ_AXIS, None, None),
    )
    out = np.asarray(jax.jit(fn)(q, k, v, m))
    assert np.all(out[1] == 0.0)
    assert np.isfinite(out).all()


def test_ulysses_attention_matches_single_device(eight_devices):
    """Ulysses CP (all-to-all head/seq exchange): exact parity with the
    single-device oracle, including padded key positions."""
    from text_similarity_tpu.ops.ulysses import ulysses_attention

    mesh = make_mesh(data=1, model=1, seq=8, index=1)
    b, s, h, d = 2, 128, 8, 16  # 8 heads / 8 devices: 1 head each
    q, k, v = _qkv(b=b, s=s, h=h, d=d, seed=7)
    mask = np.ones((b, s), np.int32)
    mask[0, 100:] = 0
    m = jnp.asarray(mask)

    ref = np.asarray(attention_reference(q, k, v, m))
    fn = shard_map(
        lambda q_, k_, v_, m_: ulysses_attention(q_, k_, v_, m_, SEQ_AXIS),
        mesh=mesh,
        in_specs=(
            P(None, SEQ_AXIS, None, None),
            P(None, SEQ_AXIS, None, None),
            P(None, SEQ_AXIS, None, None),
            P(None, SEQ_AXIS),
        ),
        out_specs=P(None, SEQ_AXIS, None, None),
    )
    out = np.asarray(jax.jit(fn)(q, k, v, m))
    keep = mask.astype(bool)
    np.testing.assert_allclose(out[keep], ref[keep], atol=1e-5)


def test_ulysses_attention_gradients_match(eight_devices):
    from text_similarity_tpu.ops.ulysses import ulysses_attention

    mesh = make_mesh(data=1, model=1, seq=8, index=1)
    b, s, h, d = 1, 64, 8, 16
    q, k, v = _qkv(b=b, s=s, h=h, d=d, seed=9)
    m = jnp.ones((b, s), jnp.int32)

    def loss_ref(qkv):
        q_, k_, v_ = qkv
        return jnp.sum(attention_reference(q_, k_, v_, m) ** 2)

    ufn = shard_map(
        lambda q_, k_, v_, m_: ulysses_attention(q_, k_, v_, m_, SEQ_AXIS),
        mesh=mesh,
        in_specs=(
            P(None, SEQ_AXIS, None, None),
            P(None, SEQ_AXIS, None, None),
            P(None, SEQ_AXIS, None, None),
            P(None, SEQ_AXIS),
        ),
        out_specs=P(None, SEQ_AXIS, None, None),
    )

    def loss_u(qkv):
        q_, k_, v_ = qkv
        return jnp.sum(ufn(q_, k_, v_, m) ** 2)

    g_ref = jax.grad(loss_ref)((q, k, v))
    g_u = jax.jit(jax.grad(loss_u))((q, k, v))
    for a, b_ in zip(g_ref, g_u):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=1e-4, rtol=1e-4
        )


@pytest.mark.parametrize("strategy", ["ring", "ulysses"])
def test_encoder_forward_cp_matches_single_device(eight_devices, strategy):
    """The FULL encoder running context-parallel (seq sharded over 8
    devices, ring or ulysses attention inside the layer scan) must match
    the single-device forward."""
    from text_similarity_tpu.models.long_context import encoder_forward_cp
    from text_similarity_tpu.core.config import ARCH_PRESETS
    from text_similarity_tpu.core.precision import FP32_PRECISION
    from text_similarity_tpu.models import init_params, encoder_forward

    arch = ARCH_PRESETS["tiny-test"].replace(num_heads=8, max_position=256)
    params = init_params(jax.random.PRNGKey(0), arch)
    rng = np.random.RandomState(11)
    b, s = 2, 128
    ids = jnp.asarray(rng.randint(5, arch.vocab_size, (b, s)), jnp.int32)
    mask = np.ones((b, s), np.int32)
    mask[1, 96:] = 0
    m = jnp.asarray(mask)

    ref = encoder_forward(
        params, ids, m, arch=arch, precision=FP32_PRECISION,
        attention_impl="reference",
    ).last_hidden_state

    mesh = make_mesh(data=1, model=1, seq=8, index=1)
    out = encoder_forward_cp(
        params, ids, m, arch=arch, mesh=mesh, strategy=strategy,
        precision=FP32_PRECISION,
    )
    keep = mask.astype(bool)
    np.testing.assert_allclose(
        np.asarray(out)[keep], np.asarray(ref)[keep], atol=2e-5, rtol=2e-5
    )


def test_sentence_encoder_encode_long_cp(eight_devices):
    """encode_long: the CP encode path produces the same embeddings as
    the single-device forward + mean pool at the same padded length."""
    from text_similarity_tpu.core.config import ARCH_PRESETS
    from text_similarity_tpu.core.precision import FP32_PRECISION
    from text_similarity_tpu.models import init_params, encoder_forward, mean_pool
    from text_similarity_tpu.models.sentence_encoder import SentenceEncoder
    from text_similarity_tpu.data.tokenization import (
        WordPieceTokenizer, train_wordpiece_vocab,
    )
    from text_similarity_tpu.ops.topk import l2_normalize

    texts = [
        "a very long document about foxes " * 8,
        "tensor processing units multiply matrices quickly " * 6,
        "short one",
    ]
    tok = WordPieceTokenizer(train_wordpiece_vocab(texts, 256, min_freq=1))
    arch = ARCH_PRESETS["tiny-test"].replace(
        vocab_size=tok.vocab_size, num_heads=8, max_position=256
    )
    params = init_params(jax.random.PRNGKey(0), arch)
    enc = SentenceEncoder(
        params, arch, tokenizer=tok, precision=FP32_PRECISION
    )
    mesh = make_mesh(data=1, model=1, seq=8, index=1)
    got = enc.encode_long(texts, mesh, max_len=128, strategy="ulysses")

    ids, mask = tok.encode_batch(texts, 128)
    ref_h = encoder_forward(
        params, jnp.asarray(ids), jnp.asarray(mask), arch=arch,
        precision=FP32_PRECISION, attention_impl="reference",
    ).last_hidden_state
    ref = np.asarray(l2_normalize(mean_pool(ref_h, jnp.asarray(mask))))
    np.testing.assert_allclose(got, ref, atol=3e-5, rtol=3e-5)
