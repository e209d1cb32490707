"""Mixture-of-Experts FFN + expert parallelism (ops/moe.py).

The reference has no MoE (SURVEY.md §2.2 — every parallelism axis of the
rebuild is new); these tests pin the routing semantics against a pure-numpy
oracle, the dense-FFN equivalence at E=1, Switch dropped-token behavior,
and EP sharding equivalence on the fake 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from text_similarity_tpu.core.config import EncoderArch
from text_similarity_tpu.core.mesh import make_mesh
from text_similarity_tpu.ops.moe import expert_capacity, moe_ffn, router_topk


def _np_router(logits, valid, k, capacity, normalize=True):
    """Pure-numpy greedy top-k router with capacity — the oracle."""
    t, e = logits.shape
    x = logits - logits.max(axis=-1, keepdims=True)
    probs = np.exp(x) / np.exp(x).sum(axis=-1, keepdims=True)
    remaining = probs.copy()
    counts = np.zeros(e, np.int64)
    choice = np.zeros((k, t), np.int64)
    slot = np.zeros((k, t), np.int64)
    gate = np.zeros((k, t), np.float64)
    keep = np.zeros((k, t), bool)
    for r in range(k):
        for tok in range(t):
            c = int(np.argmax(remaining[tok]))
            g = remaining[tok, c]
            remaining[tok, c] = 0.0
            choice[r, tok] = c
            if valid[tok] <= 0:
                continue
            slot[r, tok] = counts[c]
            gate[r, tok] = g
            keep[r, tok] = counts[c] < capacity
            counts[c] += 1
    if normalize and k > 1:
        denom = np.maximum(gate.sum(axis=0, keepdims=True), 1e-9)
        gate = gate / denom
    gate = gate * keep
    return choice, slot, gate, keep


def test_router_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    t, e, k, cap = 24, 4, 2, 6
    logits = rng.normal(size=(t, e)).astype(np.float32)
    valid = (rng.random(t) > 0.2).astype(np.float32)
    choice, slot, gate, keep, aux, dropped = jax.jit(
        router_topk, static_argnums=(2, 3)
    )(jnp.asarray(logits), jnp.asarray(valid), k, cap)
    oc, os_, og, ok_ = _np_router(logits, valid, k, cap)
    np.testing.assert_array_equal(np.asarray(keep), ok_)
    n_valid = max(valid.sum(), 1.0)
    np.testing.assert_allclose(
        float(dropped),
        ((valid[None, :] > 0) & ~ok_).sum() / (k * n_valid),
        atol=1e-6,
    )
    # choice/slot only meaningful where kept
    np.testing.assert_array_equal(np.asarray(choice)[ok_], oc[ok_])
    np.testing.assert_array_equal(np.asarray(slot)[ok_], os_[ok_])
    np.testing.assert_allclose(np.asarray(gate), og, atol=1e-5)
    assert np.isfinite(float(aux))


def test_router_aux_balanced_vs_collapsed():
    """The load-balance loss is ~1 for a uniform router and E for a
    collapsed one (all tokens on one expert)."""
    t, e = 512, 8
    uniform = jnp.zeros((t, e))
    valid = jnp.ones((t,))
    *_, aux_u, _ = router_topk(uniform, valid, 1, t)
    collapsed = jnp.zeros((t, e)).at[:, 3].set(10.0)
    *_, aux_c, _ = router_topk(collapsed, valid, 1, t)
    assert abs(float(aux_u) - 1.0) < 1e-3
    assert abs(float(aux_c) - e) < 1e-2


def test_moe_e1_equals_dense_ffn():
    """One expert, top-1, full capacity ⇒ exactly the dense FFN."""
    rng = np.random.default_rng(1)
    b, s, h, i = 2, 16, 32, 64
    x = jnp.asarray(rng.normal(size=(b, s, h)).astype(np.float32))
    mask = jnp.ones((b, s), jnp.int32)
    router_w = jnp.asarray(rng.normal(size=(h, 1)).astype(np.float32))
    wi = jnp.asarray(rng.normal(size=(1, h, i)).astype(np.float32)) * 0.1
    bi = jnp.asarray(rng.normal(size=(1, i)).astype(np.float32)) * 0.1
    wo = jnp.asarray(rng.normal(size=(1, i, h)).astype(np.float32)) * 0.1
    bo = jnp.asarray(rng.normal(size=(1, h)).astype(np.float32)) * 0.1
    y, aux, drop = moe_ffn(
        x, mask, router_w, wi, bi, wo, bo,
        top_k=1, capacity_factor=1.0,
    )
    assert float(drop) == 0.0  # full capacity: nothing dropped
    dense = jax.nn.gelu(
        jnp.einsum("bsh,hi->bsi", x, wi[0]) + bi[0]
    )
    dense = jnp.einsum("bsi,ih->bsh", dense, wo[0]) + bo[0]
    np.testing.assert_allclose(np.asarray(y), np.asarray(dense), atol=1e-5)
    assert abs(float(aux) - 1.0) < 1e-5  # E=1 is perfectly "balanced"


def test_moe_capacity_drop_and_padding():
    """Tokens routed past capacity, and padding tokens, get a zero FFN
    delta; real in-capacity tokens do not consume slots for padding."""
    rng = np.random.default_rng(2)
    b, s, h, i, e = 1, 8, 8, 16, 2
    x = jnp.asarray(rng.normal(size=(b, s, h)).astype(np.float32))
    mask = jnp.asarray([[1, 1, 1, 1, 1, 1, 0, 0]], jnp.int32)
    # force every token onto expert 0
    router_w = jnp.zeros((h, e)).at[:, 0].set(0.0).at[:, 1].set(-100.0)
    wi = jnp.ones((e, h, i), jnp.float32) * 0.1
    bi = jnp.zeros((e, i))
    wo = jnp.ones((e, i, h), jnp.float32) * 0.1
    bo = jnp.zeros((e, h))
    # capacity_factor chosen so C = 4 (T=8, k=1, E=2 → 8/2=4 · 1.0)
    y, _, drop = moe_ffn(
        x, mask, router_w, wi, bi, wo, bo, top_k=1, capacity_factor=1.0,
    )
    assert float(drop) == 0.0  # padding is not a drop
    assert expert_capacity(8, 2, 1, 1.0) == 8  # min multiple=8 floor
    # with the multiple=8 floor nothing drops here; shrink via factor
    y = np.asarray(y)
    # valid tokens got a nonzero delta
    assert np.abs(y[0, :6]).sum() > 0
    # padding tokens got exactly zero
    np.testing.assert_array_equal(y[0, 6:], np.zeros((2, h), np.float32))


def test_moe_overflow_drops_tokens():
    """With capacity < tokens-per-expert, later tokens are dropped (zero
    delta) — Switch semantics."""
    rng = np.random.default_rng(3)
    t, h, i, e = 64, 8, 16, 2
    x = jnp.asarray(rng.normal(size=(1, t, h)).astype(np.float32))
    mask = jnp.ones((1, t), jnp.int32)
    # zero router ⇒ tied logits ⇒ argmax picks expert 0 for every token
    router_w = jnp.zeros((h, e))
    wi = jnp.ones((e, h, i), jnp.float32) * 0.1
    bi = jnp.zeros((e, i))
    wo = jnp.ones((e, i, h), jnp.float32) * 0.1
    bo = jnp.zeros((e, h))
    # C = ceil(64·1·0.25/2)=8 → exactly 8 of 64 tokens fit expert 0
    y, _, drop = moe_ffn(
        x, mask, router_w, wi, bi, wo, bo, top_k=1, capacity_factor=0.25,
    )
    # 8 of 64 assignments fit → 56/64 dropped, and the metric says so
    np.testing.assert_allclose(float(drop), 56 / 64, atol=1e-6)
    y = np.asarray(y)[0]
    nz = np.abs(y).sum(axis=-1) > 1e-9
    assert nz[:8].all()          # first 8 tokens served (priority by order)
    assert not nz[8:].any()      # the rest dropped


def _tiny_moe_arch(**kw):
    return EncoderArch(
        vocab_size=128, hidden_size=32, num_layers=2, num_heads=4,
        intermediate_size=64, max_position=64, has_pooler=False,
        num_experts=4, expert_top_k=2, hidden_dropout=0.0,
        attention_dropout=0.0, **kw,
    )


def test_encoder_forward_moe_and_grads():
    from text_similarity_tpu.models.encoder import encoder_forward, init_params

    arch = _tiny_moe_arch()
    params = init_params(jax.random.PRNGKey(0), arch)
    assert params["layers"]["mlp"]["in"]["w"].shape == (2, 4, 32, 64)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, 128)
    mask = jnp.ones((2, 16), jnp.int32)
    out = jax.jit(
        lambda p, i, m: encoder_forward(p, i, m, arch=arch)
    )(params, ids, mask)
    assert out.last_hidden_state.shape == (2, 16, 32)
    aux = float(out.moe_aux)
    assert np.isfinite(aux) and 0.5 < aux < 4.0

    def loss(p):
        o = encoder_forward(p, ids, mask, arch=arch)
        return jnp.sum(o.last_hidden_state**2) + o.moe_aux

    grads = jax.grad(loss)(params)
    g_router = grads["layers"]["mlp"]["router"]["w"]
    g_wi = grads["layers"]["mlp"]["in"]["w"]
    assert float(jnp.abs(g_router).sum()) > 0
    assert float(jnp.abs(g_wi).sum()) > 0


def test_moe_ep_sharded_matches_unsharded(eight_devices):
    """EP over the mesh 'expert' axis reproduces the replicated forward."""
    from text_similarity_tpu.models.encoder import (
        encoder_forward, init_params, param_pspecs,
    )

    arch = _tiny_moe_arch()
    params = init_params(jax.random.PRNGKey(0), arch)
    ids = jax.random.randint(jax.random.PRNGKey(1), (8, 16), 0, 128)
    mask = jnp.ones((8, 16), jnp.int32)

    ref = encoder_forward(params, ids, mask, arch=arch)

    mesh = make_mesh(data=2, expert=4)
    specs = param_pspecs(arch)
    sharded = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, specs,
    )
    ids_s = jax.device_put(
        ids, NamedSharding(mesh, P("data", None))
    )
    mask_s = jax.device_put(mask, NamedSharding(mesh, P("data", None)))
    out = jax.jit(
        lambda p, i, m: encoder_forward(p, i, m, arch=arch)
    )(sharded, ids_s, mask_s)
    np.testing.assert_allclose(
        np.asarray(out.last_hidden_state),
        np.asarray(ref.last_hidden_state),
        atol=2e-5,
    )
    np.testing.assert_allclose(
        float(out.moe_aux), float(ref.moe_aux), atol=1e-5
    )
    np.testing.assert_allclose(
        float(out.moe_drop), float(ref.moe_drop), atol=1e-5
    )


def test_moe_bi_encoder_train_step_learns():
    import optax

    from text_similarity_tpu.train.steps import (
        init_train_state, make_bi_encoder_train_step,
    )
    from text_similarity_tpu.models.encoder import init_params

    arch = _tiny_moe_arch()
    enc = init_params(jax.random.PRNGKey(0), arch)
    tx = optax.adam(1e-3)
    state = init_train_state({"encoder": enc}, tx)
    step = make_bi_encoder_train_step(arch, tx, loss_type="cosine_mse")
    rng = np.random.default_rng(0)
    batch = {
        "ids_a": jnp.asarray(rng.integers(0, 128, (8, 16)), jnp.int32),
        "mask_a": jnp.ones((8, 16), jnp.int32),
        "ids_b": jnp.asarray(rng.integers(0, 128, (8, 16)), jnp.int32),
        "mask_b": jnp.ones((8, 16), jnp.int32),
        "target": jnp.asarray(rng.random(8), jnp.float32),
        "valid": jnp.ones((8,), jnp.float32),
    }
    losses = []
    for _ in range(12):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
        assert "moe_aux" in metrics and np.isfinite(float(metrics["moe_aux"]))
        assert "moe_drop" in metrics
        assert 0.0 <= float(metrics["moe_drop"]) <= 1.0
    assert losses[-1] < losses[0]


def test_moe_rejects_topk_above_experts():
    x = jnp.zeros((1, 8, 8))
    mask = jnp.ones((1, 8), jnp.int32)
    rw = jnp.zeros((8, 2))
    wi = jnp.zeros((2, 8, 16)); bi = jnp.zeros((2, 16))
    wo = jnp.zeros((2, 16, 8)); bo = jnp.zeros((2, 8))
    with pytest.raises(ValueError, match="expert_top_k"):
        moe_ffn(x, mask, rw, wi, bi, wo, bo, top_k=4)


def test_router_fuzz_vs_numpy_oracle():
    """Randomized configs (T, E, k, capacity, padding mix) against the
    numpy oracle — pins slot/keep/gate semantics across the space."""
    rng = np.random.default_rng(7)
    for trial in range(12):
        t = int(rng.integers(4, 50))
        e = int(rng.integers(2, 9))
        k = int(rng.integers(1, e + 1))
        cap = int(rng.integers(1, t + 4))
        logits = rng.normal(size=(t, e)).astype(np.float32)
        valid = (rng.random(t) > 0.3).astype(np.float32)
        choice, slot, gate, keep, aux, dropped = router_topk(
            jnp.asarray(logits), jnp.asarray(valid), k, cap
        )
        oc, os_, og, ok_ = _np_router(logits, valid, k, cap)
        ctx = (trial, t, e, k, cap)
        np.testing.assert_array_equal(np.asarray(keep), ok_, err_msg=str(ctx))
        np.testing.assert_array_equal(
            np.asarray(choice)[ok_], oc[ok_], err_msg=str(ctx)
        )
        np.testing.assert_array_equal(
            np.asarray(slot)[ok_], os_[ok_], err_msg=str(ctx)
        )
        np.testing.assert_allclose(
            np.asarray(gate), og, atol=1e-5, err_msg=str(ctx)
        )
        assert np.isfinite(float(aux)), ctx
        n_valid = max(valid.sum(), 1.0)
        np.testing.assert_allclose(
            float(dropped),
            ((valid[None, :] > 0) & ~ok_).sum() / (k * n_valid),
            atol=1e-6, err_msg=str(ctx),
        )


def test_moe_int8_expert_gemms_close_to_f32():
    """Quantized expert kernels ({"q","s"} leaves) run int8 batched GEMMs
    inside moe_ffn; outputs stay close to the f32 forward and the router
    (fp32) picks the same experts."""
    from text_similarity_tpu.compress.quantize import _quant_leaf

    rng = np.random.default_rng(5)
    b, s, h, i, e = 2, 16, 32, 64, 4
    x = jnp.asarray(rng.normal(size=(b, s, h)).astype(np.float32))
    mask = jnp.ones((b, s), jnp.int32)
    rw = jnp.asarray(rng.normal(size=(h, e)).astype(np.float32))
    wi = jnp.asarray(rng.normal(size=(e, h, i)).astype(np.float32)) * 0.1
    bi = jnp.asarray(rng.normal(size=(e, i)).astype(np.float32)) * 0.1
    wo = jnp.asarray(rng.normal(size=(e, i, h)).astype(np.float32)) * 0.1
    bo = jnp.asarray(rng.normal(size=(e, h)).astype(np.float32)) * 0.1
    y, aux, drop = moe_ffn(x, mask, rw, wi, bi, wo, bo, top_k=2)
    y8, aux8, drop8 = moe_ffn(
        x, mask, rw, _quant_leaf(wi), bi, _quant_leaf(wo), bo, top_k=2
    )
    # same routing (router is fp32 in both), small quantization error
    np.testing.assert_allclose(float(aux), float(aux8), atol=1e-6)
    np.testing.assert_allclose(float(drop), float(drop8), atol=1e-6)
    err = np.abs(np.asarray(y) - np.asarray(y8)).max()
    scale = np.abs(np.asarray(y)).max()
    assert err < 0.05 * scale + 1e-3, (err, scale)


def test_moe_encoder_to_int8_forward():
    """SentenceEncoder.to_int8 on an MoE arch quantizes expert kernels
    (4-D leaves) and the forward still runs, close to the dequantized
    oracle; the router weight stays a dense fp32 array."""
    from text_similarity_tpu.compress.quantize import dequantize_params
    from text_similarity_tpu.models.encoder import encoder_forward, init_params
    from text_similarity_tpu.models.sentence_encoder import SentenceEncoder
    from text_similarity_tpu.core.precision import precision_for

    arch = _tiny_moe_arch()
    params = init_params(jax.random.PRNGKey(0), arch)
    enc = SentenceEncoder(
        params, arch, tokenizer=None, pooling="mean",
        precision=precision_for(False),
    ).to_int8()
    q = enc.params["layers"]["mlp"]["in"]["w"]
    assert isinstance(q, dict) and q["q"].dtype == jnp.int8
    assert q["q"].ndim == 4 and q["s"].shape == (2, 4, 1, 64)
    router = enc.params["layers"]["mlp"]["router"]["w"]
    assert not isinstance(router, dict)  # router stays fp32

    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, 128)
    mask = jnp.ones((2, 16), jnp.int32)
    emb8 = np.asarray(enc.embed_tokens(ids, mask))
    deq = dequantize_params(enc.params, dtype=jnp.float32)
    ref = encoder_forward(deq, ids, mask, arch=arch)
    from text_similarity_tpu.models.pooling import mean_pool
    from text_similarity_tpu.ops.topk import l2_normalize
    refp = np.asarray(l2_normalize(mean_pool(ref.last_hidden_state, mask)))
    # int8 activation quant error only (weights identical post-dequant)
    assert np.abs(emb8 - refp).max() < 0.1
