"""Pipeline-parallel encoder forward on the fake 8-device CPU mesh: exact
equivalence vs the plain single-program forward, gradient equivalence
through the GPipe schedule, DP×PP composition, and validation errors."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from text_similarity_tpu.core.config import ARCH_PRESETS
from text_similarity_tpu.core.mesh import make_mesh
from text_similarity_tpu.core.precision import FP32_PRECISION
from text_similarity_tpu.models import (
    init_params, encoder_forward, encoder_forward_pp, mean_pool,
)


def _arch(layers=4):
    return ARCH_PRESETS["tiny-test"].replace(
        num_layers=layers, hidden_dropout=0.0, attention_dropout=0.0
    )


def _batch(arch, b=8, s=16, seed=0, ragged=True):
    rng = np.random.RandomState(seed)
    ids = jnp.asarray(rng.randint(5, arch.vocab_size, (b, s)), jnp.int32)
    mask = np.ones((b, s), np.int32)
    if ragged:
        # distinct per-row lengths: proves each microbatch carries its own
        # attention mask through the pipeline ticks
        for r in range(b):
            mask[r, s - 1 - (r % 4):] = 0
    return ids, jnp.asarray(mask)


def test_pp_forward_matches_plain(eight_devices):
    arch = _arch(4)
    params = init_params(jax.random.PRNGKey(0), arch)
    ids, mask = _batch(arch)
    ref = encoder_forward(
        params, ids, mask, arch=arch, precision=FP32_PRECISION
    ).last_hidden_state
    mesh = make_mesh(data=1, pipe=4, seq=2)
    out = encoder_forward_pp(
        params, ids, mask, arch=arch, mesh=mesh, precision=FP32_PRECISION
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5
    )


def test_pp_composes_with_dp(eight_devices):
    arch = _arch(4)
    params = init_params(jax.random.PRNGKey(1), arch)
    ids, mask = _batch(arch, b=8, seed=1)
    ref = encoder_forward(
        params, ids, mask, arch=arch, precision=FP32_PRECISION
    ).last_hidden_state
    mesh = make_mesh(data=2, pipe=4)
    out = encoder_forward_pp(
        params, ids, mask, arch=arch, mesh=mesh, precision=FP32_PRECISION,
        microbatches=4,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5
    )


@pytest.mark.parametrize("m", [1, 2, 8])
def test_pp_microbatch_counts(eight_devices, m):
    arch = _arch(2)
    params = init_params(jax.random.PRNGKey(2), arch)
    ids, mask = _batch(arch, b=8, seed=2)
    ref = encoder_forward(
        params, ids, mask, arch=arch, precision=FP32_PRECISION
    ).last_hidden_state
    mesh = make_mesh(data=1, pipe=2, model=1, seq=1, index=4)
    out = encoder_forward_pp(
        params, ids, mask, arch=arch, mesh=mesh,
        precision=FP32_PRECISION, microbatches=m,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5
    )


def test_pp_grads_match_plain(eight_devices):
    """AD through ppermute/psum gives the same parameter gradients as the
    plain scan forward — the backward pipeline falls out of transposition."""
    arch = _arch(4)
    params = init_params(jax.random.PRNGKey(3), arch)
    ids, mask = _batch(arch, b=8, seed=3)
    tgt = jnp.asarray(
        np.random.RandomState(9).randn(8, arch.hidden_size), jnp.float32
    )
    mesh = make_mesh(data=2, pipe=4)

    def loss_pp(p):
        h = encoder_forward_pp(
            p, ids, mask, arch=arch, mesh=mesh, precision=FP32_PRECISION
        )
        return jnp.mean((mean_pool(h, mask) - tgt) ** 2)

    def loss_plain(p):
        h = encoder_forward(
            p, ids, mask, arch=arch, precision=FP32_PRECISION
        ).last_hidden_state
        return jnp.mean((mean_pool(h, mask) - tgt) ** 2)

    g_pp = jax.jit(jax.grad(loss_pp))(params)
    g_ref = jax.jit(jax.grad(loss_plain))(params)
    flat_pp, _ = jax.tree_util.tree_flatten_with_path(g_pp)
    flat_ref = jax.tree_util.tree_leaves(g_ref)
    for (path, a), b in zip(flat_pp, flat_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4,
            err_msg=str(path),
        )


def test_pp_remat_matches(eight_devices):
    arch = _arch(4)
    params = init_params(jax.random.PRNGKey(4), arch)
    ids, mask = _batch(arch, b=4, seed=4)
    mesh = make_mesh(data=1, pipe=4, seq=2)

    def loss(p, remat):
        h = encoder_forward_pp(
            p, ids, mask, arch=arch, mesh=mesh,
            precision=FP32_PRECISION, remat=remat,
        )
        return jnp.mean(h ** 2)

    g_a = jax.jit(jax.grad(lambda p: loss(p, False)))(params)
    g_b = jax.jit(jax.grad(lambda p: loss(p, True)))(params)
    for a, b in zip(jax.tree.leaves(g_a), jax.tree.leaves(g_b)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4
        )


def _train_setup(arch, pp_mesh=None, dropout=0.0, seed=0, b=8, s=16):
    from text_similarity_tpu.core.config import TrainConfig
    from text_similarity_tpu.train import (
        make_optimizer, make_bi_encoder_train_step, init_train_state,
    )

    arch = arch.replace(hidden_dropout=dropout, attention_dropout=dropout)
    cfg = TrainConfig(lr=1e-3, batch_size=b, warmup_ratio=0.0, bf16=False)
    params = {"encoder": init_params(jax.random.PRNGKey(seed), arch)}
    tx = make_optimizer(cfg, 100, params_example=params)
    state = init_train_state(params, tx, seed=seed)
    step = make_bi_encoder_train_step(
        arch, tx, loss_type="cosine_mse", precision=FP32_PRECISION,
        pp_mesh=pp_mesh,
    )
    rng = np.random.RandomState(seed)
    batch = {
        "ids_a": jnp.asarray(rng.randint(5, arch.vocab_size, (b, s)), jnp.int32),
        "mask_a": jnp.ones((b, s), jnp.int32),
        "ids_b": jnp.asarray(rng.randint(5, arch.vocab_size, (b, s)), jnp.int32),
        "mask_b": jnp.ones((b, s), jnp.int32),
        "target": jnp.asarray(rng.rand(b), jnp.float32),
        "valid": jnp.ones((b,), jnp.int32),
    }
    return state, step, batch


def test_pp_train_step_matches_plain(eight_devices):
    """The PP bi-encoder train step (data=2 x pipe=4) reproduces the plain
    step's loss trajectory and final params with dropout off — the whole
    training runtime (loss, grad, AdamW update) is PP-transparent."""
    arch = _arch(4)
    mesh = make_mesh(data=2, pipe=4)
    st_pp, step_pp, batch = _train_setup(arch, pp_mesh=mesh)
    st_pl, step_pl, _ = _train_setup(arch, pp_mesh=None)
    losses_pp, losses_pl = [], []
    for _ in range(3):
        st_pp, m = step_pp(st_pp, batch)
        losses_pp.append(float(m["loss"]))
        st_pl, m = step_pl(st_pl, batch)
        losses_pl.append(float(m["loss"]))
    np.testing.assert_allclose(losses_pp, losses_pl, rtol=1e-5)
    for a, b in zip(
        jax.tree.leaves(st_pp.params), jax.tree.leaves(st_pl.params)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4
        )


def test_pp_train_step_with_dropout(eight_devices):
    """Dropout threads through the pipeline ticks: per-microbatch,
    per-layer, per-data-shard keys; loss stays finite and decreases."""
    arch = _arch(4)
    mesh = make_mesh(data=2, pipe=4)
    st, step, batch = _train_setup(arch, pp_mesh=mesh, dropout=0.1)
    losses = []
    for _ in range(8):
        st, m = step(st, batch)
        losses.append(float(m["loss"]))
    assert np.all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_pp_mlm_step(eight_devices):
    from text_similarity_tpu.core.config import TrainConfig
    from text_similarity_tpu.train import make_optimizer, init_train_state
    from text_similarity_tpu.train.steps import make_mlm_train_step

    arch = _arch(4)
    mesh = make_mesh(data=2, pipe=4)
    cfg = TrainConfig(lr=1e-3, batch_size=8, warmup_ratio=0.0, bf16=False)
    params = {
        "encoder": init_params(jax.random.PRNGKey(0), arch),
        "mlm_bias": jnp.zeros((arch.vocab_size,), jnp.float32),
    }
    tx = make_optimizer(cfg, 100, params_example=params)
    st = init_train_state(params, tx)
    step = make_mlm_train_step(
        arch, tx, mask_token_id=4, precision=FP32_PRECISION, pp_mesh=mesh,
    )
    ids, mask = _batch(arch, b=8, s=16)
    batch = {"ids": ids, "mask": mask}
    losses = []
    for _ in range(6):
        st, m = step(st, batch)
        losses.append(float(m["loss"]))
    assert np.all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_pp_classifier_step_matches_plain(eight_devices):
    """The PP classifier (cross-encoder) train step reproduces the plain
    step's loss trajectory and final params — including the BERT pooler
    tail, which the PP path applies outside the pipeline region."""
    from text_similarity_tpu.core.config import TrainConfig
    from text_similarity_tpu.train import make_optimizer, init_train_state
    from text_similarity_tpu.train.steps import (
        make_classifier_train_step, init_classifier_head,
    )

    arch = _arch(4)
    assert arch.has_pooler  # the PP pooler tail is the point of this test
    mesh = make_mesh(data=2, pipe=4)
    cfg = TrainConfig(lr=1e-3, batch_size=8, warmup_ratio=0.0, bf16=False)
    rng = np.random.RandomState(3)
    b, s = 8, 16
    batch = {
        "ids": jnp.asarray(rng.randint(5, arch.vocab_size, (b, s)), jnp.int32),
        "mask": jnp.ones((b, s), jnp.int32),
        "type_ids": jnp.asarray(rng.randint(0, 2, (b, s)), jnp.int32),
        "labels": jnp.asarray(rng.randint(0, 3, (b,)), jnp.int32),
        "valid": jnp.ones((b,), jnp.int32),
    }
    losses, final = {}, {}
    for name, pp in (("pp", mesh), ("plain", None)):
        params = {
            "encoder": init_params(jax.random.PRNGKey(0), arch),
            "head": init_classifier_head(
                jax.random.PRNGKey(1), arch.hidden_size, 3
            ),
        }
        tx = make_optimizer(cfg, 100, params_example=params)
        st = init_train_state(params, tx, seed=0)
        step = make_classifier_train_step(
            arch, tx, precision=FP32_PRECISION, pp_mesh=pp,
        )
        ls = []
        for _ in range(3):
            st, m = step(st, batch)
            ls.append(float(m["loss"]))
        losses[name], final[name] = ls, st.params
    np.testing.assert_allclose(losses["pp"], losses["plain"], rtol=1e-5)
    for a, b_ in zip(
        jax.tree.leaves(final["pp"]), jax.tree.leaves(final["plain"])
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=1e-5, rtol=1e-4
        )


def test_pp_validation_errors(eight_devices):
    arch = _arch(4)
    params = init_params(jax.random.PRNGKey(5), arch)
    ids, mask = _batch(arch, b=8)
    mesh = make_mesh(data=1, pipe=4, seq=2)
    with pytest.raises(ValueError, match="num_layers"):
        encoder_forward_pp(
            params, ids, mask, arch=arch.replace(num_layers=3), mesh=mesh
        )
    with pytest.raises(ValueError, match="microbatches"):
        encoder_forward_pp(
            params, ids, mask, arch=arch, mesh=mesh, microbatches=3
        )
    shared = _arch(4).replace(share_layers=True)
    with pytest.raises(ValueError, match="shared"):
        encoder_forward_pp(params, ids, mask, arch=shared, mesh=mesh)
