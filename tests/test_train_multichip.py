"""Multi-device training-step tests on the fake 8-device CPU mesh: full DP+TP
sharded bi-encoder step (the driver's dryrun path) and loss decrease on a
tiny overfit task."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_dryrun_multichip_8(eight_devices):
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_graft_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, 384)
    # normalized
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out), axis=-1), 1.0, atol=1e-3
    )


def test_bi_encoder_loss_decreases():
    from text_similarity_tpu.core.config import ARCH_PRESETS, TrainConfig
    from text_similarity_tpu.core.precision import FP32_PRECISION
    from text_similarity_tpu.models.encoder import init_params
    from text_similarity_tpu.train import (
        make_optimizer,
        make_bi_encoder_train_step,
        init_train_state,
    )

    arch = ARCH_PRESETS["tiny-test"].replace(
        hidden_dropout=0.0, attention_dropout=0.0
    )
    cfg = TrainConfig(lr=1e-3, batch_size=8, warmup_ratio=0.0)
    params = {"encoder": init_params(jax.random.PRNGKey(0), arch)}
    tx = make_optimizer(cfg, total_steps=30, params_example=params)
    state = init_train_state(params, tx)
    step = make_bi_encoder_train_step(
        arch, tx, loss_type="cosine_mse", precision=FP32_PRECISION
    )

    rng = np.random.RandomState(0)
    b, s = 8, 16
    batch = {
        "ids_a": jnp.asarray(rng.randint(5, arch.vocab_size, (b, s)), jnp.int32),
        "mask_a": jnp.ones((b, s), jnp.int32),
        "ids_b": jnp.asarray(rng.randint(5, arch.vocab_size, (b, s)), jnp.int32),
        "mask_b": jnp.ones((b, s), jnp.int32),
        "target": jnp.asarray(rng.rand(b), jnp.float32),
        "valid": jnp.ones((b,), jnp.int32),
    }
    losses = []
    for _ in range(20):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.5, losses


def test_fsdp_sharded_training_step(eight_devices):
    """ZeRO/FSDP-style: params sharded over the data axis, batch sharded
    over the same axis; one step runs and updates sharded params."""
    from jax.sharding import PartitionSpec as P
    from text_similarity_tpu.core.config import ARCH_PRESETS, TrainConfig
    from text_similarity_tpu.core.mesh import make_mesh
    from text_similarity_tpu.models.encoder import (
        init_params, fsdp_param_pspecs,
    )
    from text_similarity_tpu.train import (
        make_optimizer,
        make_bi_encoder_train_step,
        init_sharded_train_state,
        shard_batch_for,
    )

    mesh = make_mesh(data=8)
    # hidden=64 shards over 8 devices (8 each); vocab 1024 over 8
    arch = ARCH_PRESETS["tiny-test"].replace(
        hidden_dropout=0.0, attention_dropout=0.0
    )
    cfg = TrainConfig(lr=1e-3, batch_size=16, warmup_ratio=0.0, bf16=False)
    params = {"encoder": init_params(jax.random.PRNGKey(0), arch)}
    specs = {"encoder": fsdp_param_pspecs(arch)}
    tx = make_optimizer(cfg, 10, params_example=params)
    state = init_sharded_train_state(params, tx, mesh, param_specs=specs)

    # verify params are genuinely sharded (one leaf check)
    qw = state.params["encoder"]["layers"]["attn"]["q"]["w"]
    assert qw.sharding.spec == P(None, None, "data")

    step = make_bi_encoder_train_step(arch, tx, loss_type="cosine_mse")
    rng = np.random.RandomState(0)
    b, s = 16, 16
    batch = shard_batch_for(mesh, {
        "ids_a": jnp.asarray(rng.randint(5, arch.vocab_size, (b, s)), jnp.int32),
        "mask_a": jnp.ones((b, s), jnp.int32),
        "ids_b": jnp.asarray(rng.randint(5, arch.vocab_size, (b, s)), jnp.int32),
        "mask_b": jnp.ones((b, s), jnp.int32),
        "target": jnp.asarray(rng.rand(b), jnp.float32),
        "valid": jnp.ones((b,), jnp.int32),
    })
    losses = []
    for _ in range(3):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
