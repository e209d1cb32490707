"""End-to-end tests mirroring BASELINE.json's benchmark configs on the fake
8-device mesh: distilled/int8 encoder → sharded ANN query (config 5),
theseus training loop, multilingual distillation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from text_similarity_tpu.core.config import (
    ARCH_PRESETS,
    IndexConfig,
    TrainConfig,
)
from text_similarity_tpu.core.precision import FP32_PRECISION
from text_similarity_tpu.core.mesh import make_mesh
from text_similarity_tpu.data.tokenization import (
    WordPieceTokenizer,
    train_wordpiece_vocab,
)
from text_similarity_tpu.models import init_params
from text_similarity_tpu.models.sentence_encoder import SentenceEncoder

CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "a fast dark fox leaped over a sleepy dog",
    "machine learning on tensor processing units",
    "semantic similarity of sentences",
    "investors worried about rising interest rates",
    "the cat sat on the mat",
    "tokyo is the capital of japan",
    "rain is expected across the region tomorrow",
] * 4


@pytest.fixture(scope="module")
def teacher():
    tok = WordPieceTokenizer(train_wordpiece_vocab(CORPUS, 512, min_freq=1))
    arch = ARCH_PRESETS["tiny-test"].replace(
        vocab_size=tok.vocab_size, num_layers=4,
        hidden_dropout=0.0, attention_dropout=0.0,
    )
    params = init_params(jax.random.PRNGKey(0), arch)
    return SentenceEncoder(params, arch, tokenizer=tok, precision=FP32_PRECISION)


def test_int8_encoder_feeds_sharded_index(teacher, eight_devices):
    """BASELINE config 5: distilled + int8 encoder → multi-chip sharded
    ANN query; results must match the fp32 single-device path closely."""
    from text_similarity_tpu.compress.distill import SentenceEncoderDistiller
    from text_similarity_tpu.compress.quantize import (
        quantize_params_int8,
        dequantize_params,
    )
    from text_similarity_tpu.index.sharded import ShardedIVFIndex
    from text_similarity_tpu.index import BruteForceIndex

    distiller = SentenceEncoderDistiller(
        teacher, num_student_layers=2,
        train_config=TrainConfig(lr=5e-4, epochs=2, batch_size=8, bf16=False,
                                 warmup_ratio=0.0),
    )
    student = distiller.distill(CORPUS)
    q8 = dequantize_params(
        quantize_params_int8(student.params), jnp.float32
    )
    student_int8 = SentenceEncoder(
        q8, student.arch, tokenizer=student.tokenizer,
        precision=FP32_PRECISION,
    )

    emb = student_int8.encode(CORPUS)
    mesh = make_mesh(data=1, model=1, index=8)
    cfg = IndexConfig(num_clusters=8, num_probes=8, kmeans_iters=4)
    sharded = ShardedIVFIndex.build(mesh, emb, cfg)
    s, i = sharded.query(emb[:8], k=3)
    # self-retrieval: each doc's nearest neighbors include itself or its
    # duplicate (corpus repeats every 8)
    for r in range(8):
        assert any(int(x) % 8 == r for x in i[r]), (r, i[r])

    # oracle comparison vs single-device brute force
    oracle = BruteForceIndex.from_embeddings(emb)
    _, oi = oracle.query(emb[:8], k=3, impl="xla")
    overlap = np.mean([
        len(set(i[r]) & set(oi[r])) / 3 for r in range(8)
    ])
    assert overlap >= 0.66, overlap


def test_theseus_training_loop_and_swap(teacher):
    """Theseus replacement training runs, loss is finite/decreasing-ish,
    and the swapped-in student is a working standard encoder."""
    from text_similarity_tpu.compress.theseus import (
        TheseusDistiller,
        ReplacementScheduler,
    )
    from text_similarity_tpu.train import make_optimizer, init_train_state
    from text_similarity_tpu.train.steps import init_classifier_head
    from text_similarity_tpu.data.pairs import build_pair_batches
    from text_similarity_tpu.models import encoder_forward

    arch = teacher.arch
    cfg = TrainConfig(lr=5e-4, batch_size=8, bf16=False, warmup_ratio=0.0)
    distiller = TheseusDistiller(
        teacher.params, arch, num_slots=2,
        scheduler=ReplacementScheduler(0.5, 0.05),
        train_config=cfg,
    )
    pairs = [(CORPUS[i], CORPUS[(i + 1) % len(CORPUS)]) for i in range(16)]
    labels = [i % 2 for i in range(16)]
    batches = build_pair_batches(
        teacher.tokenizer, pairs, labels, batch_size=8,
        target_dtype=np.int32, shuffle=False,
    )
    params = {
        "succ": distiller.succ,
        "head": init_classifier_head(
            jax.random.PRNGKey(5), 3 * arch.hidden_size, 2
        ),
    }
    tx = make_optimizer(cfg, 20, params_example=params)
    state = init_train_state(params, tx)
    step = distiller.make_train_step(tx, num_classes=2)

    losses = []
    pred_layers = teacher.params["layers"]
    embeddings = teacher.params["embeddings"]
    for epoch in range(5):
        for b in batches:
            rate = distiller.scheduler.rate(int(state.step))
            state, m = step(
                state, jax.tree.map(jnp.asarray, b), rate,
                pred_layers, embeddings,
            )
            losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses

    # swap successors in → standard 2-layer encoder
    student_params = distiller.compressed_params(state.params["succ"])
    out = encoder_forward(
        student_params,
        jnp.asarray(teacher.tokenizer.encode_batch(CORPUS[:2], 16, pad_to=16)[0]),
        jnp.ones((2, 16), jnp.int32),
        arch=distiller.compressed_arch,
        precision=FP32_PRECISION,
    )
    assert out.last_hidden_state.shape[0] == 2


def test_multilingual_distillation(teacher):
    """make_multilingual flow: teacher encodes source side, student learns
    to embed the target side to the same vector."""
    from text_similarity_tpu.compress.distill import SentenceEncoderDistiller

    src = CORPUS[:16]
    tgt = [s.upper() for s in src]  # stand-in "translations"
    distiller = SentenceEncoderDistiller(
        teacher, num_student_layers=2,
        train_config=TrainConfig(lr=5e-4, epochs=3, batch_size=8, bf16=False,
                                 warmup_ratio=0.0),
    )
    student = distiller.distill(tgt, src_sentences=src)
    t_emb = teacher.encode(src)
    s_emb = student.encode(tgt)
    cos = np.sum(t_emb * s_emb, axis=1)
    assert cos.mean() > 0.3, cos.mean()  # moved toward teacher space


def test_albert_shared_layer_train_step_decreases_loss():
    """ALBERT-style shared-layer encoder trains end to end: the bi-encoder
    cosine-MSE step runs with a stack-depth-1 parameter set and the loss
    decreases (gradients flow through all scan iterations into the one
    shared layer)."""
    from text_similarity_tpu.core.config import TrainConfig
    from text_similarity_tpu.train import (
        init_train_state, make_bi_encoder_train_step, make_optimizer,
    )

    arch = ARCH_PRESETS["tiny-test"].replace(
        share_layers=True, embed_factor_size=32
    )
    params = {"encoder": init_params(jax.random.PRNGKey(0), arch)}
    assert params["encoder"]["layers"]["attn"]["q"]["w"].shape[0] == 1
    tcfg = TrainConfig(lr=1e-3, batch_size=8, max_seq_len=16)
    tx = make_optimizer(tcfg, total_steps=20, params_example=params)
    state = init_train_state(params, tx)
    step = make_bi_encoder_train_step(arch, tx, loss_type="cosine_mse")
    rng = np.random.RandomState(0)
    batch = {
        "ids_a": jnp.asarray(rng.randint(5, arch.vocab_size, (8, 16)), jnp.int32),
        "mask_a": jnp.ones((8, 16), jnp.int32),
        "ids_b": jnp.asarray(rng.randint(5, arch.vocab_size, (8, 16)), jnp.int32),
        "mask_b": jnp.ones((8, 16), jnp.int32),
        "target": jnp.asarray(rng.rand(8), jnp.float32),
        "valid": jnp.ones((8,), jnp.int32),
    }
    losses = []
    for _ in range(12):
        state, m = step(state, batch)
        losses.append(float(jax.device_get(m["loss"])))
    assert losses[-1] < losses[0], losses
