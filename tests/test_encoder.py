"""Encoder forward correctness: HF parity (logit-level diff vs a random-init
torch BertModel/DistilBertModel), mask invariance, layer gating."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from text_similarity_tpu.core.config import ARCH_PRESETS
from text_similarity_tpu.core.precision import FP32_PRECISION
from text_similarity_tpu.models import (
    convert_hf_model,
    encoder_forward,
    init_params,
)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _tiny_bert_config():
    return transformers.BertConfig(
        vocab_size=512,
        hidden_size=64,
        num_hidden_layers=3,
        num_attention_heads=4,
        intermediate_size=128,
        max_position_embeddings=96,
        type_vocab_size=2,
    )


def _random_batch(vocab, b=3, s=24, pad_from=16, seed=0):
    rng = np.random.RandomState(seed)
    ids = rng.randint(5, vocab, size=(b, s)).astype(np.int32)
    mask = np.ones((b, s), np.int32)
    mask[:, pad_from:] = 0
    ids[:, pad_from:] = 0
    return ids, mask


def test_bert_parity_with_hf():
    cfg = _tiny_bert_config()
    torch.manual_seed(0)
    model = transformers.BertModel(cfg).eval()
    params, arch = convert_hf_model(model)
    ids, mask = _random_batch(cfg.vocab_size)

    with torch.no_grad():
        ref = model(
            input_ids=torch.tensor(ids, dtype=torch.long),
            attention_mask=torch.tensor(mask, dtype=torch.long),
        )
    out = encoder_forward(
        params,
        jnp.asarray(ids),
        jnp.asarray(mask),
        arch=arch,
        precision=FP32_PRECISION,
        attention_impl="reference",
    )
    got = np.asarray(out.last_hidden_state, np.float32)
    want = ref.last_hidden_state.numpy()
    # Only compare non-padding positions (HF computes padded positions too,
    # but they are meaningless downstream — our poolers mask them).
    m = mask.astype(bool)
    np.testing.assert_allclose(got[m], want[m], atol=2e-4, rtol=2e-3)

    pooled = np.asarray(out.pooler_output, np.float32)
    np.testing.assert_allclose(
        pooled, ref.pooler_output.numpy(), atol=2e-4, rtol=2e-3
    )


def test_distilbert_parity_with_hf():
    cfg = transformers.DistilBertConfig(
        vocab_size=512,
        dim=64,
        n_layers=2,
        n_heads=4,
        hidden_dim=128,
        max_position_embeddings=96,
    )
    torch.manual_seed(1)
    model = transformers.DistilBertModel(cfg).eval()
    params, arch = convert_hf_model(model)
    ids, mask = _random_batch(cfg.vocab_size, seed=1)

    with torch.no_grad():
        ref = model(
            input_ids=torch.tensor(ids, dtype=torch.long),
            attention_mask=torch.tensor(mask, dtype=torch.long),
        )
    out = encoder_forward(
        params,
        jnp.asarray(ids),
        jnp.asarray(mask),
        arch=arch,
        precision=FP32_PRECISION,
        attention_impl="reference",
    )
    got = np.asarray(out.last_hidden_state, np.float32)
    want = ref.last_hidden_state.numpy()
    m = mask.astype(bool)
    np.testing.assert_allclose(got[m], want[m], atol=2e-4, rtol=2e-3)


def test_roberta_parity_with_hf():
    cfg = transformers.RobertaConfig(
        vocab_size=512,
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=128,
        max_position_embeddings=98,
        type_vocab_size=1,
        pad_token_id=1,
    )
    torch.manual_seed(2)
    model = transformers.RobertaModel(cfg, add_pooling_layer=False).eval()
    params, arch = convert_hf_model(model)
    ids, mask = _random_batch(cfg.vocab_size, seed=2)

    with torch.no_grad():
        ref = model(
            input_ids=torch.tensor(ids, dtype=torch.long),
            attention_mask=torch.tensor(mask, dtype=torch.long),
        )
    out = encoder_forward(
        params,
        jnp.asarray(ids),
        jnp.asarray(mask),
        arch=arch,
        precision=FP32_PRECISION,
        attention_impl="reference",
    )
    got = np.asarray(out.last_hidden_state, np.float32)
    m = mask.astype(bool)
    np.testing.assert_allclose(
        got[m], ref.last_hidden_state.numpy()[m], atol=2e-4, rtol=2e-3
    )


def test_padding_invariance():
    """Extending padding must not change non-pad outputs (flash + reference)."""
    arch = ARCH_PRESETS["tiny-test"]
    params = init_params(jax.random.PRNGKey(0), arch)
    rng = np.random.RandomState(3)
    ids16 = rng.randint(5, arch.vocab_size, size=(2, 16)).astype(np.int32)
    mask16 = np.ones((2, 16), np.int32)
    ids32 = np.pad(ids16, ((0, 0), (0, 16)))
    mask32 = np.pad(mask16, ((0, 0), (0, 16)))

    out16 = encoder_forward(
        params, jnp.asarray(ids16), jnp.asarray(mask16),
        arch=arch, precision=FP32_PRECISION, attention_impl="reference",
    ).last_hidden_state
    out32 = encoder_forward(
        params, jnp.asarray(ids32), jnp.asarray(mask32),
        arch=arch, precision=FP32_PRECISION, attention_impl="reference",
    ).last_hidden_state
    np.testing.assert_allclose(
        np.asarray(out16), np.asarray(out32[:, :16]), atol=1e-5, rtol=1e-5
    )


def test_layer_gate_identity():
    """Gating a layer off must make it contribute identity (theseus/layer-drop
    semantics, reference bert_of_theseus.py:551-561)."""
    arch = ARCH_PRESETS["tiny-test"]
    params = init_params(jax.random.PRNGKey(0), arch)
    ids = jnp.asarray(
        np.random.RandomState(4).randint(5, arch.vocab_size, size=(2, 8)),
        jnp.int32,
    )
    mask = jnp.ones((2, 8), jnp.int32)

    full = encoder_forward(
        params, ids, mask, arch=arch, precision=FP32_PRECISION,
        layer_gate=jnp.array([1.0, 1.0]), attention_impl="reference",
    ).last_hidden_state
    gated = encoder_forward(
        params, ids, mask, arch=arch, precision=FP32_PRECISION,
        layer_gate=jnp.array([1.0, 0.0]), attention_impl="reference",
    ).last_hidden_state
    assert not np.allclose(np.asarray(full), np.asarray(gated))

    # All-off == embeddings only
    off = encoder_forward(
        params, ids, mask, arch=arch, precision=FP32_PRECISION,
        layer_gate=jnp.array([0.0, 0.0]), attention_impl="reference",
        output_hidden_states=True,
    )
    np.testing.assert_allclose(
        np.asarray(off.last_hidden_state),
        np.asarray(off.hidden_states[0]),
        atol=1e-6,
    )


def test_sentence_encoder_from_hf():
    """SentenceEncoder.from_hf + encode end-to-end from a torch model."""
    from text_similarity_tpu.models.sentence_encoder import SentenceEncoder
    from text_similarity_tpu.core.precision import FP32_PRECISION
    from text_similarity_tpu.data.tokenization import (
        WordPieceTokenizer, train_wordpiece_vocab,
    )

    corpus = ["a quick brown fox", "machine learning is fun"]
    tok = WordPieceTokenizer(train_wordpiece_vocab(corpus, 512, min_freq=1))
    cfg = transformers.BertConfig(
        vocab_size=tok.vocab_size, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=64,
    )
    torch.manual_seed(0)
    model = transformers.BertModel(cfg).eval()
    enc = SentenceEncoder.from_hf(model, tokenizer=tok, precision=FP32_PRECISION)
    emb = enc.encode(corpus)
    assert emb.shape == (2, 32)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, atol=1e-5)

    # parity with direct torch mean-pool of the same tokens
    ids, mask = tok.encode_batch(corpus, max_len=16)
    with torch.no_grad():
        out = model(
            input_ids=torch.tensor(ids, dtype=torch.long),
            attention_mask=torch.tensor(mask, dtype=torch.long),
        ).last_hidden_state.numpy()
    m = mask[..., None].astype(np.float32)
    pooled = (out * m).sum(1) / np.maximum(m.sum(1), 1e-9)
    pooled /= np.linalg.norm(pooled, axis=1, keepdims=True)
    got = np.asarray(enc.embed_tokens(ids, mask))
    np.testing.assert_allclose(got, pooled, atol=5e-4, rtol=1e-2)


def test_remat_gradient_equivalence():
    """remat=True and remat="dots" (matmul-output-saving checkpoint policy)
    must change only the backward schedule, never values: forward outputs
    and parameter gradients match remat=False exactly (both are pure
    rematerialization of the same computation)."""
    arch = ARCH_PRESETS["tiny-test"]
    params = init_params(jax.random.PRNGKey(0), arch)
    rng = np.random.RandomState(7)
    ids = jnp.asarray(rng.randint(5, arch.vocab_size, size=(2, 16)), jnp.int32)
    mask = jnp.ones((2, 16), jnp.int32)

    def loss(p, remat):
        out = encoder_forward(
            p, ids, mask, arch=arch, precision=FP32_PRECISION, remat=remat,
        ).last_hidden_state
        return jnp.sum(out * out)

    base, g_base = jax.value_and_grad(lambda p: loss(p, False))(params)
    for mode in (True, "dots"):
        v, g = jax.value_and_grad(lambda p: loss(p, mode))(params)
        np.testing.assert_allclose(np.asarray(v), np.asarray(base), rtol=1e-6)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5
            ),
            g, g_base,
        )


@pytest.mark.parametrize("embedding_size", [32, 64])
def test_albert_parity_with_hf(embedding_size):
    """ALBERT: shared layer stack + factorized embeddings (the reference
    trains albert-japanese classifiers, BASELINE.md). Logit parity vs a
    random-init transformers AlbertModel. The E == H case matters: HF
    applies embedding_hidden_mapping_in unconditionally, so the converter
    must keep the projection even when no dimension change happens."""
    cfg = transformers.AlbertConfig(
        vocab_size=512,
        embedding_size=embedding_size,
        hidden_size=64,
        num_hidden_layers=3,
        num_attention_heads=4,
        intermediate_size=128,
        max_position_embeddings=96,
        type_vocab_size=2,
    )
    torch.manual_seed(0)
    model = transformers.AlbertModel(cfg).eval()
    params, arch = convert_hf_model(model)
    assert arch.share_layers and arch.embed_factor_size == embedding_size
    assert "proj" in params["embeddings"]
    # one shared parameter set on the stack axis
    assert params["layers"]["attn"]["q"]["w"].shape[0] == 1
    ids, mask = _random_batch(cfg.vocab_size)

    with torch.no_grad():
        ref = model(
            input_ids=torch.tensor(ids, dtype=torch.long),
            attention_mask=torch.tensor(mask, dtype=torch.long),
        )
    out = encoder_forward(
        params,
        jnp.asarray(ids),
        jnp.asarray(mask),
        arch=arch,
        precision=FP32_PRECISION,
        attention_impl="reference",
    )
    got = np.asarray(out.last_hidden_state, np.float32)
    want = ref.last_hidden_state.numpy()
    m = mask.astype(bool)
    np.testing.assert_allclose(got[m], want[m], atol=2e-4, rtol=2e-3)
    pooled = np.asarray(out.pooler_output, np.float32)
    np.testing.assert_allclose(
        pooled, ref.pooler_output.numpy(), atol=2e-4, rtol=2e-3
    )


def test_albert_random_init_runs_and_shares():
    """init_params honors share_layers/embed_factor_size and the forward
    runs all num_layers iterations (output differs from a 1-layer run)."""
    from text_similarity_tpu.models import init_params as _init

    arch = ARCH_PRESETS["tiny-test"].replace(
        share_layers=True, embed_factor_size=32
    )
    params = _init(jax.random.PRNGKey(0), arch)
    assert params["layers"]["attn"]["q"]["w"].shape[0] == 1
    assert params["embeddings"]["word"].shape[1] == 32
    ids, mask = _random_batch(arch.vocab_size)
    out2 = encoder_forward(
        params, jnp.asarray(ids), jnp.asarray(mask), arch=arch,
        precision=FP32_PRECISION,
    ).last_hidden_state
    out1 = encoder_forward(
        params, jnp.asarray(ids), jnp.asarray(mask),
        arch=arch.replace(num_layers=1), precision=FP32_PRECISION,
    ).last_hidden_state
    assert not np.allclose(np.asarray(out2), np.asarray(out1))


def test_encode_data_parallel_mesh_matches_single_device():
    """SentenceEncoder(mesh=data-mesh) shards encode batches over the
    data axis; embeddings must match the single-device path exactly
    (bulk corpus encode for multi-chip indexing — serve --shards wires
    this up over the same devices as the index mesh)."""
    from text_similarity_tpu.core.mesh import make_mesh
    from text_similarity_tpu.core.precision import FP32_PRECISION
    from text_similarity_tpu.data.tokenization import (
        WordPieceTokenizer, train_wordpiece_vocab,
    )
    from text_similarity_tpu.models.sentence_encoder import SentenceEncoder

    texts = [
        f"document number {i} about topic {i % 5}" for i in range(37)
    ]
    vocab = train_wordpiece_vocab(texts, vocab_size=256, min_freq=1)
    tok = WordPieceTokenizer(vocab)
    arch = ARCH_PRESETS["tiny-test"].replace(vocab_size=tok.vocab_size)
    params = init_params(jax.random.PRNGKey(0), arch)
    single = SentenceEncoder(
        params, arch, tokenizer=tok, precision=FP32_PRECISION
    )
    mesh = make_mesh(data=8)
    sharded = SentenceEncoder(
        params, arch, tokenizer=tok, precision=FP32_PRECISION, mesh=mesh
    )
    a = single.encode(texts, batch_size=16)
    b = sharded.encode(texts, batch_size=16)
    np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)
