"""Greedy sequence packing (data/packing.py + segment-aware attention).

Parity contract: packing several short sequences into one row behind a
block-diagonal attention mask, restarting positions, and segment-mean
pooling must reproduce the per-sequence (unpacked) embeddings exactly —
the only differences are float-accumulation order. Generalizes the
reference's length-sorted batching (src/models/sentence_encoder.py:138)."""

import jax
import jax.numpy as jnp
import numpy as np

from text_similarity_tpu.core.config import EncoderArch
from text_similarity_tpu.core.precision import precision_for
from text_similarity_tpu.data.packing import pack_sequences, packing_efficiency
from text_similarity_tpu.models.encoder import init_params
from text_similarity_tpu.models.sentence_encoder import SentenceEncoder


def _rand_rows(rng, n, width, vocab=100):
    lens = rng.integers(4, width // 2, n)
    return [list(rng.integers(5, vocab, L)) for L in lens]


def test_pack_sequences_layout():
    rng = np.random.default_rng(0)
    width = 64
    rows = _rand_rows(rng, 40, width)
    packed = pack_sequences(rows, width, pad_id=0)
    ids, segs, pos, owners = (
        packed["ids"], packed["segments"], packed["positions"],
        packed["owners"],
    )
    # every sequence appears exactly once, token-exact, positions 0..L-1
    seen = set()
    for ri in range(ids.shape[0]):
        for mi in range(owners.shape[1]):
            si = owners[ri, mi]
            if si < 0:
                continue
            assert si not in seen
            seen.add(int(si))
            sel = segs[ri] == mi + 1
            np.testing.assert_array_equal(
                ids[ri][sel], np.asarray(rows[si], np.int32)
            )
            np.testing.assert_array_equal(
                pos[ri][sel], np.arange(sel.sum(), dtype=np.int32)
            )
    assert seen == set(range(40))
    # pads carry segment 0 and pad_id
    assert (ids[segs == 0] == 0).all()
    # packing actually packs: fewer rows than sequences, decent fill
    assert ids.shape[0] < 40
    assert packing_efficiency(packed) > 0.5


def test_ffd_placement_matches_naive_first_fit():
    """The O(n log n) segment-tree placement (native C + Python fallback)
    must reproduce the naive first-fit scan exactly: lowest-indexed row
    with free space >= len, else a new row."""
    from text_similarity_tpu.data.packing import _ffd_place_py

    rng = np.random.default_rng(1)
    for _ in range(25):
        width = int(rng.choice([16, 64, 128]))
        n = int(rng.integers(1, 300))
        sl = np.sort(rng.integers(0, width + 1, n))[::-1].astype(np.int32)
        # naive oracle
        space, o_row, o_slot, o_off = [], [], [], []
        for L in sl:
            for ri in range(len(space)):
                if space[ri] >= L:
                    break
            else:
                space.append(width)
                ri = len(space) - 1
            o_row.append(ri)
            o_slot.append(sum(1 for r in o_row[:-1] if r == ri))
            o_off.append(width - space[ri])
            space[ri] -= int(L)
        r, row, slot, off = _ffd_place_py(sl, width)
        assert r == len(space)
        np.testing.assert_array_equal(row, o_row)
        np.testing.assert_array_equal(slot, o_slot)
        np.testing.assert_array_equal(off, o_off)
        try:
            from text_similarity_tpu.native import ffd_place_native

            nat = ffd_place_native(sl, width)
        except Exception:
            nat = None
        if nat is not None:
            assert nat[0] == r
            for x, y in zip(nat[1:], (row, slot, off)):
                np.testing.assert_array_equal(x, y)


def test_pack_pair_arrays_matches_ragged_path():
    """The vectorized pair layout (pack_pair_arrays over padded body
    arrays) must be byte-identical to pack_sequences over the ragged
    [CLS] a [SEP] b [SEP] rows from encode_pair_rows — including
    longest-first truncation cases."""
    from text_similarity_tpu.data.packing import pack_pair_arrays
    from text_similarity_tpu.data.tokenization import (
        WordPieceTokenizer, train_wordpiece_vocab,
    )

    rng = np.random.default_rng(3)
    lex = [
        "".join(chr(97 + c) for c in rng.integers(0, 26, rng.integers(3, 8)))
        for _ in range(300)
    ]

    def mk(n, lo, hi):
        return [
            " ".join(rng.choice(lex, rng.integers(lo, hi))) for _ in range(n)
        ]

    corpus = mk(300, 3, 30)
    tok = WordPieceTokenizer(
        train_wordpiece_vocab(corpus, vocab_size=512, min_freq=1)
    )
    for lo, hi, ml, w in [(3, 10, 128, 128), (20, 60, 64, 128),
                          (1, 40, 32, 64)]:
        a, b = mk(150, lo, hi), mk(150, lo, hi)
        rows, types = tok.encode_pair_rows(a, b, max_len=min(ml, w))
        p0 = pack_sequences(rows, w, pad_id=tok.pad_id, row_types=types)
        ba, la = tok.encode_bodies(a, min(ml, w) - 3)
        bb, lb = tok.encode_bodies(b, min(ml, w) - 3)
        p1 = pack_pair_arrays(
            ba, la, bb, lb, w, cls_id=tok.cls_id, sep_id=tok.sep_id,
            pad_id=tok.pad_id, max_len=min(ml, w),
        )
        for k in p0:
            np.testing.assert_array_equal(p0[k], p1[k], err_msg=k)


def test_encode_pair_rows_matches_padded_pair_batch():
    """encode_pair_rows (ragged, closed-form truncation) must equal the
    padded encode_pair_batch + strip on every pair."""
    from text_similarity_tpu.data.tokenization import (
        WordPieceTokenizer, train_wordpiece_vocab,
    )
    from text_similarity_tpu.models.cross_encoder import _strip_pair_rows

    rng = np.random.default_rng(5)
    lex = [
        "".join(chr(97 + c) for c in rng.integers(0, 26, rng.integers(3, 8)))
        for _ in range(300)
    ]

    def mk(n, lo, hi):
        return [
            " ".join(rng.choice(lex, rng.integers(lo, hi))) for _ in range(n)
        ]

    corpus = mk(300, 3, 30)
    tok = WordPieceTokenizer(
        train_wordpiece_vocab(corpus, vocab_size=512, min_freq=1)
    )
    for lo, hi, ml in [(3, 10, 128), (20, 60, 48), (1, 40, 16)]:
        a, b = mk(120, lo, hi), mk(120, lo, hi)
        ids, mask, tts = tok.encode_pair_batch(a, b, max_len=ml)
        r0, t0 = _strip_pair_rows(ids, mask, tts)
        r1, t1 = tok.encode_pair_rows(a, b, max_len=ml)
        assert [list(map(int, x)) for x in r0] == r1
        assert [list(map(int, x)) for x in t0] == t1


def test_pack_truncates_overlong():
    packed = pack_sequences([list(range(5, 40))], width=16, pad_id=0)
    assert packed["ids"].shape == (1, 16)
    assert (packed["segments"][0] == 1).all()


def _tiny_encoder():
    arch = EncoderArch(
        vocab_size=120, hidden_size=32, num_layers=2, num_heads=4,
        intermediate_size=64, max_position=64, has_pooler=False,
        hidden_dropout=0.0, attention_dropout=0.0,
    )
    params = init_params(jax.random.PRNGKey(0), arch)
    return SentenceEncoder(
        params, arch, tokenizer=None, pooling="mean",
        precision=precision_for(False),
    )


def test_packed_embeddings_match_unpacked():
    rng = np.random.default_rng(1)
    width = 64
    rows = _rand_rows(rng, 24, width, vocab=120)
    enc = _tiny_encoder()

    # unpacked oracle: one padded row per sequence
    ids_u = np.zeros((24, width), np.int32)
    mask_u = np.zeros((24, width), np.int32)
    for i, r in enumerate(rows):
        ids_u[i, : len(r)] = r
        mask_u[i, : len(r)] = 1
    ref = np.asarray(enc.embed_tokens(ids_u, mask_u))

    packed = pack_sequences(rows, width, pad_id=0)
    emb = np.asarray(
        enc.embed_tokens_packed(
            packed["ids"], packed["segments"], packed["positions"]
        )
    )
    out = np.zeros_like(ref)
    owners = packed["owners"]
    sel = owners >= 0
    out[owners[sel]] = emb[sel]
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_packed_embeddings_match_unpacked_position_offset():
    """RoBERTa-family archs (position_offset > 0) index position rows at
    pad_token_id+1+p — the packed position_ids override must apply the
    same shift or packed embeddings silently diverge (review r4 #1)."""
    rng = np.random.default_rng(7)
    width = 64
    rows = _rand_rows(rng, 24, width, vocab=120)
    arch = EncoderArch(
        vocab_size=120, hidden_size=32, num_layers=2, num_heads=4,
        intermediate_size=64, max_position=128, has_pooler=False,
        hidden_dropout=0.0, attention_dropout=0.0,
        position_offset=2, pad_token_id=1,
    )
    params = init_params(jax.random.PRNGKey(0), arch)
    enc = SentenceEncoder(
        params, arch, tokenizer=None, pooling="mean",
        precision=precision_for(False),
    )
    ids_u = np.ones((24, width), np.int32)   # pad id 1
    mask_u = np.zeros((24, width), np.int32)
    for i, r in enumerate(rows):
        ids_u[i, : len(r)] = r
        mask_u[i, : len(r)] = 1
    ref = np.asarray(enc.embed_tokens(ids_u, mask_u))

    packed = pack_sequences(rows, width, pad_id=1)
    emb = np.asarray(
        enc.embed_tokens_packed(
            packed["ids"], packed["segments"], packed["positions"]
        )
    )
    out = np.zeros_like(ref)
    owners = packed["owners"]
    sel = owners >= 0
    out[owners[sel]] = emb[sel]
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_encode_empty_texts():
    enc, _ = _tok_encoder()
    for kw in ({}, {"packed": True}, {"device_output": True}):
        out = enc.encode([], **kw)
        assert np.asarray(out).shape == (0, enc.embedding_dim)


def test_segment_mean_pool_matches_per_segment_mean():
    from text_similarity_tpu.models.pooling import segment_mean_pool

    rng = np.random.default_rng(2)
    h = jnp.asarray(rng.normal(size=(2, 16, 8)).astype(np.float32))
    segs = jnp.asarray(
        [[1, 1, 1, 2, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
         [1, 2, 2, 2, 3, 3, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]], jnp.int32
    )
    out = np.asarray(segment_mean_pool(h, segs, 3))
    hn = np.asarray(h)
    np.testing.assert_allclose(out[0, 0], hn[0, :3].mean(0), atol=1e-6)
    np.testing.assert_allclose(out[0, 1], hn[0, 3:5].mean(0), atol=1e-6)
    np.testing.assert_allclose(out[0, 2], np.zeros(8), atol=1e-6)
    np.testing.assert_allclose(out[1, 2], hn[1, 4:6].mean(0), atol=1e-6)


def test_segment_attention_blocks_cross_talk():
    """A token's output must be invariant to the CONTENT of other segments
    in the same packed row."""
    from text_similarity_tpu.ops.attention import attention_reference

    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.normal(size=(1, 8, 2, 4)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, 8, 2, 4)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, 8, 2, 4)).astype(np.float32))
    segs = jnp.asarray([[1, 1, 1, 1, 2, 2, 2, 2]], jnp.int32)
    out1 = np.asarray(attention_reference(q, k, v, segment_ids=segs))
    # perturb segment 2's keys/values: segment 1's outputs must not move
    k2 = k.at[0, 4:].set(jnp.asarray(rng.normal(size=(4, 2, 4)), jnp.float32))
    v2 = v.at[0, 4:].set(jnp.asarray(rng.normal(size=(4, 2, 4)), jnp.float32))
    out2 = np.asarray(attention_reference(q, k2, v2, segment_ids=segs))
    np.testing.assert_allclose(out1[0, :4], out2[0, :4], atol=1e-6)
    assert np.abs(out1[0, 4:] - out2[0, 4:]).max() > 1e-3


def _tok_encoder(pooling="mean"):
    """Tiny encoder WITH a real WordPiece tokenizer (text-level encode)."""
    from text_similarity_tpu.data.tokenization import (
        WordPieceTokenizer, train_wordpiece_vocab,
    )

    corpus = [
        "the quick brown fox jumps over the lazy dog",
        "a fast dark fox leaped over a sleepy dog",
        "semantic similarity of sentences on tensor units",
        "the dog sleeps while the fox runs far away",
    ] * 3
    vocab = train_wordpiece_vocab(corpus, vocab_size=256, min_freq=1)
    tok = WordPieceTokenizer(vocab)
    arch = EncoderArch(
        vocab_size=300, hidden_size=32, num_layers=2, num_heads=4,
        intermediate_size=64, max_position=64, has_pooler=False,
        hidden_dropout=0.0, attention_dropout=0.0,
    )
    params = init_params(jax.random.PRNGKey(0), arch)
    return SentenceEncoder(
        params, arch, tokenizer=tok, pooling=pooling,
        precision=precision_for(False),
    ), corpus


def _packed_jit_used(enc):
    return any(
        isinstance(k, tuple) and k and k[0] == "packed"
        for k in enc._jit_cache
    )


def test_encode_auto_packs_short_texts():
    """Short texts against max_len=64 clear the PACK_AUTO_RATIO and route
    through the packed path; embeddings match the bucketed path exactly
    (same tokens, same math — only the layout differs)."""
    enc, corpus = _tok_encoder()
    texts = corpus * 2   # 24 short sentences (~10 tokens vs 64-wide rows)
    ref = enc.encode(texts, max_len=64, packed=False)
    assert not _packed_jit_used(enc)
    out = enc.encode(texts, max_len=64)   # packed="auto" default
    assert _packed_jit_used(enc), "auto should engage packing here"
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_encode_auto_respects_pooling_guard():
    """Non-mean pooling can't segment-pool → auto must stay bucketed."""
    enc, corpus = _tok_encoder(pooling="cls")
    enc.encode(corpus, max_len=64)
    assert not _packed_jit_used(enc)


def test_encode_auto_skips_near_full_rows():
    """Texts that already fill their bucket gain nothing from packing —
    the estimated token ratio stays under PACK_AUTO_RATIO."""
    enc, corpus = _tok_encoder()
    long_texts = [
        " ".join(["the quick brown fox jumps over the lazy dog"] * 3)
    ] * 12   # ~29 tokens each → bucket 32, 91% full, 1 per packed row ⇒
             # packing saves nothing (batch_size matches n so bucketed
             # tail padding doesn't tip the ratio either)
    enc.encode(long_texts, max_len=32, batch_size=12)
    assert not _packed_jit_used(enc)


def test_encode_packed_device_output_matches_host():
    enc, corpus = _tok_encoder()
    texts = corpus * 2
    host = enc.encode(texts, max_len=64, packed=True)
    dev = enc.encode(texts, max_len=64, packed=True, device_output=True)
    assert isinstance(dev, jax.Array)
    np.testing.assert_allclose(np.asarray(dev), host, atol=2e-5)


def test_packed_encode_dp_sharded_matches(eight_devices):
    """Packed embed under a data mesh (rows sharded over devices) matches
    the unsharded packed embed."""
    from text_similarity_tpu.core.mesh import make_mesh

    rng = np.random.default_rng(4)
    width = 64
    rows = _rand_rows(rng, 32, width, vocab=120)
    enc = _tiny_encoder()
    packed = pack_sequences(rows, width, pad_id=0)
    r = packed["ids"].shape[0]
    pad = (-r) % 8  # row count must split over the 8-way data axis
    ids = np.pad(packed["ids"], ((0, pad), (0, 0)))
    segs = np.pad(packed["segments"], ((0, pad), (0, 0)))
    pos = np.pad(packed["positions"], ((0, pad), (0, 0)))
    ref = np.asarray(enc.embed_tokens_packed(ids, segs, pos))

    enc_sharded = _tiny_encoder()
    enc_sharded.mesh = make_mesh(data=8)
    out = np.asarray(enc_sharded.embed_tokens_packed(ids, segs, pos))
    np.testing.assert_allclose(out, ref, atol=2e-5)


def _cross_encoder():
    from text_similarity_tpu.data.tokenization import (
        WordPieceTokenizer, train_wordpiece_vocab,
    )
    from text_similarity_tpu.models.cross_encoder import CrossEncoder

    corpus = [
        "the quick brown fox jumps over the lazy dog",
        "a fast dark fox leaped over a sleepy dog",
        "semantic similarity of sentences on tensor units",
        "the dog sleeps while the fox runs far away",
    ] * 3
    vocab = train_wordpiece_vocab(corpus, vocab_size=256, min_freq=1)
    tok = WordPieceTokenizer(vocab)
    arch = EncoderArch(
        vocab_size=300, hidden_size=32, num_layers=2, num_heads=4,
        intermediate_size=64, max_position=128, has_pooler=False,
        hidden_dropout=0.0, attention_dropout=0.0,
    )
    return CrossEncoder.init(
        jax.random.PRNGKey(3), arch, tokenizer=tok, num_classes=1,
        precision=precision_for(False),
    ), corpus


def test_cross_encoder_packed_scores_match_unpacked():
    """Packed pair scoring (several [CLS] a [SEP] b [SEP] pairs per row,
    each scored at its own CLS via segment_first_pool) must reproduce the
    per-pair bucketed scores exactly."""
    ce, corpus = _cross_encoder()
    pairs = [(corpus[i], corpus[(i + 1) % len(corpus)])
             for i in range(len(corpus))]
    ref = ce.predict(pairs, max_len=64, packed=False)
    out = ce.predict_packed(pairs, width=64, max_len=64)
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_cross_encoder_predict_auto_packs():
    ce, corpus = _cross_encoder()
    pairs = [(corpus[i], corpus[(i + 1) % len(corpus)])
             for i in range(len(corpus))]
    ref = ce.predict(pairs, max_len=64, packed=False)
    assert not _packed_jit_used(ce)
    out = ce.predict(pairs, max_len=64)   # auto: short pairs → packed
    assert _packed_jit_used(ce)
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_segment_first_pool_picks_segment_heads():
    from text_similarity_tpu.models.pooling import segment_first_pool

    rng = np.random.default_rng(5)
    h = jnp.asarray(rng.normal(size=(2, 10, 4)).astype(np.float32))
    segs = jnp.asarray(
        [[1, 1, 2, 2, 2, 0, 0, 0, 0, 0],
         [1, 2, 2, 3, 3, 3, 0, 0, 0, 0]], jnp.int32
    )
    out = np.asarray(segment_first_pool(h, segs, 3))
    hn = np.asarray(h)
    np.testing.assert_allclose(out[0, 0], hn[0, 0])
    np.testing.assert_allclose(out[0, 1], hn[0, 2])
    np.testing.assert_allclose(out[0, 2], np.zeros(4))
    np.testing.assert_allclose(out[1, 1], hn[1, 1])
    np.testing.assert_allclose(out[1, 2], hn[1, 3])
