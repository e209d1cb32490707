"""Batch builders: example lists → fixed-shape device batches.

The TPU-native "smart batching" (reference SmartParaphraseDataloader,
src/dataset/dataset.py:338-807): pairs are pre-tokenized once, sorted by
max-side length, grouped into same-bucket batches of a fixed batch size
(static shapes → one compile per bucket), tails padded with masked rows.

Modes mirror the reference's (dataset.py:386-418):
- ``build_pair_batches(mode="bi")``      ← standard/parallel (twin features)
- ``build_pair_batches(mode="cross")``   ← standard sentence-pair
                                           cross-encoder batches
- ``build_sequence_batches``             ← sequence (document classification)
- ``build_distill_batches``              ← distillation (student tokens +
                                           teacher embeddings as targets)
- ``build_word_batches``                 ← word (WiC span features)
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from .batching import BUCKETS, pick_bucket


def _tok_rows(tokenizer, texts: Sequence[str], max_len: int) -> List[List[int]]:
    if hasattr(tokenizer, "tokenize_many"):
        # one batched call (the native C path tokenizes the corpus at once)
        return [
            [tokenizer.cls_id] + body[: max_len - 2] + [tokenizer.sep_id]
            for body in tokenizer.tokenize_many(list(texts))
        ]
    if hasattr(tokenizer, "tokenize_to_ids"):
        return [
            [tokenizer.cls_id]
            + tokenizer.tokenize_to_ids(t)[: max_len - 2]
            + [tokenizer.sep_id]
            for t in texts
        ]
    # HF tokenizer.json adapter: only exposes encode_batch — strip pads
    ids, mask = tokenizer.encode_batch(list(texts), max_len)
    return [
        [int(t) for t in ids[i, : int(mask[i].sum())]]
        for i in range(len(texts))
    ]


def _cap_bucket(longest: int, buckets, max_len: int) -> int:
    """Bucket width clamped to the padded array width: pick_bucket can
    return a bucket ABOVE max_len (crash on assignment) or silently cap
    at buckets[-1] BELOW a larger max_len (mid-sequence truncation)."""
    L = pick_bucket(longest, buckets)
    if longest > L:          # bucket list exhausted: honor max_len
        L = max_len
    return min(L, max_len)


def _pad_rows(rows, batch_idx, bs, L, pad_id):
    ids = np.full((bs, L), pad_id, np.int32)
    mask = np.zeros((bs, L), np.int32)
    for j, r in enumerate(batch_idx):
        row = rows[r][:L]
        ids[j, : len(row)] = row
        mask[j, : len(row)] = 1
    return ids, mask


def build_pair_batches(
    tokenizer,
    pairs: Sequence,                  # [(a, b), ...]
    targets: Sequence,                # labels / scores, len == len(pairs)
    batch_size: int = 32,
    max_len: int = 128,
    mode: str = "bi",                 # "bi" (twin towers) | "cross" (joint)
    buckets=BUCKETS,
    shuffle: bool = True,
    seed: int = 0,
    target_dtype=np.float32,
) -> List[Dict[str, np.ndarray]]:
    rng = np.random.RandomState(seed)
    targets = np.asarray(targets)

    if mode == "cross":
        enc = tokenizer.encode_pair_batch(
            [p[0] for p in pairs], [p[1] for p in pairs],
            max_len=max_len, pad_to=max_len,
        )
        ids_all, mask_all, tts_all = enc
        lens = mask_all.sum(1)
        order = np.argsort(lens, kind="stable")
        batches = []
        for s in range(0, len(order), batch_size):
            g = order[s : s + batch_size]
            L = _cap_bucket(int(lens[g].max()), buckets, max_len)
            bs = batch_size
            ids = np.zeros((bs, L), np.int32)
            ids[:, :] = tokenizer.pad_id
            mask = np.zeros((bs, L), np.int32)
            tts = np.zeros((bs, L), np.int32)
            tgt = np.zeros((bs,), target_dtype)
            valid = np.zeros((bs,), np.int32)
            for j, r in enumerate(g):
                ids[j, :L] = ids_all[r, :L]
                mask[j, :L] = mask_all[r, :L]
                tts[j, :L] = tts_all[r, :L]
                tgt[j] = targets[r]
                valid[j] = 1
            batches.append(
                {"ids": ids, "mask": mask, "type_ids": tts,
                 "labels": tgt, "valid": valid}
            )
        if shuffle:
            rng.shuffle(batches)
        return batches

    rows_a = _tok_rows(tokenizer, [p[0] for p in pairs], max_len)
    rows_b = _tok_rows(tokenizer, [p[1] for p in pairs], max_len)
    lens = np.maximum(
        [len(r) for r in rows_a], [len(r) for r in rows_b]
    )
    order = np.argsort(lens, kind="stable")
    batches = []
    for s in range(0, len(order), batch_size):
        g = order[s : s + batch_size]
        L = _cap_bucket(int(lens[g].max()), buckets, max_len)
        ids_a, mask_a = _pad_rows(rows_a, g, batch_size, L, tokenizer.pad_id)
        ids_b, mask_b = _pad_rows(rows_b, g, batch_size, L, tokenizer.pad_id)
        tgt = np.zeros((batch_size,), target_dtype)
        valid = np.zeros((batch_size,), np.int32)
        tgt[: len(g)] = targets[g]
        valid[: len(g)] = 1
        batches.append(
            {"ids_a": ids_a, "mask_a": mask_a,
             "ids_b": ids_b, "mask_b": mask_b,
             "target": tgt, "valid": valid}
        )
    if shuffle:
        rng.shuffle(batches)
    return batches


def _pack_group(rows, group, width, pad_id, types=None):
    from .packing import pack_sequences

    return pack_sequences(
        [rows[i] for i in group], width, pad_id=pad_id,
        row_types=[types[i] for i in group] if types is not None else None,
    )


def _pad_packed(pk, rows_per_side, max_segments, with_types=False):
    """Pad one pack_sequences layout to the batch-set's fixed shapes."""
    r = pk["ids"].shape[0]
    out = {}
    keys = ("ids", "segments", "positions") + (
        ("type_ids",) if with_types else ()
    )
    for k in keys:
        out[k] = np.pad(pk[k], ((0, rows_per_side - r), (0, 0)))
    ow = pk["owners"]
    out["owners"] = np.pad(
        ow,
        ((0, rows_per_side - r), (0, max_segments - ow.shape[1])),
        constant_values=-1,
    )
    return out


def build_packed_pair_batches(
    tokenizer,
    pairs: Sequence,
    targets: Sequence,
    rows_per_side: int = 32,
    width: int = 128,
    mode: str = "bi",                 # "bi" (twin towers) | "cross" (joint)
    shuffle: bool = True,
    seed: int = 0,
    target_dtype=np.float32,
) -> List[Dict[str, np.ndarray]]:
    """PACKED pair batches: several short sentences per fixed-width row
    behind a block-diagonal mask (data/packing.py) — the training-side
    form of the measured 2.3-2.6× packing win. Supersedes the reference's
    smart batching (src/dataset/dataset.py:386-418): where that pads every
    pair to its batch's longest, this packs ~width/len pairs per row so
    MXU work tracks real tokens.

    All batches share one static shape set (one compile):
      mode="bi":    ids_a/segments_a/positions_a (R, W), owners_a (R, M),
                    same _b, target (P,), valid (P,)
      mode="cross": ids/segments/positions/type_ids (R, W), owners (R, M),
                    labels (P,), valid (P,)
    R = rows_per_side, W = width, M/P = derived segment-slot / pair
    capacities (constant across the returned batches). Consumed by
    train.steps.make_packed_{bi_encoder,classifier}_train_step."""
    if not len(pairs):
        return []
    cross = mode == "cross"
    types = None
    if cross:
        ids_all, mask_all, tts_all = tokenizer.encode_pair_batch(
            [p[0] for p in pairs], [p[1] for p in pairs], max_len=width
        )
        lens_r = mask_all.sum(axis=1)
        rows_a = [
            list(ids_all[i, : lens_r[i]]) for i in range(len(pairs))
        ]
        types = [
            list(tts_all[i, : lens_r[i]]) for i in range(len(pairs))
        ]
        rows_b = rows_a
    else:
        rows_a = _tok_rows(tokenizer, [p[0] for p in pairs], width)
        rows_b = _tok_rows(tokenizer, [p[1] for p in pairs], width)
    return packed_pair_batches_from_rows(
        rows_a, rows_b, targets, rows_per_side=rows_per_side, width=width,
        pad_id=tokenizer.pad_id, types=types, cross=cross,
        shuffle=shuffle, seed=seed, target_dtype=target_dtype,
    )


def packed_pair_batches_from_rows(
    rows_a: Sequence[Sequence[int]],
    rows_b: Sequence[Sequence[int]],
    targets: Sequence,
    rows_per_side: int = 32,
    width: int = 128,
    pad_id: int = 0,
    types: Optional[Sequence[Sequence[int]]] = None,
    cross: bool = False,
    shuffle: bool = True,
    seed: int = 0,
    target_dtype=np.float32,
) -> List[Dict[str, np.ndarray]]:
    """Pre-tokenized-row form of ``build_packed_pair_batches`` (benches and
    drive scripts feed synthetic token rows directly). ``cross=True``
    treats rows_a as joint [CLS] a [SEP] b [SEP] rows (rows_b ignored)."""
    if not len(rows_a):
        return []
    targets = np.asarray(targets)
    rng = np.random.RandomState(seed)
    rows_a = [list(r[:width]) for r in rows_a]
    rows_b = rows_a if cross else [list(r[:width]) for r in rows_b]
    if types is not None:
        types = [list(t[:width]) for t in types]
    la = np.asarray([len(r) for r in rows_a], np.int64)
    lb = np.asarray([len(r) for r in rows_b], np.int64)
    cost = la if cross else np.maximum(la, lb)

    # group pairs by token budget (longest-first keeps groups homogeneous
    # and FFD-friendly), then verify each side really packs into R rows —
    # overflow pairs spill into the next group.
    order = list(np.argsort(-cost, kind="stable"))
    cap = int(rows_per_side * width * 0.98)
    groups: List[List[int]] = []
    cur: List[int] = []
    sa = sb = 0
    for i in order:
        a_len = len(rows_a[i])
        b_len = a_len if cross else len(rows_b[i])
        if cur and (sa + a_len > cap or sb + b_len > cap):
            groups.append(cur)
            cur, sa, sb = [], 0, 0
        cur.append(int(i))
        sa += a_len
        sb += b_len
    if cur:
        groups.append(cur)

    packed_groups = []
    spill: List[int] = []
    gi = 0
    while gi < len(groups) or spill:
        g = (spill + groups[gi]) if gi < len(groups) else spill
        spill = []
        gi += 1
        while True:
            pa = _pack_group(rows_a, g, width, pad_id, types)
            pb = (
                pa if cross
                else _pack_group(rows_b, g, width, pad_id)
            )
            if (
                pa["ids"].shape[0] <= rows_per_side
                and pb["ids"].shape[0] <= rows_per_side
            ):
                break
            spill.insert(0, g.pop())   # shortest member → next group
        packed_groups.append((g, pa, pb))

    # fixed segment-slot / pair capacities across the batch set
    m = max(
        max(pa["owners"].shape[1], pb["owners"].shape[1])
        for _, pa, pb in packed_groups
    )
    if m > 1:
        m = 1 << (m - 1).bit_length()
    p_cap = max(len(g) for g, _, _ in packed_groups)
    p_cap = -(-p_cap // 8) * 8

    batches = []
    for g, pa, pb in packed_groups:
        tgt = np.zeros(
            (p_cap,) + targets.shape[1:], target_dtype
        )
        valid = np.zeros((p_cap,), np.int32)
        tgt[: len(g)] = targets[g]
        valid[: len(g)] = 1
        if cross:
            side = _pad_packed(pa, rows_per_side, m, with_types=True)
            batches.append(
                {"ids": side["ids"], "segments": side["segments"],
                 "positions": side["positions"],
                 "type_ids": side["type_ids"], "owners": side["owners"],
                 "labels": tgt, "valid": valid}
            )
        else:
            a = _pad_packed(pa, rows_per_side, m)
            b = _pad_packed(pb, rows_per_side, m)
            batches.append(
                {"ids_a": a["ids"], "segments_a": a["segments"],
                 "positions_a": a["positions"], "owners_a": a["owners"],
                 "ids_b": b["ids"], "segments_b": b["segments"],
                 "positions_b": b["positions"], "owners_b": b["owners"],
                 "target": tgt, "valid": valid}
            )
    if shuffle:
        rng.shuffle(batches)
    return batches


def build_sequence_batches(
    tokenizer,
    texts: Sequence[str],
    labels: Sequence[int],
    batch_size: int = 32,
    max_len: int = 256,
    buckets=BUCKETS,
    shuffle: bool = True,
    seed: int = 0,
) -> List[Dict[str, np.ndarray]]:
    """Document-classification batches (reference smart_batching_sequence,
    dataset.py:772-806)."""
    rng = np.random.RandomState(seed)
    rows = _tok_rows(tokenizer, texts, max_len)
    labels = np.asarray(labels)
    lens = np.asarray([len(r) for r in rows])
    order = np.argsort(lens, kind="stable")
    batches = []
    for s in range(0, len(order), batch_size):
        g = order[s : s + batch_size]
        L = _cap_bucket(int(lens[g].max()), buckets, max_len)
        ids, mask = _pad_rows(rows, g, batch_size, L, tokenizer.pad_id)
        lab = np.zeros((batch_size,), np.int32)
        valid = np.zeros((batch_size,), np.int32)
        lab[: len(g)] = labels[g]
        valid[: len(g)] = 1
        batches.append(
            {"ids": ids, "mask": mask,
             "type_ids": np.zeros_like(ids),
             "labels": lab, "valid": valid}
        )
    if shuffle:
        rng.shuffle(batches)
    return batches


def build_distill_batches(
    student_tokenizer,
    sentences: Sequence[str],
    teacher_embeddings: np.ndarray,     # (N, D) precomputed teacher targets
    batch_size: int = 32,
    max_len: int = 128,
    buckets=BUCKETS,
    shuffle: bool = True,
    seed: int = 0,
    src_sentences: Optional[Sequence[str]] = None,
) -> List[Dict[str, np.ndarray]]:
    """Distillation batches: student tokens + teacher embedding targets
    (reference smart_batching_distillation dataset.py:738-770 and the
    multilingual parallel mode :687-736). With ``src_sentences`` (the
    teacher-side parallel texts, aligned 1:1 with ``sentences``), the
    student trains on BOTH sides mapping to the same teacher embedding —
    the make_multilingual recipe (student(src) ≈ student(tgt) ≈
    teacher(src))."""
    if src_sentences is not None:
        if len(src_sentences) != len(sentences):
            raise ValueError(
                f"src/tgt length mismatch: {len(src_sentences)} vs "
                f"{len(sentences)} (parallel corpora must align 1:1)"
            )
        sentences = list(src_sentences) + list(sentences)
        teacher_embeddings = np.concatenate(
            [teacher_embeddings, teacher_embeddings]
        )
    rng = np.random.RandomState(seed)
    rows = _tok_rows(student_tokenizer, sentences, max_len)
    lens = np.asarray([len(r) for r in rows])
    order = np.argsort(lens, kind="stable")
    d = teacher_embeddings.shape[1]
    batches = []
    for s in range(0, len(order), batch_size):
        g = order[s : s + batch_size]
        L = _cap_bucket(int(lens[g].max()), buckets, max_len)
        ids, mask = _pad_rows(rows, g, batch_size, L, student_tokenizer.pad_id)
        tgt = np.zeros((batch_size, d), np.float32)
        valid = np.zeros((batch_size,), np.int32)
        tgt[: len(g)] = teacher_embeddings[g]
        valid[: len(g)] = 1
        batches.append(
            {"ids_a": ids, "mask_a": mask,
             "ids_b": ids, "mask_b": mask,   # unused by distill_mse loss
             "target": tgt, "valid": valid}
        )
    if shuffle:
        rng.shuffle(batches)
    return batches


def build_word_batches(
    tokenizer,
    examples: Sequence[Dict],           # load_wic rows
    batch_size: int = 32,
    max_len: int = 128,
    max_span: int = 8,
    shuffle: bool = True,
    seed: int = 0,
) -> List[Dict[str, np.ndarray]]:
    """WiC word-in-context batches: twin sentences + target-word sub-token
    span indices (reference smart_batching_word dataset.py:482-529; the
    word↔subtoken alignment of :353-379 is tokenizer.token_spans)."""
    rng = np.random.RandomState(seed)

    from .tokenization import _basic_tokenize

    def encode_with_span(sent: str, word_idx: int):
        spans = tokenizer.token_spans(sent)
        # WiC word indices count WHITESPACE-separated chunks, but
        # token_spans enumerates punctuation-split basic tokens — map the
        # chunk index to its basic-token range, and inside the chunk mark
        # the alphanumeric token(s) (skip attached punctuation like the
        # comma in "cat,"), so the span really covers the target word.
        lowercase = getattr(tokenizer, "lowercase", True)
        chunk_of = []
        for ci, chunk in enumerate(sent.split()):
            chunk_of.extend([ci] * len(_basic_tokenize(chunk, lowercase)))
        target = {
            wi for wi, (w, _) in enumerate(spans)
            if wi < len(chunk_of) and chunk_of[wi] == word_idx
            and any(ch.isalnum() for ch in w)
        }
        if not target:   # pure-punctuation chunk: take all of its tokens
            target = {
                wi for wi in range(len(spans))
                if wi < len(chunk_of) and chunk_of[wi] == word_idx
            }
        row = [tokenizer.cls_id]
        span_pos = [-1] * max_span
        n_marked = 0
        for wi, (w, positions) in enumerate(spans):
            if len(row) >= max_len - 1:
                break
            if wi in target:
                for p in range(len(row), len(row) + len(positions)):
                    if n_marked < max_span and p < max_len - 1:
                        span_pos[n_marked] = p
                        n_marked += 1
            row.extend(tokenizer._wordpiece(w)[: max_len - 1 - len(row)])
        row.append(tokenizer.sep_id)
        return row, span_pos

    rows_a, rows_b, spans_a, spans_b, labels = [], [], [], [], []
    for ex in examples:
        ra, sa = encode_with_span(ex["sent1"], ex["idx1"])
        rb, sb = encode_with_span(ex["sent2"], ex["idx2"])
        rows_a.append(ra)
        rows_b.append(rb)
        spans_a.append(sa)
        spans_b.append(sb)
        labels.append(ex["label"] if ex["label"] is not None else 0)

    lens = np.maximum([len(r) for r in rows_a], [len(r) for r in rows_b])
    order = np.argsort(lens, kind="stable")
    batches = []
    for s in range(0, len(order), batch_size):
        g = order[s : s + batch_size]
        L = _cap_bucket(int(lens[g].max()), BUCKETS, max_len)
        ids_a, mask_a = _pad_rows(rows_a, g, batch_size, L, tokenizer.pad_id)
        ids_b, mask_b = _pad_rows(rows_b, g, batch_size, L, tokenizer.pad_id)
        sa = np.full((batch_size, max_span), -1, np.int32)
        sb = np.full((batch_size, max_span), -1, np.int32)
        lab = np.zeros((batch_size,), np.int32)
        valid = np.zeros((batch_size,), np.int32)
        index = np.full((batch_size,), -1, np.int64)
        for j, r in enumerate(g):
            sa[j] = spans_a[r]
            sb[j] = spans_b[r]
            lab[j] = labels[r]
            valid[j] = 1
            index[j] = r
        batches.append(
            {"ids_a": ids_a, "mask_a": mask_a, "span_a": sa,
             "ids_b": ids_b, "mask_b": mask_b, "span_b": sb,
             "target": lab, "valid": valid, "index": index}
        )
    if shuffle:
        rng.shuffle(batches)
    return batches
