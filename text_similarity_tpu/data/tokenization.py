"""Host-side tokenization.

The reference delegates tokenization to HF AutoTokenizer (+ MeCab for
Japanese, reference: src/utils/tokenizers.py:1-12); tokenization stays a CPU
concern here too (SURVEY.md §2.1). This module provides:

- ``WordPieceTokenizer``: a from-scratch BERT-style WordPiece tokenizer
  (basic whitespace/punctuation pre-split + greedy longest-match subwords)
  that can load a ``vocab.txt`` or a trained in-memory vocab;
- ``train_wordpiece_vocab``: a frequency-based vocab builder so tests and
  benches run with zero network access;
- ``load_tokenizer``: loads a HuggingFace ``tokenizer.json`` via the
  ``tokenizers`` wheel when one exists on disk, else ``vocab.txt``.

All tokenizers expose the same API: ``encode_batch(texts, max_len)`` /
``encode_pair_batch(a, b, max_len)`` returning numpy ``(ids, mask[,
type_ids])``, padded to ``max_len``, with [CLS]/[SEP] added.
"""

from __future__ import annotations

import collections
import json
import os
import re
import unicodedata
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np

PAD, UNK, CLS, SEP, MASK = "[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"
SPECIALS = [PAD, UNK, CLS, SEP, MASK]

_PUNCT_RE = re.compile(r"([\W_])", re.UNICODE)


def _basic_tokenize(text: str, lowercase: bool = True) -> List[str]:
    if lowercase:
        text = text.lower()
    text = unicodedata.normalize("NFKC", text)
    out = []
    for chunk in text.split():
        for piece in _PUNCT_RE.split(chunk):
            piece = piece.strip()
            if piece:
                out.append(piece)
    return out


class WordPieceTokenizer:
    """Greedy longest-match-first WordPiece (BERT semantics).

    The matcher inner loop runs in C when a compiler is available
    (text_similarity_tpu.native — the host data-loader hot path); falls
    back to pure Python with identical output."""

    def __init__(
        self,
        vocab: Dict[str, int],
        lowercase: bool = True,
        max_word_chars: int = 100,
        use_native: bool = True,
    ):
        self.vocab = dict(vocab)
        self.ids_to_tokens = {i: t for t, i in self.vocab.items()}
        self.lowercase = lowercase
        self.max_word_chars = max_word_chars
        self.pad_id = self.vocab[PAD]
        self.unk_id = self.vocab[UNK]
        self.cls_id = self.vocab[CLS]
        self.sep_id = self.vocab[SEP]
        self.mask_id = self.vocab.get(MASK, self.unk_id)  # MLM pretraining
        self._native = None
        if use_native:
            try:
                from ..native import NativeWordPiece

                # C side limits by bytes; words over the char limit are
                # unk'd in Python first, so give C 4× headroom for utf-8.
                self._native = NativeWordPiece(
                    self.vocab, self.unk_id, max_word_chars * 4
                )
            except Exception:
                self._native = None

    @property
    def vocab_size(self) -> int:
        return len(self.vocab)

    @classmethod
    def from_vocab_file(cls, path: str, lowercase: bool = True):
        vocab = {}
        with open(path, encoding="utf-8") as f:
            for i, line in enumerate(f):
                # strip \r too: a CRLF vocab.txt would key every token as
                # 'token\r' and tokenize everything to [UNK]
                vocab[line.rstrip("\r\n")] = i
        return cls(vocab, lowercase=lowercase)

    def save_vocab(self, path: str) -> None:
        with open(path, "w", encoding="utf-8") as f:
            for tok, _ in sorted(self.vocab.items(), key=lambda kv: kv[1]):
                f.write(tok + "\n")

    def _wordpiece(self, word: str) -> List[int]:
        if len(word) > self.max_word_chars:
            return [self.unk_id]
        ids, start = [], 0
        n = len(word)
        while start < n:
            end, cur = n, None
            while start < end:
                sub = word[start:end]
                if start > 0:
                    sub = "##" + sub
                if sub in self.vocab:
                    cur = self.vocab[sub]
                    break
                end -= 1
            if cur is None:
                return [self.unk_id]
            ids.append(cur)
            start = end
        return ids

    def tokenize_to_ids(self, text: str) -> List[int]:
        words = _basic_tokenize(text, self.lowercase)
        if self._native is not None:
            safe = [
                w if len(w) <= self.max_word_chars else UNK for w in words
            ]
            return self._native.encode_flat(safe)
        ids: List[int] = []
        for w in words:
            ids.extend(self._wordpiece(w))
        return ids

    def tokenize_many(self, texts: Sequence[str]) -> List[List[int]]:
        """Batch tokenization — one native call for the whole corpus (the
        ctypes marshalling amortizes over all texts; this is the path the
        batch builders and encode() use)."""
        split = [_basic_tokenize(t, self.lowercase) for t in texts]
        if self._native is None:
            return [
                [i for w in words for i in self._wordpiece(w)]
                for words in split
            ]
        all_words: List[str] = []
        counts = []
        for words in split:
            for w in words:
                all_words.append(
                    w if len(w) <= self.max_word_chars else UNK
                )
            counts.append(len(words))
        ids, word_ends = self._native.encode_joined(
            "\n".join(all_words), len(all_words)
        )
        # regroup once per TEXT (not per word): text t's ids end at
        # word_ends[last word of t]
        out: List[List[int]] = []
        wpos, prev_end = 0, 0
        for c in counts:
            if c == 0:
                out.append([])
                continue
            end = int(word_ends[wpos + c - 1])
            out.append(ids[prev_end:end].tolist())
            prev_end = end
            wpos += c
        return out

    # ------------------------------------------------------------------
    # Batch APIs (numpy, padded)
    # ------------------------------------------------------------------

    def encode_batch(
        self, texts: Sequence[str], max_len: int = 128, pad_to: Optional[int] = None
    ) -> Tuple[np.ndarray, np.ndarray]:
        """→ (ids, mask), shape (B, L). [CLS] tokens [SEP], truncated.

        Fast path: the whole batch (split + wordpiece + CLS/SEP/pad) runs
        in ONE pthread-parallel C call (native.wp_encode_batch) — measured
        ~10× the sequential path. Non-ASCII docs fall back per-row to the
        full-unicode Python pipeline (identical output either way)."""
        texts = list(texts)
        use_native = self._native is not None and texts and max_len >= 2
        if use_native:
            try:
                ids, mask, lens, needs_py = self._native.encode_batch_padded(
                    texts, max_len, self.cls_id, self.sep_id, self.pad_id,
                    lowercase=self.lowercase,
                    max_word_chars=self.max_word_chars,
                )
            except Exception:
                use_native = False    # pure-Python path below
        if use_native:
            for i in np.nonzero(needs_py)[0]:
                row = (
                    [self.cls_id]
                    + self.tokenize_to_ids(texts[i])[: max_len - 2]
                    + [self.sep_id]
                )
                ids[i, : len(row)] = row
                ids[i, len(row):] = self.pad_id
                mask[i, : len(row)] = 1
                mask[i, len(row):] = 0
                lens[i] = len(row)
            if pad_to and len(lens) and pad_to < int(lens.max()):
                raise ValueError(
                    f"pad_to={pad_to} < longest row ({int(lens.max())}): "
                    "would truncate mid-sequence; raise pad_to or lower "
                    "max_len"
                )
            L = pad_to or max(int(lens.max()) if len(lens) else 2, 2)
            if L > max_len:
                # the native buffers are (B, max_len); honor pad_to > max_len
                # exactly like the pure-Python path does (shape parity)
                extra = L - max_len
                ids = np.pad(ids, ((0, 0), (0, extra)),
                             constant_values=self.pad_id)
                mask = np.pad(mask, ((0, 0), (0, extra)))
            return ids[:, :L], mask[:, :L]
        rows = []
        for t in texts:
            ids = [self.cls_id] + self.tokenize_to_ids(t)[: max_len - 2] + [self.sep_id]
            rows.append(ids)
        _longest = max((len(r) for r in rows), default=2)
        if pad_to and pad_to < _longest:
            raise ValueError(
                f"pad_to={pad_to} < longest row ({_longest}): would "
                "truncate mid-sequence; raise pad_to or lower max_len"
            )
        L = pad_to or _longest
        out = np.full((len(rows), L), self.pad_id, np.int32)
        mask = np.zeros((len(rows), L), np.int32)
        for i, r in enumerate(rows):
            out[i, : len(r)] = r
            mask[i, : len(r)] = 1
        return out, mask

    def encode_pair_batch(
        self,
        texts_a: Sequence[str],
        texts_b: Sequence[str],
        max_len: int = 128,
        pad_to: Optional[int] = None,
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Cross-encoder input: [CLS] a [SEP] b [SEP] with token types."""
        rows, types = [], []
        budget = max_len - 3
        for a, b in zip(texts_a, texts_b):
            ia, ib = self.tokenize_to_ids(a), self.tokenize_to_ids(b)
            # longest-first truncation (HF 'longest_first' strategy)
            while len(ia) + len(ib) > budget:
                if len(ia) >= len(ib):
                    ia.pop()
                else:
                    ib.pop()
            ids = [self.cls_id] + ia + [self.sep_id] + ib + [self.sep_id]
            tt = [0] * (len(ia) + 2) + [1] * (len(ib) + 1)
            rows.append(ids)
            types.append(tt)
        _longest = max((len(r) for r in rows), default=2)
        if pad_to and pad_to < _longest:
            raise ValueError(
                f"pad_to={pad_to} < longest row ({_longest}): would "
                "truncate mid-sequence; raise pad_to or lower max_len"
            )
        L = pad_to or _longest
        out = np.full((len(rows), L), self.pad_id, np.int32)
        mask = np.zeros((len(rows), L), np.int32)
        tts = np.zeros((len(rows), L), np.int32)
        for i, (r, tt) in enumerate(zip(rows, types)):
            out[i, : len(r)] = r
            mask[i, : len(r)] = 1
            tts[i, : len(tt)] = tt
        return out, mask, tts

    def encode_pair_rows(
        self,
        texts_a: Sequence[str],
        texts_b: Sequence[str],
        max_len: int = 128,
    ) -> Tuple[List[List[int]], List[List[int]]]:
        """Ragged form of ``encode_pair_batch``: [CLS] a [SEP] b [SEP]
        token rows + type rows, no padding — the packing input. One
        batched native tokenize per side instead of a per-text call, and
        closed-form longest-first truncation instead of the pop loop;
        this is the serving rerank hot path (25k pairs per 256-query
        batch measured 3.7s through the padded path, ~0.4s here)."""
        ra = self.tokenize_many(texts_a)
        rb = self.tokenize_many(texts_b)
        budget = max_len - 3
        half = budget // 2
        cls_id, sep_id = self.cls_id, self.sep_id
        rows, types = [], []
        for ia, ib in zip(ra, rb):
            la, lb = len(ia), len(ib)
            if la + lb > budget:
                # longest-first (HF 'longest_first'): pop from the longer
                # side (ties → a) until within budget — in closed form
                if lb <= half:
                    la = budget - lb
                elif la <= half:
                    lb = budget - la
                else:
                    la, lb = half, budget - half
                ia, ib = ia[:la], ib[:lb]
            rows.append([cls_id] + ia + [sep_id] + ib + [sep_id])
            types.append([0] * (la + 2) + [1] * (lb + 1))
        return rows, types

    def encode_bodies(
        self, texts: Sequence[str], max_body: int
    ) -> Tuple[np.ndarray, np.ndarray]:
        """→ (body_ids (N, ≤max_body+1) int32 left-aligned, body lens):
        tokenized bodies without CLS/SEP, truncated to ``max_body``.
        Rides the all-C pthread-parallel ``encode_batch`` and slices the
        specials off — the array-form input to
        ``data.packing.pack_pair_arrays`` (serving rerank hot path)."""
        ids, mask = self.encode_batch(texts, max_len=max_body + 2)
        lens = mask.sum(axis=1).astype(np.int64) - 2
        return ids[:, 1:], lens

    def token_spans(self, text: str) -> List[Tuple[str, List[int]]]:
        """Word → positions of its wordpieces in the encoded sequence
        (offset by 1 for [CLS]) — the analogue of the reference's
        word↔subtoken alignment (dataset.py:353-379), used by WiC/GWSC."""
        spans, pos = [], 1  # position 0 is [CLS]
        for w in _basic_tokenize(text, self.lowercase):
            n = len(self._wordpiece(w))
            spans.append((w, list(range(pos, pos + n))))
            pos += n
        return spans


def train_wordpiece_vocab(
    texts: Iterable[str],
    vocab_size: int = 8192,
    lowercase: bool = True,
    min_freq: int = 2,
) -> Dict[str, int]:
    """Build a WordPiece vocab: all single chars (+ '##' continuations) for
    full coverage, then the most frequent whole words and suffixes."""
    word_freq: collections.Counter = collections.Counter()
    for t in texts:
        word_freq.update(_basic_tokenize(t, lowercase))

    char_set, cont_set = set(), set()
    for w in word_freq:
        for i, ch in enumerate(w):
            (char_set if i == 0 else cont_set).add(ch)

    cand: collections.Counter = collections.Counter()
    for w, f in word_freq.items():
        if f >= min_freq:
            cand[w] += f
            # frequent suffixes as continuation pieces
            for i in range(1, min(len(w), 8)):
                cand["##" + w[i:]] += f

    vocab: Dict[str, int] = {}
    for s in SPECIALS:
        vocab[s] = len(vocab)
    for ch in sorted(char_set):
        if ch not in vocab:
            vocab[ch] = len(vocab)
    for ch in sorted(cont_set):
        tok = "##" + ch
        if tok not in vocab:
            vocab[tok] = len(vocab)
    for tok, _ in cand.most_common():
        if len(vocab) >= vocab_size:
            break
        if tok not in vocab:
            vocab[tok] = len(vocab)
    return vocab


class HFTokenizerAdapter:
    """Wraps a HuggingFace ``tokenizers.Tokenizer`` (from tokenizer.json on
    disk) behind the same batch API."""

    def __init__(self, tok, pad_id: int, cls_id: int, sep_id: int,
                 unk_id: int = 0, mask_id: Optional[int] = None):
        self._tok = tok
        self.pad_id, self.cls_id, self.sep_id = pad_id, cls_id, sep_id
        self.unk_id = unk_id
        self.mask_id = mask_id if mask_id is not None else unk_id
        # the HF tokenizer normalizes internally; word-level helpers below
        # must not lowercase again
        self.lowercase = False
        self.vocab_size = tok.get_vocab_size()

    @classmethod
    def from_file(cls, path: str):
        from tokenizers import Tokenizer

        tok = Tokenizer.from_file(path)
        vocab = tok.get_vocab()
        return cls(
            tok,
            pad_id=vocab.get(PAD, 0),
            cls_id=vocab.get(CLS, vocab.get("<s>", 0)),
            sep_id=vocab.get(SEP, vocab.get("</s>", 0)),
            unk_id=vocab.get(UNK, vocab.get("<unk>", 0)),
            mask_id=vocab.get(MASK, vocab.get("<mask>")),
        )

    def _wordpiece(self, word: str):
        """Sub-token ids of one word, no specials — gives the word-level
        batch builders (WiC/NER) the same surface WordPieceTokenizer has."""
        enc = self._tok.encode(word, add_special_tokens=False)
        return list(enc.ids) or [self.unk_id]

    def token_spans(self, text: str):
        """[(basic_token, subtoken_ids)] — mirrors
        WordPieceTokenizer.token_spans for the span batch builders."""
        return [
            (w, self._wordpiece(w))
            for w in _basic_tokenize(text, lowercase=False)
        ]

    def _truncate(self, ids, max_len):
        """Truncate but keep the terminal [SEP] — BERT-class models never
        saw rows ending mid-sequence in training."""
        if len(ids) <= max_len:
            return list(ids)
        return list(ids[: max_len - 1]) + [self.sep_id]

    def encode_batch(self, texts, max_len=128, pad_to=None):
        encs = self._tok.encode_batch(list(texts))
        rows = [self._truncate(e.ids, max_len) for e in encs]
        _longest = max((len(r) for r in rows), default=2)
        if pad_to and pad_to < _longest:
            raise ValueError(
                f"pad_to={pad_to} < longest row ({_longest}): would "
                "truncate mid-sequence; raise pad_to or lower max_len"
            )
        L = pad_to or _longest
        out = np.full((len(rows), L), self.pad_id, np.int32)
        mask = np.zeros((len(rows), L), np.int32)
        for i, r in enumerate(rows):
            out[i, : len(r)] = r
            mask[i, : len(r)] = 1
        return out, mask

    def encode_pair_batch(self, texts_a, texts_b, max_len=128, pad_to=None):
        encs = self._tok.encode_batch(list(zip(texts_a, texts_b)))
        rows = [self._truncate(e.ids, max_len) for e in encs]
        tids = [e.type_ids[: len(r)] for e, r in zip(encs, rows)]
        _longest = max((len(r) for r in rows), default=2)
        if pad_to and pad_to < _longest:
            raise ValueError(
                f"pad_to={pad_to} < longest row ({_longest}): would "
                "truncate mid-sequence; raise pad_to or lower max_len"
            )
        L = pad_to or _longest
        out = np.full((len(rows), L), self.pad_id, np.int32)
        mask = np.zeros((len(rows), L), np.int32)
        tts = np.zeros((len(rows), L), np.int32)
        for i, (r, tt) in enumerate(zip(rows, tids)):
            out[i, : len(r)] = r
            mask[i, : len(r)] = 1
            tts[i, : len(tt)] = tt
        return out, mask, tts


def load_tokenizer(path: str):
    """Load a tokenizer from a model directory: prefers tokenizer.json
    (HF fast-tokenizer format), falls back to vocab.txt (WordPiece)."""
    tj = os.path.join(path, "tokenizer.json")
    if os.path.exists(tj):
        return HFTokenizerAdapter.from_file(tj)
    vt = os.path.join(path, "vocab.txt")
    if os.path.exists(vt):
        lowercase = True
        cfgp = os.path.join(path, "tokenizer_config.json")
        if os.path.exists(cfgp):
            with open(cfgp) as f:
                lowercase = json.load(f).get("do_lower_case", True)
        return WordPieceTokenizer.from_vocab_file(vt, lowercase=lowercase)
    raise FileNotFoundError(f"no tokenizer.json or vocab.txt under {path}")
