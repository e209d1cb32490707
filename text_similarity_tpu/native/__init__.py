"""Native (C) host-runtime components, bound via ctypes.

The compute path is JAX/Pallas on the TPU; the host runtime around it uses
C where the reference leaned on native code (SURVEY.md §2.1): here the
WordPiece tokenization inner loop (the data-loader hot path feeding the
encoder). The shared library builds on first use with the system compiler
and is cached next to the source; everything degrades gracefully to the
pure-Python implementation when no compiler is available.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from typing import List, Optional, Sequence

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "wordpiece.c")
_SRC_PACK = os.path.join(_HERE, "pack.c")

_lib = None
_lib_err: Optional[str] = None


def _build_lib() -> Optional[str]:
    """Compile wordpiece.c + pack.c → cached .so keyed by source hash."""
    srcs = [_SRC, _SRC_PACK]
    h = hashlib.sha256()
    for s in srcs:
        with open(s, "rb") as f:
            h.update(f.read())
    tag = h.hexdigest()[:16]
    cache_dir = os.environ.get(
        "TS_TPU_NATIVE_CACHE",
        os.path.join(tempfile.gettempdir(), "ts_tpu_native"),
    )
    os.makedirs(cache_dir, exist_ok=True)
    so_path = os.path.join(cache_dir, f"native_{tag}.so")
    if os.path.exists(so_path):
        return so_path
    for cc in ("cc", "gcc", "clang"):
        try:
            tmp = so_path + ".tmp"
            subprocess.run(
                [cc, "-O3", "-shared", "-fPIC", "-o", tmp] + srcs,
                check=True, capture_output=True, timeout=120,
            )
            os.replace(tmp, so_path)
            return so_path
        except (subprocess.CalledProcessError, FileNotFoundError,
                subprocess.TimeoutExpired):
            continue
    return None


def get_lib():
    """ctypes handle to the native library, or None if unavailable."""
    global _lib, _lib_err
    if _lib is not None or _lib_err is not None:
        return _lib
    so = _build_lib()
    if so is None:
        _lib_err = "no C compiler available"
        return None
    lib = ctypes.CDLL(so)
    lib.wp_create.restype = ctypes.c_void_p
    lib.wp_create.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
        ctypes.c_int32,
        ctypes.c_int32,
    ]
    lib.wp_free.argtypes = [ctypes.c_void_p]
    lib.wp_encode_words.restype = ctypes.c_int64
    lib.wp_encode_words.argtypes = [
        ctypes.c_void_p,
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
    ]
    lib.wp_encode_joined.restype = ctypes.c_int64
    lib.wp_encode_joined.argtypes = [
        ctypes.c_void_p,
        ctypes.c_char_p,
        ctypes.c_int64,
        ctypes.c_char,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.wp_encode_batch.restype = ctypes.c_int64
    lib.wp_encode_batch.argtypes = [
        ctypes.c_void_p,
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int32,
    ]
    lib.ffd_place.restype = ctypes.c_int64
    lib.ffd_place.argtypes = [
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64,
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
    ]
    _lib = lib
    return _lib


def ffd_place_native(lens: np.ndarray, width: int):
    """C first-fit-decreasing placement (pack.c). ``lens`` must already be
    in placement (longest-first) order. → (n_rows, row, slot, offset), or
    None when no compiler is available."""
    lib = get_lib()
    if lib is None:
        return None
    lens = np.ascontiguousarray(lens, np.int32)
    n = len(lens)
    out_row = np.empty(n, np.int32)
    out_slot = np.empty(n, np.int32)
    out_off = np.empty(n, np.int32)
    p32 = ctypes.POINTER(ctypes.c_int32)
    r = lib.ffd_place(
        lens.ctypes.data_as(p32), n, int(width),
        out_row.ctypes.data_as(p32),
        out_slot.ctypes.data_as(p32),
        out_off.ctypes.data_as(p32),
    )
    if r < 0:
        raise MemoryError("ffd_place allocation failed")
    return int(r), out_row, out_slot, out_off


class NativeWordPiece:
    """C-backed greedy wordpiece matcher over a fixed vocab."""

    def __init__(self, vocab: dict, unk_id: int, max_word_chars: int = 100):
        lib = get_lib()
        if lib is None:
            raise RuntimeError(f"native lib unavailable: {_lib_err}")
        self._lib = lib
        tokens = [t.encode("utf-8") for t in vocab.keys()]
        ids = list(vocab.values())
        # wp_create assigns id = position; order tokens by target id via a
        # dense remap (ids are already dense 0..n-1 for our tokenizers, but
        # handle gaps defensively)
        order = sorted(range(len(tokens)), key=lambda i: ids[i])
        self._id_remap = np.asarray([ids[i] for i in order], np.int32)
        toks_sorted = [tokens[i] for i in order]
        buf = b"".join(toks_sorted)
        offsets = np.zeros(len(toks_sorted) + 1, np.int64)
        np.cumsum([len(t) for t in toks_sorted], out=offsets[1:])
        self._buf_keepalive = buf
        # unk in *local* id space (position in sorted order)
        unk_local = int(np.searchsorted(self._id_remap, unk_id))
        self._h = lib.wp_create(
            buf,
            offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(toks_sorted),
            unk_local,
            max_word_chars,
        )
        if not self._h:
            raise MemoryError("wp_create failed")
        self._dense = bool((self._id_remap == np.arange(len(ids))).all())

    def __del__(self):
        try:
            if getattr(self, "_h", None):
                self._lib.wp_free(self._h)
        except Exception:
            pass

    def encode_words_raw(self, words: Sequence[str]):
        """words (already normalized/split) → (ids int32 array,
        ends int64 array) where ends[i] = #ids emitted after word i."""
        if not words:
            return np.empty(0, np.int32), np.empty(0, np.int64)
        wb = [w.encode("utf-8") for w in words]
        buf = b"".join(wb)
        offsets = np.zeros(len(wb) + 1, np.int64)
        np.cumsum([len(w) for w in wb], out=offsets[1:])
        max_out = max(len(buf) + len(wb), 16)
        out_ids = np.empty(max_out, np.int32)
        out_ends = np.empty(len(wb), np.int64)
        n = self._lib.wp_encode_words(
            self._h,
            buf,
            offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(wb),
            out_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            out_ends.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            max_out,
        )
        if n < 0:
            raise RuntimeError("wp_encode_words overflow")
        ids = out_ids[:n]
        if not self._dense:
            ids = self._id_remap[ids]
        return ids, out_ends

    def encode_words(self, words: Sequence[str]) -> List[List[int]]:
        """words → per-word id lists."""
        ids, ends = self.encode_words_raw(words)
        res, prev = [], 0
        for e in ends:
            res.append(ids[prev:e].tolist())
            prev = int(e)
        return res

    def encode_joined(self, joined: str, n_words: int, sep: str = "\n"):
        """Fast path: words pre-joined with a separator char. One encode +
        one C call. → (ids int32 array, ends int64 array of len n_words)."""
        buf = joined.encode("utf-8")
        max_out = max(len(buf) + n_words + 1, 16)
        out_ids = np.empty(max_out, np.int32)
        out_ends = np.empty(max(n_words, 1), np.int64)
        nw = ctypes.c_int64(0)
        n = self._lib.wp_encode_joined(
            self._h,
            buf,
            len(buf),
            ctypes.c_char(sep.encode()),
            out_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            out_ends.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            max_out,
            len(out_ends),  # C side stops BEFORE writing past out_ends
            ctypes.byref(nw),
        )
        if n == -2:
            # more separator-delimited words in `joined` than the caller
            # claimed (e.g. a word containing the separator byte) — the C
            # side bailed out without touching memory past out_ends.
            raise RuntimeError(
                f"separator appeared inside words: >{n_words} words found"
            )
        if n < 0:
            raise RuntimeError("wp_encode_joined overflow")
        if nw.value != n_words:
            raise RuntimeError(
                f"separator appeared inside words: {nw.value} != {n_words}"
            )
        ids = out_ids[:n]
        if not self._dense:
            ids = self._id_remap[ids]
        return ids, out_ends[:n_words]

    def encode_batch_padded(
        self,
        texts: Sequence[str],
        max_len: int,
        cls_id: int,
        sep_id: int,
        pad_id: int,
        lowercase: bool = True,
        max_word_chars: int = 100,
        n_threads: int = 0,
    ):
        """Whole-pipeline batch tokenization in C, pthread-parallel over
        documents: split + wordpiece + [CLS]/[SEP]/pad in ONE call →
        (ids (N, max_len) int32, mask (N, max_len) int32, lens (N,),
        needs_python (N,) bool). Docs with any non-ASCII byte are flagged
        (pad-filled) for the caller's full-unicode Python fallback; for
        pure-ASCII docs the output is byte-exact with the Python path."""
        import os as _os

        n = len(texts)
        if max_len < 2:
            raise ValueError("max_len must be >= 2 ([CLS] + [SEP])")
        if n == 0:
            z = np.zeros((0, max_len), np.int32)
            return z, z.copy(), np.zeros(0, np.int32), np.zeros(0, bool)
        enc = [t.encode("utf-8") for t in texts]
        buf = b"".join(enc)
        offs = np.zeros(n + 1, np.int64)
        np.cumsum([len(e) for e in enc], out=offs[1:])
        out_ids = np.empty((n, max_len), np.int32)
        out_mask = np.empty((n, max_len), np.int32)
        out_lens = np.empty(n, np.int32)
        needs_py = np.empty(n, np.uint8)
        if n_threads <= 0:
            n_threads = min(8, _os.cpu_count() or 1)

        def local(gid):
            # C ids are vocab POSITIONS; map global special ids to local
            if self._dense:
                return int(gid)
            return int(np.searchsorted(self._id_remap, gid))

        r = self._lib.wp_encode_batch(
            self._h,
            buf,
            offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            n,
            max_len,
            1 if lowercase else 0,
            max_word_chars,
            local(cls_id),
            local(sep_id),
            local(pad_id),
            out_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            out_mask.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            out_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            needs_py.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            n_threads,
        )
        if r == -1 and n_threads > 1:
            # thread spawn failed (e.g. cgroup pid exhaustion): the
            # single-thread path runs inline in the caller, no pthreads
            return self.encode_batch_padded(
                texts, max_len, cls_id, sep_id, pad_id,
                lowercase=lowercase, max_word_chars=max_word_chars,
                n_threads=1,
            )
        if r < 0:
            raise RuntimeError("wp_encode_batch failed")
        if not self._dense:
            out_ids = self._id_remap[out_ids]
        return out_ids, out_mask, out_lens, needs_py.astype(bool)

    def encode_flat(self, words: Sequence[str]) -> List[int]:
        """words → flat id list (concatenated pieces)."""
        out: List[int] = []
        for piece in self.encode_words(words):
            out.extend(piece)
        return out
