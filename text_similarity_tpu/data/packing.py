"""Greedy sequence packing: many short sequences per fixed-width row.

The reference's throughput answer to variable-length text is length-sorted
batching with per-batch `padding='longest'` (src/models/sentence_encoder.py:
138-153); the TPU rebuild's default is the same policy snapped to static
bucket shapes (data/batching.LengthBucketBatcher — recompile-free). Packing
is the next lever for SHORT-sequence traffic: instead of padding a 20-token
sentence to a 128-wide row (84% wasted MXU work), first-fit-decreasing
packs ~5 such sentences per row and the encoder separates them with a
block-diagonal attention mask (ops/attention.attention_reference
``segment_ids``) + per-segment restarting position ids + segment-wise
pooling (segment_mean_pool).

Everything here is host-side layout; shapes stay static: rows are always
(n_rows, width) with width fixed, so one compile serves any corpus.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np


def pack_sequences(
    row_ids: Sequence[Sequence[int]],
    width: int,
    pad_id: int = 0,
    row_types: Optional[Sequence[Sequence[int]]] = None,
) -> Dict[str, np.ndarray]:
    """First-fit-decreasing packing of token-id sequences into fixed-width
    rows.

    Returns a dict of equal-leading-dim arrays:
      ids        (R, width) int32 — packed token ids (pad_id elsewhere)
      segments   (R, width) int32 — 1-based segment tag per token, 0 = pad
      positions  (R, width) int32 — restart-at-0 position ids per segment
      owners     (R, max_per_row) int32 — original sequence index of each
                 segment in the row, -1 = empty slot
      n_segments (R,) int32
      type_ids   (R, width) int32 — only when ``row_types`` is given:
                 per-token token-type ids packed alongside (cross-encoder
                 [CLS] a [SEP] b [SEP] pairs carry 0/1 types)

    Sequences longer than ``width`` are truncated (parity with the
    bucketed path's max_len truncation).
    """
    n = len(row_ids)
    lens = np.asarray([min(len(r), width) for r in row_ids], np.int64)
    order = np.argsort(-lens, kind="stable")   # longest first

    rows: List[List[int]] = []      # sequence indices per row
    space: List[int] = []           # free tokens per row
    # first-fit over a simple free-space list; corpus-scale inputs
    # (~100k sentences) pack in well under a second because the fit
    # search short-circuits on the first row with room
    for si in order:
        L = int(lens[si])
        placed = False
        for ri in range(len(rows)):
            if space[ri] >= L:
                rows[ri].append(int(si))
                space[ri] -= L
                placed = True
                break
        if not placed:
            rows.append([int(si)])
            space.append(width - L)

    r = len(rows)
    max_per_row = max(len(x) for x in rows) if rows else 1
    ids = np.full((r, width), pad_id, np.int32)
    segs = np.zeros((r, width), np.int32)
    pos = np.zeros((r, width), np.int32)
    types = np.zeros((r, width), np.int32) if row_types is not None else None
    owners = np.full((r, max_per_row), -1, np.int32)
    n_seg = np.zeros((r,), np.int32)
    for ri, members in enumerate(rows):
        off = 0
        for mi, si in enumerate(members):
            L = int(lens[si])
            ids[ri, off:off + L] = np.asarray(row_ids[si][:L], np.int32)
            segs[ri, off:off + L] = mi + 1
            pos[ri, off:off + L] = np.arange(L, dtype=np.int32)
            if types is not None:
                types[ri, off:off + L] = np.asarray(
                    row_types[si][:L], np.int32
                )
            owners[ri, mi] = si
            off += L
        n_seg[ri] = len(members)
    out = {
        "ids": ids, "segments": segs, "positions": pos,
        "owners": owners, "n_segments": n_seg,
    }
    if types is not None:
        out["type_ids"] = types
    return out


def packing_efficiency(packed: Dict[str, np.ndarray]) -> float:
    """Fraction of row slots holding real tokens (1.0 = zero padding)."""
    segs = packed["segments"]
    return float((segs > 0).sum() / segs.size)
