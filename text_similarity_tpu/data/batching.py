"""Length-bucketed batching with static shapes.

The reference's "smart batching" sorts the dataset by length and pads each
batch to its longest member (reference: src/dataset/dataset.py:601-685,
sentence_encoder.py:138-153) — dynamic shapes that would force an XLA
recompile per batch. Here batches snap to a small set of power-of-two
sequence buckets and a fixed batch size, so every (batch, seq) shape is
compiled exactly once; short tails are padded with masked rows.
"""

from __future__ import annotations

from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

BUCKETS = (16, 32, 64, 128, 256, 512)


def pick_bucket(length: int, buckets: Sequence[int] = BUCKETS) -> int:
    for b in buckets:
        if length <= b:
            return b
    return buckets[-1]


def pad_to_bucket(
    ids: np.ndarray, mask: np.ndarray, buckets: Sequence[int] = BUCKETS
) -> Tuple[np.ndarray, np.ndarray]:
    """Pad (B, L) arrays up to the enclosing bucket length."""
    L = ids.shape[1]
    tgt = pick_bucket(L, buckets)
    if tgt == L:
        return ids, mask
    pad = tgt - L
    return (
        np.pad(ids, ((0, 0), (0, pad))),
        np.pad(mask, ((0, 0), (0, pad))),
    )


class LengthBucketBatcher:
    """Groups pre-tokenized rows into fixed-shape batches.

    Mirrors the throughput intent of the reference's length-sorted batching
    while keeping shapes static: rows are sorted by token length, grouped
    into same-bucket batches of exactly ``batch_size`` (tail batches padded
    with all-masked dummy rows), and optionally shuffled at batch level
    (preserving the reference's randomized-window behavior,
    dataset.py:607-615)."""

    def __init__(
        self,
        batch_size: int,
        buckets: Sequence[int] = BUCKETS,
        shuffle_batches: bool = True,
        seed: int = 0,
    ):
        self.batch_size = batch_size
        self.buckets = tuple(buckets)
        self.shuffle_batches = shuffle_batches
        self.rng = np.random.RandomState(seed)

    def batches(
        self,
        row_ids: List[List[int]],
        extras: Optional[List] = None,
        pad_id: int = 0,
    ) -> Iterator[dict]:
        """Yield dicts: ids (B,L), mask (B,L), valid (B,) bool, index (B,)
        original row index (−1 for padding rows), plus ``extra`` when
        per-row payloads (labels, pair ids) are given."""
        order = np.argsort([len(r) for r in row_ids], kind="stable")
        groups = [
            order[i : i + self.batch_size]
            for i in range(0, len(order), self.batch_size)
        ]
        if self.shuffle_batches:
            self.rng.shuffle(groups)
        for g in groups:
            rows = [row_ids[i] for i in g]
            L = pick_bucket(max(len(r) for r in rows), self.buckets)
            B = self.batch_size
            ids = np.full((B, L), pad_id, np.int32)
            mask = np.zeros((B, L), np.int32)
            index = np.full((B,), -1, np.int64)
            for j, (i_orig, r) in enumerate(zip(g, rows)):
                rl = r[:L]   # rows longer than the largest bucket truncate
                ids[j, : len(rl)] = rl
                mask[j, : len(rl)] = 1
                index[j] = i_orig
            batch = {
                "ids": ids,
                "mask": mask,
                "valid": index >= 0,
                "index": index,
            }
            if extras is not None:
                batch["extra"] = [extras[i] for i in g]
            yield batch
