"""Density-based clustering (DBSCAN / HDBSCAN-class) on device.

Capability parity with the reference's HDBSCAN stage in topic modeling
(src/pipeline/topic_modeling.py:98-104: noise-aware density clustering of
reduced document embeddings). TPU-first formulation:

- the ε-neighborhood graph is a thresholded cosine-similarity matmul,
  computed BLOCKWISE (``chunk`` query rows at a time) so the (N, N)
  similarity matrix never materializes — memory is O(N·chunk), corpora
  of 100k+ docs fit one chip (the round-2 dense form capped at ~50k);
- connected components resolve by min-label propagation with pointer
  jumping (labels are representative row ids, so ``labels[labels]``
  halves chain depth each sweep — O(log N) sweeps instead of O(diameter));
- :func:`hdbscan_cosine` runs a multi-ε ladder, builds the condensed
  cluster tree (clusters are nested across ε because adjacency and core
  sets grow monotonically with ε), scores each condensed cluster by its
  HDBSCAN stability (Σ_p λ_leave(p) − λ_birth), and selects the
  excess-of-mass winners — no single ε to tune, clusters of different
  densities coexist (the property fixed-ε DBSCAN provably lacks).

Semantics of the fixed-ε form match classic DBSCAN: core points
(≥ min_samples neighbors) merge through core-core edges; border points
adopt the label of any neighboring core point; everything else is noise
(−1).
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .topk import _round_up


def _compact_labels(labels: np.ndarray) -> np.ndarray:
    """Renumber labels 0..k−1 in first-appearance order (noise stays −1)."""
    out = np.full(labels.shape, -1, np.int64)
    next_id = 0
    seen: dict = {}
    for i, l in enumerate(labels):
        if l < 0:
            continue
        if l not in seen:
            seen[l] = next_id
            next_id += 1
        out[i] = seen[l]
    return out


def dbscan_cosine(
    x: jax.Array,            # (N, D) L2-normalized
    eps: float = 0.3,        # cosine-distance radius
    min_samples: int = 5,
    max_sweeps: int = 0,     # 0 = N sweeps upper bound (while_loop exits early)
    chunk: int = 1024,       # rows per adjacency block (memory = N·chunk)
) -> np.ndarray:
    """Cluster rows of ``x``; returns (N,) int labels, −1 = noise, else
    labels renumbered 0..k−1 in first-appearance order."""
    n = x.shape[0]
    labels = _dbscan_device(
        jnp.asarray(x, jnp.float32), jnp.float32(eps), int(min_samples),
        int(max_sweeps), min(int(chunk), _round_up(n, 8)),
    )
    labels = np.asarray(jax.device_get(labels))[:n]
    return _compact_labels(labels)


@partial(jax.jit, static_argnames=("min_samples", "max_sweeps", "chunk"))
def _dbscan_device(x, eps, min_samples: int, max_sweeps: int, chunk: int):
    n, d = x.shape
    pad = (-n) % chunk
    xp = jnp.pad(x, ((0, pad), (0, 0)))
    nb = xp.shape[0]
    xb = xp.reshape(nb // chunk, chunk, d)
    valid = jnp.arange(nb) < n
    thr = 1.0 - eps
    sent = jnp.int32(nb)                 # sentinel = "no label"

    # degrees + core mask, one (chunk, N) adjacency block at a time
    def chunk_deg(rows):
        s = jnp.einsum(
            "cd,nd->cn", rows, xp, preferred_element_type=jnp.float32
        )
        adj = (s >= thr) & valid[None, :]
        return jnp.sum(adj.astype(jnp.int32), axis=1)

    deg = jax.lax.map(chunk_deg, xb).reshape(nb)
    core = (deg >= min_samples) & valid
    init = jnp.where(core, jnp.arange(nb, dtype=jnp.int32), sent)
    limit = max_sweeps or nb

    def neighbor_min(labels):
        # min label among neighboring CORE points, recomputed blockwise
        def chunk_step(rows):
            s = jnp.einsum(
                "cd,nd->cn", rows, xp, preferred_element_type=jnp.float32
            )
            adj = (s >= thr) & core[None, :]
            neigh = jnp.where(adj, labels[None, :], sent)
            return jnp.min(neigh, axis=1)

        return jax.lax.map(chunk_step, xb).reshape(nb)

    def cond(state):
        _, changed, it = state
        return changed & (it < limit)

    def body(state):
        labels, _, it = state
        new = jnp.where(core, jnp.minimum(labels, neighbor_min(labels)), labels)
        # pointer jumping: labels are representative ROW IDS, so composing
        # the label map halves chain depth — twice per sweep
        for _ in range(2):
            jumped = new[jnp.clip(new, 0, nb - 1)]
            new = jnp.where(new < sent, jnp.minimum(new, jumped), new)
        return new, jnp.any(new != labels), it + 1

    labels, _, _ = jax.lax.while_loop(
        cond, body, (init, jnp.bool_(True), jnp.int32(0))
    )
    # border points: adopt the minimum label among neighboring cores
    border = neighbor_min(labels)
    labels = jnp.where(core, labels, border)
    return jnp.where(labels >= sent, -1, labels)


# ---------------------------------------------------------------------------
# HDBSCAN-class: multi-ε ladder + condensed-tree stability selection.
# ---------------------------------------------------------------------------

DEFAULT_EPS_GRID = (0.05, 0.1, 0.15, 0.2, 0.3, 0.4, 0.55)


def hdbscan_cosine(
    x: jax.Array,                       # (N, D) L2-normalized
    eps_grid: Optional[Sequence[float]] = None,  # ascending cosine radii
    min_samples: int = 5,
    chunk: int = 1024,
) -> np.ndarray:
    """Variable-density clustering: no single ε. Returns (N,) labels,
    −1 = noise.

    Replaces the reference's HDBSCAN (topic_modeling.py:98-104) with the
    TPU-shaped equivalent: m fixed-ε DBSCAN runs (each a blocked
    matmul+threshold pipeline) give a nested cluster hierarchy over
    λ = 1/ε density levels; the condensed tree is built on host from the
    tiny (m, N) label matrix; each condensed cluster's HDBSCAN stability
    Σ_p (λ_leave(p) − λ_birth) is compared against the sum of its
    children's — the standard excess-of-mass selection — so tight and
    diffuse clusters win at their own density levels."""
    eps_grid = sorted(eps_grid or DEFAULT_EPS_GRID)
    n = int(x.shape[0])
    x = jnp.asarray(x, jnp.float32)
    # tight → loose label matrix; nested because adjacency/core sets grow
    # monotonically with ε at fixed min_samples
    levels = np.stack([
        dbscan_cosine(x, eps=e, min_samples=min_samples, chunk=chunk)
        for e in eps_grid
    ])  # (m, N)
    lam = np.asarray([1.0 / e for e in eps_grid])       # descending density
    return _stability_select(levels, lam, n)


def _stability_select(levels: np.ndarray, lam: np.ndarray, n: int) -> np.ndarray:
    """Condensed-tree construction + excess-of-mass selection on host.

    ``levels[i]`` = labels at density λ_i (λ descending with i); clusters
    at level i are contained in clusters at level i+1."""
    m = levels.shape[0]

    class Node:
        __slots__ = ("level", "label", "members", "birth_lam", "stab",
                     "children", "chain_members")

        def __init__(self, level, label, members):
            self.level = level          # loosest level of its chain
            self.label = label
            self.members = members      # member rows at birth level
            self.birth_lam = None
            self.stab = 0.0
            self.children = []
            self.chain_members = None

    # nodes per (level, label)
    raw: dict = {}
    for i in range(m):
        labs = levels[i]
        for l in np.unique(labs):
            if l < 0:
                continue
            raw[(i, int(l))] = np.nonzero(labs == l)[0]

    # children links: cluster at level i is inside exactly one cluster at
    # level i+1 (containment can be imperfect at boundaries with border
    # points — use the majority parent)
    child_of: dict = {}
    for (i, l), rows in raw.items():
        if i == m - 1:
            continue
        up = levels[i + 1][rows]
        up = up[up >= 0]
        if up.size == 0:
            continue
        vals, cnts = np.unique(up, return_counts=True)
        child_of.setdefault((i + 1, int(vals[np.argmax(cnts)])), []).append((i, l))

    # condense top-down from the loosest level: single-child links extend
    # the chain (same logical cluster living to a denser λ); multi-child
    # links split the cluster (birth of the children)

    def build(key, birth_lam):
        i, l = key
        node = Node(i, l, raw[key])
        node.birth_lam = birth_lam
        # walk the single-child chain toward denser λ, recording the λ at
        # which each member last appears in the chain (its λ_leave)
        leave = np.full(len(node.members), birth_lam)
        ck = key
        while True:
            kids = child_of.get(ck, [])
            if len(kids) != 1:
                break
            ck = kids[0]
            still = np.isin(node.members, raw[ck])
            leave = np.where(still, lam[ck[0]], leave)
        # survivors at the chain end persist to the densest λ reached
        end_level = ck[0]
        in_end = np.isin(node.members, raw[ck])
        leave = np.where(in_end, lam[end_level], leave)
        node.stab = float(np.sum(leave - birth_lam))
        node.chain_members = raw[ck]
        for kid in child_of.get(ck, []):
            node.children.append(build(kid, lam[ck[0]]))
        return node

    # roots are born at λ=0 (the density at which everything is one
    # component), so a cluster existing only at the loosest level still
    # has positive lifetime and can beat its noise fragments
    roots = [
        build((m - 1, int(l)), 0.0)
        for l in np.unique(levels[m - 1]) if l >= 0
    ]

    # excess-of-mass selection
    out = np.full(n, -1, np.int64)
    next_id = [0]

    def select(node):
        child_sum = sum(best(c) for c in node.children)
        if node.children and child_sum > node.stab:
            for c in node.children:
                select(c)
        else:
            out[node.members] = next_id[0]
            next_id[0] += 1

    def best(node):
        child_sum = sum(best(c) for c in node.children)
        return max(node.stab, child_sum) if node.children else node.stab

    for r in roots:
        select(r)
    return _compact_labels(out)
