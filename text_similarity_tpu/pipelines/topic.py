"""Topic modeling pipeline: embed → reduce → cluster → class-based TF-IDF.

Capability parity with the reference's BERTopic-style pipeline
(src/pipeline/topic_modeling.py:54-283: encode → UMAP → HDBSCAN → c-TF-IDF
→ top-n words, with topic reduction). TPU-native substitutions per
SURVEY.md §7 stage 7:

- dimensionality reduction: PCA via on-device SVD (UMAP is a host-side C++
  dependency; PCA preserves the embed→reduce capability),
- clustering: spherical k-means (ops/kmeans) with an outlier rule
  (distance-to-centroid below threshold → topic −1) standing in for
  HDBSCAN's noise label,
- c-TF-IDF scoring and topic merge implemented exactly as the reference's
  math (topic_modeling.py:106-118 — tf·log(1+A/w) formulation; :129-151
  merge of least-frequent topics into nearest neighbor),
- hypernym topic naming (topic_modeling.py:120-127,171-190) via
  ``utils/lexicon.py`` — pass ``lexicon=`` to get a ``names`` result key.
"""

from __future__ import annotations

import collections
import re
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.kmeans import kmeans
from ..ops.topk import l2_normalize

_WORD_RE = re.compile(r"[a-zA-Z][a-zA-Z\-']+")

# minimal English stoplist for topic words
_STOP = set(
    """the a an and or of to in is are was were be been it its this that
    these those for with as on at by from not no but if then so such can
    could would should may might will shall do does did done have has had
    i you he she we they them his her their our your my me us""".split()
)


def _tokenize_doc(text: str) -> List[str]:
    return [
        w.lower()
        for w in _WORD_RE.findall(text)
        if w.lower() not in _STOP and len(w) > 2
    ]


def pca_reduce(emb: jnp.ndarray, dim: int) -> jnp.ndarray:
    """On-device PCA (shared implementation: ops/pca.py)."""
    from ..ops.pca import pca_fit_transform

    reduced, _, _ = pca_fit_transform(emb, dim)
    return reduced


def spectral_reduce(
    emb: jnp.ndarray, dim: int, n_neighbors: int = 15
) -> jnp.ndarray:
    """Nonlinear neighbor-graph reduction (Laplacian eigenmaps) — the
    manifold-preserving option next to linear PCA, standing in for the
    reference's UMAP stage (topic_modeling.py:90-96) with TPU-friendly
    ops only: k-NN graph via the fused cosine top-k, symmetric normalized
    adjacency, ``jnp.linalg.eigh`` for the leading eigenvectors.

    Dense (N, N) adjacency + eigh: O(N²) memory, O(N³) solve — sized for
    topic-modeling corpora (N ≲ 20k on one chip); use PCA beyond that."""
    from ..ops.topk import cosine_topk_xla

    x = l2_normalize(jnp.asarray(emb, jnp.float32))
    n = x.shape[0]
    k = min(n_neighbors + 1, n)          # +1: top-1 is the row itself
    _, idx = cosine_topk_xla(x, x, k=k)
    a = jnp.zeros((n, n), jnp.float32)
    rows = jnp.repeat(jnp.arange(n), k)
    a = a.at[rows, idx.reshape(-1)].set(1.0)
    a = jnp.maximum(a, a.T)              # undirected graph
    a = a * (1.0 - jnp.eye(n))           # no self loops
    deg = jnp.maximum(jnp.sum(a, axis=1), 1e-6)
    dinv = jax.lax.rsqrt(deg)
    a_norm = a * dinv[:, None] * dinv[None, :]
    # bottom eigenvectors of L_sym = I − A_norm ⇔ top eigenvectors of
    # A_norm. The leading ones are kept (not dropped as "trivial"): for a
    # disconnected k-NN graph the whole eigenvalue-1 subspace consists of
    # component indicators — exactly the separating directions.
    _, v = jnp.linalg.eigh(a_norm)       # ascending eigenvalues
    take = min(dim, n)
    return v[:, n - take:][:, ::-1]


def class_tfidf(
    docs_per_topic: Dict[int, List[str]], top_n: int = 10
) -> Dict[int, List[Tuple[str, float]]]:
    """c-TF-IDF: per-topic term frequency × log(1 + avg_docs_per_topic /
    term_doc_frequency) — the reference's formulation
    (topic_modeling.py:106-118)."""
    topic_tf: Dict[int, collections.Counter] = {}
    word_topic_freq: collections.Counter = collections.Counter()
    for t, docs in docs_per_topic.items():
        c = collections.Counter()
        for d in docs:
            c.update(_tokenize_doc(d))
        topic_tf[t] = c
        for w in c:
            word_topic_freq[w] += c[w]
    a = np.mean([sum(c.values()) or 1 for c in topic_tf.values()])
    out = {}
    for t, c in topic_tf.items():
        total = sum(c.values()) or 1
        scored = [
            (w, (cnt / total) * np.log(1 + a / word_topic_freq[w]))
            for w, cnt in c.items()
        ]
        scored.sort(key=lambda x: -x[1])
        out[t] = scored[:top_n]
    return out


class TopicModelingPipeline:
    def __init__(
        self,
        encoder,
        num_topics: int = 20,
        reduce_dim: int = 32,
        top_n_words: int = 10,
        outlier_quantile: float = 0.0,  # 0 = no outliers; e.g. 0.05
        batch_size: int = 128,
        method: str = "kmeans",     # "kmeans" | "density" (fixed-ε DBSCAN)
                                    # | "hdbscan" (multi-ε stability)
        density_eps: float = 0.3,
        density_min_samples: int = 3,
        reduce: str = "pca",        # "pca" | "spectral" (Laplacian eigenmaps)
        spectral_neighbors: int = 15,
        lexicon=None,               # utils.lexicon.Lexicon → topic names
    ):
        self.encoder = encoder
        self.num_topics = num_topics
        self.reduce_dim = reduce_dim
        self.top_n_words = top_n_words
        self.outlier_quantile = outlier_quantile
        self.batch_size = batch_size
        self.method = method
        self.density_eps = density_eps
        self.density_min_samples = density_min_samples
        self.reduce = reduce
        self.spectral_neighbors = spectral_neighbors
        self.lexicon = lexicon

    def __call__(self, corpus: Sequence[str]) -> dict:
        emb = self.encoder.encode(corpus, batch_size=self.batch_size)
        x = jnp.asarray(emb)
        if self.reduce_dim and self.reduce_dim < x.shape[1]:
            if self.reduce == "spectral":
                x = spectral_reduce(
                    x, self.reduce_dim, n_neighbors=self.spectral_neighbors
                )
            else:
                x = pca_reduce(x, self.reduce_dim)
        x = l2_normalize(x)

        if self.method in ("density", "hdbscan"):
            # noise-aware density clustering (the reference's HDBSCAN
            # stage, topic_modeling.py:98-104): topic count emerges from
            # the data, low-density docs become topic −1. "hdbscan" needs
            # no ε: the multi-ε stability selection lets clusters of
            # different densities coexist.
            from ..ops.density import dbscan_cosine, hdbscan_cosine

            if self.method == "hdbscan":
                assign = hdbscan_cosine(
                    x, min_samples=self.density_min_samples
                )
            else:
                assign = dbscan_cosine(
                    x, eps=self.density_eps,
                    min_samples=self.density_min_samples,
                )
            ks = [t for t in np.unique(assign) if t >= 0]
            centroids = np.stack([
                np.asarray(jnp.mean(x[jnp.asarray(assign == t)], axis=0))
                for t in ks
            ]) if ks else np.zeros((0, x.shape[1]), np.float32)
        else:
            k = min(self.num_topics, max(len(corpus) // 4, 1))
            centroids, assign = kmeans(x, k, iters=20)
            assign = np.asarray(assign)

            # outlier rule: lowest-similarity docs to centroid → topic -1
            if self.outlier_quantile > 0:
                sims = np.asarray(
                    jnp.sum(x * centroids[assign], axis=1)
                )
                thr = np.quantile(sims, self.outlier_quantile)
                assign = np.where(sims < thr, -1, assign)
            centroids = np.asarray(centroids)

        docs_per_topic: Dict[int, List[str]] = {}
        for i, t in enumerate(assign):
            docs_per_topic.setdefault(int(t), []).append(corpus[i])
        words = class_tfidf(docs_per_topic, self.top_n_words)
        sizes = {t: len(d) for t, d in docs_per_topic.items()}
        out = {
            "assignments": assign,
            "topics": words,
            "sizes": sizes,
            "centroids": centroids,
        }
        if self.lexicon is not None:
            out["names"] = self._name(words)
        return out

    def _name(self, words: Dict[int, List[Tuple[str, float]]]):
        """Hypernym-based topic names (reference find_general_categories,
        topic_modeling.py:171-190) via the offline taxonomy lexicon."""
        from ..utils.lexicon import name_topics

        return name_topics(words, self.lexicon)

    def reduce_topics(
        self, result: dict, corpus: Sequence[str], target: int
    ) -> dict:
        """Merge least-frequent topics into their nearest topic by centroid
        cosine (reference topic_modeling.py:129-151)."""
        assign = np.array(result["assignments"])
        centroids = np.array(result["centroids"])
        alive = [int(t) for t in np.unique(assign) if t >= 0]
        sizes = {t: int((assign == t).sum()) for t in alive}
        while len(alive) > target:
            # least-frequent first on CURRENT sizes — merges grow topics,
            # so the ordering must be recomputed every step (reference
            # topic_modeling.py:129-151 semantics)
            smallest = min(alive, key=lambda t: sizes[t])
            alive.remove(smallest)
            c = centroids[smallest]
            # COSINE nearest target: density-path means and post-merge
            # weighted means are not unit-norm, so a raw dot would favor
            # large-norm topics over genuinely similar ones
            cand = centroids[alive]
            cand_n = cand / np.maximum(
                np.linalg.norm(cand, axis=1, keepdims=True), 1e-12
            )
            c_n = c / max(float(np.linalg.norm(c)), 1e-12)
            sims = cand_n @ c_n
            tgt = alive[int(np.argmax(sims))]
            n_s, n_t = sizes[smallest], sizes[tgt]
            centroids[tgt] = (centroids[tgt] * n_t + c * n_s) / max(n_s + n_t, 1)
            assign[assign == smallest] = tgt
            sizes[tgt] = n_t + n_s
            del sizes[smallest]
        docs_per_topic: Dict[int, List[str]] = {}
        for i, t in enumerate(assign):
            docs_per_topic.setdefault(int(t), []).append(corpus[i])
        words = class_tfidf(docs_per_topic, self.top_n_words)
        out = {
            "assignments": assign,
            "topics": words,
            "sizes": {t: len(d) for t, d in docs_per_topic.items()},
            "centroids": centroids,
        }
        if self.lexicon is not None:
            out["names"] = self._name(words)
        return out
