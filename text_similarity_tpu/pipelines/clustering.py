"""Corpus clustering pipeline (reference src/pipeline/clustering.py:8-31:
sklearn KMeans over corpus embeddings) — here the on-device spherical
k-means from ops/kmeans."""

from __future__ import annotations

from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.kmeans import kmeans
from ..ops.topk import l2_normalize


class ClusteringPipeline:
    def __init__(self, encoder, num_clusters: int = 10, iters: int = 20,
                 batch_size: int = 128):
        self.encoder = encoder
        self.num_clusters = num_clusters
        self.iters = iters
        self.batch_size = batch_size

    def __call__(self, corpus: Sequence[str]) -> Dict[int, List[str]]:
        emb = self.encoder.encode(corpus, batch_size=self.batch_size)
        # k-means init samples k distinct rows — clamp to the corpus size
        k = min(self.num_clusters, len(corpus))
        _, assign = kmeans(
            l2_normalize(jnp.asarray(emb)), k, iters=self.iters
        )
        assign = np.asarray(assign)
        clusters: Dict[int, List[str]] = {}
        for i, text in enumerate(corpus):
            clusters.setdefault(int(assign[i]), []).append(text)
        return clusters

    def assignments(self, corpus: Sequence[str]) -> np.ndarray:
        emb = self.encoder.encode(corpus, batch_size=self.batch_size)
        _, assign = kmeans(
            l2_normalize(jnp.asarray(emb)), self.num_clusters, iters=self.iters
        )
        return np.asarray(assign)
