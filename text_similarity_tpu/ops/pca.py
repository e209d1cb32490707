"""PCA via SVD of the centered matrix — the single implementation behind
the topic-pipeline reduction (pipelines/topic.pca_reduce, the reference's
UMAP-stage linear substitute, topic_modeling.py:90-96) and the
dim-reducing distiller's teacher-target projection
(compress/distill.pca_reduce, reference DistillationStrategy
model_compression.py:937-984)."""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def pca_fit_transform(
    emb, dim: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """→ (reduced (N, dim), mean (1, D), components (dim, D)), on device."""
    x = jnp.asarray(emb, jnp.float32)
    mu = jnp.mean(x, axis=0, keepdims=True)
    xc = x - mu
    _, _, vt = jnp.linalg.svd(xc, full_matrices=False)
    comp = vt[:dim]
    return xc @ comp.T, mu, comp
