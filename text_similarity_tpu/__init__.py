"""text_similarity_tpu — a TPU-native text-similarity framework.

Built from scratch in JAX/XLA/Pallas with pjit/sharding, providing the
capabilities of the reference library ``cr1m5onk1ng/text_similarity``
(sentence/word embedding models, SBERT-style bi-encoder training, similarity
evaluation, semantic search with ANN indexing + cross-encoder reranking, and a
distill/prune/quantize compression stack) re-designed TPU-first:

- one functional core (pure JAX pytrees + function transforms),
- explicit `jax.sharding.Mesh` axes (data / model / index),
- Pallas kernels for the hot paths (flash attention, fused cosine top-k,
  IVF scan, int8 matmul),
- an HBM-resident embedding store queried on-device.

See SURVEY.md at the repo root for the structural analysis of the reference
and the layer-by-layer build plan this package implements.
"""

__version__ = "0.1.0"
