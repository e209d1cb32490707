from .store import EmbeddingStore
from .brute import BruteForceIndex
from .ivf import IVFIndex

__all__ = ["EmbeddingStore", "BruteForceIndex", "IVFIndex"]
