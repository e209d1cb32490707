from .search import (
    SemanticSearchPipeline,
    SentenceMiningPipeline,
    ShardedSearchPipeline,
)
from .rerank import RankingPipeline
from .clustering import ClusteringPipeline
from .topic import TopicModelingPipeline
from .serve import SearchServer

__all__ = [
    "SemanticSearchPipeline",
    "SentenceMiningPipeline",
    "ShardedSearchPipeline",
    "RankingPipeline",
    "ClusteringPipeline",
    "TopicModelingPipeline",
    "SearchServer",
]
