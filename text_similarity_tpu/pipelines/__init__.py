from .search import SemanticSearchPipeline, SentenceMiningPipeline
from .rerank import RankingPipeline
from .clustering import ClusteringPipeline
from .topic import TopicModelingPipeline
from .serve import SearchServer

__all__ = [
    "SemanticSearchPipeline",
    "SentenceMiningPipeline",
    "RankingPipeline",
    "ClusteringPipeline",
    "TopicModelingPipeline",
    "SearchServer",
]
