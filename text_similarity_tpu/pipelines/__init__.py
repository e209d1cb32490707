from .search import SemanticSearchPipeline, SentenceMiningPipeline
from .rerank import RankingPipeline
from .clustering import ClusteringPipeline
from .topic import TopicModelingPipeline

__all__ = [
    "SemanticSearchPipeline",
    "SentenceMiningPipeline",
    "RankingPipeline",
    "ClusteringPipeline",
    "TopicModelingPipeline",
]
