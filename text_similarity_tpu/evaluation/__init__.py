from .meters import (
    AverageMeter,
    Metrics,
    similarity_metrics,
    best_threshold_accuracy,
    best_threshold_f1,
    average_precision,
    retrieval_accuracy,
    classification_metrics,
)
from .evaluators import ParaphraseEvaluator, RetrievalEvaluator, ClassifierEvaluator

__all__ = [
    "AverageMeter",
    "Metrics",
    "similarity_metrics",
    "best_threshold_accuracy",
    "best_threshold_f1",
    "average_precision",
    "retrieval_accuracy",
    "classification_metrics",
    "ParaphraseEvaluator",
    "RetrievalEvaluator",
    "ClassifierEvaluator",
]
