from .distill import extract_student_layers, SentenceEncoderDistiller
from .theseus import TheseusDistiller, ReplacementScheduler
from .prune import head_importance, ffn_importance, prune_rewire
from .quantize import quantize_params_int8, dequantize_params, quantize_embeddings_int8

__all__ = [
    "extract_student_layers",
    "SentenceEncoderDistiller",
    "TheseusDistiller",
    "ReplacementScheduler",
    "head_importance",
    "ffn_importance",
    "prune_rewire",
    "quantize_params_int8",
    "dequantize_params",
    "quantize_embeddings_int8",
]
