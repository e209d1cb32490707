from .encoder import (
    EncoderOutput,
    init_params,
    encoder_forward,
    param_pspecs,
    num_params,
)
from .long_context import encoder_forward_cp
from .pipeline import encoder_forward_pp
from .pooling import mean_pool, cls_pool, max_pool, word_span_pool, pool
from .hf_convert import convert_hf_model, convert_state_dict, arch_from_hf_config

__all__ = [
    "EncoderOutput",
    "init_params",
    "encoder_forward",
    "encoder_forward_cp",
    "encoder_forward_pp",
    "param_pspecs",
    "num_params",
    "mean_pool",
    "cls_pool",
    "max_pool",
    "word_span_pool",
    "pool",
    "convert_hf_model",
    "convert_state_dict",
    "arch_from_hf_config",
]
