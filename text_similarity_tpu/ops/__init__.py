from .attention import multi_head_attention
from .moe import moe_ffn
from .topk import cosine_topk, topk_merge

__all__ = ["multi_head_attention", "moe_ffn", "cosine_topk", "topk_merge"]
