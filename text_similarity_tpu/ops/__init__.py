from .attention import multi_head_attention
from .topk import cosine_topk, topk_merge

__all__ = ["multi_head_attention", "cosine_topk", "topk_merge"]
