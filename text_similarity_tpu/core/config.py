"""Frozen config dataclasses — the TPU-native analogue of the reference's
two-tier config system (argparse flags feeding ``Configuration`` dataclasses,
reference: src/configurations/config.py:7-58).

Differences from the reference, by design:
- configs are frozen + hashable so they can be closed over by jitted
  functions as static arguments;
- serialization is JSON (not pickle) so checkpoints stay readable and
  framework-independent;
- mesh/sharding fields are first-class (the reference is single-device).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Optional, Tuple


def _asdict(obj) -> dict:
    return dataclasses.asdict(obj)


@dataclass(frozen=True)
class EncoderArch:
    """Architecture of a BERT-class transformer encoder.

    Covers BERT / MiniLM (bert layout), DistilBERT (no token types, no
    pooler), and RoBERTa/XLM-R (position offset 2, type vocab 1) — the model
    families the reference wraps via HF AutoModel (reference:
    src/models/modeling.py:32-33).
    """

    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    hidden_act: str = "gelu"  # "gelu" (erf, HF default) | "gelu_new" | "relu"
    pad_token_id: int = 0
    # RoBERTa starts position ids at pad_token_id + 1 and skips padding
    # positions; BERT starts at 0.
    position_offset: int = 0
    # DistilBERT has no token-type embeddings and no pooler.
    has_token_type: bool = True
    has_pooler: bool = True
    # Optional projection head (SBERT-style dense after pooling),
    # 0 = disabled.
    projection_dim: int = 0
    # Attention dropout / hidden dropout (train-time only).
    attention_dropout: float = 0.1
    hidden_dropout: float = 0.1
    # Head-pruned models keep the original per-head width while num_heads
    # shrinks; 0 = derive from hidden_size // num_heads.
    head_dim_override: int = 0
    # Attention flavor: "softmax" (exact; flash kernel on TPU) or
    # "performer" (FAVOR+ linear attention for long context — the
    # reference's Performer-BERT capability, SURVEY.md §5.7).
    attention_type: str = "softmax"
    # Number of random features for performer attention (0 = head_dim).
    performer_features: int = 0
    # Performer feature map: "softmax" (FAVOR+ positive features) or
    # "relu" (generalized kernel — reference fast_attention.py:36-75's
    # generalized_kernel_feature_creator path).
    performer_kernel: str = "softmax"
    # Redraw the random feature matrix every N train steps (0 = fixed) —
    # reference FastAttention.redraw_projection_matrix
    # (fast_attention.py:137-188).
    performer_redraw_every: int = 0
    # First N heads use exact local (windowed) attention while the rest
    # stay linear — the reference's local+global mixed heads
    # (fast_attention.py:257-307, local_attn_heads).
    performer_local_heads: int = 0
    performer_local_window: int = 64
    # ALBERT-family knobs (reference trains albert-japanese classifiers,
    # BASELINE.md results table): one parameter set shared by all
    # num_layers blocks, and factorized embeddings — tables live at
    # embed_factor_size and a learned projection maps them to hidden.
    share_layers: bool = False
    embed_factor_size: int = 0   # 0 = embeddings at hidden_size (no proj)
    # Sliding-window (Longformer-style local) attention radius; 0 = full.
    attention_window: int = 0
    # With a window, keep position 0 (CLS) globally attending/attended —
    # the reference's LongformerSelfAttention global tokens
    # (make_long_transformer.py:56-68). Served by the XLA attention path;
    # the Pallas flash kernel implements the pure band only.
    window_global_cls: bool = False
    # Mixture-of-Experts FFN (ops/moe.py): >0 replaces every layer's dense
    # MLP with num_experts routed experts. The expert axis of the stacked
    # weights shards over the mesh "expert" axis (expert parallelism — a
    # new axis of the rebuild, SURVEY.md §2.2; the reference has no MoE).
    num_experts: int = 0
    expert_top_k: int = 2
    expert_capacity_factor: float = 1.25
    # weight of the Switch load-balance auxiliary loss in the train steps
    moe_aux_weight: float = 0.01

    @property
    def head_dim(self) -> int:
        return self.head_dim_override or self.hidden_size // self.num_heads

    @property
    def embedding_size(self) -> int:
        """Output embedding width (after optional projection)."""
        return self.projection_dim or self.hidden_size

    def replace(self, **kw) -> "EncoderArch":
        return dataclasses.replace(self, **kw)

    def to_json(self) -> str:
        return json.dumps(_asdict(self), indent=2, sort_keys=True)

    @classmethod
    def from_json(cls, s: str) -> "EncoderArch":
        return cls(**json.loads(s))


# Registry of common architectures — the analogue of the reference's
# MODELS / DIMENSIONS_MAP registries (reference: src/configurations/config.py:66-91).
ARCH_PRESETS = {
    "bert-base": EncoderArch(),
    "bert-large": EncoderArch(
        hidden_size=1024, num_layers=24, num_heads=16, intermediate_size=4096
    ),
    "distilbert-base": EncoderArch(
        num_layers=6, has_token_type=False, has_pooler=False
    ),
    "minilm-l6": EncoderArch(
        hidden_size=384, num_layers=6, num_heads=12, intermediate_size=1536
    ),
    "minilm-l12": EncoderArch(
        hidden_size=384, num_layers=12, num_heads=12, intermediate_size=1536
    ),
    "roberta-base": EncoderArch(
        vocab_size=50265,
        max_position=514,
        type_vocab_size=1,
        layer_norm_eps=1e-5,
        pad_token_id=1,
        position_offset=2,
    ),
    "xlm-roberta-base": EncoderArch(
        vocab_size=250002,
        max_position=514,
        type_vocab_size=1,
        layer_norm_eps=1e-5,
        pad_token_id=1,
        position_offset=2,
    ),
    "albert-base": EncoderArch(
        vocab_size=30000,
        hidden_act="gelu_new",
        share_layers=True,
        embed_factor_size=128,
    ),
    "tiny-test": EncoderArch(
        vocab_size=1024,
        hidden_size=64,
        num_layers=2,
        num_heads=4,
        intermediate_size=128,
        max_position=128,
    ),
}


@dataclass(frozen=True)
class MeshConfig:
    """Device mesh layout. Axis sizes of 1 mean the axis is unused.

    - ``data``: batch/data-parallel axis (DP; also ZeRO-style param sharding)
    - ``model``: tensor-parallel axis (heads / hidden sharding)
    - ``index``: ANN corpus shard axis (per-shard scan + all-gather top-k)

    The reference has no distributed layer at all (SURVEY.md §5.8); this is a
    new first-class component.
    """

    data: int = 1
    model: int = 1
    index: int = 1

    @property
    def num_devices(self) -> int:
        return self.data * self.model * self.index

    def axis_names(self) -> Tuple[str, ...]:
        return ("data", "model", "index")


@dataclass(frozen=True)
class TrainConfig:
    """Training hyper-parameters (semantics of reference
    src/training/learner.py:53-78 — AdamW with no-decay groups + linear
    warmup — plus TPU-native additions)."""

    lr: float = 2e-5
    weight_decay: float = 0.01
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    adam_eps: float = 1e-8
    warmup_ratio: float = 0.1
    max_grad_norm: float = 1.0
    batch_size: int = 32
    epochs: int = 1
    grad_accum_steps: int = 1
    seed: int = 0
    # bf16 matmuls ≈ the reference's fp16 AMP (learner.py:48-49).
    bf16: bool = True
    max_seq_len: int = 256
    eval_in_train: bool = True
    save_best: bool = True
    metric_direction: str = "max"  # direction of the tracked eval metric


@dataclass(frozen=True)
class IndexConfig:
    """ANN index parameters — the TPU-native analogue of the reference's
    ``SearchConfiguration`` HNSW knobs (ef/ef_construction/M, reference:
    src/configurations/config.py:40-44), re-expressed for an IVF/clustered
    index."""

    num_clusters: int = 1024
    num_probes: int = 16
    kmeans_iters: int = 12
    top_k: int = 10
    # Cap on cluster size (lists padded/truncated for static shapes).
    max_cluster_size: int = 0  # 0 = auto (corpus / clusters * 4)
    quantize_int8: bool = False

    @classmethod
    def auto(cls, n: int) -> "IndexConfig":
        """Size the index from the corpus: C ≈ 2·√N rounded to a power of
        two, probes ≈ C/37 — the round-3 operating point of the 1M×384
        sweep (C=2048, 56-probe block union → recall@10=0.9961 at 342k
        QPS on one v5e with the deferred merge; docs/ROUND3.md).

        Corpora ≥ 3M rows tighten the cluster cap to ~2× the mean size:
        the default 4× cap pads the slab to >4× the corpus and blows the
        16 GB single-chip HBM at 4M×384 (measured; with the 2× cap the
        spill-balanced layout absorbed 4M rows into one overflow cluster
        at recall@10=0.9965, 221.8k QPS — docs/ROUND3.md). At 1M the
        tighter cap is NOT the default: measured −0.2pp recall for +3%
        QPS, dominated by the 4×-cap point."""
        import math

        c = 2 ** int(round(math.log2(max(2.0 * math.sqrt(max(n, 1)), 8.0))))
        c = max(8, min(c, max(n // 32, 8)))
        probes = max(4, min(c, int(round(c / 37)) or 4))
        cap = 0
        if n >= 3_000_000:
            cap = max(8, (2 * n // c + 511) // 512 * 512)
        return cls(num_clusters=c, num_probes=probes, max_cluster_size=cap)


@dataclass(frozen=True)
class RunConfig:
    """Top-level run config threaded through entry points — analogue of
    the reference's ``Configuration`` object passed everywhere."""

    model_name: str = "minilm-l6"
    arch: EncoderArch = field(default_factory=lambda: ARCH_PRESETS["minilm-l6"])
    mesh: MeshConfig = field(default_factory=MeshConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    index: IndexConfig = field(default_factory=IndexConfig)
    save_path: str = "checkpoints"

    def to_json(self) -> str:
        return json.dumps(_asdict(self), indent=2, sort_keys=True)

    @classmethod
    def from_json(cls, s: str) -> "RunConfig":
        d = json.loads(s)
        return cls(
            model_name=d.get("model_name", "minilm-l6"),
            arch=EncoderArch(**d["arch"]),
            mesh=MeshConfig(**d["mesh"]),
            train=TrainConfig(**d["train"]),
            index=IndexConfig(**d["index"]),
            save_path=d.get("save_path", "checkpoints"),
        )
