"""HuggingFace → pytree weight conversion.

Capability parity with the reference's ``AutoModel.from_pretrained``
bootstrap (reference: src/models/modeling.py:32-33): any BERT / MiniLM /
DistilBERT / RoBERTa / XLM-R / ALBERT checkpoint converts into this framework's
stacked-layer pytree. Works from either a live ``transformers`` torch model
or a raw state_dict (numpy'd), so converted checkpoints can be produced
offline and shipped as npz.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np
import jax.numpy as jnp

from ..core.config import EncoderArch


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def arch_from_hf_config(cfg) -> EncoderArch:
    """Map a transformers PretrainedConfig to EncoderArch."""
    mt = cfg.model_type
    if mt == "distilbert":
        return EncoderArch(
            vocab_size=cfg.vocab_size,
            hidden_size=cfg.dim,
            num_layers=cfg.n_layers,
            num_heads=cfg.n_heads,
            intermediate_size=cfg.hidden_dim,
            max_position=cfg.max_position_embeddings,
            type_vocab_size=0,
            layer_norm_eps=1e-12,
            hidden_act=cfg.activation,
            pad_token_id=cfg.pad_token_id,
            has_token_type=False,
            has_pooler=False,
        )
    if mt == "albert":
        if (
            getattr(cfg, "num_hidden_groups", 1) != 1
            or getattr(cfg, "inner_group_num", 1) != 1
        ):
            raise ValueError("only single-group ALBERT is supported")
        return EncoderArch(
            vocab_size=cfg.vocab_size,
            hidden_size=cfg.hidden_size,
            num_layers=cfg.num_hidden_layers,
            num_heads=cfg.num_attention_heads,
            intermediate_size=cfg.intermediate_size,
            max_position=cfg.max_position_embeddings,
            type_vocab_size=cfg.type_vocab_size,
            layer_norm_eps=cfg.layer_norm_eps,
            hidden_act=cfg.hidden_act,
            pad_token_id=cfg.pad_token_id or 0,
            has_token_type=cfg.type_vocab_size > 0,
            has_pooler=True,
            share_layers=True,
            # HF ALBERT applies embedding_hidden_mapping_in UNCONDITIONALLY
            # (even when embedding_size == hidden_size), so the factor size
            # must stay set either way or the learned projection is
            # silently dropped from converted checkpoints.
            embed_factor_size=cfg.embedding_size,
        )
    if mt in ("bert", "roberta", "xlm-roberta", "camembert"):
        offset = 2 if mt != "bert" else 0
        return EncoderArch(
            vocab_size=cfg.vocab_size,
            hidden_size=cfg.hidden_size,
            num_layers=cfg.num_hidden_layers,
            num_heads=cfg.num_attention_heads,
            intermediate_size=cfg.intermediate_size,
            max_position=cfg.max_position_embeddings,
            type_vocab_size=cfg.type_vocab_size,
            layer_norm_eps=cfg.layer_norm_eps,
            hidden_act=cfg.hidden_act,
            pad_token_id=cfg.pad_token_id or 0,
            position_offset=offset,
            has_token_type=cfg.type_vocab_size > 0,
            has_pooler=mt == "bert",
        )
    raise ValueError(f"unsupported model_type {mt!r}")


# key templates per family: ours ← theirs
_BERT_LAYER = {
    ("attn", "q", "w"): "encoder.layer.{i}.attention.self.query.weight",
    ("attn", "q", "b"): "encoder.layer.{i}.attention.self.query.bias",
    ("attn", "k", "w"): "encoder.layer.{i}.attention.self.key.weight",
    ("attn", "k", "b"): "encoder.layer.{i}.attention.self.key.bias",
    ("attn", "v", "w"): "encoder.layer.{i}.attention.self.value.weight",
    ("attn", "v", "b"): "encoder.layer.{i}.attention.self.value.bias",
    ("attn", "o", "w"): "encoder.layer.{i}.attention.output.dense.weight",
    ("attn", "o", "b"): "encoder.layer.{i}.attention.output.dense.bias",
    ("attn_ln", "scale"): "encoder.layer.{i}.attention.output.LayerNorm.weight",
    ("attn_ln", "bias"): "encoder.layer.{i}.attention.output.LayerNorm.bias",
    ("mlp", "in", "w"): "encoder.layer.{i}.intermediate.dense.weight",
    ("mlp", "in", "b"): "encoder.layer.{i}.intermediate.dense.bias",
    ("mlp", "out", "w"): "encoder.layer.{i}.output.dense.weight",
    ("mlp", "out", "b"): "encoder.layer.{i}.output.dense.bias",
    ("mlp_ln", "scale"): "encoder.layer.{i}.output.LayerNorm.weight",
    ("mlp_ln", "bias"): "encoder.layer.{i}.output.LayerNorm.bias",
}

_DISTILBERT_LAYER = {
    ("attn", "q", "w"): "transformer.layer.{i}.attention.q_lin.weight",
    ("attn", "q", "b"): "transformer.layer.{i}.attention.q_lin.bias",
    ("attn", "k", "w"): "transformer.layer.{i}.attention.k_lin.weight",
    ("attn", "k", "b"): "transformer.layer.{i}.attention.k_lin.bias",
    ("attn", "v", "w"): "transformer.layer.{i}.attention.v_lin.weight",
    ("attn", "v", "b"): "transformer.layer.{i}.attention.v_lin.bias",
    ("attn", "o", "w"): "transformer.layer.{i}.attention.out_lin.weight",
    ("attn", "o", "b"): "transformer.layer.{i}.attention.out_lin.bias",
    ("attn_ln", "scale"): "transformer.layer.{i}.sa_layer_norm.weight",
    ("attn_ln", "bias"): "transformer.layer.{i}.sa_layer_norm.bias",
    ("mlp", "in", "w"): "transformer.layer.{i}.ffn.lin1.weight",
    ("mlp", "in", "b"): "transformer.layer.{i}.ffn.lin1.bias",
    ("mlp", "out", "w"): "transformer.layer.{i}.ffn.lin2.weight",
    ("mlp", "out", "b"): "transformer.layer.{i}.ffn.lin2.bias",
    ("mlp_ln", "scale"): "transformer.layer.{i}.output_layer_norm.weight",
    ("mlp_ln", "bias"): "transformer.layer.{i}.output_layer_norm.bias",
}

# ALBERT: one shared parameter set (layer group 0, inner layer 0) — the
# {i} template index is unused and the stack depth is 1 (the forward scan
# reuses it num_layers times; encoder.py share_layers).
_ALBERT_LAYER = {
    ("attn", "q", "w"): "encoder.albert_layer_groups.0.albert_layers.0.attention.query.weight",
    ("attn", "q", "b"): "encoder.albert_layer_groups.0.albert_layers.0.attention.query.bias",
    ("attn", "k", "w"): "encoder.albert_layer_groups.0.albert_layers.0.attention.key.weight",
    ("attn", "k", "b"): "encoder.albert_layer_groups.0.albert_layers.0.attention.key.bias",
    ("attn", "v", "w"): "encoder.albert_layer_groups.0.albert_layers.0.attention.value.weight",
    ("attn", "v", "b"): "encoder.albert_layer_groups.0.albert_layers.0.attention.value.bias",
    ("attn", "o", "w"): "encoder.albert_layer_groups.0.albert_layers.0.attention.dense.weight",
    ("attn", "o", "b"): "encoder.albert_layer_groups.0.albert_layers.0.attention.dense.bias",
    ("attn_ln", "scale"): "encoder.albert_layer_groups.0.albert_layers.0.attention.LayerNorm.weight",
    ("attn_ln", "bias"): "encoder.albert_layer_groups.0.albert_layers.0.attention.LayerNorm.bias",
    ("mlp", "in", "w"): "encoder.albert_layer_groups.0.albert_layers.0.ffn.weight",
    ("mlp", "in", "b"): "encoder.albert_layer_groups.0.albert_layers.0.ffn.bias",
    ("mlp", "out", "w"): "encoder.albert_layer_groups.0.albert_layers.0.ffn_output.weight",
    ("mlp", "out", "b"): "encoder.albert_layer_groups.0.albert_layers.0.ffn_output.bias",
    ("mlp_ln", "scale"): "encoder.albert_layer_groups.0.albert_layers.0.full_layer_layer_norm.weight",
    ("mlp_ln", "bias"): "encoder.albert_layer_groups.0.albert_layers.0.full_layer_layer_norm.bias",
}

_EMB = {
    "bert": {
        "word": "embeddings.word_embeddings.weight",
        "position": "embeddings.position_embeddings.weight",
        "token_type": "embeddings.token_type_embeddings.weight",
        "ln_scale": "embeddings.LayerNorm.weight",
        "ln_bias": "embeddings.LayerNorm.bias",
    },
    "distilbert": {
        "word": "embeddings.word_embeddings.weight",
        "position": "embeddings.position_embeddings.weight",
        "ln_scale": "embeddings.LayerNorm.weight",
        "ln_bias": "embeddings.LayerNorm.bias",
    },
    "albert": {
        "word": "embeddings.word_embeddings.weight",
        "position": "embeddings.position_embeddings.weight",
        "token_type": "embeddings.token_type_embeddings.weight",
        "ln_scale": "embeddings.LayerNorm.weight",
        "ln_bias": "embeddings.LayerNorm.bias",
    },
}


def convert_state_dict(
    state_dict: Dict[str, "np.ndarray"],
    arch: EncoderArch,
    family: str = "bert",
) -> dict:
    """Convert an HF state_dict (torch tensors or numpy) to our pytree.

    Linear weights transpose (torch stores (out, in); we matmul x @ w with
    w (in, out)). Layers stack along a leading axis for ``lax.scan``.
    """
    sd = {k: _np(v) for k, v in state_dict.items()}
    # Strip a top-level prefix like "bert." / "distilbert." / "roberta."
    prefixes = ("bert.", "distilbert.", "roberta.", "albert.", "model.")
    for p in prefixes:
        if any(k.startswith(p) for k in sd):
            sd = {
                (k[len(p):] if k.startswith(p) else k): v for k, v in sd.items()
            }
            break

    if family in ("distilbert", "albert"):
        fam = family
    else:
        fam = "bert"
    emb_map = _EMB[fam]
    layer_map = {
        "distilbert": _DISTILBERT_LAYER,
        "albert": _ALBERT_LAYER,
        "bert": _BERT_LAYER,
    }[fam]
    # ALBERT shares one parameter set across all layers — stack depth 1
    l = 1 if arch.share_layers else arch.num_layers

    def stacked(template: str, transpose: bool) -> jnp.ndarray:
        mats = []
        for i in range(l):
            m = sd[template.format(i=i)]
            mats.append(m.T if transpose else m)
        return jnp.asarray(np.stack(mats), jnp.float32)

    def nest(flat: Dict[Tuple[str, ...], jnp.ndarray]) -> dict:
        out: dict = {}
        for path, v in flat.items():
            d = out
            for kpart in path[:-1]:
                d = d.setdefault(kpart, {})
            d[path[-1]] = v
        return out

    layers_flat = {}
    for path, template in layer_map.items():
        is_weight = path[-1] == "w"
        layers_flat[path] = stacked(template, transpose=is_weight)

    params = {
        "embeddings": {
            "word": jnp.asarray(sd[emb_map["word"]], jnp.float32),
            "position": jnp.asarray(sd[emb_map["position"]], jnp.float32),
            "ln": {
                "scale": jnp.asarray(sd[emb_map["ln_scale"]], jnp.float32),
                "bias": jnp.asarray(sd[emb_map["ln_bias"]], jnp.float32),
            },
        },
        "layers": nest(layers_flat),
    }
    if arch.has_token_type and "token_type" in emb_map:
        params["embeddings"]["token_type"] = jnp.asarray(
            sd[emb_map["token_type"]], jnp.float32
        )
    if arch.embed_factor_size and "encoder.embedding_hidden_mapping_in.weight" in sd:
        params["embeddings"]["proj"] = {
            "w": jnp.asarray(
                sd["encoder.embedding_hidden_mapping_in.weight"].T,
                jnp.float32,
            ),
            "b": jnp.asarray(
                sd["encoder.embedding_hidden_mapping_in.bias"], jnp.float32
            ),
        }
    if arch.has_pooler and "pooler.dense.weight" in sd:
        params["pooler"] = {
            "w": jnp.asarray(sd["pooler.dense.weight"].T, jnp.float32),
            "b": jnp.asarray(sd["pooler.dense.bias"], jnp.float32),
        }
    elif arch.has_pooler and "pooler.weight" in sd:   # ALBERT: bare Linear
        params["pooler"] = {
            "w": jnp.asarray(sd["pooler.weight"].T, jnp.float32),
            "b": jnp.asarray(sd["pooler.bias"], jnp.float32),
        }
    return params


def extend_positions(params: dict, arch: EncoderArch, new_max: int) -> Tuple[dict, EncoderArch]:
    """Long-context conversion: tile the learned position embeddings out to
    ``new_max`` positions (the reference's Longformer conversion trick,
    make_long_transformer.py:47-54 — copy the position table k times). The
    first positions (incl. RoBERTa's offset rows) are preserved exactly."""
    emb = params["embeddings"]["position"]
    old_max, h = emb.shape
    if new_max <= old_max:
        return params, arch
    reps = -(-new_max // old_max)
    offset = arch.position_offset
    body = emb[offset:]
    tiled = jnp.concatenate([emb[:offset]] + [body] * reps, axis=0)[:new_max]
    new_params = dict(params)
    new_params["embeddings"] = dict(params["embeddings"])
    new_params["embeddings"]["position"] = tiled
    return new_params, arch.replace(max_position=new_max)


def convert_hf_model(hf_model) -> Tuple[dict, EncoderArch]:
    """Convert a live transformers model (BertModel/DistilBertModel/
    RobertaModel/AlbertModel) into (params, arch)."""
    arch = arch_from_hf_config(hf_model.config)
    family = hf_model.config.model_type
    if family in ("distilbert", "albert"):
        fam = family
    else:
        fam = "bert"
    params = convert_state_dict(hf_model.state_dict(), arch, family=fam)
    return params, arch
