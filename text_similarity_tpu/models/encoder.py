"""BERT-class transformer encoder as a pure-pytree functional model.

Capability parity with the reference's HF ``AutoModel`` wrapper
(reference: src/models/modeling.py:11-87) but TPU-first:

- params are a plain pytree of arrays; layers are *stacked* along a leading
  L axis and the forward pass is a single ``lax.scan`` — one compiled layer
  body regardless of depth (fast compiles, natural fit for theseus-style
  layer surgery and layer-drop distillation);
- attention dispatches to a Pallas flash kernel on TPU
  (ops/attention.py), the full S×S score tensor never hits HBM;
- softmax/layernorm in fp32, matmuls in bf16 (Precision policy) — the
  TPU analogue of the reference's fp16 AMP;
- tensor-parallel PartitionSpecs are provided by :func:`param_pspecs` so the
  same params pytree shards over a mesh ``model`` axis under pjit.

Supports BERT / MiniLM / DistilBERT / RoBERTa layouts via EncoderArch flags.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..core.config import EncoderArch
from ..core.precision import Precision, DEFAULT_PRECISION
from ..ops.attention import multi_head_attention


class EncoderOutput(NamedTuple):
    last_hidden_state: jax.Array            # (B, S, H)
    pooler_output: Optional[jax.Array]      # (B, H) tanh(W·cls) or None
    hidden_states: Optional[jax.Array]      # (L+1, B, S, H) if requested
    moe_aux: Optional[jax.Array] = None     # scalar load-balance loss
                                            # (mean over layers) for MoE archs
    moe_drop: Optional[jax.Array] = None    # scalar dropped-token fraction
                                            # (mean over layers) for MoE archs


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def _dense_init(key, fan_in, fan_out, stddev=0.02):
    return jax.random.normal(key, (fan_in, fan_out), jnp.float32) * stddev


def init_params(key: jax.Array, arch: EncoderArch) -> dict:
    """Random-init params (HF-style trunc-normal-ish, std=0.02)."""
    keys = jax.random.split(key, 16)
    h, i = arch.hidden_size, arch.intermediate_size
    # ALBERT layer sharing: ONE parameter set on the stack axis; the
    # forward scan still runs num_layers iterations over it.
    l = 1 if arch.share_layers else arch.num_layers
    # ALBERT factorized embeddings: tables at E, projected to H.
    e = arch.embed_factor_size or h

    def stack(fn, key, *shape_args):
        ks = jax.random.split(key, l)
        return jnp.stack([fn(ks[j], *shape_args) for j in range(l)])

    params = {
        "embeddings": {
            "word": jax.random.normal(keys[0], (arch.vocab_size, e)) * 0.02,
            "position": jax.random.normal(keys[1], (arch.max_position, e)) * 0.02,
            "ln": {"scale": jnp.ones((e,)), "bias": jnp.zeros((e,))},
        },
        "layers": {
            "attn": {
                "q": {"w": stack(_dense_init, keys[2], h, h), "b": jnp.zeros((l, h))},
                "k": {"w": stack(_dense_init, keys[3], h, h), "b": jnp.zeros((l, h))},
                "v": {"w": stack(_dense_init, keys[4], h, h), "b": jnp.zeros((l, h))},
                "o": {"w": stack(_dense_init, keys[5], h, h), "b": jnp.zeros((l, h))},
            },
            "attn_ln": {"scale": jnp.ones((l, h)), "bias": jnp.zeros((l, h))},
            "mlp": {
                "in": {"w": stack(_dense_init, keys[6], h, i), "b": jnp.zeros((l, i))},
                "out": {"w": stack(_dense_init, keys[7], i, h), "b": jnp.zeros((l, h))},
            },
            "mlp_ln": {"scale": jnp.ones((l, h)), "bias": jnp.zeros((l, h))},
        },
    }
    if arch.num_experts > 0:
        # MoE FFN (ops/moe.py): expert weights stack (L, E, ·, ·); the E
        # axis shards over the mesh "expert" axis (param_pspecs). Replaces
        # the dense mlp in/out; the router is a small per-layer (H, E).
        ne = arch.num_experts

        def stack_experts(key, fan_in, fan_out):
            ks = jax.random.split(key, l * ne)
            return jnp.stack(
                [_dense_init(k2, fan_in, fan_out) for k2 in ks]
            ).reshape(l, ne, fan_in, fan_out)

        params["layers"]["mlp"] = {
            "router": {"w": stack(_dense_init, keys[12], h, ne)},
            "in": {
                "w": stack_experts(keys[6], h, i),
                "b": jnp.zeros((l, ne, i)),
            },
            "out": {
                "w": stack_experts(keys[7], i, h),
                "b": jnp.zeros((l, ne, h)),
            },
        }
    if arch.has_token_type:
        params["embeddings"]["token_type"] = (
            jax.random.normal(keys[8], (arch.type_vocab_size, e)) * 0.02
        )
    if arch.embed_factor_size:
        params["embeddings"]["proj"] = {
            "w": _dense_init(keys[11], e, h),
            "b": jnp.zeros((h,)),
        }
    if arch.has_pooler:
        params["pooler"] = {
            "w": _dense_init(keys[9], h, h),
            "b": jnp.zeros((h,)),
        }
    if arch.projection_dim:
        params["projection"] = {
            "w": _dense_init(keys[10], h, arch.projection_dim),
            "b": jnp.zeros((arch.projection_dim,)),
        }
    return params


# ---------------------------------------------------------------------------
# Sharding specs (tensor parallelism over the mesh "model" axis)
# ---------------------------------------------------------------------------

def param_pspecs(
    arch: EncoderArch,
    model_axis: str = "model",
    expert_axis: str = "expert",
) -> dict:
    """Megatron-style TP: QKV/MLP-in shard the output feature dim, O/MLP-out
    shard the input feature dim (row-parallel); XLA inserts the psum. MoE
    archs shard the expert dim over ``expert_axis`` (EP) and keep the
    Megatron column/row split within each expert (EP×TP composition)."""
    m = model_axis
    specs = {
        "embeddings": {
            "word": P(None, None),
            "position": P(None, None),
            "ln": {"scale": P(None), "bias": P(None)},
        },
        "layers": {
            "attn": {
                "q": {"w": P(None, None, m), "b": P(None, m)},
                "k": {"w": P(None, None, m), "b": P(None, m)},
                "v": {"w": P(None, None, m), "b": P(None, m)},
                "o": {"w": P(None, m, None), "b": P(None, None)},
            },
            "attn_ln": {"scale": P(None, None), "bias": P(None, None)},
            "mlp": {
                "in": {"w": P(None, None, m), "b": P(None, m)},
                "out": {"w": P(None, m, None), "b": P(None, None)},
            },
            "mlp_ln": {"scale": P(None, None), "bias": P(None, None)},
        },
    }
    if arch.num_experts > 0:
        ex = expert_axis
        specs["layers"]["mlp"] = {
            "router": {"w": P(None, None, None)},
            "in": {"w": P(None, ex, None, m), "b": P(None, ex, m)},
            "out": {"w": P(None, ex, m, None), "b": P(None, ex, None)},
        }
    if arch.has_token_type:
        specs["embeddings"]["token_type"] = P(None, None)
    if arch.embed_factor_size:
        specs["embeddings"]["proj"] = {"w": P(None, None), "b": P(None)}
    if arch.has_pooler:
        specs["pooler"] = {"w": P(None, None), "b": P(None)}
    if arch.projection_dim:
        specs["projection"] = {"w": P(None, None), "b": P(None)}
    return specs


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _layer_norm(x, scale, bias, eps):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mu) * jax.lax.rsqrt(var + eps)
    return (y * scale + bias).astype(x.dtype)


def _act(name: str):
    if name == "gelu":
        # HF default: exact erf gelu.
        return lambda x: jax.nn.gelu(x, approximate=False)
    if name == "gelu_new":
        return lambda x: jax.nn.gelu(x, approximate=True)
    if name == "relu":
        return jax.nn.relu
    # reference src/utils/activations.py:5-18
    if name == "mish":
        return lambda x: x * jnp.tanh(jax.nn.softplus(x))
    if name == "swish":
        return jax.nn.silu
    if name == "penalized_tanh":
        return lambda x: jnp.where(x > 0, jnp.tanh(x), 0.25 * jnp.tanh(x))
    raise ValueError(f"unknown activation {name}")


def _dropout(x, rate, key, deterministic):
    if deterministic or rate == 0.0:
        return x
    keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0).astype(x.dtype)


# ---------------------------------------------------------------------------
# int8 serving path: the quantized tree from compress.quantize carries
# {"q": int8 kernel, "s": per-output-channel scale} leaves; when present,
# dense layers run dynamic per-token activation quantization and an
# int8×int8→int32 MXU dot — the TPU-native form of the reference's
# onnxruntime int8 serving (model_compression.py:784-791, search
# int8 intent search_pipeline.py:193-226). The int8 MXU runs at 2× the
# bf16 rate on v5e, and the weight stream from HBM halves vs bf16.
# Inference-only (round() has no gradient).
# ---------------------------------------------------------------------------


def _is_q(wb_w) -> bool:
    return isinstance(wb_w, dict) and "q" in wb_w


def dequant_weight(w):
    """Weight-only dequant of one {"q", "s"} int8 leaf; pass-through for
    dense kernels. For the SMALL kernels (pooler, projections, classifier
    heads) where a full int8 activation-quant path isn't worth the extra
    quantize step — the single shared helper all call sites use."""
    if _is_q(w):
        return w["q"].astype(jnp.float32) * w["s"]
    return w


def _dyn_quant_tokens(x: jax.Array):
    """Per-token (last-axis) symmetric int8: (…, H) → int8 plus (…, 1)
    fp32 scale."""
    x32 = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    s = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(x32 / s), -127, 127).astype(jnp.int8)
    return q, s


def _int8_dense(x: jax.Array, wb: dict) -> jax.Array:
    """y = dequant(quant(x) @ w_q) + b, per-token × per-channel scales."""
    xq, xs = _dyn_quant_tokens(x)
    y = jnp.einsum(
        "bsh,ho->bso", xq, wb["w"]["q"],
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    y = y * xs * wb["w"]["s"].reshape(1, 1, -1)
    return y.astype(x.dtype) + wb["b"]


def transformer_layer(
    hx: jax.Array,                 # (B, S, H)
    lp: dict,                      # one layer's params (unstacked)
    attention_mask: jax.Array,     # (B, S)
    *,
    arch: EncoderArch,
    precision: Precision = DEFAULT_PRECISION,
    head_mask: Optional[jax.Array] = None,   # (num_heads,)
    dropout_rng: Optional[jax.Array] = None,
    deterministic: bool = True,
    attention_impl: str = "auto",
    performer_proj: Optional[jax.Array] = None,
    cp_axis: Optional[str] = None,   # context-parallel mesh axis for
                                     # attention_impl="ring"/"ulysses"
    with_aux: bool = False,          # also return the MoE aux-loss scalar
    segment_ids: Optional[jax.Array] = None,  # (B, S): packed-batch
                                     # block-diagonal attention mask
) -> jax.Array:
    """One post-LN transformer block: MHA + residual + LN, FFN + residual +
    LN. Shared by the stock encoder scan, the theseus mixed stack
    (compress/theseus.py), and pruning rewires. For MoE archs
    (``arch.num_experts > 0``) the FFN is the routed expert block
    (ops/moe.py); ``with_aux=True`` returns ``(out, aux, drop)`` where aux
    is the layer's load-balance loss and drop its dropped-token fraction
    (both 0.0 for dense archs)."""
    b, s, h = hx.shape
    nh, hd = arch.num_heads, arch.head_dim
    attn, mlp = lp["attn"], lp["mlp"]
    act = _act(arch.hidden_act)
    if dropout_rng is None:
        dropout_rng = jax.random.PRNGKey(0)

    def dense(x_, wb):
        if _is_q(wb["w"]):
            return _int8_dense(x_, wb)
        return (
            jnp.einsum(
                "bsh,ho->bso", x_, wb["w"],
                preferred_element_type=precision.accum_dtype,
            ).astype(x_.dtype)
            + wb["b"]
        )

    # Fused QKV: one (B·S, H) @ (H, 3·nh·hd) MXU matmul instead of three —
    # x streams from HBM once. Weights stack head-interleaved (h, nh, 3, hd)
    # so under tensor parallelism the sharded nh dim survives the stack and
    # the q/k/v slices stay local (no resharding collective).
    quant = _is_q(attn["q"]["w"])

    def _kernel(wb):
        return wb["w"]["q"] if quant else wb["w"]

    w_qkv = jnp.stack(
        [
            _kernel(attn["q"]).reshape(h, nh, hd),
            _kernel(attn["k"]).reshape(h, nh, hd),
            _kernel(attn["v"]).reshape(h, nh, hd),
        ],
        axis=2,
    )  # (h, nh, 3, hd)
    b_qkv = jnp.stack(
        [
            attn["q"]["b"].reshape(nh, hd),
            attn["k"]["b"].reshape(nh, hd),
            attn["v"]["b"].reshape(nh, hd),
        ],
        axis=1,
    )  # (nh, 3, hd)
    if quant:
        s_qkv = jnp.stack(
            [
                attn["q"]["w"]["s"].reshape(nh, hd),
                attn["k"]["w"]["s"].reshape(nh, hd),
                attn["v"]["w"]["s"].reshape(nh, hd),
            ],
            axis=1,
        )  # (nh, 3, hd)
        hq, hs = _dyn_quant_tokens(hx)
        qkv = jnp.einsum(
            "bsh,hnkd->bsnkd", hq, w_qkv, preferred_element_type=jnp.int32
        ).astype(jnp.float32)
        qkv = (
            qkv * hs[..., None, None] * s_qkv[None, None]
        ).astype(hx.dtype) + b_qkv
    else:
        qkv = (
            jnp.einsum(
                "bsh,hnkd->bsnkd", hx, w_qkv,
                preferred_element_type=precision.accum_dtype,
            ).astype(hx.dtype)
            + b_qkv
        )
    q, k, v = qkv[:, :, :, 0], qkv[:, :, :, 1], qkv[:, :, :, 2]
    ctx = multi_head_attention(
        q, k, v, mask=attention_mask, head_mask=head_mask,
        impl=attention_impl, performer_proj=performer_proj,
        window=arch.attention_window,
        performer_kernel=arch.performer_kernel,
        performer_local_heads=arch.performer_local_heads,
        performer_local_window=arch.performer_local_window,
        window_global_cls=arch.window_global_cls,
        cp_axis=cp_axis,
        segment_ids=segment_ids,
    ).reshape(b, s, nh * hd)  # nh*hd < h after head pruning
    ctx = dense(ctx, attn["o"])
    ctx = _dropout(
        ctx, arch.hidden_dropout, jax.random.fold_in(dropout_rng, 0),
        deterministic,
    )
    hx1 = _layer_norm(
        hx + ctx, lp["attn_ln"]["scale"], lp["attn_ln"]["bias"],
        arch.layer_norm_eps,
    )
    moe_aux = jnp.zeros((), jnp.float32)
    moe_drop = jnp.zeros((), jnp.float32)
    if arch.num_experts > 0:
        from ..ops.moe import moe_ffn

        ff, moe_aux, moe_drop = moe_ffn(
            hx1, attention_mask,
            mlp["router"]["w"], mlp["in"]["w"], mlp["in"]["b"],
            mlp["out"]["w"], mlp["out"]["b"],
            top_k=arch.expert_top_k,
            capacity_factor=arch.expert_capacity_factor,
            activation=act, accum_dtype=precision.accum_dtype,
        )
    else:
        ff = dense(hx1, mlp["in"])
        ff = act(ff.astype(jnp.float32)).astype(hx1.dtype)
        ff = dense(ff, mlp["out"])
    ff = _dropout(
        ff, arch.hidden_dropout, jax.random.fold_in(dropout_rng, 1),
        deterministic,
    )
    out = _layer_norm(
        hx1 + ff, lp["mlp_ln"]["scale"], lp["mlp_ln"]["bias"],
        arch.layer_norm_eps,
    )
    return (out, moe_aux, moe_drop) if with_aux else out


def embed_inputs(
    emb: dict,                          # params["embeddings"]
    input_ids: jax.Array,
    attention_mask: jax.Array,
    token_type_ids: Optional[jax.Array] = None,
    *,
    arch: EncoderArch,
    precision: Precision = DEFAULT_PRECISION,
    deterministic: bool = True,
    dropout_rng: Optional[jax.Array] = None,
    position_ids: Optional[jax.Array] = None,  # (B, S) override — packed
                                               # rows restart positions at
                                               # each segment boundary
) -> jax.Array:
    """Word + position (+ token type) embeddings, LN, dropout — in the
    compute dtype. Shared by the stock forward and the theseus mixed
    stack (which previously ran the FULL layer scan with layer_gate=0
    just to get this tensor: all L layers executed and were discarded).
    """
    b, s = input_ids.shape

    def take(table, idx):
        # int8-quantized table: gather int8 rows, then dequant (per-column
        # scale) — the full-table dequant would read 4× the HBM
        if _is_q(table):
            rows = jnp.take(table["q"], idx, axis=0).astype(jnp.float32)
            return rows * table["s"]
        return jnp.take(table, idx, axis=0)

    x = take(emb["word"], input_ids)
    if position_ids is not None:
        if arch.position_offset:
            # RoBERTa-family tables index real tokens at pad_token_id+1+p
            # and padding at pad_token_id (same mapping as the cumsum
            # branch below) — packed rows pass 0-based per-segment
            # positions, so shift them here or packed embeddings silently
            # diverge from the bucketed path
            m = attention_mask.astype(jnp.int32)
            position_ids = (
                position_ids + arch.pad_token_id + 1
            ) * m + arch.pad_token_id * (1 - m)
        x = x + take(emb["position"], position_ids)
    elif arch.position_offset:
        # RoBERTa: padding tokens keep position = pad index; real tokens
        # get cumulative positions (create_position_ids_from_input_ids)
        m = attention_mask.astype(jnp.int32)
        pos_ids = jnp.cumsum(m, axis=1) * m + arch.pad_token_id
        x = x + take(emb["position"], pos_ids)
    elif _is_q(emb["position"]):
        x = x + (
            emb["position"]["q"][:s].astype(jnp.float32)
            * emb["position"]["s"]
        )[None]
    else:
        x = x + emb["position"][None, :s, :]
    if arch.has_token_type:
        if token_type_ids is None:
            token_type_ids = jnp.zeros((b, s), jnp.int32)
        x = x + take(emb["token_type"], token_type_ids)
    x = _layer_norm(x, emb["ln"]["scale"], emb["ln"]["bias"],
                    arch.layer_norm_eps)
    if dropout_rng is None:
        dropout_rng = jax.random.PRNGKey(0)
    x = _dropout(
        x, arch.hidden_dropout, jax.random.fold_in(dropout_rng, 997),
        deterministic,
    )
    if arch.embed_factor_size and "proj" in emb:
        # ALBERT factorized embeddings: tables live at E; map E→H before
        # the layer stack (HF embedding_hidden_mapping_in semantics)
        pw = dequant_weight(emb["proj"]["w"])  # small (E, H) kernel
        x = (
            jnp.einsum(
                "bse,eh->bsh", x, pw,
                preferred_element_type=precision.accum_dtype,
            )
            + emb["proj"]["b"]
        )
    return x.astype(precision.compute_dtype)


def encoder_forward(
    params: dict,
    input_ids: jax.Array,               # (B, S) int32
    attention_mask: Optional[jax.Array] = None,  # (B, S) 1=keep
    token_type_ids: Optional[jax.Array] = None,  # (B, S)
    *,
    arch: EncoderArch,
    precision: Precision = DEFAULT_PRECISION,
    head_mask: Optional[jax.Array] = None,       # (L, num_heads)
    layer_gate: Optional[jax.Array] = None,      # (L,) 1=run layer, 0=skip
    deterministic: bool = True,
    dropout_rng: Optional[jax.Array] = None,
    output_hidden_states: bool = False,
    attention_impl: str = "auto",
    performer_step=None,   # train step for performer feature redraw
    remat: bool = False,   # rematerialize layer activations in backward
    segment_ids: Optional[jax.Array] = None,  # (B, S): packed-batch
                           # block-diagonal attention (data/packing.py)
    position_ids: Optional[jax.Array] = None,  # (B, S): packed rows
                           # restart positions per segment
) -> EncoderOutput:
    """Run the encoder. ``layer_gate`` supports theseus-style stochastic
    layer skipping and layer-drop distillation (reference semantics:
    src/models/bert_of_theseus.py:551-561) — a gated layer contributes the
    identity."""
    b, s = input_ids.shape
    h = arch.hidden_size
    nh, hd = arch.num_heads, arch.head_dim
    if attention_mask is None:
        attention_mask = jnp.ones((b, s), jnp.int32)

    if dropout_rng is None:
        dropout_rng = jax.random.PRNGKey(0)
    x = embed_inputs(
        params["embeddings"], input_ids, attention_mask, token_type_ids,
        arch=arch, precision=precision, deterministic=deterministic,
        dropout_rng=dropout_rng, position_ids=position_ids,
    )

    l = arch.num_layers
    if head_mask is None:
        hm_stack = jnp.ones((l, nh), jnp.float32)
        use_head_mask = False
    else:
        hm_stack = head_mask.astype(jnp.float32)
        use_head_mask = True
    if layer_gate is None:
        layer_gate = jnp.ones((l,), jnp.float32)

    layer_params = jax.tree.map(
        lambda p: p.astype(precision.compute_dtype)
        if jnp.issubdtype(p.dtype, jnp.floating)
        else p,
        params["layers"],
    )

    performer_proj = None
    if arch.attention_type == "performer":
        from ..ops.performer import (
            orthogonal_random_features,
            redraw_features,
        )

        m = arch.performer_features or arch.head_dim
        if arch.performer_redraw_every > 0 and performer_step is not None:
            # feature redraw: projection is a function of
            # step // redraw_every (reference fast_attention.py:137-188)
            performer_proj = redraw_features(
                jax.random.PRNGKey(42), performer_step,
                arch.performer_redraw_every, m, arch.head_dim,
            )
        else:
            performer_proj = orthogonal_random_features(
                jax.random.PRNGKey(42), m, arch.head_dim
            )
        attention_impl = "performer"

    # ALBERT layer sharing: the single parameter set is closed over the
    # scan body (it's a traced function argument, not a baked constant)
    # and every iteration reuses it.
    shared_lp = (
        jax.tree.map(lambda p: p[0], layer_params)
        if arch.share_layers else None
    )

    moe = arch.num_experts > 0

    def layer_body(carry, scanned):
        hx, aux_acc = carry if moe else (carry, None)
        if shared_lp is None:
            lp, hm, gate, layer_idx = scanned
        else:
            hm, gate, layer_idx = scanned
            lp = shared_lp
        hx2 = transformer_layer(
            hx, lp, attention_mask,
            arch=arch, precision=precision,
            head_mask=hm if use_head_mask else None,
            dropout_rng=jax.random.fold_in(dropout_rng, layer_idx),
            deterministic=deterministic,
            attention_impl=attention_impl,
            performer_proj=performer_proj,
            with_aux=moe,
            segment_ids=segment_ids,
        )
        if moe:
            hx2, aux, drop = hx2
        out = gate * hx2 + (1.0 - gate) * hx
        out = out.astype(hx.dtype)
        if moe:
            # a gated-off layer contributes no aux (its FFN is discarded)
            g = gate.astype(jnp.float32)
            carry_out = (
                out, aux_acc + g * jnp.stack([aux, drop])
            )
        else:
            carry_out = out
        return carry_out, out if output_hidden_states else None

    scanned = (
        hm_stack,
        layer_gate.astype(precision.compute_dtype),
        jnp.arange(l, dtype=jnp.int32),
    )
    if shared_lp is None:
        scanned = (layer_params,) + scanned
    body = layer_body
    if remat:
        # trade FLOPs for HBM: the backward pass recomputes each layer's
        # activations instead of saving them across the whole scan.
        # remat="dots" keeps every matmul OUTPUT resident (the FLOPs-heavy
        # part of recompute) and re-derives only the cheap elementwise
        # chain — the middle ground when activations fit HBM. (Full
        # remat=False crashes this environment's remote XLA compiler on
        # every tested config — docs/ROUND3.md.)
        if remat == "dots":
            body = jax.checkpoint(
                layer_body,
                policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
            )
        else:
            body = jax.checkpoint(layer_body)
    carry0 = (x, jnp.zeros((2,), jnp.float32)) if moe else x
    final, ys = jax.lax.scan(body, carry0, scanned)
    moe_aux = moe_drop = None
    if moe:
        final, aux_total = final
        moe_aux = aux_total[0] / l   # mean over layers
        moe_drop = aux_total[1] / l

    hidden_states = None
    if output_hidden_states:
        hidden_states = jnp.concatenate([x[None], ys], axis=0)

    pooler_out = None
    if arch.has_pooler and "pooler" in params:
        cls = final[:, 0, :].astype(jnp.float32)
        pw = params["pooler"]
        w = dequant_weight(pw["w"])   # small (H, H) kernel
        pooler_out = jnp.tanh(cls @ w + pw["b"]).astype(final.dtype)

    return EncoderOutput(final, pooler_out, hidden_states, moe_aux, moe_drop)


def num_params(params) -> int:
    return sum(int(math.prod(p.shape)) for p in jax.tree.leaves(params))


def fsdp_param_pspecs(arch: EncoderArch, data_axis: str = "data") -> dict:
    """ZeRO-3/FSDP-style parameter sharding: every stacked layer kernel
    shards its largest feature dim over the DATA axis; XLA inserts the
    all-gather before use and reduce-scatters gradients (GSPMD). Combine
    with batch sharding over the same axis for memory-scaled data
    parallelism — params + optimizer state per device shrink by the DP
    degree (the reference has no distributed training at all, SURVEY §5.8).
    """
    d = data_axis
    specs = {
        "embeddings": {
            "word": P(d, None),          # vocab dim shards cleanly
            "position": P(None, None),
            "ln": {"scale": P(None), "bias": P(None)},
        },
        "layers": {
            "attn": {
                "q": {"w": P(None, None, d), "b": P(None, d)},
                "k": {"w": P(None, None, d), "b": P(None, d)},
                "v": {"w": P(None, None, d), "b": P(None, d)},
                "o": {"w": P(None, d, None), "b": P(None, None)},
            },
            "attn_ln": {"scale": P(None, None), "bias": P(None, None)},
            "mlp": {
                "in": {"w": P(None, None, d), "b": P(None, d)},
                "out": {"w": P(None, d, None), "b": P(None, None)},
            },
            "mlp_ln": {"scale": P(None, None), "bias": P(None, None)},
        },
    }
    if arch.num_experts > 0:
        # ZeRO-style: the (L, E, ·, ·) expert weights shard their widest
        # trailing dims over the data axis like the dense mlp they replace.
        specs["layers"]["mlp"] = {
            "router": {"w": P(None, None, None)},
            "in": {"w": P(None, None, None, d), "b": P(None, None, d)},
            "out": {"w": P(None, None, d, None), "b": P(None, None, None)},
        }
    if arch.has_token_type:
        specs["embeddings"]["token_type"] = P(None, None)
    if arch.has_pooler:
        specs["pooler"] = {"w": P(None, d), "b": P(d)}
    if arch.projection_dim:
        specs["projection"] = {"w": P(None, d), "b": P(d)}
    return specs
