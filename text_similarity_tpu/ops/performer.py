"""Performer / FAVOR+ linear attention.

Capability parity with the reference's fast-attention module
(src/modules/fast_attention.py — itself a torch transcription of the
google-research JAX original, fast_attention.py:33-34): softmax-kernel
random features (:36-75), orthogonal random matrices (:77-112), non-causal
linear attention einsums (:117-121), and the causal variant the reference
needs a CUDA kernel for (:124-135) — here a ``lax.scan`` prefix-sum that
XLA pipelines natively on TPU; no custom kernel required for O(n) causal.

O(n·m·d) instead of O(n²·d): the default long-context path for sequences
past the flash-attention sweet spot.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp


def orthogonal_random_features(
    key: jax.Array, num_features: int, dim: int, scaling: str = "sqrt_dim"
) -> jax.Array:
    """(m, d) block-orthogonal gaussian features (reference
    fast_attention.py:77-112: QR of gaussian blocks, rows rescaled)."""
    n_blocks = -(-num_features // dim)
    keys = jax.random.split(key, n_blocks + 1)
    blocks = []
    for i in range(n_blocks):
        g = jax.random.normal(keys[i], (dim, dim), jnp.float32)
        q, _ = jnp.linalg.qr(g)
        blocks.append(q.T)
    w = jnp.concatenate(blocks, axis=0)[:num_features]
    if scaling == "sqrt_dim":
        # rows scaled to norm sqrt(d) (matches gaussian row-norm in
        # expectation — the reference's scaling=0 multiplier path)
        norms = jnp.sqrt(
            jax.random.chisquare(keys[-1], df=dim, shape=(num_features, 1))
        )
        w = w * norms
    else:
        w = w * math.sqrt(dim)
    return w


def softmax_kernel_features(
    x: jax.Array,          # (..., S, H, D)
    proj: jax.Array,       # (m, D)
    is_query: bool,
    eps: float = 1e-4,
    mask: Optional[jax.Array] = None,   # (..., S) 1 = valid position
) -> jax.Array:
    """φ(x): positive softmax-kernel features (FAVOR+; reference
    fast_attention.py:36-75). Queries stabilize per-position, keys
    globally — masked key positions are excluded from the global
    stabilizer so padding content cannot perturb real features."""
    d = x.shape[-1]
    scale = d ** -0.25          # x/d^¼ then squared norms divide by √d
    xs = x.astype(jnp.float32) * scale
    wx = jnp.einsum("...shd,md->...shm", xs, proj)   # (..., S, H, m)
    sq = 0.5 * jnp.sum(xs * xs, axis=-1, keepdims=True)
    if is_query:
        stab = jnp.max(wx - sq, axis=-1, keepdims=True)
    else:
        wx_for_stab = wx - sq
        if mask is not None:
            # finite sentinel, NOT -inf: a fully-masked (all-padding) row
            # would make stab = -inf and exp(wx - sq + inf) = inf → NaN
            # after the mask multiply; padded batch rows are routine here
            wx_for_stab = jnp.where(
                mask[..., None, None].astype(bool), wx_for_stab, -1e9
            )
        stab = jnp.max(wx_for_stab, axis=(-3, -1), keepdims=True)
        stab = jnp.maximum(stab, -1e9)   # belt-and-braces vs -inf inputs
    return (jnp.exp(wx - sq - stab) + eps) / math.sqrt(proj.shape[0])


def relu_kernel_features(
    x: jax.Array,          # (..., S, H, D)
    proj: jax.Array,       # (m, D)
    eps: float = 1e-4,
) -> jax.Array:
    """Generalized (ReLU) kernel features — the reference's
    generalized_kernel_feature_creator with relu nonlinearity
    (fast_attention.py:36-75 generalized path). No query/key asymmetry and
    no exp stabilizer: φ(x) = relu(xWᵀ)/√m + ε."""
    wx = jnp.einsum(
        "...shd,md->...shm", x.astype(jnp.float32), proj
    )
    return (jax.nn.relu(wx) + eps) / math.sqrt(proj.shape[0])


def _features(x, proj, is_query, mask, kernel: str):
    if kernel == "relu":
        return relu_kernel_features(x, proj)
    return softmax_kernel_features(x, proj, is_query=is_query, mask=mask)


def performer_attention(
    q: jax.Array,                     # (B, S, H, D)
    k: jax.Array,
    v: jax.Array,
    proj: jax.Array,                  # (m, D)
    mask: Optional[jax.Array] = None,  # (B, S) 1=keep
    kernel: str = "softmax",
) -> jax.Array:
    """Non-causal FAVOR+: out = φq (φkᵀ v) / (φq (φkᵀ 1))."""
    qf = _features(q, proj, True, None, kernel)             # (B,S,H,m)
    kf = _features(k, proj, False, mask, kernel)
    if mask is not None:
        kf = kf * mask[:, :, None, None].astype(kf.dtype)
    kv = jnp.einsum("bshm,bshd->bhmd", kf, v.astype(jnp.float32))
    z = jnp.einsum("bshm,bhm->bsh", qf, jnp.sum(kf, axis=1))
    out = jnp.einsum("bshm,bhmd->bshd", qf, kv) / jnp.maximum(
        z[..., None], 1e-9
    )
    return out.astype(q.dtype)


def performer_attention_causal(
    q: jax.Array, k: jax.Array, v: jax.Array, proj: jax.Array,
    mask: Optional[jax.Array] = None,
    chunk: int = 128,
    kernel: str = "softmax",
) -> jax.Array:
    """Causal FAVOR+ via chunked prefix sums (replaces the reference's
    optional CUDA causal_product kernel, fast_attention.py:124-135):
    within a chunk, exact masked quadratic attention over the chunk plus
    the running (m, d) prefix state carried by a ``lax.scan``."""
    b, s, h, d = q.shape
    m = proj.shape[0]
    pad = (-s) % chunk
    if pad:
        padder = lambda x: jnp.pad(x, ((0, 0), (0, pad), (0, 0), (0, 0)))
        q, k, v = padder(q), padder(k), padder(v)
        if mask is None:
            mask = jnp.concatenate(
                [jnp.ones((b, s), jnp.int32), jnp.zeros((b, pad), jnp.int32)],
                axis=1,
            )
        else:
            mask = jnp.pad(mask, ((0, 0), (0, pad)))
    elif mask is None:
        mask = jnp.ones((b, s), jnp.int32)

    qf = _features(q, proj, True, None, kernel)
    kf = _features(k, proj, False, mask, kernel)
    kf = kf * mask[:, :, None, None].astype(kf.dtype)
    v32 = v.astype(jnp.float32)

    n_chunks = q.shape[1] // chunk

    def reshape_chunks(x):
        return x.reshape(b, n_chunks, chunk, *x.shape[2:]).swapaxes(0, 1)

    qfc, kfc, vc = reshape_chunks(qf), reshape_chunks(kf), reshape_chunks(v32)

    tri = jnp.tril(jnp.ones((chunk, chunk), jnp.float32))

    def body(carry, xs):
        kv_prefix, z_prefix = carry           # (b,h,m,d), (b,h,m)
        qc, kc, vck = xs                      # (b,chunk,h,m|d)
        # cross-chunk (prefix) contribution
        num = jnp.einsum("bchm,bhmd->bchd", qc, kv_prefix)
        den = jnp.einsum("bchm,bhm->bch", qc, z_prefix)
        # within-chunk causal contribution (exact, O(chunk²))
        scores = jnp.einsum("bchm,bkhm->bhck", qc, kc)
        scores = scores * tri[None, None]
        num = num + jnp.einsum("bhck,bkhd->bchd", scores, vck)
        den = den + jnp.sum(scores, axis=-1).transpose(0, 2, 1)
        # update prefix
        kv_prefix = kv_prefix + jnp.einsum("bkhm,bkhd->bhmd", kc, vck)
        z_prefix = z_prefix + jnp.sum(kc, axis=1)  # (b, h, m)
        out = num / jnp.maximum(den[..., None], 1e-9)
        return (kv_prefix, z_prefix), out

    init = (
        jnp.zeros((b, h, m, d), jnp.float32),
        jnp.zeros((b, h, m), jnp.float32),
    )
    _, outs = jax.lax.scan(body, init, (qfc, kfc, vc))
    out = outs.swapaxes(0, 1).reshape(b, n_chunks * chunk, h, d)
    return out[:, :s].astype(q.dtype)


def redraw_features(
    base_key: jax.Array, step, every: int, num_features: int, dim: int
) -> jax.Array:
    """Feature redraw (reference FastAttention.redraw_projection_matrix,
    fast_attention.py:137-188): the projection is a pure function of
    ``step // every``, so consecutive steps share features and every
    ``every`` steps they regenerate — trace-stable under jit (no state)."""
    epoch = jnp.asarray(step, jnp.int32) // max(every, 1)
    key = jax.random.fold_in(base_key, epoch)
    # orthogonal_random_features is fully traceable (QR + chisquare on a
    # traced key), so the epoch-derived key feeds it directly
    return orthogonal_random_features(key, num_features, dim)
