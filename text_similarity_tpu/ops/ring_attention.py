"""Ring attention: exact attention over sequences sharded across devices.

The reference scales context with *approximate* architectures only
(Performer/Longformer, SURVEY.md §5.7) because it has no distributed layer.
Here long context also scales *exactly* via context parallelism: the
sequence axis shards over the mesh ``seq`` axis; each device holds a local
Q/K/V block, K/V blocks rotate around the ring (``ppermute`` over ICI) and
an online-softmax accumulator folds in one block per step — flash attention
at the cluster scale. Compute overlaps the rotation (XLA schedules the
ppermute concurrently with the block matmuls).

Use inside ``shard_map`` with the sequence dim sharded over ``seq``:
    fn = shard_map(lambda q, k, v, m: ring_attention(q, k, v, m, "seq"),
                   mesh=mesh, in_specs=..., out_specs=...)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e9


def ring_attention(
    q: jax.Array,        # (B, S_local, H, D) — this device's query block
    k: jax.Array,        # (B, S_local, H, D)
    v: jax.Array,
    mask: jax.Array,     # (B, S_local) 1 = valid key position (local)
    axis_name: str,
) -> jax.Array:
    """Exact softmax attention where K/V are sharded over ``axis_name``.
    Every query attends to all keys on all devices (non-causal)."""
    n_dev = jax.lax.psum(1, axis_name)
    d = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, jnp.float32))
    q32 = q.astype(jnp.float32) * scale

    b, s_loc, h, _ = q.shape
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

    def block_update(carry, k_blk, v_blk, m_blk):
        acc, m_prev, l_prev = carry
        s = jnp.einsum(
            "bqhd,bkhd->bhqk", q32, k_blk.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        s = jnp.where(m_blk[:, None, None, :].astype(bool), s, NEG_INF)
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1))
        p = jnp.exp(s - m_new[..., None])
        # NEG_INF is finite: a fully-masked block would give p=exp(0)=1
        # for every masked key and the l==0 zero-output guard below would
        # never fire (padding rows averaged V instead of 0)
        p = jnp.where(s > 0.5 * NEG_INF, p, 0.0)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1)
        upd = jnp.einsum(
            "bhqk,bkhd->bqhd", p, v_blk.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        acc = acc * alpha.transpose(0, 2, 1)[..., None] + upd
        return acc, m_new, l_new

    acc = jnp.zeros((b, s_loc, h, d), jnp.float32)
    m_run = jnp.full((b, h, s_loc), NEG_INF, jnp.float32)
    l_run = jnp.zeros((b, h, s_loc), jnp.float32)

    k_cur, v_cur, m_cur = k, v, mask
    carry = (acc, m_run, l_run)
    # static python loop over ring steps (n_dev is static inside shard_map)
    for step in range(n_dev):
        carry = block_update(carry, k_cur, v_cur, m_cur)
        if step != n_dev - 1:
            k_cur = jax.lax.ppermute(k_cur, axis_name, perm)
            v_cur = jax.lax.ppermute(v_cur, axis_name, perm)
            m_cur = jax.lax.ppermute(m_cur, axis_name, perm)

    acc, m_run, l_run = carry
    l_safe = jnp.where(l_run == 0.0, 1.0, l_run)
    out = acc / l_safe.transpose(0, 2, 1)[..., None]
    return out.astype(q.dtype)
