"""Ulysses-style context parallelism: all-to-all head/sequence exchange.

The second exact long-context strategy next to ring attention
(SURVEY.md §5.7 names both; the reference scales context only with
approximate architectures — Performer/Longformer — because it has no
distributed layer). Where the ring rotates K/V blocks around the mesh
``seq`` axis and folds one block per step, Ulysses re-shards ONCE:

  (B, S/P, H, D)  --all_to_all-->  (B, S, H/P, D)

so every device runs plain full-sequence attention over its own head
slice, then a second all_to_all restores the sequence sharding. Two
collectives total instead of P ppermute rounds — cheaper when
H ≥ P and the per-device attention fits memory; the ring wins when heads
are too few to split or S is too long to materialize per device.

Use inside ``shard_map`` with the sequence dim sharded over ``seq``:
    fn = shard_map(lambda q, k, v, m: ulysses_attention(q, k, v, m, "seq"),
                   mesh=mesh, in_specs=..., out_specs=...)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e9


def ulysses_attention(
    q: jax.Array,        # (B, S_local, H, D) — this device's seq block
    k: jax.Array,        # (B, S_local, H, D)
    v: jax.Array,
    mask: jax.Array,     # (B, S_local) 1 = valid position (local)
    axis_name: str,
) -> jax.Array:
    """Exact non-causal softmax attention over a seq-sharded batch via
    head/sequence all-to-all (DeepSpeed-Ulysses pattern). Requires the
    head count to divide the axis size."""
    n_dev = jax.lax.psum(1, axis_name)
    b, s_loc, h, d = q.shape
    if h % n_dev:
        raise ValueError(f"num_heads {h} must divide over axis ({n_dev})")

    def to_heads(x):
        # split heads over devices, gather the full sequence:
        # (B, S/P, H, D) → (B, S, H/P, D)
        return jax.lax.all_to_all(
            x, axis_name, split_axis=2, concat_axis=1, tiled=True
        )

    qh = to_heads(q)
    kh = to_heads(k)
    vh = to_heads(v)
    # every device needs the FULL mask for its head slice
    m_all = jax.lax.all_gather(mask, axis_name, axis=1, tiled=True)  # (B, S)

    scale = 1.0 / jnp.sqrt(jnp.asarray(d, jnp.float32))
    s = jnp.einsum(
        "bqhd,bkhd->bhqk", qh.astype(jnp.float32) * scale,
        kh.astype(jnp.float32), preferred_element_type=jnp.float32,
    )
    s = jnp.where(m_all[:, None, None, :].astype(bool), s, NEG_INF)
    m_max = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m_max)
    p = jnp.where(s > 0.5 * NEG_INF, p, 0.0)   # fully-masked rows → 0
    l = jnp.sum(p, axis=-1, keepdims=True)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", p / jnp.maximum(l, 1e-30),
        vh.astype(jnp.float32), preferred_element_type=jnp.float32,
    )
    # masked-row convention matches the ring path: masked QUERY rows get
    # the normal average over valid keys (don't-care downstream — poolers
    # mask them), and only all-keys-masked rows fall to 0 via l == 0
    # restore sequence sharding: (B, S, H/P, D) → (B, S/P, H, D)
    out = jax.lax.all_to_all(
        out, axis_name, split_axis=1, concat_axis=2, tiled=True
    )
    return out.astype(q.dtype)
