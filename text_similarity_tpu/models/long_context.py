"""Context-parallel encoder forward: exact attention over sequences too
long for one chip, sharded over the mesh ``seq`` axis.

The reference scales context only with approximate architectures
(Performer / Longformer conversion, SURVEY.md §5.7) because it has no
distributed layer. Here the SAME encoder weights run exactly at S beyond
one device's attention memory: embeddings are computed globally (position
ids need global offsets), the hidden states shard over ``seq``, and every
layer's attention runs a context-parallel collective —

- ``strategy="ring"``: K/V blocks rotate around the axis (ppermute), an
  online-softmax accumulator folds one block per hop (ops/ring_attention);
- ``strategy="ulysses"``: one all_to_all re-shards seq→heads, plain
  attention runs per head slice, a second all_to_all restores the seq
  sharding (ops/ulysses) — fewer collectives when heads divide the axis.

Everything position-wise (dense, LN, residuals, FFN) runs untouched on
the local slice inside shard_map.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.config import EncoderArch
from ..core.mesh import SEQ_AXIS
from ..core.precision import Precision, DEFAULT_PRECISION
from .encoder import embed_inputs, transformer_layer


def encoder_forward_cp(
    params: dict,
    input_ids: jax.Array,          # (B, S) — S divisible by the seq axis
    attention_mask: jax.Array,     # (B, S)
    *,
    arch: EncoderArch,
    mesh: Mesh,
    strategy: str = "ring",        # ring | ulysses
    precision: Precision = DEFAULT_PRECISION,
    token_type_ids: Optional[jax.Array] = None,
) -> jax.Array:
    """→ (B, S, H) last hidden state (a global array; pool as usual).

    Runs the full layer stack with sequence sharded over ``mesh``'s seq
    axis. Requires ``arch.attention_window == 0`` (context parallelism is
    full attention) and, for ulysses, heads divisible by the axis size."""
    if strategy not in ("ring", "ulysses"):
        raise ValueError(f"unknown CP strategy {strategy!r}")
    if arch.attention_type == "performer" or arch.attention_window:
        # running exact CP attention under weights trained for a
        # different attention would silently change the model
        raise ValueError(
            "context-parallel forward is exact full attention; "
            f"arch has attention_type={arch.attention_type!r} / "
            f"window={arch.attention_window}"
        )
    n_seq = mesh.shape[SEQ_AXIS]
    b, s = input_ids.shape
    if s % n_seq:
        raise ValueError(f"S={s} must divide over seq axis ({n_seq})")
    limit = arch.max_position - (arch.pad_token_id + 1 if arch.position_offset else 0)
    if s > limit:
        raise ValueError(
            f"S={s} exceeds the position table ({limit} usable positions)"
            " — CP extends attention memory, not max_position; re-tile "
            "positions first (models/hf_convert.extend_positions)"
        )

    # embeddings need GLOBAL positions — compute them replicated, outside
    # the shard_map (position-wise cost, one gather per token)
    x = embed_inputs(
        params["embeddings"], input_ids, attention_mask, token_type_ids,
        arch=arch, precision=precision, deterministic=True,
    )
    layer_params = jax.tree.map(
        lambda p: p.astype(precision.compute_dtype)
        if jnp.issubdtype(p.dtype, jnp.floating)
        else p,
        params["layers"],
    )
    shared = arch.share_layers
    if shared:
        layer_params = jax.tree.map(lambda p: p[0], layer_params)

    def local_stack(x_loc, mask_loc, lp):
        def body(hx, scanned_lp):
            lp_i = lp if shared else scanned_lp
            out = transformer_layer(
                hx, lp_i, mask_loc,
                arch=arch, precision=precision,
                deterministic=True,
                attention_impl=strategy,
                cp_axis=SEQ_AXIS,
            )
            return out.astype(hx.dtype), None

        if shared:
            final, _ = jax.lax.scan(
                body, x_loc, jnp.arange(arch.num_layers), length=arch.num_layers
            )
        else:
            final, _ = jax.lax.scan(body, x_loc, lp)
        return final

    fn = shard_map(
        local_stack,
        mesh=mesh,
        in_specs=(
            P(None, SEQ_AXIS, None),
            P(None, SEQ_AXIS),
            P(),                       # layer params replicated
        ),
        out_specs=P(None, SEQ_AXIS, None),
        check_vma=False,
    )
    x = jax.device_put(x, NamedSharding(mesh, P(None, SEQ_AXIS, None)))
    m = jax.device_put(
        attention_mask, NamedSharding(mesh, P(None, SEQ_AXIS))
    )
    return fn(x, m, layer_params)
