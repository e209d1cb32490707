"""Pipeline-parallel encoder forward: layer stages sharded over the mesh
``pipe`` axis, GPipe-style microbatching inside one jit.

The reference is single-device (SURVEY.md §5.8) — pipeline parallelism is
a new first-class capability, built the TPU way: the layer stack already
lives on a leading L axis (one pytree, one ``lax.scan``), so a pipeline
stage is just a shard_map partition of that axis. Each device holds
L/P contiguous layers; activations hand off stage-to-stage with a single
``ppermute`` per tick (the cheapest collective on the mesh — one
microbatch activation per hop), and the classic GPipe schedule runs as a
``lax.scan`` over M + P - 1 ticks:

    tick t: stage s applies its local sub-stack to microbatch t - s
            (garbage flows through warmup/drain ticks and is masked out
            of the output buffer — no data-dependent control flow, so
            XLA compiles ONE program).

Composes with data parallelism (batch shards over ``data`` inside the
same shard_map); tensor/context parallelism ride different mechanisms
(GSPMD pspecs / their own shard_map regions) and are not combined here.
Embeddings are computed outside the pipeline region (position-wise cost,
needed only by stage 0 logically, replicated like the CP forward), and
the pooler/head stays with the caller.

Backward works through ``jax.grad`` unchanged: the transpose of
``ppermute`` is the reverse permute, so the cooldown phase of the
backward pipeline falls out of AD — no hand-written schedule.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.config import EncoderArch
from ..core.mesh import DATA_AXIS, PIPE_AXIS
from ..core.precision import Precision, DEFAULT_PRECISION
from .encoder import embed_inputs, transformer_layer


def encoder_forward_pp(
    params: dict,
    input_ids: jax.Array,           # (B, S)
    attention_mask: Optional[jax.Array] = None,   # (B, S)
    *,
    arch: EncoderArch,
    mesh: Mesh,
    microbatches: Optional[int] = None,   # default: one per stage
    precision: Precision = DEFAULT_PRECISION,
    token_type_ids: Optional[jax.Array] = None,
    attention_impl: str = "auto",
    remat: bool = False,            # rematerialize each stage's sub-stack
    deterministic: bool = True,
    dropout_rng: Optional[jax.Array] = None,
    performer_step=None,            # train step for performer feature redraw
) -> jax.Array:
    """→ (B, S, H) last hidden state, identical to ``encoder_forward``.

    Requirements: ``arch.num_layers`` divisible by the pipe axis size,
    the per-data-shard batch divisible by ``microbatches``, and no ALBERT
    layer sharing (all stages would hold the same single layer — use DP).
    The pipeline bubble costs (P-1)/(M+P-1) of the ticks; raise
    ``microbatches`` to amortize it (M ≥ 2P keeps it under a third).
    """
    if arch.num_experts > 0:
        raise ValueError(
            "MoE archs are not supported in the pipelined stack (it would "
            "silently drop the load-balance aux loss); use DP/TP/EP"
        )
    n_pipe = mesh.shape[PIPE_AXIS]
    n_data = mesh.shape[DATA_AXIS]
    if arch.share_layers:
        raise ValueError(
            "pipeline parallelism over shared (ALBERT) layers is "
            "meaningless — every stage would hold the same parameters"
        )
    l = arch.num_layers
    if l % n_pipe:
        raise ValueError(f"num_layers={l} must divide over pipe axis ({n_pipe})")
    b, s = input_ids.shape
    if attention_mask is None:
        attention_mask = jnp.ones((b, s), jnp.int32)
    if b % n_data:
        raise ValueError(f"B={b} must divide over data axis ({n_data})")
    b_loc = b // n_data
    m = microbatches if microbatches is not None else min(n_pipe, b_loc)
    if m < 1 or b_loc % m:
        raise ValueError(
            f"per-shard batch {b_loc} must divide into microbatches={m}"
        )
    mb = b_loc // m

    performer_proj = None
    if arch.attention_type == "performer":
        from ..ops.performer import (
            orthogonal_random_features,
            redraw_features,
        )

        nf = arch.performer_features or arch.head_dim
        if arch.performer_redraw_every > 0 and performer_step is not None:
            performer_proj = redraw_features(
                jax.random.PRNGKey(42), performer_step,
                arch.performer_redraw_every, nf, arch.head_dim,
            )
        else:
            performer_proj = orthogonal_random_features(
                jax.random.PRNGKey(42), nf, arch.head_dim
            )
        attention_impl = "performer"

    if dropout_rng is None:
        dropout_rng = jax.random.PRNGKey(0)
    x = embed_inputs(
        params["embeddings"], input_ids, attention_mask, token_type_ids,
        arch=arch, precision=precision, deterministic=deterministic,
        dropout_rng=dropout_rng,
    )
    layer_params = jax.tree.map(
        lambda p: p.astype(precision.compute_dtype)
        if jnp.issubdtype(p.dtype, jnp.floating)
        else p,
        params["layers"],
    )

    def stage_spec(leaf):
        return P(PIPE_AXIS, *([None] * (leaf.ndim - 1)))

    lp_specs = jax.tree.map(stage_spec, layer_params)
    perm = [(i, (i + 1) % n_pipe) for i in range(n_pipe)]
    n_ticks = m + n_pipe - 1
    l_per = l // n_pipe

    def worker(x_loc, m_loc, lp_loc, rng):
        # x_loc (b_loc, S, H); every leaf of lp_loc leads with L/P
        stage = jax.lax.axis_index(PIPE_AXIS)
        # decorrelate dropout across data shards AND microbatches: the
        # plain forward draws one (B,S,H) mask; here each (mb,S,H) slice
        # must draw its own or every microbatch reuses one pattern
        rng = jax.random.fold_in(rng, jax.lax.axis_index(DATA_AXIS))
        h = x_loc.shape[-1]
        xs = x_loc.reshape(m, mb, s, h)
        ms = m_loc.reshape(m, mb, s)

        def apply_stage(x_mb, mask_mb, mb_idx):
            rng_mb = jax.random.fold_in(rng, mb_idx)

            def body(hx, scanned):
                lp_i, li = scanned
                out = transformer_layer(
                    hx, lp_i, mask_mb,
                    arch=arch, precision=precision,
                    deterministic=deterministic,
                    dropout_rng=jax.random.fold_in(
                        rng_mb, stage * l_per + li
                    ),
                    attention_impl=attention_impl,
                    performer_proj=performer_proj,
                )
                return out.astype(hx.dtype), None

            y, _ = jax.lax.scan(
                body, x_mb, (lp_loc, jnp.arange(l_per, dtype=jnp.int32))
            )
            return y

        if remat:
            apply_stage = jax.checkpoint(apply_stage)

        def tick(carry, t):
            state, outbuf = carry
            mb_idx = jnp.clip(t - stage, 0, m - 1)
            inp = jnp.where(stage == 0, xs[mb_idx], state)
            out = apply_stage(inp, ms[mb_idx], mb_idx)
            done = t - (n_pipe - 1)
            upd = jax.lax.dynamic_update_index_in_dim(
                outbuf, out, jnp.clip(done, 0, m - 1), 0
            )
            outbuf = jnp.where(
                jnp.logical_and(stage == n_pipe - 1, done >= 0), upd, outbuf
            )
            state = jax.lax.ppermute(out, PIPE_AXIS, perm)
            return (state, outbuf), None

        init = (
            jnp.zeros((mb, s, h), x_loc.dtype),
            jnp.zeros((m, mb, s, h), x_loc.dtype),
        )
        (_, outbuf), _ = jax.lax.scan(
            tick, init, jnp.arange(n_ticks, dtype=jnp.int32)
        )
        # results live on the last stage; psum broadcasts them pipe-wide
        # (all other stages contribute zeros) so out_specs can tile over
        # data only
        outbuf = jax.lax.psum(
            jnp.where(stage == n_pipe - 1, outbuf, jnp.zeros_like(outbuf)),
            PIPE_AXIS,
        )
        return outbuf.reshape(b_loc, s, h)

    fn = shard_map(
        worker,
        mesh=mesh,
        in_specs=(
            P(DATA_AXIS, None, None),
            P(DATA_AXIS, None),
            lp_specs,
            P(),
        ),
        out_specs=P(DATA_AXIS, None, None),
        check_vma=False,
    )
    x = jax.device_put(x, NamedSharding(mesh, P(DATA_AXIS, None, None)))
    mask_dev = jax.device_put(
        attention_mask, NamedSharding(mesh, P(DATA_AXIS, None))
    )
    return fn(x, mask_dev, layer_params, dropout_rng)
