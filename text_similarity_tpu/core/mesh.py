"""Device mesh + sharding helpers.

The reference is single-device (SURVEY.md §5.8); here the mesh is a
first-class citizen. All parallelism in the framework rides three named
axes:

- ``data``   — batch sharding (DP / ZeRO-style)
- ``pipe``   — pipeline parallelism (layer stages, GPipe microbatching)
- ``model``  — tensor parallelism (attention heads / hidden / FFN sharding)
- ``expert`` — expert parallelism (MoE expert axis, ops/moe.py)
- ``seq``    — context parallelism (ring / Ulysses attention)
- ``index``  — ANN corpus shards (per-shard top-k + all-gather merge)

Collectives are XLA-inserted via NamedSharding/pjit, or explicit
(psum/all_gather/ppermute) inside shard_map regions.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
PIPE_AXIS = "pipe"
MODEL_AXIS = "model"
EXPERT_AXIS = "expert"
SEQ_AXIS = "seq"
INDEX_AXIS = "index"


def make_mesh(
    data: int = -1,
    model: int = 1,
    seq: int = 1,
    index: int = 1,
    pipe: int = 1,
    expert: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a 6-axis mesh over the given (default: all) devices.

    ``data=-1`` absorbs whatever devices remain after the other axes.
    Axis order is (data, pipe, model, expert, seq, index): model-parallel
    groups stay on adjacent devices so TP collectives ride the fastest ICI
    links; expert sits next to model (MoE dispatch all-to-alls are the
    next-chattiest collective); the seq (context-parallel ring) axis sits
    next so ring ppermutes stay local; pipe sits outside model/seq (stage
    handoffs are one activation per tick — the lowest-bandwidth collective
    on the mesh).
    """
    devs = list(devices if devices is not None else jax.devices())
    n = len(devs)
    rest = pipe * model * expert * seq * index
    if data == -1:
        if n % rest != 0:
            raise ValueError(
                f"{n} devices not divisible by "
                f"pipe*model*expert*seq*index={rest}"
            )
        data = n // rest
    if data * rest != n:
        raise ValueError(
            f"mesh {data}x{pipe}x{model}x{expert}x{seq}x{index} != {n} devices"
        )
    arr = np.asarray(devs).reshape(data, pipe, model, expert, seq, index)
    return Mesh(
        arr,
        (DATA_AXIS, PIPE_AXIS, MODEL_AXIS, EXPERT_AXIS, SEQ_AXIS, INDEX_AXIS),
    )


def local_mesh() -> Mesh:
    """Single-axis data mesh over all local devices (the common case for
    one-chip encode/serve)."""
    return make_mesh()


def shard_batch(mesh: Mesh, tree, axis: str = DATA_AXIS):
    """Place a host batch onto the mesh, sharded along the leading dim."""
    def put(x):
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, tree)


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def batch_spec(ndim: int, axis: str = DATA_AXIS) -> P:
    return P(axis, *([None] * (ndim - 1)))


def is_multichip() -> bool:
    return jax.device_count() > 1
