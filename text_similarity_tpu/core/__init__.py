from .config import (
    EncoderArch,
    MeshConfig,
    TrainConfig,
    IndexConfig,
    RunConfig,
    ARCH_PRESETS,
)
from .mesh import (
    make_mesh, local_mesh, shard_batch, replicate,
    DATA_AXIS, PIPE_AXIS, MODEL_AXIS, SEQ_AXIS, INDEX_AXIS,
)
from .precision import Precision, DEFAULT_PRECISION

__all__ = [
    "EncoderArch",
    "MeshConfig",
    "TrainConfig",
    "IndexConfig",
    "RunConfig",
    "ARCH_PRESETS",
    "make_mesh",
    "local_mesh",
    "shard_batch",
    "replicate",
    "DATA_AXIS",
    "PIPE_AXIS",
    "MODEL_AXIS",
    "SEQ_AXIS",
    "INDEX_AXIS",
    "Precision",
    "DEFAULT_PRECISION",
]
