"""Serving export: AOT-compiled, portable deployment artifacts.

The reference ships compressed models as ONNX / TorchScript / TFLite files
(src/modules/model_compression.py:793-911, :269-279;
src/compression/convert_to_tflite.py). The TPU-native analogue is a
**StableHLO export bundle**: the jitted encode step is lowered and
serialized with ``jax.export`` (hardware-portable, version-stable), packed
with int8-quantized params, the arch json and the tokenizer vocab. A server
deserializes and calls it with zero Python model code.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import EncoderArch
from ..utils.logging import get_logger

logger = get_logger("export")


def export_encoder_stablehlo(
    encoder,                        # SentenceEncoder
    path: str,
    batch_sizes: Sequence[int] = (32,),
    seq_lens: Sequence[int] = (128,),
    quantize: bool = True,
) -> dict:
    """Export the encode step for each (batch, seq) shape + params.

    Returns a manifest dict (also written as manifest.json)."""
    from jax import export as jexport
    from .quantize import quantize_params_int8

    os.makedirs(path, exist_ok=True)
    fn = encoder._embed_fn()

    # Self-consistency: the serialized fns must be TRACED on the exact
    # param tree the bundle SHIPS — quantize first (the encoder's int8
    # forward handles {q, s} leaves natively), so a server restoring the
    # checkpoint can call the fn without dtype/treedef surgery.
    params = encoder.params
    if quantize:
        params = quantize_params_int8(params)

    manifest = {"arch": json.loads(encoder.arch.to_json()),
                "pooling": encoder.pooling,
                "int8": bool(quantize),
                "functions": []}
    for b in batch_sizes:
        for s in seq_lens:
            ids = jnp.zeros((b, s), jnp.int32)
            mask = jnp.ones((b, s), jnp.int32)
            # multi-platform lowering when supported ('hardware-portable');
            # fall back to the current backend and RECORD it either way
            try:
                exp = jexport.export(
                    jax.jit(fn), platforms=("cpu", "tpu")
                )(params, ids, mask)
            except Exception:
                exp = jexport.export(jax.jit(fn))(params, ids, mask)
            blob = exp.serialize()
            name = f"encode_b{b}_s{s}.stablehlo"
            with open(os.path.join(path, name), "wb") as f:
                f.write(blob)
            manifest["functions"].append(
                {"name": name, "batch": b, "seq": s, "bytes": len(blob),
                 "platforms": list(exp.platforms)}
            )
            logger.info(
                "exported %s (%d bytes, platforms=%s)",
                name, len(blob), list(exp.platforms),
            )

    from ..core.checkpoint import save_checkpoint

    save_checkpoint(path, params, step=0, meta={"int8": quantize})
    with open(os.path.join(path, "arch.json"), "w") as f:
        f.write(encoder.arch.to_json())
    if encoder.tokenizer is not None and hasattr(encoder.tokenizer, "save_vocab"):
        encoder.tokenizer.save_vocab(os.path.join(path, "vocab.txt"))
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


def load_exported_fn(path: str, name: str):
    """Deserialize one exported function; call as fn(params, ids, mask)
    with the params from :func:`load_exported_params` (the fns are traced
    on exactly the tree the bundle ships)."""
    from jax import export as jexport

    with open(os.path.join(path, name), "rb") as f:
        exp = jexport.deserialize(f.read())
    return exp.call


def load_exported_params(path: str):
    """Restore the bundle's shipped params (template-free — the int8
    {q, s} leaf structure is rebuilt from the flat key paths). This plus
    load_exported_fn is the whole server story: zero model code."""
    from ..core.checkpoint import latest_checkpoint, restore_checkpoint_raw

    params, _, _ = restore_checkpoint_raw(latest_checkpoint(path))
    return params
