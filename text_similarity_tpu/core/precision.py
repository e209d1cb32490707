"""Precision policy: params in fp32, compute in bf16 on the MXU.

This is the TPU-native replacement for the reference's fp16 AMP
(`torch.cuda.amp`, reference: src/training/learner.py:48-49,131-161). On TPU
bf16 needs no loss scaling: same exponent range as fp32.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp


@dataclass(frozen=True)
class Precision:
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    # Keep softmax / layernorm / reductions in fp32 for stability.
    accum_dtype: jnp.dtype = jnp.float32

    def cast_compute(self, tree):
        import jax

        return jax.tree.map(
            lambda x: x.astype(self.compute_dtype)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            tree,
        )


DEFAULT_PRECISION = Precision()
FP32_PRECISION = Precision(compute_dtype=jnp.float32)


def precision_for(bf16: bool) -> Precision:
    return DEFAULT_PRECISION if bf16 else FP32_PRECISION
