"""Pallas TPU kernel: fused input preprocessing.

uint8 quantized frame features -> dequantize (utils.py:10-25 math) ->
per-frame l2-normalize (train.py:256) in ONE pass: the uint8 block is
read once from HBM and the normalized f32 block written once — XLA's
unfused version materializes the dequantized f32 intermediate
([B,300,1152] = 354 MB for the flagship batch) for an extra HBM
round-trip.

This runs in the TRAINING step too: gradients never flow into the input
pipeline, so no VJP is needed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _preprocess_kernel(u8_ref, out_ref, *, scalar: float, bias: float,
                       epsilon: float):
    # Mosaic has no direct u8->f32 cast; hop through int32.
    x = u8_ref[:].astype(jnp.int32).astype(jnp.float32) * scalar + bias
    sq = jnp.sum(x * x, axis=-1, keepdims=True)
    out_ref[:] = x * jax.lax.rsqrt(jnp.maximum(sq, epsilon))


def dequantize_l2_normalize_pallas(
    features_u8: jax.Array,  # [B, T, D] uint8
    max_quantized_value: float = 2.0,
    min_quantized_value: float = -2.0,
    epsilon: float = 1e-12,
    interpret: bool = False,
) -> jax.Array:
    """Fused Dequantize + tf.nn.l2_normalize(axis=-1). Returns f32 [B,T,D]."""
    B, T, D = features_u8.shape
    rows = B * T
    flat = features_u8.reshape(rows, D)

    quantized_range = max_quantized_value - min_quantized_value
    scalar = quantized_range / 255.0
    bias = (quantized_range / 512.0) + min_quantized_value

    tile_r = 512
    while rows % tile_r:
        tile_r //= 2
    kernel = functools.partial(
        _preprocess_kernel, scalar=scalar, bias=bias, epsilon=epsilon
    )
    out = pl.pallas_call(
        kernel,
        grid=(rows // tile_r,),
        in_specs=[
            pl.BlockSpec((tile_r, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_r, D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, D), jnp.float32),
        interpret=interpret,
    )(flat)
    return out.reshape(B, T, D)
