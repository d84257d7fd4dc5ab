"""On-device input preprocessing ops.

The reference does all of this inside the TF graph / TF input pipeline:

  * `Dequantize` — `/root/reference/code_student_uniform/utils.py:10-25`
  * `resize_axis` — `/root/reference/code_student_uniform/readers.py:8-43`
  * per-feature-axis `tf.nn.l2_normalize` —
    `/root/reference/code_student_uniform/train.py:256`
  * every-Nth-frame student subsampling (transpose/gather/transpose) —
    `/root/reference/code_student_uniform/train.py:265-272`

TPU-first: the host loader hands over the RAW uint8 features (4x less
PCIe/DCN traffic than f32) and these run fused under `jit` on device,
where XLA folds dequantize + l2-normalize + strided gather into the
surrounding computation.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def dequantize(
    feat: jax.Array,
    max_quantized_value: float = 2.0,
    min_quantized_value: float = -2.0,
) -> jax.Array:
    """Map byte-quantized features back to floats.

    Bit-compatible with the reference: ``x * (range/255) + (range/512 + min)``.
    """
    assert max_quantized_value > min_quantized_value
    quantized_range = max_quantized_value - min_quantized_value
    scalar = quantized_range / 255.0
    bias = (quantized_range / 512.0) + min_quantized_value
    return feat.astype(jnp.float32) * scalar + bias


def l2_normalize(x: jax.Array, axis: int = -1, epsilon: float = 1e-12) -> jax.Array:
    """`tf.nn.l2_normalize` semantics: x / sqrt(max(sum(x^2), eps))."""
    sq = jnp.sum(jnp.square(x), axis=axis, keepdims=True)
    return x * jax.lax.rsqrt(jnp.maximum(sq, epsilon))


def uniform_subsample(x: jax.Array, every_n: int, axis: int = 1) -> jax.Array:
    """Keep frames [0, every_n, 2*every_n, ...] along `axis`.

    Equivalent to the reference's transpose→gather→transpose on indices
    built by the `while (every_n*i <= 299)` loop — i.e. a plain strided
    slice, which XLA lowers with zero data movement beyond the gather.
    """
    return jax.lax.slice_in_dim(
        x, 0, x.shape[axis], stride=every_n, axis=axis
    )


def host_subsample(features_u8, every_n: int):
    """HOST-side every-n frame stride on the raw uint8 batch — applied
    before the device transfer so student-only paths (eval / inference /
    serving) move 1/every_n the bytes over PCIe/relay. Semantically the
    same strided slice as `uniform_subsample`; contiguity matters for
    the transfer."""
    import numpy as np

    return np.ascontiguousarray(np.asarray(features_u8)[:, ::every_n])


def student_num_frames(num_frames: jax.Array, every_n: int, max_frames: int = 300) -> jax.Array:
    """`num_frames/300 * (300//every_n)` cast to int — the reference's
    approximation of how many frames survive subsampling
    (`/root/reference/code_student_uniform/train.py:262-264`).

    The reference's `tf.divide(int, int)` promotes to FLOAT64 before the
    truncating cast; recomputing in f32 on device differs by ±1 for many
    (num_frames, every_n) pairs (every_n=2 n=98: f32 truncates to 48,
    the reference to 49 — shifting the student's sequence-length masks).
    A host-built float64 table indexed by the capped frame count
    reproduces the reference bit-exactly inside jit without needing f64
    on the TPU; every_n/max_frames are static, so the 301-entry table is
    a compile-time constant and the lookup is one tiny gather."""
    import numpy as np

    max_student = max_frames // every_n
    table = (np.arange(max_frames + 1, dtype=np.float64) / max_frames
             * max_student).astype(np.int64).astype(np.int32)
    idx = jnp.clip(num_frames.astype(jnp.int32), 0, max_frames)
    return jnp.asarray(table)[idx]


def resize_axis(x: jax.Array, axis: int, new_size: int, fill_value: Any = 0) -> jax.Array:
    """Truncate or zero-pad `x` along `axis` to `new_size` (pad at the end)."""
    old = x.shape[axis]
    if old == new_size:
        return x
    if old > new_size:
        return jax.lax.slice_in_dim(x, 0, new_size, axis=axis)
    pad_shape = list(x.shape)
    pad_shape[axis] = new_size - old
    pad = jnp.full(pad_shape, fill_value, dtype=x.dtype)
    return jnp.concatenate([x, pad], axis=axis)
