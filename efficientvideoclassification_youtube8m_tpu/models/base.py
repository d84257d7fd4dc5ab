"""Model registry and shared helpers.

The reference selects model/loss classes by reflection over module
namespaces (`find_class_by_name`,
`/root/reference/code_student_uniform/train.py:179-182`). Here the same
flag strings resolve through an explicit registry.

Models are functional: ``init(key, input_size, vocab_size, cfg) -> params``
and ``apply(params, model_input, **ctx) -> {"predictions": ..., ...}``.
The returned dict may carry "loss" (model-supplied training loss, see
SplitSingleHiddenLayerModel) and always carries "regularization_loss".
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp

MODEL_REGISTRY: Dict[str, Any] = {}


def register_model(name: str) -> Callable:
    def deco(cls):
        MODEL_REGISTRY[name] = cls
        cls.name = name
        return cls

    return deco


def get_model(name: str):
    try:
        return MODEL_REGISTRY[name]
    except KeyError:
        raise ValueError(
            f"Unknown model {name!r}; registered: {sorted(MODEL_REGISTRY)}"
        ) from None


def glorot_uniform(key: jax.Array, shape, dtype=jnp.float32) -> jax.Array:
    """slim.fully_connected's default weight init (uniform Xavier)."""
    fan_in, fan_out = shape[0], shape[1]
    limit = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, minval=-limit, maxval=limit)


def xavier_normal(key: jax.Array, shape, dtype=jnp.float32) -> jax.Array:
    """`xavier_initializer(uniform=False)` (frame_level_models.py:48)."""
    fan_in, fan_out = shape[0], shape[1]
    std = math.sqrt(2.0 / (fan_in + fan_out))
    return std * jax.random.normal(key, shape, dtype)


def dense_init(key, in_dim: int, out_dim: int, use_bias: bool = True):
    p = {"w": glorot_uniform(key, (in_dim, out_dim))}
    if use_bias:
        p["b"] = jnp.zeros((out_dim,), jnp.float32)
    return p


def dense(p, x: jax.Array) -> jax.Array:
    y = jax.lax.dot_general(
        x, p["w"], dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if "b" in p:
        y = y + p["b"]
    return y


def l2_loss(x: jax.Array) -> jax.Array:
    """`tf.nn.l2_loss`: sum(x**2) / 2."""
    return 0.5 * jnp.sum(jnp.square(x))


def dropout(x: jax.Array, keep_prob, rng: jax.Array) -> jax.Array:
    """`tf.nn.dropout` keep_prob semantics: scale kept units by 1/keep_prob.

    `keep_prob` may be a traced scalar (the reference plumbs it as a
    variable assigned to 1.0 at inference,
    `/root/reference/code_student_uniform/train.py:278-279`).
    """
    keep_prob = jnp.asarray(keep_prob, jnp.float32)
    mask = jax.random.bernoulli(rng, keep_prob, x.shape)
    return jnp.where(mask, x / keep_prob, 0.0)
