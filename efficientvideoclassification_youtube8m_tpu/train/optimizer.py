"""Optimizers and schedules with TF 1.3 semantics.

The reference trains with `tf.train.AdamOptimizer` on an
`exponential_decay(staircase=True)` schedule, gradients clipped by
slim's `create_train_op(clip_gradient_norm=1.0)`
(`/root/reference/code_student_uniform/train.py:222-242,329-334`).

TF-vs-modern-defaults details reproduced exactly:

  * `exponential_decay` steps by `global_step * batch_size /
    decay_examples` (staircased with floor). The schedule is driven by
    the SHARED global step — which the reference's quirky graph advances
    by 2 per batch (both train ops increment it, train.py:230,329,413) —
    so the learning rate is an explicit per-call input here, not an
    optimizer-internal count;
  * TF-Adam applies epsilon OUTSIDE the bias-correction rescale:
    ``lr * sqrt(1-b2^t)/(1-b1^t) * m / (sqrt(v) + eps)`` — optax.adam's
    eps placement differs by a factor sqrt(1-b2^t);
  * slim's `clip_gradient_norm` clips EACH gradient tensor by its own
    norm (`clip_ops.clip_by_norm` per variable), not the global norm.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax


def exponential_decay(
    base_learning_rate: float,
    batch_size: int,
    decay_examples: float,
    decay_rate: float,
    staircase: bool = True,
) -> Callable[[jax.Array], jax.Array]:
    """`tf.train.exponential_decay(base, step*batch, decay_examples, rate)`."""

    def schedule(global_step):
        p = global_step.astype(jnp.float32) * batch_size / decay_examples
        if staircase:
            p = jnp.floor(p)
        return base_learning_rate * decay_rate**p

    return schedule


def clip_grads_per_variable(grads, max_norm: float):
    """slim.learning.clip_gradient_norms: per-tensor clip_by_norm."""

    def clip(g):
        norm = jnp.sqrt(jnp.sum(jnp.square(g)))
        return g * jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-30))

    return jax.tree.map(clip, grads)


class TfAdamState(NamedTuple):
    count: jax.Array
    mu: optax.Updates
    nu: optax.Updates


class Optimizer:
    """(init, update) pair taking the learning rate as a per-call input.

    `update(grads, state, params, learning_rate)` returns
    (new_params, new_state) with the gradient clipping already applied.
    """

    def __init__(self, init_fn, update_fn, clip_gradient_norm: float = 0.0):
        self._init = init_fn
        self._update = update_fn
        self.clip_gradient_norm = clip_gradient_norm

    def init(self, params):
        return self._init(params)

    def init_host(self, params):
        """Same slot structure as init(), but numpy zeros on the HOST —
        for eval-only binaries whose templates never read the optimizer
        state (avoids even a transient device allocation of the Adam
        moments, ~2x the parameter bytes)."""
        import numpy as np

        shapes = jax.eval_shape(self._init, params)
        return jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), shapes)

    def update(self, grads, state, params, learning_rate):
        if self.clip_gradient_norm > 0:
            grads = clip_grads_per_variable(grads, self.clip_gradient_norm)
        return self._update(grads, state, params, learning_rate)


def _tf_adam(b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8):
    def init_fn(params):
        return TfAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(jnp.zeros_like, params),
            nu=jax.tree.map(jnp.zeros_like, params),
        )

    def update_fn(grads, state, params, lr):
        count = state.count + 1
        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state.mu, grads)
        nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g, state.nu, grads)
        t = count.astype(jnp.float32)
        lr_t = lr * jnp.sqrt(1 - b2**t) / (1 - b1**t)
        new_params = jax.tree.map(
            lambda p, m, v: p - lr_t * m / (jnp.sqrt(v) + eps), params, mu, nu
        )
        return new_params, TfAdamState(count, mu, nu)

    return init_fn, update_fn


def _sgd(momentum: float = 0.0):
    def init_fn(params):
        if momentum == 0.0:
            return optax.EmptyState()
        return jax.tree.map(jnp.zeros_like, params)

    def update_fn(grads, state, params, lr):
        if momentum == 0.0:
            new_params = jax.tree.map(lambda p, g: p - lr * g, params, grads)
            return new_params, state
        # tf.train.MomentumOptimizer: accum = momentum*accum + g;
        # var -= lr * accum
        accum = jax.tree.map(lambda a, g: momentum * a + g, state, grads)
        new_params = jax.tree.map(lambda p, a: p - lr * a, params, accum)
        return new_params, accum

    return init_fn, update_fn


def _rmsprop(decay: float = 0.9, momentum: float = 0.0, eps: float = 1e-10):
    def init_fn(params):
        return {
            "ms": jax.tree.map(jnp.ones_like, params),  # TF inits ms to ones
            "mom": jax.tree.map(jnp.zeros_like, params),
        }

    def update_fn(grads, state, params, lr):
        ms = jax.tree.map(
            lambda m, g: decay * m + (1 - decay) * g * g, state["ms"], grads
        )
        mom = jax.tree.map(
            lambda mo, m, g: momentum * mo + lr * g / jnp.sqrt(m + eps),
            state["mom"], ms, grads,
        )
        new_params = jax.tree.map(lambda p, mo: p - mo, params, mom)
        return new_params, {"ms": ms, "mom": mom}

    return init_fn, update_fn


def _adagrad(initial_accumulator_value: float = 0.1):
    def init_fn(params):
        return jax.tree.map(
            lambda p: jnp.full_like(p, initial_accumulator_value), params
        )

    def update_fn(grads, state, params, lr):
        accum = jax.tree.map(lambda a, g: a + g * g, state, grads)
        new_params = jax.tree.map(
            lambda p, a, g: p - lr * g / jnp.sqrt(a), params, accum, grads
        )
        return new_params, accum

    return init_fn, update_fn


_BUILDERS = {
    "AdamOptimizer": _tf_adam,
    "GradientDescentOptimizer": _sgd,
    "MomentumOptimizer": lambda: _sgd(momentum=0.9),
    "RMSPropOptimizer": _rmsprop,
    "AdagradOptimizer": _adagrad,
}


def make_optimizer(
    optimizer_name: str, clip_gradient_norm: float = 1.0
) -> Optimizer:
    """Build the flag-named optimizer with the reference's clipping.

    The reference resolves `--optimizer` by name inside `tf.train`
    (train.py:631); the same names resolve here.
    """
    if optimizer_name not in _BUILDERS:
        raise ValueError(
            f"Unknown optimizer {optimizer_name!r}; known: {sorted(_BUILDERS)}"
        )
    init_fn, update_fn = _BUILDERS[optimizer_name]()
    return Optimizer(init_fn, update_fn, clip_gradient_norm)
