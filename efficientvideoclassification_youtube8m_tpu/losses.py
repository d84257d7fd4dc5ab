"""Pure-function loss registry.

Every loss from `/root/reference/code_student_uniform/losses.py` as a
stateless ``loss(predictions, labels) -> scalar``, plus the two
distillation losses built inline in the reference's train graph
(`train.py:359-406`): the representation-matching L2 (L_REP) and the
renormalized-Categorical KL (L_PRED).

All reductions follow the reference exactly: per-example sum over
classes, mean over batch (except L_PRED, which is a SUM over batch —
`train.py:402`).
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp

LOSS_REGISTRY: Dict[str, Callable] = {}


def register_loss(name: str):
    def deco(fn):
        LOSS_REGISTRY[name] = fn
        return fn

    return deco


def get_loss(name: str) -> Callable:
    try:
        return LOSS_REGISTRY[name]
    except KeyError:
        raise ValueError(
            f"Unknown loss {name!r}; registered: {sorted(LOSS_REGISTRY)}"
        ) from None


_EPSILON = 10e-6  # the reference's epsilon (losses.py:34 etc.)


def _binary_ce(predictions, float_labels, epsilon=_EPSILON):
    return -(
        float_labels * jnp.log(predictions + epsilon)
        + (1.0 - float_labels) * jnp.log(1.0 - predictions + epsilon)
    )


@register_loss("CrossEntropyLoss")
def cross_entropy_loss(predictions, labels, **_):
    """losses.py:86-97 — the default label loss."""
    float_labels = labels.astype(jnp.float32)
    ce = _binary_ce(predictions, float_labels)
    return jnp.mean(jnp.sum(ce, axis=1))


@register_loss("CrossEntropyLossWithSparsity")
def cross_entropy_loss_with_sparsity(predictions, labels, **_):
    """losses.py:28-41 — CE + 0.1 * mean row-sum sparsity regularizer."""
    float_labels = labels.astype(jnp.float32)
    ce = _binary_ce(predictions, float_labels)
    sparsity_reg = 0.1 * jnp.mean(jnp.sum(predictions, axis=1))
    return jnp.mean(jnp.sum(ce, axis=1)) + sparsity_reg


@register_loss("CrossEntropyLossTop50")
def cross_entropy_loss_top50(predictions, labels, **_):
    """losses.py:43-60 — CE masked to each row's top-50 predictions,
    rescaled by 4716/50."""
    float_labels = labels.astype(jnp.float32)
    ce = _binary_ce(predictions, float_labels)
    values = jax.lax.top_k(predictions, 50)[0][:, 49]
    mask = (predictions >= values[:, None]).astype(jnp.float32)
    ce = ce * mask * (4716.0 / 50.0)
    return jnp.mean(jnp.sum(ce, axis=1))


@register_loss("PWELoss")
def pwe_loss(predictions, labels, faithful_quirks=False, **_):
    """losses.py:62-84 — pairwise exponential loss.

    The reference's "loss" is MATRIX-valued: it accumulates each
    example's full [V, V] pairwise matrix divided by its pos*neg
    normalizer and returns the summed matrix / 128 (losses.py:78-84).
    slim's `create_train_op` then differentiates that non-scalar with a
    ones cotangent, so the quantity gradient descent actually optimizes
    is the SUM of the matrix — exactly the scalar computed here (the
    per-example matrix sum factorizes to sum(p) * sum(exp(-l) ... )
    without materializing [V, V]).

    `faithful_quirks` additionally reproduces the literal graph's
    hardcoded `tf.reshape(predictions, [128, 4716])` batch contract
    (losses.py:70-71): any batch other than 128 fails at trace time,
    exactly as the reference session would. (The reference also
    hardcodes vocab 4716; the reshape here keeps the row count quirk
    and leaves V free so the contract is testable at small vocab.)
    Tested against a literal transcription's gradients at batch 128
    (tests/test_losses.py).
    """
    float_labels = labels.astype(jnp.float32)
    if faithful_quirks:
        predictions = jnp.reshape(predictions, (128, predictions.shape[-1]))
        float_labels = jnp.reshape(float_labels, (128, float_labels.shape[-1]))

    def per_example(p, lab):
        # the factorized O(V) form the docstring describes:
        # sum_{a,b} p_a (1-p_b) e^{-(l_a - l_b)}
        #   = (sum_a p_a e^{-l_a}) * (sum_b (1-p_b) e^{l_b})
        # — identical math to the [V, V] matrix sum (gradient parity vs
        # the literal-matrix transcription pinned in tests/test_losses),
        # without the ~22M-element pairwise product per example
        a = jnp.sum(p * jnp.exp(-lab))
        b = jnp.sum((1.0 - p) * jnp.exp(lab))
        return a * b / (jnp.sum(p) * jnp.sum(1.0 - p))

    per = jax.vmap(per_example)(predictions, float_labels)
    return jnp.sum(per) / predictions.shape[0]


@register_loss("CrossEntropyLossClassImbalance")
def cross_entropy_loss_class_imbalance(predictions, labels, class_counts=None,
                                       total_examples=4906660.0 + 1401828.0, **_):
    """losses.py:99-119 — positive terms weighted by 1/sqrt(class freq).

    The reference reads the per-class counts from a `counts_tv` file;
    here they are passed in as an array (loaded by the caller).
    """
    if class_counts is None:
        raise ValueError("CrossEntropyLossClassImbalance needs class_counts")
    float_labels = labels.astype(jnp.float32)
    positive_freq = jnp.sqrt(jnp.asarray(class_counts, jnp.float32) / total_examples)
    pw = 1.0 / positive_freq
    ce = -(
        pw[None, :] * float_labels * jnp.log(predictions + _EPSILON)
        + (1.0 - float_labels) * jnp.log(1.0 - predictions + _EPSILON)
    )
    return jnp.mean(jnp.sum(ce, axis=1))


@register_loss("CrossEntropyLossPositives")
def cross_entropy_loss_positives(predictions, labels, **_):
    """losses.py:121-131 — only the positive-label CE terms."""
    float_labels = labels.astype(jnp.float32)
    ce = -(float_labels * jnp.log(predictions + _EPSILON))
    return jnp.mean(jnp.sum(ce, axis=1))


@register_loss("NewLoss")
def new_loss(predictions, labels, **_):
    """losses.py:133-151 — hard-example mining on both sides: positives
    below 0.9 and negatives above (min positive prob - 0.1)."""
    float_labels = labels.astype(jnp.float32)
    bad_positive = (predictions < 0.9).astype(jnp.float32)
    ce1 = bad_positive * float_labels * jnp.log(predictions + _EPSILON)

    prob_positive = predictions * float_labels + (1.0 - float_labels)
    min_prob_positive = jnp.maximum(jnp.min(prob_positive) - 0.1, 0.1)
    prob_negative = predictions * (1.0 - float_labels)
    bad_negative = (prob_negative > min_prob_positive).astype(jnp.float32)
    ce0 = bad_negative * (1.0 - float_labels) * jnp.log(1.0 - predictions + _EPSILON)
    ce = -(ce0 + ce1)
    return jnp.mean(jnp.sum(ce, axis=1))


@register_loss("HingeLoss")
def hinge_loss(predictions, labels, b: float = 1.0, **_):
    """losses.py:153-169 — multi-label hinge on +-1 sign labels."""
    float_labels = labels.astype(jnp.float32)
    sign_labels = 2.0 * float_labels - 1.0
    hinge = jnp.maximum(0.0, b - sign_labels * predictions)
    return jnp.mean(jnp.sum(hinge, axis=1))


@register_loss("SoftmaxLoss")
def softmax_loss(predictions, labels, **_):
    """losses.py:172-196 — softmax CE against L1-normalized labels."""
    epsilon = 10e-8
    float_labels = labels.astype(jnp.float32)
    label_rowsum = jnp.maximum(jnp.sum(float_labels, axis=1, keepdims=True), epsilon)
    norm_labels = float_labels / label_rowsum
    softmax_outputs = jax.nn.softmax(predictions, axis=-1)
    per_row = -jnp.sum(norm_labels * jnp.log(softmax_outputs), axis=1)
    return jnp.mean(per_row)


# ---------------------------------------------------------------------------
# Distillation losses (built inline in the reference's train graph).
# ---------------------------------------------------------------------------


def representation_loss(teacher_state, student_state):
    """L_REP: mean over batch of || t_state - s_state ||^2 (train.py:359-362).
    The teacher side is stop-gradiented — the reference achieves the same
    by restricting the student train op to `model_student/*` variables."""
    teacher_state = jax.lax.stop_gradient(teacher_state)
    per_example = jnp.sum(jnp.square(teacher_state - student_state), axis=1)
    return jnp.mean(per_example)


def prediction_kl_loss(teacher_predictions, student_predictions,
                       epsilon: float = 1e-20):
    """L_PRED: sum over batch of KL(Cat(t) || Cat(s)) where both sides'
    independent sigmoid outputs are row-renormalized into categorical
    distributions (`tf.distributions.Categorical(probs=...)`,
    train.py:398-402). Note the batch reduction is a SUM, not a mean.

    `epsilon` guards the logs against exactly-zero sigmoid outputs
    (saturated experts underflow to 0.0 in f32, where the reference's
    tf.distributions KL NaNs out the whole run); it is far below any
    representable probability of interest, so normal values are
    bit-unchanged."""
    t = jax.lax.stop_gradient(teacher_predictions)
    # guard the normalizers too: a row where EVERY class underflowed to
    # 0.0 would otherwise renormalize as 0/0 = NaN before the log guard
    # applies; any nonzero sum exceeds epsilon so normal rows are
    # bit-unchanged
    t = t / jnp.maximum(jnp.sum(t, axis=1, keepdims=True), epsilon)
    s = student_predictions / jnp.maximum(
        jnp.sum(student_predictions, axis=1, keepdims=True), epsilon)
    kl = jnp.sum(t * (jnp.log(t + epsilon) - jnp.log(s + epsilon)), axis=1)
    return jnp.sum(kl)
