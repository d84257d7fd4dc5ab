"""Loss registry tests against hand-computed NumPy oracles."""

import numpy as np
import jax.numpy as jnp
import pytest

from efficientvideoclassification_youtube8m_tpu import losses

EPS = 10e-6


@pytest.fixture
def batch():
    rng = np.random.default_rng(0)
    preds = rng.uniform(0.01, 0.99, size=(4, 10)).astype(np.float32)
    labels = (rng.uniform(size=(4, 10)) < 0.3).astype(np.int32)
    labels[0, 0] = 1  # every row gets at least one positive? row-wise not needed
    return preds, labels


def _ce(preds, labels):
    fl = labels.astype(np.float32)
    return -(fl * np.log(preds + EPS) + (1 - fl) * np.log(1 - preds + EPS))


def test_registry_has_all_nine_losses():
    expected = {
        "CrossEntropyLoss", "CrossEntropyLossWithSparsity",
        "CrossEntropyLossTop50", "PWELoss", "CrossEntropyLossClassImbalance",
        "CrossEntropyLossPositives", "NewLoss", "HingeLoss", "SoftmaxLoss",
    }
    assert expected <= set(losses.LOSS_REGISTRY)


def test_cross_entropy(batch):
    preds, labels = batch
    got = float(losses.get_loss("CrossEntropyLoss")(jnp.asarray(preds), jnp.asarray(labels)))
    want = _ce(preds, labels).sum(1).mean()
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_cross_entropy_with_sparsity(batch):
    preds, labels = batch
    got = float(losses.get_loss("CrossEntropyLossWithSparsity")(
        jnp.asarray(preds), jnp.asarray(labels)))
    want = _ce(preds, labels).sum(1).mean() + 0.1 * preds.sum(1).mean()
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_cross_entropy_top50_small_vocab():
    """With vocab < 50 every class is in the top-50, so the loss is plain
    CE scaled by 4716/50."""
    rng = np.random.default_rng(1)
    preds = rng.uniform(0.01, 0.99, size=(3, 20)).astype(np.float32)
    labels = (rng.uniform(size=(3, 20)) < 0.3).astype(np.int32)
    # top_k with k=50 needs >=50 classes; pad to 60
    preds = np.concatenate([preds, np.full((3, 40), 0.001, np.float32)], 1)
    labels = np.concatenate([labels, np.zeros((3, 40), np.int32)], 1)
    got = float(losses.get_loss("CrossEntropyLossTop50")(
        jnp.asarray(preds), jnp.asarray(labels)))
    kth = np.sort(preds, axis=1)[:, -50]
    mask = (preds >= kth[:, None]).astype(np.float32)
    want = (_ce(preds, labels) * mask * (4716.0 / 50.0)).sum(1).mean()
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_positives_only(batch):
    preds, labels = batch
    got = float(losses.get_loss("CrossEntropyLossPositives")(
        jnp.asarray(preds), jnp.asarray(labels)))
    fl = labels.astype(np.float32)
    want = (-(fl * np.log(preds + EPS))).sum(1).mean()
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_hinge(batch):
    preds, labels = batch
    got = float(losses.get_loss("HingeLoss")(jnp.asarray(preds), jnp.asarray(labels)))
    sign = 2.0 * labels - 1.0
    want = np.maximum(0.0, 1.0 - sign * preds).sum(1).mean()
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_softmax(batch):
    preds, labels = batch
    got = float(losses.get_loss("SoftmaxLoss")(jnp.asarray(preds), jnp.asarray(labels)))
    fl = labels.astype(np.float32)
    norm = fl / np.maximum(fl.sum(1, keepdims=True), 10e-8)
    sm = np.exp(preds) / np.exp(preds).sum(1, keepdims=True)
    want = (-(norm * np.log(sm)).sum(1)).mean()
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_class_imbalance(batch):
    preds, labels = batch
    counts = np.arange(1, 11, dtype=np.float32) * 1000
    got = float(losses.get_loss("CrossEntropyLossClassImbalance")(
        jnp.asarray(preds), jnp.asarray(labels), class_counts=counts))
    total = 4906660.0 + 1401828.0
    pw = 1.0 / np.sqrt(counts / total)
    fl = labels.astype(np.float32)
    want = (-(pw[None] * fl * np.log(preds + EPS)
              + (1 - fl) * np.log(1 - preds + EPS))).sum(1).mean()
    np.testing.assert_allclose(got, want, rtol=1e-5)

    with pytest.raises(ValueError):
        losses.get_loss("CrossEntropyLossClassImbalance")(
            jnp.asarray(preds), jnp.asarray(labels))


def test_new_loss_runs(batch):
    preds, labels = batch
    got = float(losses.get_loss("NewLoss")(jnp.asarray(preds), jnp.asarray(labels)))
    assert np.isfinite(got) and got >= 0


def test_pwe_loss_runs(batch):
    preds, labels = batch
    got = float(losses.get_loss("PWELoss")(jnp.asarray(preds), jnp.asarray(labels)))
    assert np.isfinite(got)


def test_pwe_faithful_gradients_match_literal_matrix_loss():
    """Faithful PWELoss gradients == tf.gradients through the
    reference's MATRIX-valued loss (losses.py:62-84): slim's
    create_train_op backpropagates a ones cotangent through the
    accumulated [V, V] matrix, i.e. the gradient of its SUM."""
    import jax

    rng = np.random.default_rng(0)
    B, V = 128, 64  # the hardcoded batch; small vocab for the literal path
    preds = jnp.asarray(rng.uniform(0.05, 0.95, size=(B, V)), jnp.float32)
    labels = jnp.asarray(rng.uniform(size=(B, V)) < 0.1)

    def literal_matrix_loss_sum(p):
        """Transcription of the reference loop: accumulate the per-example
        normalized [V, V] matrices, /128, then the ones-cotangent sum."""
        p = jnp.reshape(p, (128, V))
        lab = jnp.reshape(labels.astype(jnp.float32), (128, V))
        loss = jnp.zeros((V, V), jnp.float32)
        for i in range(128):
            pi, li = p[i], lab[i]
            pn_pairs = pi[:, None] * (1.0 - pi)[None, :]
            opon_pairs = li[:, None] - li[None, :]
            inside = pn_pairs * jnp.exp(-opon_pairs)
            loss = loss + inside / (jnp.sum(pi) * jnp.sum(1.0 - pi))
        return jnp.sum(loss / 128.0)

    fn = losses.get_loss("PWELoss")
    got_val = fn(preds, labels, faithful_quirks=True)
    want_val = literal_matrix_loss_sum(preds)
    np.testing.assert_allclose(float(got_val), float(want_val), rtol=1e-5)

    g_got = jax.grad(lambda p: fn(p, labels, faithful_quirks=True))(preds)
    g_want = jax.grad(literal_matrix_loss_sum)(preds)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want),
                               rtol=1e-4, atol=1e-7)


def test_pwe_faithful_rejects_non_128_batch():
    fn = losses.get_loss("PWELoss")
    preds = jnp.ones((64, 32)) * 0.5
    labels = jnp.zeros((64, 32), bool)
    with pytest.raises(TypeError):
        fn(preds, labels, faithful_quirks=True)


def test_representation_loss():
    t = jnp.asarray([[1.0, 2.0], [0.0, 0.0]])
    s = jnp.asarray([[0.0, 0.0], [3.0, 4.0]])
    got = float(losses.representation_loss(t, s))
    np.testing.assert_allclose(got, ((1 + 4) + (9 + 16)) / 2.0)


def test_prediction_kl_loss():
    t = jnp.asarray([[0.2, 0.8], [0.5, 0.5]])
    s = jnp.asarray([[0.2, 0.8], [0.5, 0.5]])
    np.testing.assert_allclose(float(losses.prediction_kl_loss(t, s)), 0.0,
                               atol=1e-6)
    # sum-over-batch reduction: doubling the batch doubles the loss
    s2 = jnp.asarray([[0.3, 0.7], [0.4, 0.6]])
    one = float(losses.prediction_kl_loss(t[:1], s2[:1]))
    two = float(losses.prediction_kl_loss(
        jnp.concatenate([t[:1], t[:1]]), jnp.concatenate([s2[:1], s2[:1]])))
    np.testing.assert_allclose(two, 2 * one, rtol=1e-5)
    # renormalization: scaling raw sigmoid outputs leaves the KL unchanged
    three = float(losses.prediction_kl_loss(t[:1] * 0.5, s2[:1] * 2.0))
    np.testing.assert_allclose(three, one, rtol=1e-5)
