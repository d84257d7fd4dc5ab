"""Metrics tests: hand-computed oracles + an independent reference
implementation of the heap/tie-break AP semantics."""

import heapq
import random

import numpy as np
import jax.numpy as jnp
import pytest

from efficientvideoclassification_youtube8m_tpu import metrics


def test_hit_at_one():
    preds = np.array([[0.1, 0.9, 0.0], [0.8, 0.1, 0.1]])
    actuals = np.array([[0, 1, 0], [0, 0, 1]], np.float32)
    assert metrics.calculate_hit_at_one(preds, actuals) == 0.5


def test_perr():
    preds = np.array([[0.1, 0.9, 0.5, 0.0]])
    actuals = np.array([[0, 1, 1, 0]], np.float32)
    # 2 labels -> top-2 = {1, 2}, both positive -> PERR 1.0
    assert metrics.calculate_precision_at_equal_recall_rate(preds, actuals) == 1.0
    actuals2 = np.array([[1, 1, 0, 0]], np.float32)
    # top-2 = {1, 2}: one positive -> 0.5
    assert metrics.calculate_precision_at_equal_recall_rate(preds, actuals2) == 0.5


def _ref_ap_at_n(predictions, actuals, n, total_num_positives):
    """Literal transcription of the reference algorithm for cross-checking."""
    predictions = np.array(predictions)
    actuals = np.array(actuals)
    random.seed(0)
    suffidx = random.sample(range(len(predictions)), len(predictions))
    predictions, actuals = predictions[suffidx], actuals[suffidx]
    sortidx = sorted(range(len(predictions)), key=lambda k: predictions[k],
                     reverse=True)
    numpos = total_num_positives
    if numpos == 0:
        return 0
    if n is not None:
        numpos = min(numpos, n)
    delta_recall = 1.0 / numpos
    ap, poscount = 0.0, 0.0
    r = len(sortidx) if n is None else min(len(sortidx), n)
    for i in range(r):
        if actuals[sortidx[i]] > 0:
            poscount += 1
            ap += poscount / (i + 1) * delta_recall
    return ap


def test_ap_perfect_ranking():
    p = np.array([0.9, 0.8, 0.3, 0.2])
    a = np.array([1, 1, 0, 0])
    ap = metrics.AveragePrecisionCalculator.ap(p, a)
    np.testing.assert_allclose(ap, 1.0)


def test_ap_with_ties_matches_reference_shuffle():
    """Oracle replicates the reference's FULL pipeline — heap accumulation
    (which reorders entries) feeding the seeded shuffle + sort — since the
    heap ordering feeds the tie-break."""
    rng = np.random.default_rng(0)
    p = np.round(rng.uniform(size=200), 1)  # heavy ties
    a = (rng.uniform(size=200) < 0.3).astype(np.float64)
    calc = metrics.AveragePrecisionCalculator()
    calc.accumulate(list(p), list(a))
    got = calc.peek_ap_at_n()

    heap = []
    for pi, ai in zip(p, a):
        heapq.heappush(heap, (pi, ai))
    predlists = np.array(list(zip(*heap)))
    want = _ref_ap_at_n(predlists[0], predlists[1], None, int(np.sum(a > 0)))
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_streaming_heap_truncation():
    """top_n-bounded accumulation keeps only the largest predictions."""
    calc = metrics.AveragePrecisionCalculator(top_n=3)
    calc.accumulate([0.1, 0.5], [0, 1])
    calc.accumulate([0.9, 0.3, 0.7], [1, 0, 1])
    assert calc.heap_size == 3
    kept = sorted(p for p, _ in calc._heap)
    assert kept == [0.5, 0.7, 0.9]
    assert calc.num_accumulated_positives == 3


def test_gap_against_bruteforce():
    rng = np.random.default_rng(1)
    preds = rng.uniform(size=(16, 40)).astype(np.float64)
    labels = (rng.uniform(size=(16, 40)) < 0.15).astype(np.float64)
    gap = metrics.calculate_gap(preds, labels, top_k=20)

    # brute-force pooled list of per-video top-20 entries
    pooled_p, pooled_a = [], []
    for v in range(16):
        idx = np.argsort(preds[v])[-20:]
        pooled_p.extend(preds[v, idx])
        pooled_a.extend(labels[v, idx])
    want = _ref_ap_at_n(pooled_p, pooled_a, None, int(labels.sum()))
    np.testing.assert_allclose(gap, want, rtol=1e-12)


def test_evaluation_metrics_aggregator():
    rng = np.random.default_rng(2)
    num_class = 25
    em = metrics.EvaluationMetrics(num_class=num_class, top_k=5)
    with pytest.raises(ValueError):
        em.get()
    for _ in range(3):
        preds = rng.uniform(size=(8, num_class))
        labels = (rng.uniform(size=(8, num_class)) < 0.2).astype(np.float64)
        em.accumulate(preds, labels, loss=np.full(8, 2.0))
    out = em.get()
    assert 0 <= out["gap"] <= 1
    assert len(out["aps"]) == num_class
    assert out["avg_loss"] == 2.0
    em.clear()
    assert em.num_examples == 0


def test_topk_fastpath_matches_full_path():
    """accumulate_topk (device top-k) must give the same GAP/mAP/Hit@1 as
    the reference full-matrix path when every video has <= k labels."""
    rng = np.random.default_rng(3)
    num_class, k = 30, 8
    preds = rng.uniform(size=(12, num_class))
    labels = np.zeros((12, num_class))
    for v in range(12):
        labels[v, rng.choice(num_class, size=rng.integers(1, 4), replace=False)] = 1

    em_full = metrics.EvaluationMetrics(num_class, k)
    info_full = em_full.accumulate(preds, labels, np.zeros(12))

    vals, idx = metrics.topk_on_device(jnp.asarray(preds), k)
    em_fast = metrics.EvaluationMetrics(num_class, k)
    info_fast = em_fast.accumulate_topk(vals, idx, labels, np.zeros(12))

    np.testing.assert_allclose(info_fast["hit_at_one"], info_full["hit_at_one"])
    np.testing.assert_allclose(info_fast["perr"], info_full["perr"], rtol=1e-9)
    full = em_full.get()
    fast = em_fast.get()
    np.testing.assert_allclose(fast["gap"], full["gap"], rtol=1e-9)
    np.testing.assert_allclose(fast["aps"], full["aps"], rtol=1e-9)


def test_exact_perr_with_many_label_videos():
    """With perr_precision from the device helper, accumulate_topk's epoch
    PERR is EXACT even for videos with more labels than top_k — equal to
    the reference full-matrix path (eval_util.py:34-59). The top-k-only
    fallback is NOT exact on such videos (regression guard)."""
    rng = np.random.default_rng(7)
    num_class, k = 60, 8
    B = 10
    preds = rng.uniform(size=(B, num_class))
    labels = np.zeros((B, num_class))
    # half the batch has 30 labels (>> k), half has 2
    for v in range(B):
        n = 30 if v % 2 == 0 else 2
        labels[v, rng.choice(num_class, size=n, replace=False)] = 1

    em_full = metrics.EvaluationMetrics(num_class, k)
    info_full = em_full.accumulate(preds, labels, np.zeros(B))

    vals, idx = metrics.topk_on_device(jnp.asarray(preds), k)
    perr_rows = np.asarray(
        metrics.perr_precision_on_device(jnp.asarray(preds), jnp.asarray(labels))
    )
    em_exact = metrics.EvaluationMetrics(num_class, k)
    info_exact = em_exact.accumulate_topk(vals, idx, labels, np.zeros(B),
                                          perr_precision=perr_rows)
    np.testing.assert_allclose(info_exact["perr"], info_full["perr"], rtol=1e-6)
    np.testing.assert_allclose(
        em_exact.get()["avg_perr"], em_full.get()["avg_perr"], rtol=1e-6
    )

    em_approx = metrics.EvaluationMetrics(num_class, k)
    info_approx = em_approx.accumulate_topk(vals, idx, labels, np.zeros(B))
    assert abs(info_approx["perr"] - info_full["perr"]) > 1e-6


def test_perr_precision_on_device_tie_apportionment():
    """Boundary ties share the remaining top-n capacity proportionally —
    the EXPECTATION of the reference argpartition's arbitrary tie pick,
    rather than the systematically optimistic labels-first fill."""
    preds = jnp.asarray([[0.9, 0.5, 0.5, 0.5, 0.5]])
    labels = np.zeros((1, 5))
    labels[0, [0, 1]] = 1  # n=2: one hit above tau, one labeled tie of 4
    row = float(np.asarray(
        metrics.perr_precision_on_device(preds, jnp.asarray(labels)))[0])
    # hits = 1 (score 0.9) + capacity 1 * (1 labeled tie / 4 ties) = 1.25
    np.testing.assert_allclose(row, 1.25 / 2.0)


def test_perr_precision_on_device_zero_labels():
    preds = jnp.asarray(np.random.default_rng(0).uniform(size=(3, 10)))
    labels = np.zeros((3, 10))
    labels[0, [1, 2]] = 1
    rows = np.asarray(metrics.perr_precision_on_device(preds, jnp.asarray(labels)))
    assert rows[1] == 0.0 and rows[2] == 0.0
    assert 0.0 <= rows[0] <= 1.0


def test_eval_step_host_pack_round_trip():
    """The packed single-transfer host bundle unpacks to exactly the
    individual step outputs (gather_step_outputs)."""
    from efficientvideoclassification_youtube8m_tpu.parallel import distributed
    from efficientvideoclassification_youtube8m_tpu.train.step import (
        _pack_host_outputs,
    )

    rng = np.random.default_rng(4)
    B, k = 6, 5
    vals = jnp.asarray(rng.uniform(size=(B, k)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 4716, size=(B, k)), jnp.int32)
    loss = jnp.asarray(rng.uniform(size=(B,)), jnp.float32)
    perr = jnp.asarray(rng.uniform(size=(B,)), jnp.float32)
    labels = rng.uniform(size=(B, 30)) < 0.2
    out = {"host_pack": _pack_host_outputs(vals, idx, loss, perr)}
    rows = distributed.gather_step_outputs(out, labels, pad=0)
    np.testing.assert_array_equal(rows["topk_val"], np.asarray(vals))
    np.testing.assert_array_equal(rows["topk_idx"], np.asarray(idx))
    assert rows["topk_idx"].dtype == np.int32
    np.testing.assert_array_equal(rows["per_example_loss"], np.asarray(loss))
    np.testing.assert_array_equal(rows["perr_precision"], np.asarray(perr))
    np.testing.assert_array_equal(rows["labels"], labels)


def test_eval_step_host_pack_paired_layout():
    """The paired-index pack (two int16 indices per f32 lane, sign-bit
    marker) round-trips bit-exactly: boundary ids (0 and PACKED_IDX_MAX),
    odd k (padded pair), wide fallback above the id cap, and the
    lane-count alias case (wide k=3 vs paired k=4) all resolve."""
    from efficientvideoclassification_youtube8m_tpu.parallel import distributed
    from efficientvideoclassification_youtube8m_tpu.train.step import (
        PACKED_IDX_MAX,
        _pack_host_outputs,
    )

    rng = np.random.default_rng(5)
    for B, k in ((6, 5), (4, 20), (3, 1)):
        vals = jnp.asarray(rng.uniform(size=(B, k)), jnp.float32)
        idx_np = rng.integers(0, PACKED_IDX_MAX + 1, size=(B, k))
        idx_np[0, 0] = 0                 # lo=0 word: marker keeps it normal
        idx_np[-1, -1] = PACKED_IDX_MAX  # hi at the exponent-field cap
        idx = jnp.asarray(idx_np, jnp.int32)
        loss = jnp.asarray(rng.uniform(size=(B,)), jnp.float32)
        perr = jnp.asarray(rng.uniform(size=(B,)), jnp.float32)
        pack = np.asarray(_pack_host_outputs(
            vals, idx, loss, perr, num_classes=PACKED_IDX_MAX + 1))
        assert pack.shape == (B, k + (k + 1) // 2 + 2)
        # every index lane is a NEGATIVE NORMAL f32 (marker bits): no
        # subnormal/NaN patterns cross the device->host edge
        words = pack[:, k:k + (k + 1) // 2]
        assert np.all(words < 0) and np.all(np.isfinite(words))
        assert np.all(np.abs(words) >= np.finfo(np.float32).tiny)
        rows = distributed.unpack_host_pack(pack, None)
        np.testing.assert_array_equal(rows["topk_val"], np.asarray(vals))
        np.testing.assert_array_equal(rows["topk_idx"], np.asarray(idx))
        assert rows["topk_idx"].dtype == np.int32
        np.testing.assert_array_equal(rows["per_example_loss"],
                                      np.asarray(loss))
        np.testing.assert_array_equal(rows["perr_precision"],
                                      np.asarray(perr))

    # ids above the cap fall back to the wide one-per-lane layout
    big = PACKED_IDX_MAX + 1
    vals = jnp.asarray(rng.uniform(size=(4, 3)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, big + 1, size=(4, 3)), jnp.int32)
    loss = jnp.asarray(rng.uniform(size=(4,)), jnp.float32)
    perr = jnp.asarray(rng.uniform(size=(4,)), jnp.float32)
    pack = np.asarray(_pack_host_outputs(vals, idx, loss, perr,
                                         num_classes=big + 1))
    # wide k=3 gives 8 lanes = paired k=4's count: the non-negative
    # index lanes disambiguate (sign-bit marker absent)
    assert pack.shape == (4, 2 * 3 + 2)
    rows = distributed.unpack_host_pack(pack, None)
    np.testing.assert_array_equal(rows["topk_idx"], np.asarray(idx))
    np.testing.assert_array_equal(rows["topk_val"], np.asarray(vals))
    np.testing.assert_array_equal(rows["per_example_loss"], np.asarray(loss))


def test_map_calculator_validation():
    with pytest.raises(ValueError):
        metrics.MeanAveragePrecisionCalculator(1)
    c = metrics.MeanAveragePrecisionCalculator(3)
    assert c.is_empty()
    c.accumulate([[0.5], [0.2], [0.9]], [[1], [0], [1]], [1, 0, 1])
    assert not c.is_empty()
    aps = c.peek_map_at_n()
    assert len(aps) == 3


def test_train_step_metrics_matches_full_path():
    """The cheap per-step path must match the epoch aggregator's
    hit@1/perr/gap on a batch with no score ties."""
    rng = np.random.default_rng(5)
    num_class, k = 30, 8
    preds = rng.uniform(size=(12, num_class))
    labels = np.zeros((12, num_class))
    for v in range(12):
        labels[v, rng.choice(num_class, size=rng.integers(1, 4),
                             replace=False)] = 1
    vals, idx = metrics.topk_on_device(jnp.asarray(preds), k)
    fast = metrics.train_step_metrics(np.asarray(vals), np.asarray(idx), labels)

    em = metrics.EvaluationMetrics(num_class, k)
    info = em.accumulate(preds, labels, np.zeros(12))
    np.testing.assert_allclose(fast["hit_at_one"], info["hit_at_one"])
    np.testing.assert_allclose(fast["perr"], info["perr"], rtol=1e-9)
    np.testing.assert_allclose(fast["gap"], em.get()["gap"], rtol=1e-9)
