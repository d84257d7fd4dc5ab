"""Bit-exactness of the vectorized/deferred epoch-metric path.

The r3 rewrite replaced the per-entry Python loops (B*k appends + heap
pushes per batch, metrics/eval_util.py r2) with one stable argsort per
batch, deferred bulk heap pushes through the C kernel
(data/native/heap.cc), and a cumsum AP sweep. These tests pin the
results EXACTLY (==, not allclose) against a literal transcription of
the per-entry algorithm on tie-heavy streams with >k-label videos.
"""

import heapq
import random

import numpy as np
import pytest

from efficientvideoclassification_youtube8m_tpu.metrics import (
    AveragePrecisionCalculator,
    EvaluationMetrics,
    eval_util,
    train_step_metrics,
)


# --- literal r2/per-entry implementation (the oracle) ---------------------

class LegacyAP:
    def __init__(self, top_n=None):
        self._top_n = top_n
        self._total_positives = 0
        self._heap = []

    def accumulate(self, predictions, actuals, num_positives=None):
        if num_positives is not None:
            self._total_positives += num_positives
        else:
            self._total_positives += np.size(np.where(np.asarray(actuals) > 0))
        topk = self._top_n
        heap = self._heap
        for p, a in zip(predictions, actuals):
            if topk is None or len(heap) < topk:
                heapq.heappush(heap, (p, a))
            elif p > heap[0][0]:
                heapq.heapreplace(heap, (p, a))

    def peek_ap_at_n(self):
        if not self._heap:
            return 0
        predlists = np.array(list(zip(*self._heap)))
        predictions, actuals = predlists[0], predlists[1]
        random.seed(0)
        suffidx = random.sample(range(len(predictions)), len(predictions))
        predictions, actuals = predictions[suffidx], actuals[suffidx]
        sortidx = sorted(range(len(predictions)),
                         key=lambda k: predictions[k], reverse=True)
        numpos = self._total_positives
        if numpos == 0:
            return 0
        n = self._top_n
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


class LegacyEpoch:
    """r2's accumulate_topk: per-entry class scatter + immediate pushes."""

    def __init__(self, num_class, top_k):
        self.sum_perr = 0.0
        self.num_examples = 0
        self.num_class = num_class
        self.calcs = [LegacyAP() for _ in range(num_class)]
        self.global_calc = LegacyAP()

    def accumulate_topk(self, topk_values, topk_indices, labels,
                        perr_precision=None):
        B, k = topk_values.shape
        rows = np.arange(B)
        top_labels = labels[rows[:, None], topk_indices]
        if perr_precision is not None:  # r2's exact device-PERR input
            self.sum_perr += float(np.sum(np.asarray(perr_precision)))
        else:
            agg = 0.0
            for row in range(B):
                n = min(int(np.sum(labels[row])), k)
                if n == 0:
                    continue
                agg += float(
                    np.sum(top_labels[row, :n] * (topk_values[row, :n] > 0))
                ) / n
            self.sum_perr += agg
        out_p = [[] for _ in range(self.num_class)]
        out_l = [[] for _ in range(self.num_class)]
        for v in range(B):
            for j in range(k):
                c = topk_indices[v, j]
                out_p[c].append(topk_values[v, j])
                out_l[c].append(top_labels[v, j])
        num_positives = [np.sum(labels[:, i]) for i in range(self.num_class)]
        for c in range(self.num_class):
            self.calcs[c].accumulate(out_p[c], out_l[c], num_positives[c])
        self.global_calc.accumulate(
            [x for lst in out_p for x in lst],
            [x for lst in out_l for x in lst],
            sum(num_positives),
        )
        self.num_examples += B

    def get(self):
        return {
            "avg_perr": self.sum_perr / self.num_examples,
            "aps": [c.peek_ap_at_n() for c in self.calcs],
            "gap": self.global_calc.peek_ap_at_n(),
        }


def _tie_heavy_stream(num_batches=4, B=32, k=8, C=50, seed=0):
    """Quantized scores (heavy ties) + some videos with > k labels."""
    rng = np.random.default_rng(seed)
    batches = []
    for _ in range(num_batches):
        scores = np.round(rng.uniform(size=(B, C)), 1).astype(np.float32)
        labels = rng.uniform(size=(B, C)) < 0.08
        labels[: B // 4, : k + 5] = True  # > k labels
        labels[B // 4] = False  # a zero-label video
        order = np.argsort(-scores, axis=1, kind="stable")
        idx = order[:, :k]
        vals = np.take_along_axis(scores, idx, axis=1)
        batches.append((vals, idx, labels))
    return batches


@pytest.mark.parametrize("native", [True, False])
def test_epoch_metrics_bit_identical_to_per_entry_path(monkeypatch, native):
    if not native:
        from efficientvideoclassification_youtube8m_tpu.metrics import (
            average_precision,
        )

        monkeypatch.setattr(average_precision, "_native", lambda: None)
    C, k = 50, 8
    new = EvaluationMetrics(C, k)
    old = LegacyEpoch(C, k)
    for vals, idx, labels in _tie_heavy_stream(C=C, k=k):
        new.accumulate_topk(vals, idx, labels, loss=np.zeros(vals.shape[0]))
        old.accumulate_topk(vals, idx, labels)
    got, want = new.get(), old.get()
    assert got["avg_perr"] == want["avg_perr"]
    assert got["gap"] == want["gap"]
    assert got["aps"] == want["aps"]


def test_interleaved_full_and_topk_accumulate_matches_legacy_order():
    """accumulate() flushes the pending top-k batches first, so mixed
    calls keep the exact per-entry push order."""
    C, k = 30, 6
    rng = np.random.default_rng(7)
    new = EvaluationMetrics(C, k)
    old = LegacyEpoch(C, k)
    stream = _tie_heavy_stream(num_batches=2, B=16, k=k, C=C, seed=3)
    (v0, i0, l0), (v1, i1, l1) = stream
    full_scores = np.round(rng.uniform(size=(16, C)), 1).astype(np.float32)
    full_labels = rng.uniform(size=(16, C)) < 0.1

    new.accumulate_topk(v0, i0, l0, loss=np.zeros(16))
    new.accumulate(full_scores, full_labels, loss=np.zeros(16))
    new.accumulate_topk(v1, i1, l1, loss=np.zeros(16))

    old.accumulate_topk(v0, i0, l0)
    # the full-row path's own per-class selection (r2's accumulate())
    sp, sl, npos = eval_util.top_k_by_class(full_scores, full_labels, k)
    for c in range(C):
        old.calcs[c].accumulate(sp[c], sl[c], npos[c])
    old.global_calc.accumulate(
        [x for lst in sp for x in lst], [x for lst in sl for x in lst],
        sum(npos))
    old.num_examples += 16
    old.accumulate_topk(v1, i1, l1)
    assert new.get()["gap"] == old.get()["gap"]


@pytest.mark.parametrize("native", [True, False])
@pytest.mark.parametrize("top_n", [None, 5, 64])
def test_bulk_heap_matches_heapq_layout(monkeypatch, native, top_n):
    """The array heap (C kernel or fallback) must reproduce CPython
    heapq's exact layout — the order feeds the seeded tie-break."""
    if not native:
        from efficientvideoclassification_youtube8m_tpu.metrics import (
            average_precision,
        )

        monkeypatch.setattr(average_precision, "_native", lambda: None)
    rng = np.random.default_rng(1)
    p = np.round(rng.uniform(size=300), 1)
    a = (rng.uniform(size=300) < 0.3).astype(np.float64)
    calc = AveragePrecisionCalculator(top_n)
    heap = []
    for lo in range(0, 300, 37):  # uneven chunks
        chunk_p, chunk_a = p[lo:lo + 37], a[lo:lo + 37]
        calc.accumulate(chunk_p, chunk_a)
        for pi, ai in zip(chunk_p, chunk_a):
            if top_n is None or len(heap) < top_n:
                heapq.heappush(heap, (pi, ai))
            elif pi > heap[0][0]:
                heapq.heapreplace(heap, (pi, ai))
    assert calc.heap_size == len(heap)
    got = calc._heap
    for (gp, ga), (wp, wa) in zip(got, heap):
        assert gp == wp and ga == wa
    assert calc.peek_ap_at_n() == LegacyAP_peek(heap, top_n,
                                                calc._total_positives)


def LegacyAP_peek(heap, top_n, total_positives):
    legacy = LegacyAP(top_n)
    legacy._heap = list(heap)
    legacy._total_positives = total_positives
    return legacy.peek_ap_at_n()


def test_vectorized_ap_at_n_bit_identical():
    rng = np.random.default_rng(5)
    for n in (None, 20):
        for size in (1, 7, 500):
            p = np.round(rng.uniform(size=size), 2)
            a = (rng.uniform(size=size) < 0.4).astype(np.float64)
            legacy = LegacyAP(n)
            legacy.accumulate(list(p), list(a))
            calc = AveragePrecisionCalculator(n)
            calc.accumulate(p, a)
            assert calc.peek_ap_at_n() == legacy.peek_ap_at_n()


def test_train_step_metrics_vectorized_perr_matches_loop():
    vals, idx, labels = _tie_heavy_stream(num_batches=1)[0]
    info = train_step_metrics(vals, idx, labels)
    B, k = vals.shape
    rows = np.arange(B)
    top_labels = labels[rows[:, None], idx]
    perr = 0.0
    for row in range(B):
        n = min(int(np.sum(labels[row])), k)
        if n == 0:
            continue
        perr += float(np.sum(top_labels[row, :n] * (vals[row, :n] > 0))) / n
    assert info["perr"] == perr / B


def test_train_step_metrics_exact_perr_input():
    """With device-side per-row precisions the PERR is the full-row exact
    value even for > k-label videos (unique scores — the tie rule is
    covered separately)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    B, C, k = 32, 50, 8
    scores = rng.uniform(size=(B, C)).astype(np.float32)  # effectively no ties
    labels = rng.uniform(size=(B, C)) < 0.08
    labels[: B // 4, : k + 5] = True  # > k labels
    precisions = eval_util.perr_precision_on_device(
        jnp.asarray(scores), jnp.asarray(labels))
    order = np.argsort(-scores, axis=1, kind="stable")[:, :k]
    info = train_step_metrics(
        np.take_along_axis(scores, order, axis=1), order, labels,
        perr_precision=np.asarray(precisions))
    want = eval_util.calculate_precision_at_equal_recall_rate(
        scores.astype(np.float64),
        labels.astype(np.float64))
    np.testing.assert_allclose(info["perr"], want, atol=1e-6)


def test_native_group_by_class_matches_stable_argsort():
    """The C counting-sort group-by (heap.cc group_by_class_sort) is
    bit-identical to the stable composite-key argsort path, including
    the derived segment starts/ends."""
    from efficientvideoclassification_youtube8m_tpu.data import native
    from efficientvideoclassification_youtube8m_tpu.metrics.eval_util import (
        _class_segments,
        _class_sorted,
    )

    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(11)
    n, C = 50_000, 317  # leaves many classes empty
    classes = rng.integers(0, C // 2, n).astype(np.int64)
    preds = rng.random(n)
    acts = (rng.random(n) < 0.1).astype(np.float64)
    sc, sp, sl = _class_sorted(classes, preds, acts)
    gp, ga, counts = native.group_by_class(classes, preds, acts, C)
    np.testing.assert_array_equal(gp, sp)
    np.testing.assert_array_equal(ga, sl)
    np.testing.assert_array_equal(
        np.repeat(np.arange(C, dtype=np.int64), counts), sc)
    uniq, starts, ends = _class_segments(sc)
    seg_starts = np.zeros(C, np.int64)
    np.cumsum(counts[:-1], out=seg_starts[1:])
    u2 = np.flatnonzero(counts)
    np.testing.assert_array_equal(u2, uniq)
    np.testing.assert_array_equal(seg_starts[u2], starts)
    np.testing.assert_array_equal(seg_starts[u2] + counts[u2], ends)


def test_ap_sweep_radix_path_bit_identical():
    """Segments >= the C radix threshold (1<<17) take the LSD-radix
    stable sort; its rank/actual sequence — and therefore the AP doubles
    — must be bit-identical to the stable-comparison path, including
    heavy score ties and -0.0 vs +0.0 (canonicalized in the key map)."""
    from efficientvideoclassification_youtube8m_tpu.data import native

    if not native.available():
        pytest.skip("native library unavailable")

    def oracle_ap(preds, acts, numpos):
        n = len(preds)
        perm = native.sample_perm(n, 0)
        sp, sa = preds[perm], acts[perm]
        order = np.argsort(-sp, kind="stable")
        dr = 1.0 / float(numpos)
        ap = pc = 0.0
        for i in range(n):
            if sa[order[i]] > 0.0:
                pc += 1.0
                ap += pc / (i + 1) * dr
        return ap

    rng = np.random.default_rng(3)
    n = (1 << 17) + 17  # just past the radix threshold
    preds = np.round(rng.uniform(-1, 1, n), 2)  # heavy ties
    preds[rng.random(n) < 0.01] = 0.0
    preds[rng.random(n) < 0.01] = -0.0
    acts = (rng.random(n) < 0.05).astype(np.float64)
    npos = float(acts.sum())
    got = native.ap_sweep(
        preds, acts, np.zeros(1, np.int64), np.asarray([n], np.int64),
        np.asarray([npos]), -1)[0]
    assert got == oracle_ap(preds, acts, npos)


def test_fused_topk_perr_bit_identical():
    """topk_and_perr_on_device (one stable descending sort) must match
    lax.top_k + perr_precision_on_device bit-for-bit, including heavy
    score ties (where top_k's lowest-index-first contract is the
    nontrivial part) and zero-label rows."""
    import jax
    import jax.numpy as jnp

    from efficientvideoclassification_youtube8m_tpu.metrics.eval_util import (
        perr_precision_on_device,
        topk_and_perr_on_device,
    )

    rng = np.random.default_rng(5)
    B, V, k = 16, 331, 20
    preds = np.round(rng.random((B, V)), 1).astype(np.float32)  # ties
    preds[3] = 0.5  # whole row tied
    preds[4] = 0.0  # all-zero scores (positive filter edge)
    labels = rng.random((B, V)) < 0.03
    labels[7] = False  # zero-label row

    p, l = jnp.asarray(preds), jnp.asarray(labels)
    want_val, want_idx = jax.lax.top_k(p, k)
    want_perr = perr_precision_on_device(p, l)
    got_val, got_idx, got_perr = topk_and_perr_on_device(p, l, k)
    np.testing.assert_array_equal(np.asarray(want_val), np.asarray(got_val))
    np.testing.assert_array_equal(np.asarray(want_idx), np.asarray(got_idx))
    np.testing.assert_array_equal(np.asarray(want_perr), np.asarray(got_perr))

    # under jit too (the eval steps run it compiled)
    got_val, got_idx, got_perr = jax.jit(
        topk_and_perr_on_device, static_argnums=2)(p, l, k)
    np.testing.assert_array_equal(np.asarray(want_val), np.asarray(got_val))
    np.testing.assert_array_equal(np.asarray(want_idx), np.asarray(got_idx))
    np.testing.assert_array_equal(np.asarray(want_perr), np.asarray(got_perr))


def test_ap_sweep_radix_thread_safe():
    """Concurrent ap_sweep calls over radix-sized segments must match the
    sequential results bit-for-bit: ctypes releases the GIL, so the radix
    histogram has to be caller-owned scratch, not shared static state
    (two threads evaluating two checkpoints in parallel is a supported
    pattern)."""
    import threading

    from efficientvideoclassification_youtube8m_tpu.data import native

    if not native.available():
        pytest.skip("native library unavailable")

    rng = np.random.default_rng(11)
    n = (1 << 17) + 5
    cases = []
    for s in range(4):
        preds = np.round(rng.uniform(-1, 1, n), 2)  # heavy ties
        acts = (rng.random(n) < 0.03).astype(np.float64)
        cases.append((preds, acts, float(acts.sum())))

    def sweep(preds, acts, npos):
        return native.ap_sweep(
            preds, acts, np.zeros(1, np.int64), np.asarray([n], np.int64),
            np.asarray([npos]), -1)[0]

    sequential = [sweep(*c) for c in cases]
    results = [None] * len(cases)
    # several interleaved rounds per thread to maximize overlap inside
    # the radix passes
    def worker(i):
        for _ in range(3):
            results[i] = sweep(*cases[i])

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(len(cases))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert results == sequential
