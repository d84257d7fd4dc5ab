"""Evaluation metrics: Hit@1, PERR, GAP, and the epoch aggregator.

Numerics-parity with `/root/reference/code_student_uniform/eval_util.py`,
with one TPU-era addition: the per-video top-k extraction (the O(B*4716)
host-side argpartition the reference runs every step, `eval_util.py:82-124`)
can instead be done on-device with `jax.lax.top_k`, and the host only
touches the [B, k] result (`topk_on_device` + `accumulate_topk`).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

from efficientvideoclassification_youtube8m_tpu.metrics.average_precision import (
    AveragePrecisionCalculator,
)
from efficientvideoclassification_youtube8m_tpu.metrics.mean_average_precision import (
    MeanAveragePrecisionCalculator,
)


def flatten(l):
    return [item for sublist in l for item in sublist]


def calculate_hit_at_one(predictions: np.ndarray, actuals: np.ndarray) -> float:
    """Fraction of videos whose argmax prediction is a true label."""
    top_prediction = np.argmax(predictions, 1)
    hits = actuals[np.arange(actuals.shape[0]), top_prediction]
    return float(np.average(hits))


def calculate_precision_at_equal_recall_rate(
    predictions: np.ndarray, actuals: np.ndarray
) -> float:
    """Per-video precision within the top-|labels| predictions, averaged."""
    aggregated_precision = 0.0
    num_videos = actuals.shape[0]
    for row in range(num_videos):
        num_labels = int(np.sum(actuals[row]))
        top_indices = np.argpartition(predictions[row], -num_labels)[-num_labels:]
        item_precision = 0.0
        for label_index in top_indices:
            if predictions[row][label_index] > 0:
                item_precision += actuals[row][label_index]
        item_precision /= top_indices.size
        aggregated_precision += item_precision
    return aggregated_precision / num_videos


def calculate_gap(predictions, actuals, top_k: int = 20) -> float:
    """Global average precision over the batch's pooled top-k triplets."""
    gap_calculator = AveragePrecisionCalculator()
    sparse_predictions, sparse_labels, num_positives = top_k_by_class(
        predictions, actuals, top_k
    )
    gap_calculator.accumulate(
        flatten(sparse_predictions), flatten(sparse_labels), sum(num_positives)
    )
    return gap_calculator.peek_ap_at_n()


def top_k_by_class(
    predictions: np.ndarray, labels: np.ndarray, k: int = 20
) -> Tuple[List[List[float]], List[List[float]], List[float]]:
    """Top-k predictions per video, regrouped per class.

    Returns per-class score lists, per-class label lists, and per-class
    positive counts over the WHOLE batch (not just the top-k entries).
    """
    if k <= 0:
        raise ValueError("k must be a positive integer.")
    k = min(k, predictions.shape[1])
    num_classes = predictions.shape[1]

    # vectorized top-k per row (order within the k does not matter —
    # everything is re-sorted downstream)
    idx = np.argpartition(predictions, -k, axis=1)[:, -k:]
    rows = np.arange(predictions.shape[0])[:, None]
    top_preds = predictions[rows, idx]
    top_labels = labels[rows, idx]

    out_predictions: List[List[float]] = [[] for _ in range(num_classes)]
    out_labels: List[List[float]] = [[] for _ in range(num_classes)]
    for v in range(predictions.shape[0]):
        for j in range(k):
            c = idx[v, j]
            out_predictions[c].append(top_preds[v, j])
            out_labels[c].append(top_labels[v, j])
    out_true_positives = [np.sum(labels[:, i]) for i in range(num_classes)]
    return out_predictions, out_labels, out_true_positives


def top_k_triplets(predictions: np.ndarray, labels: np.ndarray, k: int = 20):
    """(class, score, label) triplets for one video's top-k."""
    m = len(predictions)
    k = min(k, m)
    indices = np.argpartition(predictions, -k)[-k:]
    return [(index, predictions[index], labels[index]) for index in indices]


def topk_on_device(predictions, k: int = 20):
    """Device-side top-k: returns (values [B,k], indices [B,k]) as jax
    arrays; call inside the jitted eval step so only [B,k] crosses to the
    host instead of [B, 4716]."""
    import jax

    return jax.lax.top_k(predictions, k)


def perr_precision_on_device(predictions, labels):
    """EXACT per-video PERR precision on device: precision within the
    top-|labels| predictions over the FULL score row
    (reference eval_util.py:34-59) — exact even for videos with more
    labels than the eval top_k. Returns [B] float32; rows with zero
    labels contribute 0 (matching the reference's `[-0:]` whole-row
    slice, whose precision is 0/num_classes = 0).

    TPU shape: a VALUE sort finds each row's n-th-largest score tau,
    then hits are counted by thresholding — no argsort and no [B, V]
    gathers (which cost ~50 ms at batch 512 on v5e; this form is ~3 ms,
    an 18x eval-path win). Scores strictly above tau are in the top-n by
    definition; of the tau-ties, only (n - #above) fit, and tied LABEL
    entries fill that capacity first (the reference's argpartition picks
    an arbitrary tie member, so any deterministic tie rule is equally
    faithful; sigmoid scores tie only at saturation)."""
    import jax.numpy as jnp

    labels_f = labels.astype(jnp.float32)
    V = predictions.shape[1]
    n = jnp.sum(labels_f, axis=1).astype(jnp.int32)  # [B]
    sorted_vals = jnp.sort(predictions, axis=1)  # ascending
    tau = jnp.take_along_axis(
        sorted_vals, jnp.maximum(V - n, 0)[:, None], axis=1
    )[:, 0]  # n-th largest score per row
    positive = predictions > 0  # the reference's numpy.nonzero filter
    above = predictions > tau[:, None]
    tied = predictions == tau[:, None]
    hits_above = jnp.sum(labels_f * above * positive, axis=1)
    count_above = jnp.sum(above, axis=1).astype(jnp.float32)
    tied_label_hits = jnp.sum(labels_f * tied * positive, axis=1)
    capacity = jnp.maximum(n.astype(jnp.float32) - count_above, 0.0)
    hits = hits_above + jnp.minimum(capacity, tied_label_hits)
    return jnp.where(n > 0, hits / jnp.maximum(n, 1).astype(jnp.float32), 0.0)


def train_step_metrics(
    topk_values: np.ndarray,  # [B, k] sorted desc (from device top_k)
    topk_indices: np.ndarray,  # [B, k]
    labels: np.ndarray,  # [B, num_class]
) -> Dict[str, float]:
    """Per-step Hit@1 / PERR / GAP from device-side top-k — the cheap path
    for the training loop's every-step logging (train.py:522-526).

    Matches the reference's per-step numbers for <= k labels/video (up
    to tie ordering in GAP), without constructing 4716 per-class mAP
    accumulators per step: one global AP calculator over the pooled
    top-k entries. The epoch-level eval path (EvaluationMetrics) keeps
    the exact reference numerics.
    """
    topk_values = np.asarray(topk_values)
    topk_indices = np.asarray(topk_indices)
    labels = np.asarray(labels)
    B, k = topk_values.shape
    rows = np.arange(B)
    top_labels = labels[rows[:, None], topk_indices]  # [B, k]

    hit_at_one = float(np.average(labels[rows, topk_indices[:, 0]]))

    perr = 0.0
    label_counts = labels.sum(axis=1).astype(np.int64)
    for row in range(B):
        n = min(int(label_counts[row]), k)
        if n == 0:
            continue
        perr += float(
            np.sum(top_labels[row, :n] * (topk_values[row, :n] > 0))
        ) / n
    perr /= B

    gap_calc = AveragePrecisionCalculator()
    gap_calc.accumulate(
        list(topk_values.ravel()),
        list(top_labels.astype(np.float64).ravel()),
        float(labels.sum()),
    )
    return {
        "hit_at_one": hit_at_one,
        "perr": perr,
        "gap": gap_calc.peek_ap_at_n(),
    }


class EvaluationMetrics:
    """Epoch-level aggregator (eval_util.py:126-213)."""

    def __init__(self, num_class: int, top_k: int):
        self.sum_hit_at_one = 0.0
        self.sum_perr = 0.0
        self.sum_loss = 0.0
        self.map_calculator = MeanAveragePrecisionCalculator(num_class)
        self.global_ap_calculator = AveragePrecisionCalculator()
        self.top_k = top_k
        self.num_examples = 0
        self.num_class = num_class

    def accumulate(self, predictions, labels, loss) -> Dict[str, float]:
        predictions = np.asarray(predictions)
        labels = np.asarray(labels)
        batch_size = labels.shape[0]
        mean_hit_at_one = calculate_hit_at_one(predictions, labels)
        mean_perr = calculate_precision_at_equal_recall_rate(predictions, labels)
        mean_loss = float(np.mean(loss))

        sparse_predictions, sparse_labels, num_positives = top_k_by_class(
            predictions, labels, self.top_k
        )
        self.map_calculator.accumulate(sparse_predictions, sparse_labels, num_positives)
        self.global_ap_calculator.accumulate(
            flatten(sparse_predictions), flatten(sparse_labels), sum(num_positives)
        )

        self.num_examples += batch_size
        self.sum_hit_at_one += mean_hit_at_one * batch_size
        self.sum_perr += mean_perr * batch_size
        self.sum_loss += mean_loss * batch_size
        return {"hit_at_one": mean_hit_at_one, "perr": mean_perr, "loss": mean_loss}

    def accumulate_topk(
        self,
        topk_values: np.ndarray,  # [B, k] from topk_on_device
        topk_indices: np.ndarray,  # [B, k]
        labels: np.ndarray,  # [B, num_class] (bool/int)
        loss,
        perr_precision: Sequence[float] = None,
    ) -> Dict[str, float]:
        """Fast path: same GAP/mAP numerics from device-side top-k.

        Hit@1 comes from the top-1 entry. PERR: pass `perr_precision`
        (the [B] per-video precisions from `perr_precision_on_device`,
        computed on the full score row inside the eval step) for EXACT
        reference numerics; without it, PERR falls back to a top-k
        approximation that is exact only for videos with <= k labels.
        GAP/mAP from the top-k list ARE the reference's definition
        (eval_util.py:82-124 pools per-video top-k triplets).
        """
        topk_values = np.asarray(topk_values)
        topk_indices = np.asarray(topk_indices)
        labels = np.asarray(labels)
        batch_size = labels.shape[0]
        num_classes = labels.shape[1]
        k = topk_values.shape[1]

        rows = np.arange(batch_size)
        hits = labels[rows, topk_indices[:, 0]]
        mean_hit_at_one = float(np.average(hits))

        top_labels = labels[rows[:, None], topk_indices]
        if perr_precision is not None:
            # exact per-row precisions computed on device over the full row
            mean_perr = float(np.sum(np.asarray(perr_precision))) / batch_size
        else:
            # PERR within the top-k ranked list (approximate for >k labels)
            aggregated_precision = 0.0
            for row in range(batch_size):
                num_labels = int(np.sum(labels[row]))
                n = min(num_labels, k)
                if n == 0:
                    continue
                # top-k values arrive sorted descending from lax.top_k
                sel = slice(0, n)
                item_precision = float(
                    np.sum(top_labels[row, sel] * (topk_values[row, sel] > 0))
                ) / n
                aggregated_precision += item_precision
            mean_perr = aggregated_precision / batch_size
        mean_loss = float(np.mean(loss))

        out_predictions: List[List[float]] = [[] for _ in range(num_classes)]
        out_labels: List[List[float]] = [[] for _ in range(num_classes)]
        for v in range(batch_size):
            for j in range(k):
                c = topk_indices[v, j]
                out_predictions[c].append(topk_values[v, j])
                out_labels[c].append(top_labels[v, j])
        num_positives = [np.sum(labels[:, i]) for i in range(num_classes)]

        self.map_calculator.accumulate(out_predictions, out_labels, num_positives)
        self.global_ap_calculator.accumulate(
            flatten(out_predictions), flatten(out_labels), sum(num_positives)
        )
        self.num_examples += batch_size
        self.sum_hit_at_one += mean_hit_at_one * batch_size
        self.sum_perr += mean_perr * batch_size
        self.sum_loss += mean_loss * batch_size
        return {"hit_at_one": mean_hit_at_one, "perr": mean_perr, "loss": mean_loss}

    def get(self) -> Dict[str, object]:
        if self.num_examples <= 0:
            raise ValueError("total_sample must be positive.")
        return {
            "avg_hit_at_one": self.sum_hit_at_one / self.num_examples,
            "avg_perr": self.sum_perr / self.num_examples,
            "avg_loss": self.sum_loss / self.num_examples,
            "aps": self.map_calculator.peek_map_at_n(),
            "gap": self.global_ap_calculator.peek_ap_at_n(),
        }

    def clear(self):
        self.sum_hit_at_one = 0.0
        self.sum_perr = 0.0
        self.sum_loss = 0.0
        self.map_calculator.clear()
        self.global_ap_calculator.clear()
        self.num_examples = 0
