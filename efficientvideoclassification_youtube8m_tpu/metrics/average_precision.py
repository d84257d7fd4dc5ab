"""Streaming (global) average-precision accumulator.

Numerically equivalent to
`/root/reference/code_student_uniform/average_precision_calculator.py`:
a bounded min-heap of (prediction, label) pairs plus non-interpolated
AP@n with the reference's seeded-shuffle tie-break (`_shuffle`,
`average_precision_calculator.py:234-240`) — the shuffle affects tie
ordering and therefore exact GAP parity, so it is reproduced verbatim
in behavior (random.seed(0) + random.sample).
"""

from __future__ import annotations

import heapq
import numbers
import random
from typing import Optional

import numpy as np


class AveragePrecisionCalculator:
    """Accumulates a ranked list (optionally top-n bounded) and computes
    non-interpolated average precision over it."""

    def __init__(self, top_n: Optional[int] = None):
        if not ((isinstance(top_n, int) and top_n >= 0) or top_n is None):
            raise ValueError("top_n must be a positive integer or None.")
        self._top_n = top_n
        self._total_positives = 0
        self._heap = []  # min-heap of (prediction, actual)

    @property
    def heap_size(self) -> int:
        return len(self._heap)

    @property
    def num_accumulated_positives(self):
        return self._total_positives

    def accumulate(self, predictions, actuals, num_positives=None):
        """Add a chunk of the ranked list. `num_positives` overrides
        positive counting when the chunk is already top-k truncated."""
        if len(predictions) != len(actuals):
            raise ValueError("the shape of predictions and actuals does not match.")
        if num_positives is not None:
            if not isinstance(num_positives, numbers.Number) or num_positives < 0:
                raise ValueError(
                    "'num_positives' was provided but it was not a nonnegative number."
                )
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

    def clear(self):
        self._heap = []
        self._total_positives = 0

    def peek_ap_at_n(self) -> float:
        if self.heap_size <= 0:
            return 0
        predlists = np.array(list(zip(*self._heap)))
        return self.ap_at_n(
            predlists[0],
            predlists[1],
            n=self._top_n,
            total_num_positives=self._total_positives,
        )

    @staticmethod
    def ap(predictions, actuals) -> float:
        return AveragePrecisionCalculator.ap_at_n(predictions, actuals, n=None)

    @staticmethod
    def ap_at_n(predictions, actuals, n=20, total_num_positives=None) -> float:
        if len(predictions) != len(actuals):
            raise ValueError("the shape of predictions and actuals does not match.")
        if n is not None and (not isinstance(n, int) or n <= 0):
            raise ValueError(f"n must be 'None' or a positive integer. It was {n!r}.")

        predictions = np.array(predictions)
        actuals = np.array(actuals)
        predictions, actuals = AveragePrecisionCalculator._shuffle(
            predictions, actuals
        )
        # stable descending sort AFTER the seeded shuffle == the
        # reference's `sorted(..., reverse=True)` tie behavior
        sortidx = sorted(
            range(len(predictions)), key=lambda k: predictions[k], reverse=True
        )

        if total_num_positives is None:
            numpos = np.size(np.where(actuals > 0))
        else:
            numpos = total_num_positives
        if numpos == 0:
            return 0
        if n is not None:
            numpos = min(numpos, n)
        delta_recall = 1.0 / numpos

        ap = 0.0
        poscount = 0.0
        r = len(sortidx) if n is None else min(len(sortidx), n)
        for i in range(r):
            if actuals[sortidx[i]] > 0:
                poscount += 1
                ap += poscount / (i + 1) * delta_recall
        return ap

    @staticmethod
    def _shuffle(predictions, actuals):
        random.seed(0)
        suffidx = random.sample(range(len(predictions)), len(predictions))
        return predictions[suffidx], actuals[suffidx]

    @staticmethod
    def _zero_one_normalize(predictions, epsilon=1e-7):
        denominator = np.max(predictions) - np.min(predictions)
        return (predictions - np.min(predictions)) / max(denominator, epsilon)
