"""Per-class (macro) mean-average-precision accumulator.

Capability-parity with
`/root/reference/code_student_uniform/mean_average_precision_calculator.py`:
one `AveragePrecisionCalculator` per class. (The reference's dead-path
bug when `num_positives` is omitted — iterating an int — is fixed here;
that path is never hit by the reference's own callers.)
"""

from __future__ import annotations

from typing import List, Optional

from efficientvideoclassification_youtube8m_tpu.metrics.average_precision import (
    AveragePrecisionCalculator,
)


class MeanAveragePrecisionCalculator:
    def __init__(self, num_class: int):
        if not isinstance(num_class, int) or num_class <= 1:
            raise ValueError("num_class must be a positive integer.")
        self._num_class = num_class
        self._ap_calculators = [
            AveragePrecisionCalculator() for _ in range(num_class)
        ]

    def accumulate(self, predictions, actuals, num_positives: Optional[list] = None):
        """predictions/actuals: per-class lists of score/label lists."""
        if not num_positives:
            num_positives = [None] * self._num_class
        for i in range(len(predictions)):
            self._ap_calculators[i].accumulate(
                predictions[i], actuals[i], num_positives[i]
            )

    def clear(self):
        for calculator in self._ap_calculators:
            calculator.clear()

    def is_empty(self) -> bool:
        return all(c.heap_size == 0 for c in self._ap_calculators)

    def peek_map_at_n(self) -> List[float]:
        return [c.peek_ap_at_n() for c in self._ap_calculators]
