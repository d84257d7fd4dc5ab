from efficientvideoclassification_youtube8m_tpu.metrics.average_precision import (
    AveragePrecisionCalculator,
)
from efficientvideoclassification_youtube8m_tpu.metrics.eval_util import (
    EvaluationMetrics,
    calculate_gap,
    calculate_hit_at_one,
    calculate_precision_at_equal_recall_rate,
    flatten,
    perr_precision_on_device,
    topk_and_perr_on_device,
    top_k_by_class,
    top_k_triplets,
    topk_on_device,
    train_step_metrics,
)
from efficientvideoclassification_youtube8m_tpu.metrics.mean_average_precision import (
    MeanAveragePrecisionCalculator,
)

__all__ = [
    "AveragePrecisionCalculator",
    "MeanAveragePrecisionCalculator",
    "EvaluationMetrics",
    "calculate_gap",
    "calculate_hit_at_one",
    "calculate_precision_at_equal_recall_rate",
    "flatten",
    "perr_precision_on_device",
    "topk_and_perr_on_device",
    "top_k_by_class",
    "top_k_triplets",
    "topk_on_device",
    "train_step_metrics",
]
