"""Host epoch metrics at real-YT8M validation scale.

The YT8M validation split is ~1.4M videos; at top-20 that pools ~28M
(pred, label) entries through `EvaluationMetrics._flush_pending`
(metrics/eval_util.py) — the epoch-wide stable group-by, the C heapify
over every class segment, and the 28M-entry global AP shuffle + sweep.
The microbenchmark (scripts/bench_host_metrics.py) proved the per-batch
path at 31k videos; this proves the EPOCH-END constant factors at the
full scale the reference eval job faces, and records peak RSS.

A 16-batch cycle of unique synthetic batches is recycled so the host
stream fits in memory; the accumulated pool still holds 1.4M distinct
row entries (metric VALUES are meaningless here — bit-identity vs the
per-entry oracle is asserted separately on a 30k-video subsample, which
exercises every code path the big run does).

Usage: python scripts/bench_host_metrics_epoch.py [num_videos]
Prints one JSON line: wall time split (accumulate vs epoch flush),
sustained host videos/s, and peak RSS.
"""

import json
import resource
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from efficientvideoclassification_youtube8m_tpu.metrics import (  # noqa: E402
    EvaluationMetrics,
)

B, K, C = 1024, 20, 4716
UNIQUE_BATCHES = 16


def make_cycle(seed=0):
    rng = np.random.default_rng(seed)
    batches = []
    for _ in range(UNIQUE_BATCHES):
        scores = rng.uniform(size=(B, C)).astype(np.float32)
        labels = rng.uniform(size=(B, C)) < (3.4 / C)  # ~3.4 labels/video
        labels[: B // 16, : K + 5] = True  # some > K-label videos
        order = np.argsort(-scores, axis=1, kind="stable")[:, :K]
        vals = np.take_along_axis(scores, order, axis=1)
        perr = rng.uniform(size=B).astype(np.float32)
        batches.append((vals, order, labels, perr))
    return batches


def subsample_identity_check():
    """30k-video oracle check (the per-entry LegacyEpoch path)."""
    from tests.test_metrics_fast import LegacyEpoch

    cycle = make_cycle(seed=7)
    fast = EvaluationMetrics(C, K)
    legacy = LegacyEpoch(C, K)
    for i in range(30):
        vals, idx, labels, perr = cycle[i % UNIQUE_BATCHES]
        fast.accumulate_topk(vals, idx, labels, loss=np.zeros(B),
                             perr_precision=perr)
        legacy.accumulate_topk(vals, idx, labels, perr_precision=perr)
    ef, el = fast.get(), legacy.get()
    assert ef["gap"] == el["gap"], (ef["gap"], el["gap"])
    assert ef["aps"] == el["aps"]
    return ef["gap"]


def main():
    num_videos = int(sys.argv[1]) if len(sys.argv) > 1 else 1_400_000
    num_batches = num_videos // B

    gap_check = subsample_identity_check()

    cycle = make_cycle()
    m = EvaluationMetrics(C, K)
    t0 = time.perf_counter()
    for i in range(num_batches):
        vals, idx, labels, perr = cycle[i % UNIQUE_BATCHES]
        m.accumulate_topk(vals, idx, labels, loss=np.zeros(B),
                          perr_precision=perr)
    t_acc = time.perf_counter() - t0

    t0 = time.perf_counter()
    epoch = m.get()  # epoch-wide flush: group-by + heapify + AP sweeps
    t_get = time.perf_counter() - t0

    assert np.isfinite(epoch["gap"])
    videos = num_batches * B
    total = t_acc + t_get
    print(json.dumps({
        "metric": "host_epoch_metrics_videos_per_sec",
        "value": round(videos / total, 1),
        "unit": "videos/s",
        "num_videos": videos,
        "pooled_entries": videos * K,
        "accumulate_seconds": round(t_acc, 2),
        "epoch_flush_seconds": round(t_get, 2),
        "peak_rss_gb": round(
            resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6, 2),
        "subsample_oracle_gap": gap_check,
        "oracle_check": "bit-identical (30k-video subsample)",
    }))


if __name__ == "__main__":
    main()
