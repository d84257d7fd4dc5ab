"""Ensemble path tests: CSV round-trips, aggregated loader, head
training + ensemble inference end-to-end."""

import os

import numpy as np
import pytest

from efficientvideoclassification_youtube8m_tpu.data import (
    AggregatedDataLoader,
    write_synthetic_aggregated_shard,
)
from efficientvideoclassification_youtube8m_tpu.ensemble import (
    format_lines,
    load_old_predictions,
    read_pred_file,
    write_predictions_csv,
)

VOCAB = 30


def test_csv_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    preds = rng.uniform(size=(5, VOCAB))
    ids = [f"v{i}" for i in range(5)]
    path = str(tmp_path / "preds.csv")
    write_predictions_csv(path, format_lines(ids, preds, 10))
    back = read_pred_file(path)
    assert set(back) == set(ids)
    for i, vid in enumerate(ids):
        labels, probs = back[vid]
        assert len(labels) == 10
        # the top-10 classes by score, descending
        want = np.argsort(-preds[i])[:10]
        assert set(labels) == set(int(x) for x in want)
        np.testing.assert_allclose(sorted(probs, reverse=True), probs)


def test_format_lines_byte_identical_to_per_row_oracle():
    """The batched format_lines must emit the same BYTES as the per-row
    reference form (inference_ensemble.py:63-74) — same argpartition
    top-k SET and the stable descending sort keeping ties in segment
    order — including duplicate probabilities and bytes video ids."""

    def oracle(video_ids, predictions, top_k):
        for i in range(len(video_ids)):
            top_indices = np.argpartition(predictions[i], -top_k)[-top_k:]
            line = [(int(c), float(predictions[i][c])) for c in top_indices]
            line = sorted(line, key=lambda p: -p[1])
            vid = video_ids[i]
            if isinstance(vid, bytes):
                vid = vid.decode("utf-8")
            yield vid + "," + " ".join("%i %f" % p for p in line) + "\n"

    rng = np.random.default_rng(3)
    # quantized probs force plenty of exact ties at the k-th boundary
    # and inside the top-k
    preds = (rng.integers(0, 7, size=(64, VOCAB)) / 7.0).astype(np.float32)
    ids = [f"v{i}".encode() if i % 3 else f"v{i}" for i in range(64)]
    for k in (1, 5, VOCAB):
        assert list(format_lines(ids, preds, k)) == list(oracle(ids, preds, k))
    assert list(format_lines([], preds[:0], 5)) == []


def test_load_old_predictions(tmp_path):
    rng = np.random.default_rng(1)
    ids = [f"v{i}" for i in range(4)]
    all_preds = []
    for k in range(3):
        preds = rng.uniform(size=(4, VOCAB))
        write_predictions_csv(
            str(tmp_path / f"preds_{k}.csv"), format_lines(ids, preds, 5))
        all_preds.append(preds)
    old = load_old_predictions(str(tmp_path / "preds_*.csv"), ids, VOCAB)
    assert old.shape == (4, 3, VOCAB)
    # entries match the top-5 of each source; non-top-5 are zero
    for k in range(3):
        for i in range(4):
            top5 = np.argsort(-all_preds[k][i])[:5]
            np.testing.assert_allclose(old[i, k, top5], all_preds[k][i, top5],
                                       rtol=1e-5)
            mask = np.ones(VOCAB, bool)
            mask[top5] = False
            assert np.all(old[i, k, mask] == 0)


def test_aggregated_loader(tmp_path):
    truth = write_synthetic_aggregated_shard(
        str(tmp_path / "agg-0000.tfrecord"), num_videos=11, seed=3,
        feature_names=("mean_rgb", "mean_audio"), feature_sizes=(8, 4),
        vocab_size=VOCAB)
    loader = AggregatedDataLoader(
        str(tmp_path / "agg-*.tfrecord"), batch_size=4,
        feature_names=("mean_rgb", "mean_audio"), feature_sizes=(8, 4),
        vocab_size=VOCAB, num_epochs=1, shuffle=False)
    seen = {}
    for batch in loader:
        assert batch.features.shape[1] == 12
        for i, vid in enumerate(batch.video_ids[: len(batch.video_ids) - batch.pad]):
            seen[vid] = (batch.features[i].copy(), batch.labels[i].copy())
    assert len(seen) == 11
    for t in truth:
        feats, labels = seen[t.video_id]
        np.testing.assert_allclose(feats, t.features, rtol=1e-6)
        np.testing.assert_array_equal(np.nonzero(labels)[0], np.asarray(t.labels))


@pytest.mark.parametrize("head", [
    "LinearRegressionEnsemble",
    "SingleHiddenLayerEnsemble",
    # regression: this head computes an in-graph labels loss; inference
    # calls apply without labels and must still get predictions
    "LinearRegressionWeightedMeanEnsembleDifferenceLoss",
])
def test_train_and_infer_ensemble_head(tmp_path, head):
    from efficientvideoclassification_youtube8m_tpu.cli import (
        inference_ensemble as ie_cli,
        train_ensemble as te_cli,
    )

    rng = np.random.default_rng(4)
    # aggregated shard + two prediction CSVs over the same ids
    truth = write_synthetic_aggregated_shard(
        str(tmp_path / "agg-0000.tfrecord"), num_videos=12, seed=5,
        feature_names=("mean_rgb", "mean_audio"), feature_sizes=(8, 4),
        vocab_size=VOCAB)
    ids = [t.video_id for t in truth]
    for k in range(2):
        preds = rng.uniform(size=(12, VOCAB))
        write_predictions_csv(str(tmp_path / f"preds_{k}.csv"),
                              format_lines(ids, preds, VOCAB))

    flags = [
        "--num_classes", str(VOCAB),
        "--batch_size", "6",
        "--feature_names", "mean_rgb, mean_audio",
        "--feature_sizes", "8, 4",
        "--num_epochs", "2",
        "--compute_dtype", "float32",
        "--top_k", "5",
        "--frame_features", "false",
    ]
    head_ckpt = str(tmp_path / "head.msgpack")
    te_cli.main(flags + [
        "--model", head,
        "--train_data_pattern", str(tmp_path / "agg-*.tfrecord"),
        "--preds_pattern", str(tmp_path / "preds_*.csv"),
        "--head_checkpoint", head_ckpt,
    ])
    assert os.path.exists(head_ckpt)

    out_csv = str(tmp_path / "ensembled.csv")
    ie_cli.main(flags + [
        "--input_data_pattern", str(tmp_path / "agg-*.tfrecord"),
        "--preds_pattern", str(tmp_path / "preds_*.csv"),
        "--head_checkpoint", head_ckpt,
        "--output_file", out_csv,
    ])
    merged = read_pred_file(out_csv)
    assert set(merged) == set(ids)
    for vid, (labels, probs) in merged.items():
        assert len(labels) == 5
        assert all(0.0 <= p <= 1.0 for p in probs)


def test_prediction_store_missing_id_message(tmp_path):
    """An input-shard video id absent from one preds CSV fails with a
    message naming the id AND the incomplete file, not a bare KeyError
    mid-batch."""
    from efficientvideoclassification_youtube8m_tpu.ensemble import (
        PredictionStore,
    )

    rng = np.random.default_rng(0)
    write_predictions_csv(str(tmp_path / "preds_0.csv"), format_lines(
        ["a", "b"], rng.uniform(size=(2, VOCAB)), 3))
    write_predictions_csv(str(tmp_path / "preds_1.csv"), format_lines(
        ["a"], rng.uniform(size=(1, VOCAB)), 3))
    store = PredictionStore(str(tmp_path / "preds_*.csv"), VOCAB)
    with pytest.raises(KeyError) as e:
        store.assemble(["a", "b"])
    assert "preds_1.csv" in str(e.value) and "'b'" in str(e.value)


def test_max_ensemble_universe_mismatch_fails_fast(tmp_path):
    """Prediction CSVs that disagree on the video universe must fail
    BEFORE any output row is emitted — a first-file iteration would
    silently drop ids only in later files (incomplete submission) or
    crash mid-stream on ids missing from them."""
    from efficientvideoclassification_youtube8m_tpu.ensemble import (
        max_ensemble,
    )

    rng = np.random.default_rng(1)
    write_predictions_csv(str(tmp_path / "m0.csv"), format_lines(
        ["a", "b"], rng.uniform(size=(2, VOCAB)), 3))
    write_predictions_csv(str(tmp_path / "m1.csv"), format_lines(
        ["a", "c"], rng.uniform(size=(2, VOCAB)), 3))
    with pytest.raises(ValueError, match="universe"):
        list(max_ensemble([str(tmp_path / "m0.csv"),
                           str(tmp_path / "m1.csv")], VOCAB, 3))
    # agreeing files still stream fine
    write_predictions_csv(str(tmp_path / "m2.csv"), format_lines(
        ["a", "b"], rng.uniform(size=(2, VOCAB)), 3))
    lines = list(max_ensemble([str(tmp_path / "m0.csv"),
                               str(tmp_path / "m2.csv")], VOCAB, 3))
    assert len(lines) == 2
