"""End-to-end `--frame_features=False` (aggregated video-level) path.

The reference selects `YT8MAggregatedFeatureReader` in five binaries
(`train.py:620-624`, `train_finetune.py:514-518`, `eval_finetune.py:
298-302`, `train_convert_model.py:467-471`, `inference_bias.py:195-199`)
so any video-level model trains/evals/infers directly on pre-aggregated
[B, D] Example features. These tests drive that path through the real
CLIs on learnable synthetic aggregated shards.
"""

import csv
import glob
import os

import numpy as np
import pytest

from efficientvideoclassification_youtube8m_tpu.data import (
    AggregatedDataLoader,
    AggregatedVideo,
)
from efficientvideoclassification_youtube8m_tpu.data.tfrecord import TFRecordWriter
from efficientvideoclassification_youtube8m_tpu.data.yt8m import (
    encode_aggregated_record,
)

VOCAB = 40
FEATURE_NAMES = ("mean_rgb", "mean_audio")
FEATURE_SIZES = (6, 2)
TOTAL = sum(FEATURE_SIZES)

AGG_FLAGS = [
    "--frame_features", "false",
    "--num_classes", str(VOCAB),
    "--batch_size", "32",
    "--feature_names", "mean_rgb, mean_audio",
    "--feature_sizes", "6, 2",
    "--num_readers", "2",
    "--compute_dtype", "float32",
    "--top_k", "5",
    "--base_learning_rate", "0.1",
    "--save_model_secs", "100000",
]


def write_learnable_aggregated_shard(path, num_videos, seed, noise=0.05):
    """One label per video; features = the label's prototype vector plus
    noise — linearly separable, so LogisticModel learns it in a few
    epochs."""
    rng = np.random.default_rng(seed)
    protos = np.random.default_rng(99).normal(size=(VOCAB, TOTAL))
    protos /= np.linalg.norm(protos, axis=1, keepdims=True)
    truth = []
    with TFRecordWriter(path) as w:
        for i in range(num_videos):
            c = int(rng.integers(VOCAB))
            feats = (protos[c] + noise * rng.normal(size=TOTAL)).astype(
                np.float32)
            vid = f"agg{seed:02d}_{i:05d}"
            w.write(encode_aggregated_record(vid, [c], feats, FEATURE_NAMES,
                                             FEATURE_SIZES))
            truth.append(AggregatedVideo(vid, [c], feats))
    return truth


@pytest.fixture(scope="module")
def agg_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("aggregated")
    data_dir = root / "data"
    data_dir.mkdir()
    for s in range(2):
        write_learnable_aggregated_shard(
            str(data_dir / f"train-{s:04d}.tfrecord"), num_videos=128, seed=s)
    write_learnable_aggregated_shard(
        str(data_dir / "validate-0000.tfrecord"), num_videos=64, seed=9)
    return {
        "root": root,
        "train_pattern": str(data_dir / "train-*.tfrecord"),
        "eval_pattern": str(data_dir / "validate-*.tfrecord"),
    }


def _run_finetune_eval(agg_dirs, model, extra=()):
    from efficientvideoclassification_youtube8m_tpu.cli import (
        eval as eval_cli,
        finetune as finetune_cli,
    )
    from efficientvideoclassification_youtube8m_tpu.metrics import eval_util

    train_dir = str(agg_dirs["root"] / f"model_{model}") + "/"
    os.makedirs(train_dir, exist_ok=True)
    finetune_cli.main(AGG_FLAGS + list(extra) + [
        "--model", model,
        "--train_dir", train_dir,
        "--train_data_pattern", agg_dirs["train_pattern"],
        "--num_epochs", "40",
        "--start_new_model", "true",
    ])
    from efficientvideoclassification_youtube8m_tpu.train import latest_checkpoint

    assert latest_checkpoint(train_dir) is not None
    captured = {}
    orig = eval_util.EvaluationMetrics.get

    def capture(self):
        data = orig(self)
        captured.update(data)
        return data

    eval_util.EvaluationMetrics.get = capture
    try:
        eval_cli.main(AGG_FLAGS + list(extra) + [
            "--model", model,
            "--train_dir", train_dir,
            "--eval_data_pattern", agg_dirs["eval_pattern"],
            "--run_once", "true",
        ])
    finally:
        eval_util.EvaluationMetrics.get = orig
    assert glob.glob(os.path.join(train_dir, "eval", "events.out.*"))
    return train_dir, captured


def test_finetune_eval_logistic(agg_dirs):
    """LogisticModel trains from scratch on aggregated shards and the
    held-out epoch metrics show it learned the linear mapping."""
    _, epoch = _run_finetune_eval(agg_dirs, "LogisticModel")
    assert epoch["avg_hit_at_one"] > 0.9
    assert epoch["gap"] > 0.8
    assert np.isfinite(epoch["avg_loss"])


def test_finetune_eval_moe(agg_dirs):
    """MoeModel end-to-end through the same aggregated CLI path."""
    _, epoch = _run_finetune_eval(agg_dirs, "MoeModel",
                                  extra=("--moe_num_mixtures", "2"))
    assert epoch["avg_hit_at_one"] > 0.9


def test_infer_aggregated(agg_dirs):
    """cli.infer --frame_features=False writes a Kaggle CSV whose top-1
    matches the known single label for most videos."""
    from efficientvideoclassification_youtube8m_tpu.cli import infer as infer_cli

    train_dir = str(agg_dirs["root"] / "model_LogisticModel") + "/"
    out_file = str(agg_dirs["root"] / "preds.csv")
    infer_cli.main(AGG_FLAGS + [
        "--model", "LogisticModel",
        "--train_dir", train_dir,
        "--input_data_pattern", agg_dirs["eval_pattern"],
        "--output_file", out_file,
    ])
    truth = {
        v.video_id: v.labels[0]
        for v in write_learnable_aggregated_shard(
            str(agg_dirs["root"] / "tmp.tfrecord"), num_videos=64, seed=9)
    }
    hits = total = 0
    with open(out_file) as f:
        reader = csv.reader(f)
        header = next(reader)
        assert header == ["VideoId", "LabelConfidencePairs"]
        for vid, pairs in reader:
            top1 = int(pairs.split()[0])
            hits += top1 == truth[vid]
            total += 1
    assert total == 64
    assert hits / total > 0.9


def test_train_cli_rejects_aggregated(agg_dirs):
    """The distill trainer needs frame features; the CLI says so clearly
    (the reference's graph build dies on a rank-2 transpose instead,
    train.py:268)."""
    from efficientvideoclassification_youtube8m_tpu.cli import train as train_cli

    with pytest.raises(ValueError, match="frame-level features"):
        train_cli.main(AGG_FLAGS + [
            "--train_dir", str(agg_dirs["root"] / "nope") + "/",
            "--train_data_pattern", agg_dirs["train_pattern"],
        ])


def test_frame_level_model_rejected_on_aggregated_input():
    """A frame-level --model with --frame_features=False fails with a
    clear error, not a shape mismatch."""
    import jax

    from efficientvideoclassification_youtube8m_tpu.train.step import (
        forward_video_level,
    )
    from efficientvideoclassification_youtube8m_tpu.utils.config import TrainConfig

    cfg = TrainConfig(model="HierarchicalLstmModel", num_classes=VOCAB,
                      feature_names="mean_rgb, mean_audio",
                      feature_sizes="6, 2", compute_dtype="float32")
    with pytest.raises(ValueError, match="video-level"):
        forward_video_level(cfg, {}, jax.numpy.zeros((4, TOTAL)))


def test_aggregated_step_math(agg_dirs):
    """The aggregated eval step is sigmoid(W . l2norm(x) + b) exactly —
    the reference graph's unconditional last-axis l2_normalize
    (eval_finetune.py:134-137) with no dequantize stage."""
    import jax
    import jax.numpy as jnp

    from efficientvideoclassification_youtube8m_tpu.train.step import (
        build_eval_step,
    )
    from efficientvideoclassification_youtube8m_tpu.utils.config import TrainConfig

    cfg = TrainConfig(model="LogisticModel", num_classes=VOCAB,
                      feature_names="mean_rgb, mean_audio",
                      feature_sizes="6, 2", compute_dtype="float32")
    rng = np.random.default_rng(3)
    params = {"fc": {"w": jnp.asarray(rng.normal(size=(TOTAL, VOCAB)),
                                      jnp.float32),
                     "b": jnp.asarray(rng.normal(size=(VOCAB,)), jnp.float32)}}
    feats = rng.normal(size=(8, TOTAL)).astype(np.float32)
    labels = np.zeros((8, VOCAB), bool)
    step = jax.jit(build_eval_step(cfg, top_k=5, aggregated=True))
    out = step(params, jnp.asarray(feats), jnp.asarray(labels),
               jnp.ones((8,), jnp.int32))
    x = feats / np.maximum(np.linalg.norm(feats, axis=1, keepdims=True), 1e-12)
    want = 1.0 / (1.0 + np.exp(-(x @ np.asarray(params["fc"]["w"])
                                 + np.asarray(params["fc"]["b"]))))
    np.testing.assert_allclose(np.asarray(out["predictions"]), want,
                               rtol=1e-5, atol=1e-5)


def test_aggregated_loader_roundtrip(agg_dirs):
    """Loader parses the Example wire format back bit-exactly and the
    num_frames placeholder is all ones (readers.py:112)."""
    truth = write_learnable_aggregated_shard(
        str(agg_dirs["root"] / "rt.tfrecord"), num_videos=10, seed=5)
    loader = AggregatedDataLoader(
        str(agg_dirs["root"] / "rt.tfrecord"), batch_size=10,
        feature_names=FEATURE_NAMES, feature_sizes=FEATURE_SIZES,
        vocab_size=VOCAB, shuffle=False, num_epochs=1)
    (batch,) = list(loader)
    assert batch.features.shape == (10, TOTAL)
    assert batch.features.dtype == np.float32
    np.testing.assert_array_equal(batch.num_frames, np.ones(10, np.int32))
    by_id = {v.video_id: v for v in truth}
    for i, vid in enumerate(batch.video_ids):
        np.testing.assert_array_equal(batch.features[i], by_id[vid].features)
        assert sorted(np.nonzero(batch.labels[i])[0]) == by_id[vid].labels


def test_reference_invocation_parses():
    """The reference eval_finetune aggregated invocation parses 1:1
    (eval_finetune.py:298-302 flag surface)."""
    from efficientvideoclassification_youtube8m_tpu.cli import flags as flags_lib

    parser = flags_lib.base_parser("t")
    args = parser.parse_args([
        "--eval_data_pattern", "/data/validate-*.tfrecord",
        "--frame_features", "False",
        "--model", "MoeModel",
        "--feature_names", "mean_rgb, mean_audio",
        "--feature_sizes", "1024, 128",
        "--batch_size", "1024",
        "--run_once", "True",
    ])
    assert args.frame_features is False
    cfg = flags_lib.config_from_args(args)
    assert cfg.total_feature_size == 1152
    assert cfg.feature_names_list == ["mean_rgb", "mean_audio"]
