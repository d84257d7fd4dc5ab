"""Generalization test: train on learnable synthetic shards, evaluate on
HELD-OUT videos drawn from the same label->feature mapping. Exercises the
whole stack (loader -> preprocess -> both towers -> losses -> Adam ->
eval metrics) and proves it learns, not just memorizes."""

import numpy as np
import jax
import jax.numpy as jnp

from efficientvideoclassification_youtube8m_tpu.data import FrameDataLoader
from efficientvideoclassification_youtube8m_tpu.data.yt8m import (
    write_learnable_frame_shard,
)
from efficientvideoclassification_youtube8m_tpu.metrics import EvaluationMetrics
from efficientvideoclassification_youtube8m_tpu.train import (
    build_distill_train_step,
    build_validate_step,
    init_distill_state,
    make_optimizer,
)
from efficientvideoclassification_youtube8m_tpu.utils.config import TrainConfig

CFG = TrainConfig(
    num_classes=24,
    batch_size=16,
    lstm_cells=16,
    lstm_layers=1,
    max_num_frames=20,
    num_inputs_to_lstm=4,
    num_inputs_L1=2,
    every_n=2,
    base_learning_rate=0.01,
    feature_names="rgb, audio",
    feature_sizes="12, 4",
    scan_unroll=1,
)


def test_teacher_and_student_generalize(tmp_path):
    cfg = CFG
    kw = dict(feature_names=("rgb", "audio"), feature_sizes=(12, 4),
              max_frames=cfg.max_num_frames, vocab_size=cfg.num_classes,
              min_frames=6, pattern_seed=7)
    write_learnable_frame_shard(str(tmp_path / "train-0.tfrecord"),
                                num_videos=192, seed=0, **kw)
    heldout = write_learnable_frame_shard(str(tmp_path / "val-0.tfrecord"),
                                          num_videos=48, seed=99, **kw)

    opt = make_optimizer(cfg.optimizer, cfg.clip_gradient_norm)
    state = init_distill_state(cfg, opt)
    step = jax.jit(build_distill_train_step(cfg, opt, top_k=5))

    for epoch in range(12):
        loader = FrameDataLoader(
            str(tmp_path / "train-*.tfrecord"), batch_size=cfg.batch_size,
            feature_names=("rgb", "audio"), feature_sizes=(12, 4),
            max_frames=cfg.max_num_frames, vocab_size=cfg.num_classes,
            num_epochs=1, shuffle=True, seed=epoch, drop_remainder=True)
        for batch in loader:
            state, metrics = step(state, jnp.asarray(batch.features),
                                  jnp.asarray(batch.labels),
                                  jnp.asarray(batch.num_frames))

    # held-out eval: STUDENT predictions via the validate step
    vstep = jax.jit(build_validate_step(cfg, top_k=5))
    em = EvaluationMetrics(cfg.num_classes, 5)
    loader = FrameDataLoader(
        str(tmp_path / "val-*.tfrecord"), batch_size=cfg.batch_size,
        feature_names=("rgb", "audio"), feature_sizes=(12, 4),
        max_frames=cfg.max_num_frames, vocab_size=cfg.num_classes,
        num_epochs=1, shuffle=False, pad_final_batch=True)
    for batch in loader:
        out = vstep(state.params_teacher, state.params_student,
                    jnp.asarray(batch.features), jnp.asarray(batch.labels),
                    jnp.asarray(batch.num_frames))
        valid = batch.labels.shape[0] - batch.pad
        em.accumulate_topk(np.asarray(out["topk_val"])[:valid],
                           np.asarray(out["topk_idx"])[:valid],
                           batch.labels[:valid],
                           np.asarray(out["per_example_loss"])[:valid])
    res = em.get()
    # chance Hit@1 with 1-3 labels over 24 classes is ~0.08; the learned
    # student must do far better on held-out videos
    assert res["avg_hit_at_one"] > 0.45, res
    assert res["gap"] > 0.25, res
