"""Steps-per-dispatch eval (parallel.build_sharded_eval_step_stacked):
K batches scanned inside ONE launch must reproduce the per-batch eval
program exactly — the CLI's --steps_per_dispatch K is a dispatch-latency
amortization, never a numerics change."""

import numpy as np
import jax

from efficientvideoclassification_youtube8m_tpu.parallel import (
    build_sharded_eval_step,
    build_sharded_eval_step_stacked,
    build_sharded_quantized_eval_step,
    create_mesh,
    shard_batch,
    shard_stacked_batch,
)
from efficientvideoclassification_youtube8m_tpu.train import (
    init_distill_state,
    make_optimizer,
    student_state_from_distill,
)
from efficientvideoclassification_youtube8m_tpu.utils.config import TrainConfig

CFG = TrainConfig(
    num_classes=32,
    batch_size=8,
    lstm_cells=8,
    lstm_layers=2,
    max_num_frames=40,
    num_inputs_to_lstm=4,
    num_inputs_L1=2,
    every_n=2,
    feature_names="rgb, audio",
    feature_sizes="6, 2",
    scan_unroll=1,
)
K = 3


def _batches(cfg, k, seed=0):
    rng = np.random.default_rng(seed)
    B = cfg.batch_size
    feats = rng.integers(
        0, 256, size=(k, B, cfg.max_num_frames, cfg.total_feature_size),
        dtype=np.uint8)
    labels = np.zeros((k, B, cfg.num_classes), bool)
    for j in range(k):
        for i in range(B):
            labels[j, i, rng.choice(cfg.num_classes, 3, replace=False)] = True
    nf = rng.integers(5, cfg.max_num_frames + 1, size=(k, B)).astype(np.int32)
    return feats, labels, nf


def _student_params(cfg):
    opt = make_optimizer(cfg.optimizer, cfg.clip_gradient_norm)
    return student_state_from_distill(
        init_distill_state(cfg, opt), opt).params_student


def test_stacked_eval_matches_per_batch():
    cfg = CFG
    params_host = _student_params(cfg)
    mesh = create_mesh()
    feats, labels, nf = _batches(cfg, K, seed=3)

    step = build_sharded_eval_step(cfg, mesh, params_host, top_k=5)
    stacked = build_sharded_eval_step_stacked(cfg, mesh, params_host, top_k=5)
    params = jax.device_put(params_host)

    packs = np.asarray(stacked(
        params, *shard_stacked_batch(mesh, feats, labels, nf)))
    # paired-index layout: k + ceil(k/2) + 2 lanes (num_classes fits)
    assert packs.shape == (K, cfg.batch_size, 5 + 3 + 2)
    for j in range(K):
        ref = np.asarray(step(
            params, *shard_batch(mesh, feats[j], labels[j], nf[j])
        )["host_pack"])
        np.testing.assert_array_equal(packs[j], ref, err_msg=f"batch {j}")


def test_stacked_quantized_eval_matches_per_batch():
    from efficientvideoclassification_youtube8m_tpu.ops.quantize import (
        quantize_hierarchical_params,
    )

    cfg = CFG
    params_host = _student_params(cfg)
    qparams_host = quantize_hierarchical_params(
        params_host, cfg.total_feature_size, cfg.lstm_cells, cfg.lstm_layers)
    mesh = create_mesh()
    feats, labels, nf = _batches(cfg, K, seed=4)

    step = build_sharded_quantized_eval_step(cfg, mesh, qparams_host, top_k=5)
    stacked = build_sharded_eval_step_stacked(
        cfg, mesh, qparams_host, top_k=5, quantized=True)
    qparams = jax.device_put(qparams_host)

    packs = np.asarray(stacked(
        qparams, *shard_stacked_batch(mesh, feats, labels, nf)))
    for j in range(K):
        ref = np.asarray(step(
            qparams, *shard_batch(mesh, feats[j], labels[j], nf[j])
        )["host_pack"])
        np.testing.assert_array_equal(packs[j], ref, err_msg=f"batch {j}")


def test_gather_stacked_outputs_single_process():
    """Unpacking yields per-batch valid rows in FIFO order; padded tail
    rows and dummy stack slices are never read."""
    from efficientvideoclassification_youtube8m_tpu.parallel import distributed

    k = 2
    B, topk = 4, 3
    rng = np.random.default_rng(0)
    packs = rng.normal(size=(3, B, 2 * topk + 2)).astype(np.float32)
    packs[:, :, topk:2 * topk] = rng.integers(
        0, 32, size=(3, B, topk)).astype(np.float32)
    labels = [rng.random((B, 32)) > 0.8 for _ in range(k)]
    metas = [(labels[0], 0), (labels[1], 3)]  # batch 1: 3 padded rows
    rows = list(distributed.gather_stacked_outputs(packs, metas))
    assert len(rows) == k  # the 3rd (dummy) slice is never surfaced
    np.testing.assert_array_equal(rows[0]["topk_val"], packs[0, :, :topk])
    assert rows[1]["topk_val"].shape[0] == B - 3
    np.testing.assert_array_equal(
        rows[1]["per_example_loss"], packs[1, :1, 2 * topk])
    np.testing.assert_array_equal(rows[1]["labels"], labels[1][:1])
