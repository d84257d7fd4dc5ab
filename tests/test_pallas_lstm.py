"""Fused Pallas LSTM kernel vs the XLA scan (interpret mode on CPU;
the same comparison runs compiled on TPU, where it is bit-exact)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from efficientvideoclassification_youtube8m_tpu.ops.lstm import (
    init_multi_lstm,
    multi_lstm_scan,
)
from efficientvideoclassification_youtube8m_tpu.ops.pallas.lstm_scan import (
    lstm_chunk_scan_pallas,
    multi_lstm_scan_pallas,
)


@pytest.mark.parametrize("num_layers", [1, 2])
def test_pallas_matches_xla_scan(num_layers):
    B, T, D, H = 16, 15, 12, 8
    params = init_multi_lstm(jax.random.PRNGKey(0), D, H, num_layers)
    xs = jnp.asarray(np.random.default_rng(0).normal(size=(B, T, D)),
                     jnp.float32)
    seq = jnp.asarray(np.r_[0, 1, 3, 7, 15, 15, 10, 2,
                            np.random.default_rng(1).integers(0, 16, 8)],
                      jnp.int32)
    want = np.asarray(
        multi_lstm_scan(params, xs, seq, compute_dtype=jnp.bfloat16))
    got = np.asarray(
        multi_lstm_scan_pallas(params, xs, seq, tile_b=8, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_pallas_outputs_stream_correctly():
    """Per-step outputs (consumed by the next layer) match the XLA scan,
    including zeroing past seq_len."""
    B, T, D, H = 8, 6, 4, 8
    params = init_multi_lstm(jax.random.PRNGKey(1), D, H, 1)
    xs = jnp.asarray(np.random.default_rng(2).normal(size=(B, T, D)),
                     jnp.float32)
    seq = jnp.asarray([0, 2, 4, 6, 6, 1, 3, 5], jnp.int32)
    _, want_outs = multi_lstm_scan(params, xs, seq,
                                   compute_dtype=jnp.bfloat16,
                                   return_outputs=True)
    w_x = params[0]["kernel"][:D].astype(jnp.bfloat16)
    xp = jax.lax.dot_general(
        jnp.swapaxes(xs, 0, 1).astype(jnp.bfloat16), w_x,
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.bfloat16)
    outs, c_fin, h_fin = lstm_chunk_scan_pallas(
        xp, params[0]["kernel"][D:], params[0]["bias"], seq,
        tile_b=8, interpret=True)
    np.testing.assert_allclose(
        np.asarray(jnp.swapaxes(outs, 0, 1), np.float32),
        np.asarray(want_outs), rtol=0.02, atol=0.02)  # outs stored bf16
    # outputs past seq_len are exactly zero
    outs_bm = np.asarray(jnp.swapaxes(outs, 0, 1))
    for b, s in enumerate([0, 2, 4, 6, 6, 1, 3, 5]):
        assert np.all(outs_bm[b, s:] == 0)


def test_int8_pallas_matches_quantized_xla_scan():
    """The fused int8 kernel computes the same math as the XLA-scan int8
    path (ops/quantize._quantized_lstm_layer_scan); differences come
    only from the bf16 inter-layer/output streams the kernel shares with
    the bf16 Pallas path."""
    from efficientvideoclassification_youtube8m_tpu.ops import quantize as qz

    B, T, D, H = 16, 15, 12, 8
    params = init_multi_lstm(jax.random.PRNGKey(3), D, H, 2)
    sizes = [D, H]
    qparams = [qz.quantize_lstm_cell(c, s) for c, s in zip(params, sizes)]
    xs = jnp.asarray(np.random.default_rng(5).normal(size=(B, T, D)),
                     jnp.float32)
    seq = jnp.asarray(np.r_[0, 1, 3, 7, 15, 15, 10, 2,
                            np.random.default_rng(6).integers(0, 16, 8)],
                      jnp.int32)
    want = np.asarray(qz.quantized_multi_lstm_scan(qparams, xs, seq))
    got = np.asarray(
        qz.quantized_multi_lstm_scan_pallas(qparams, xs, seq,
                                            interpret=True))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=0.03, atol=0.03)
    # zero-length sequences give the zero state in both
    np.testing.assert_array_equal(got[0], np.zeros_like(got[0]))


def test_int8_pallas_forward_close_to_float():
    """End-to-end: quantized hierarchical forward with the fused kernel
    stays within the int8 accuracy envelope of the float forward."""
    from efficientvideoclassification_youtube8m_tpu.ops import quantize as qz
    from efficientvideoclassification_youtube8m_tpu.train import (
        init_distill_state,
        make_optimizer,
    )
    from efficientvideoclassification_youtube8m_tpu.train.step import (
        forward_student,
        preprocess_batch,
    )
    from efficientvideoclassification_youtube8m_tpu.ops.preprocess import (
        student_num_frames,
        uniform_subsample,
    )
    from efficientvideoclassification_youtube8m_tpu.utils.config import (
        TrainConfig,
    )

    cfg = TrainConfig(num_classes=24, lstm_cells=16, lstm_layers=2,
                      max_num_frames=40, num_inputs_to_lstm=4,
                      num_inputs_L1=2, every_n=2,
                      feature_names="rgb, audio", feature_sizes="6, 2",
                      compute_dtype="float32", scan_unroll=1)
    opt = make_optimizer(cfg.optimizer, cfg.clip_gradient_norm)
    state = init_distill_state(cfg, opt)
    rng = np.random.default_rng(7)
    feats = rng.integers(0, 256, size=(16, cfg.max_num_frames,
                                       cfg.total_feature_size),
                         dtype=np.uint8)
    nf = rng.integers(5, cfg.max_num_frames + 1, size=16).astype(np.int32)
    x = preprocess_batch(cfg, jnp.asarray(feats))
    xs = uniform_subsample(x, cfg.every_n)
    nfs = student_num_frames(jnp.asarray(nf), cfg.every_n,
                             cfg.max_num_frames)
    want = np.asarray(forward_student(cfg, state.params_student, xs, nfs,
                                      inference=True)["predictions"])
    qparams = qz.quantize_hierarchical_params(
        state.params_student, cfg.total_feature_size, cfg.lstm_cells,
        cfg.lstm_layers)
    # interpret-mode fused path: swap the scan like use_pallas=True does
    # on TPU (pallas_call can't lower on CPU without interpret)
    import efficientvideoclassification_youtube8m_tpu.ops.quantize as qmod

    orig = qmod.quantized_multi_lstm_scan_pallas
    qmod.quantized_multi_lstm_scan_pallas = (
        lambda qp, x, s, **kw: orig(qp, x, s, interpret=True))
    try:
        got_pl = np.asarray(qz.quantized_hierarchical_forward(
            qparams, xs, nfs, cfg.num_inputs_L1, cfg.num_classes,
            cfg.moe_num_mixtures, use_pallas=True))
    finally:
        qmod.quantized_multi_lstm_scan_pallas = orig
    got = np.asarray(qz.quantized_hierarchical_forward(
        qparams, xs, nfs, cfg.num_inputs_L1, cfg.num_classes,
        cfg.moe_num_mixtures, use_pallas=False))
    np.testing.assert_allclose(got, want, atol=0.02)
    np.testing.assert_allclose(got_pl, want, atol=0.03)


def test_train_pallas_grad_parity_vs_scan_ad():
    """The fused train kernels' custom VJP matches XLA scan AD: values
    exactly (same fwd math), gradients within bf16-residual tolerance."""
    from efficientvideoclassification_youtube8m_tpu.ops.pallas.lstm_scan import (
        multi_lstm_scan_train_pallas,
    )

    params = init_multi_lstm(jax.random.PRNGKey(7), 12, 8, 2)
    xs = jnp.asarray(np.random.default_rng(6).normal(size=(8, 15, 12)),
                     jnp.float32)
    seq = jnp.array([0, 1, 3, 7, 15, 15, 10, 2], jnp.int32)
    tgt = jnp.asarray(np.random.default_rng(7).normal(size=(8, 32)),
                      jnp.float32)

    def loss(p, pallas):
        if pallas:
            s = multi_lstm_scan_train_pallas(p, xs, seq, tile_b=8,
                                             interpret=True)
        else:
            s = multi_lstm_scan(p, xs, seq, compute_dtype=jnp.bfloat16)
        return jnp.sum((s - tgt) ** 2)

    v0, g0 = jax.value_and_grad(lambda p: loss(p, False))(params)
    v1, g1 = jax.value_and_grad(lambda p: loss(p, True))(params)
    np.testing.assert_allclose(float(v0), float(v1), rtol=1e-6)
    for layer in range(2):
        for k in ("kernel", "bias"):
            a, b = np.asarray(g0[layer][k]), np.asarray(g1[layer][k])
            scale = max(np.abs(a).max(), 1e-6)
            assert np.abs(a - b).max() / scale < 0.03, (layer, k)


def test_train_tile_guard():
    """Oversized LSTM dims and non-tileable batches fall back to the XLA
    scan (train_tile_for -> None) instead of risking a Mosaic VMEM
    failure; validated dims pick the largest divisor tile <= 256."""
    from efficientvideoclassification_youtube8m_tpu.ops.pallas import lstm_scan

    assert lstm_scan.train_tile_for(512, 1024) == 256
    assert lstm_scan.train_tile_for(128, 1024) == 128
    assert lstm_scan.train_tile_for(8, 64) == 8
    # beyond the hardware-validated cell bound -> fallback
    assert lstm_scan.train_tile_for(512, 2048) is None
    # no power-of-two divisor tile -> fallback
    assert lstm_scan.train_tile_for(7, 1024) is None
