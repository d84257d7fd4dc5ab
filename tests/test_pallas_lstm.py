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
