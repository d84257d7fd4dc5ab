"""TF1-semantics LSTM as a TPU-friendly `lax.scan`.

Reproduces the exact math of the reference's recurrent stack
(`/root/reference/code_student_uniform/frame_level_models.py:221-257`):
`tf.contrib.rnn.BasicLSTMCell(num_units, forget_bias=1.0, state_is_tuple=False)`
wrapped in `MultiRNNCell(state_is_tuple=False)` and driven by
`tf.nn.dynamic_rnn(..., sequence_length=...)`.

Semantics that must hold for parity (and are covered by tests):

  * Cell state is the concatenation ``[c, h]`` along the feature axis;
    the multi-layer state is the per-layer concatenation
    ``[c0, h0, c1, h1, ...]``.
  * Gate pre-activations are ``[x, h] @ W + b`` split in order
    ``i, j, f, o`` (input, new-input, forget, output).
  * ``new_c = c * sigmoid(f + forget_bias) + sigmoid(i) * tanh(j)``,
    ``new_h = tanh(new_c) * sigmoid(o)``.
  * `dynamic_rnn` sequence-length handling: for steps ``t >= seq_len`` the
    cell is skipped entirely — emitted output is zero and the carried state
    is frozen; a zero-length sequence yields the zero state.

TPU-first design notes:

  * The input projection ``x_t @ Wx`` for all timesteps is hoisted out of
    the scan into ONE large ``[B*T, D] @ [D, 4H]`` matmul that tiles onto
    the MXU; the scan body only performs the unavoidable recurrent
    ``h @ Wh`` matmul plus VPU elementwise gate math.
  * Layers run sequentially over the full sequence (exact for stacked
    LSTMs — no intra-step feedback), so each layer is again one hoisted
    matmul + one scan, instead of an interleaved per-step multi-layer cell.
  * Everything is static-shaped; sequence lengths enter only as masks.
"""

from __future__ import annotations

import math
from typing import Any, List, Sequence, Tuple

import jax
import jax.numpy as jnp

# A single cell's parameters mirror the TF variable layout so checkpoints
# line up one-to-one with the reference's
# `RNN_L*/multi_rnn_cell/cell_*/basic_lstm_cell/{kernel,bias}`:
#   kernel: [input_size + num_units, 4 * num_units]
#   bias:   [4 * num_units] (zero-initialized)
BasicLSTMCellParams = dict  # {"kernel": Array, "bias": Array}


def init_basic_lstm_cell(
    key: jax.Array, input_size: int, num_units: int, dtype: Any = jnp.float32
) -> BasicLSTMCellParams:
    """Glorot-uniform kernel (TF1.3 `_linear` default) + zero bias."""
    fan_in = input_size + num_units
    fan_out = 4 * num_units
    limit = math.sqrt(6.0 / (fan_in + fan_out))
    kernel = jax.random.uniform(
        key, (fan_in, fan_out), dtype=jnp.float32, minval=-limit, maxval=limit
    ).astype(dtype)
    bias = jnp.zeros((fan_out,), dtype=dtype)
    return {"kernel": kernel, "bias": bias}


def init_multi_lstm(
    key: jax.Array,
    input_size: int,
    num_units: int,
    num_layers: int,
    dtype: Any = jnp.float32,
) -> List[BasicLSTMCellParams]:
    """Stack of cells; layer 0 consumes the input, deeper layers consume h."""
    keys = jax.random.split(key, num_layers)
    sizes = [input_size] + [num_units] * (num_layers - 1)
    return [
        init_basic_lstm_cell(k, s, num_units, dtype) for k, s in zip(keys, sizes)
    ]


def lstm_cell_step(
    params: BasicLSTMCellParams,
    x: jax.Array,
    c: jax.Array,
    h: jax.Array,
    forget_bias: float = 1.0,
) -> Tuple[jax.Array, jax.Array]:
    """One unmasked BasicLSTMCell step. Used by parity tests; the scan path
    below inlines the same math with the input projection hoisted."""
    gates = jnp.concatenate([x, h], axis=-1) @ params["kernel"] + params["bias"]
    i, j, f, o = jnp.split(gates, 4, axis=-1)
    new_c = c * jax.nn.sigmoid(f + forget_bias) + jax.nn.sigmoid(i) * jnp.tanh(j)
    new_h = jnp.tanh(new_c) * jax.nn.sigmoid(o)
    return new_c, new_h


def _lstm_layer_scan(
    params: BasicLSTMCellParams,
    xs: jax.Array,  # [B, T, D]
    seq_len: jax.Array,  # [B] int
    forget_bias: float,
    compute_dtype: Any,
    unroll: int = 1,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Run one LSTM layer over a full sequence with dynamic_rnn masking.

    Returns (outputs [B, T, H], final_c [B, H], final_h [B, H]).
    """
    B, T, D = xs.shape
    H = params["kernel"].shape[-1] // 4
    # Accumulate in f32 (MXU-native) unless running a float64 parity check.
    acc_dtype = jnp.float64 if compute_dtype == jnp.float64 else jnp.float32
    low_precision = compute_dtype == jnp.bfloat16
    w_x = params["kernel"][:D].astype(compute_dtype)
    w_h = params["kernel"][D:].astype(compute_dtype)
    bias = params["bias"].astype(acc_dtype)

    # Hoisted input projection: one MXU-sized matmul for every timestep.
    # In bf16 mode the [B, T, 4H] intermediate is stored in bf16 — it is
    # the largest HBM tensor in the model (e.g. 1.26 GB/layer f32 for the
    # teacher L1) and its round-trip bounds the scan's bandwidth; the
    # bias is re-added in f32 inside the step.
    x_proj = jax.lax.dot_general(
        xs.astype(compute_dtype),
        w_x,
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=compute_dtype if low_precision else acc_dtype,
    )
    if not low_precision:
        x_proj = x_proj + bias

    seq_len = seq_len.astype(jnp.int32)
    c0 = jnp.zeros((B, H), acc_dtype)
    h0 = jnp.zeros((B, H), acc_dtype)
    ts = jnp.arange(T, dtype=jnp.int32)

    def step(carry, inp):
        c, h = carry
        xp, t = inp
        gates = jax.lax.dot_general(
            h.astype(compute_dtype),
            w_h,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=acc_dtype,
        )
        if low_precision:
            gates = gates + xp.astype(acc_dtype) + bias
        else:
            gates = gates + xp
        i, j, f, o = jnp.split(gates, 4, axis=-1)
        new_c = c * jax.nn.sigmoid(f + forget_bias) + jax.nn.sigmoid(i) * jnp.tanh(j)
        new_h = jnp.tanh(new_c) * jax.nn.sigmoid(o)
        valid = (t < seq_len)[:, None]
        c = jnp.where(valid, new_c, c)
        h = jnp.where(valid, new_h, h)
        # per-step outputs only feed the next layer's (bf16) matmul, so
        # stack them in compute precision — halves the largest stacked
        # tensor's HBM traffic in bf16 mode ([T, B, H] per layer)
        out = jnp.where(valid, new_h, 0.0).astype(
            compute_dtype if low_precision else acc_dtype
        )
        return (c, h), out

    (c_fin, h_fin), outs = jax.lax.scan(
        step, (c0, h0), (jnp.swapaxes(x_proj, 0, 1), ts), unroll=unroll
    )
    return jnp.swapaxes(outs, 0, 1), c_fin, h_fin


# ---------------------------------------------------------------------------
# Custom-VJP layer: restructured backward pass.
#
# JAX's default scan AD recomputes the gate pre-activations in the
# backward step and accumulates dWh/dWx with one matmul PER TIMESTEP.
# This version saves the gates from the forward pass (bf16 — trading
# ~650 GFLOP of recompute per teacher-L1 layer for a 157 MB HBM
# round-trip) and leaves only the unavoidable dh chain sequential; the
# weight gradients become three big batched matmuls over the whole
# [B*T] axis:
#     dWh = h_prev^T @ dgates,  dWx = xs^T @ dgates,  dxs = dgates @ Wx^T.
# ---------------------------------------------------------------------------


def _lstm_layer_fwd_impl(kernel, bias, xs, seq_len, forget_bias, unroll):
    """Forward identical to _lstm_layer_scan, additionally emitting the
    bf16 gate pre-activations and per-step masked cell states."""
    B, T, D = xs.shape
    H = kernel.shape[-1] // 4
    w_x = kernel[:D].astype(jnp.bfloat16)
    w_h = kernel[D:].astype(jnp.bfloat16)
    bias_f = bias.astype(jnp.float32)

    x_proj = jax.lax.dot_general(
        xs.astype(jnp.bfloat16), w_x,
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.bfloat16,
    )
    seq_len = seq_len.astype(jnp.int32)
    c0 = jnp.zeros((B, H), jnp.float32)
    h0 = jnp.zeros((B, H), jnp.float32)
    ts = jnp.arange(T, dtype=jnp.int32)

    def step(carry, inp):
        c, h = carry
        xp, t = inp
        gates = xp.astype(jnp.float32) + bias_f + jax.lax.dot_general(
            h.astype(jnp.bfloat16), w_h,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        i, j, f, o = jnp.split(gates, 4, axis=-1)
        new_c = c * jax.nn.sigmoid(f + forget_bias) + jax.nn.sigmoid(i) * jnp.tanh(j)
        new_h = jnp.tanh(new_c) * jax.nn.sigmoid(o)
        valid = (t < seq_len)[:, None]
        c = jnp.where(valid, new_c, c)
        h = jnp.where(valid, new_h, h)
        out = jnp.where(valid, new_h, 0.0).astype(jnp.bfloat16)
        return (c, h), (out, gates.astype(jnp.bfloat16), c.astype(jnp.bfloat16))

    (c_fin, h_fin), (outs, gates_all, cs_all) = jax.lax.scan(
        step, (c0, h0), (jnp.swapaxes(x_proj, 0, 1), ts), unroll=unroll
    )
    outs = jnp.swapaxes(outs, 0, 1)  # [B, T, H] bf16
    gates_all = jnp.swapaxes(gates_all, 0, 1)  # [B, T, 4H] bf16
    cs_all = jnp.swapaxes(cs_all, 0, 1)  # [B, T, H] bf16 (masked c_t)
    return (outs, c_fin, h_fin), (gates_all, cs_all)


def make_lstm_layer_custom_vjp(forget_bias: float = 1.0, unroll: int = 1):
    """Build a custom-VJP LSTM layer fn(kernel, bias, xs, seq_len) ->
    (outs, c_fin, h_fin)."""

    @jax.custom_vjp
    def layer(kernel, bias, xs, seq_len):
        (outs, c_fin, h_fin), _ = _lstm_layer_fwd_impl(
            kernel, bias, xs, seq_len, forget_bias, unroll
        )
        return outs, c_fin, h_fin

    def fwd(kernel, bias, xs, seq_len):
        (outs, c_fin, h_fin), (gates_all, cs_all) = _lstm_layer_fwd_impl(
            kernel, bias, xs, seq_len, forget_bias, unroll
        )
        return (outs, c_fin, h_fin), (kernel, xs, seq_len, outs, gates_all, cs_all)

    def bwd(res, cotangents):
        kernel, xs, seq_len, outs, gates_all, cs_all = res
        d_outs, d_cfin, d_hfin = cotangents
        B, T, D = xs.shape
        H = kernel.shape[-1] // 4
        w_x = kernel[:D].astype(jnp.bfloat16)
        w_h = kernel[D:].astype(jnp.bfloat16)

        # h_{t-1} / c_{t-1} from the stored masked streams (masked h_t ==
        # carried h_t, likewise c)
        h_prev = jnp.concatenate(
            [jnp.zeros((B, 1, H), outs.dtype), outs[:, :-1]], axis=1
        )
        c_prev = jnp.concatenate(
            [jnp.zeros((B, 1, H), cs_all.dtype), cs_all[:, :-1]], axis=1
        )
        seq_len = seq_len.astype(jnp.int32)
        ts = jnp.arange(T - 1, -1, -1, dtype=jnp.int32)  # reverse order

        def step(carry, inp):
            dc, dh = carry
            g_t, c_prev_t, c_t, d_out_t, t = inp
            c_prev_t = c_prev_t.astype(jnp.float32)
            c_t = c_t.astype(jnp.float32)
            d_out_t = d_out_t.astype(jnp.float32)
            gates = g_t.astype(jnp.float32)
            i, j, f, o = jnp.split(gates, 4, axis=-1)
            sig_i = jax.nn.sigmoid(i)
            tanh_j = jnp.tanh(j)
            sig_f = jax.nn.sigmoid(f + forget_bias)
            sig_o = jax.nn.sigmoid(o)
            tanh_c = jnp.tanh(c_t)

            valid = (t < seq_len)[:, None]
            dnew_h = jnp.where(valid, dh + d_out_t, 0.0)
            dnew_c = jnp.where(valid, dc, 0.0) + dnew_h * sig_o * (
                1.0 - tanh_c * tanh_c
            )
            d_i = dnew_c * tanh_j * sig_i * (1.0 - sig_i)
            d_j = dnew_c * sig_i * (1.0 - tanh_j * tanh_j)
            d_f = dnew_c * c_prev_t * sig_f * (1.0 - sig_f)
            d_o = dnew_h * tanh_c * sig_o * (1.0 - sig_o)
            dgates = jnp.concatenate([d_i, d_j, d_f, d_o], axis=-1)

            dh_prev = jax.lax.dot_general(
                dgates.astype(jnp.bfloat16), w_h,
                dimension_numbers=(((1,), (1,)), ((), ())),  # @ w_h^T
                preferred_element_type=jnp.float32,
            ) + jnp.where(valid, 0.0, dh)
            dc_prev = dnew_c * sig_f + jnp.where(valid, 0.0, dc)
            return (dc_prev, dh_prev), dgates.astype(jnp.bfloat16)

        inputs = (
            jnp.swapaxes(gates_all, 0, 1)[::-1],
            jnp.swapaxes(c_prev, 0, 1)[::-1],
            jnp.swapaxes(cs_all, 0, 1)[::-1],
            jnp.swapaxes(d_outs, 0, 1)[::-1],
            ts,
        )
        (_, _), dgates_rev = jax.lax.scan(
            step, (d_cfin, d_hfin), inputs, unroll=unroll
        )
        dgates_all = jnp.swapaxes(dgates_rev[::-1], 0, 1)  # [B, T, 4H] bf16

        flat_dg = dgates_all.reshape(B * T, 4 * H)
        d_wh = jax.lax.dot_general(
            h_prev.reshape(B * T, H).astype(jnp.bfloat16), flat_dg,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        d_wx = jax.lax.dot_general(
            xs.reshape(B * T, D).astype(jnp.bfloat16), flat_dg,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        d_kernel = jnp.concatenate([d_wx, d_wh], axis=0)
        d_bias = jnp.sum(flat_dg.astype(jnp.float32), axis=0)
        d_xs = jax.lax.dot_general(
            flat_dg, w_x,
            dimension_numbers=(((1,), (1,)), ((), ())),  # @ w_x^T
            preferred_element_type=jnp.float32,
        ).reshape(B, T, D).astype(xs.dtype)
        return d_kernel, d_bias, d_xs, None

    layer.defvjp(fwd, bwd)
    return layer


def multi_lstm_scan(
    params: Sequence[BasicLSTMCellParams],
    xs: jax.Array,  # [B, T, D]
    seq_len: jax.Array,  # [B]
    forget_bias: float = 1.0,
    compute_dtype: Any = jnp.float32,
    return_outputs: bool = False,
    unroll: int = 1,
    custom_vjp: bool = False,
):
    """Stacked-LSTM `dynamic_rnn` over a full sequence.

    Returns the final state in the reference's `state_is_tuple=False` layout
    ``[c0, h0, c1, h1, ...]`` of shape [B, num_layers * 2H] — the tensor the
    reference uses as the distillation target
    (`/root/reference/code_student_uniform/train.py:359`). Optionally also
    returns the top layer's per-step outputs.
    """
    state_parts = []
    layer_in = xs
    outs = None
    for layer_params in params:
        if custom_vjp:
            layer_fn = make_lstm_layer_custom_vjp(forget_bias, unroll)
            outs, c_fin, h_fin = layer_fn(
                layer_params["kernel"], layer_params["bias"], layer_in, seq_len
            )
        else:
            outs, c_fin, h_fin = _lstm_layer_scan(
                layer_params, layer_in, seq_len, forget_bias, compute_dtype,
                unroll=unroll,
            )
        state_parts.extend([c_fin, h_fin])
        layer_in = outs
    final_state = jnp.concatenate(state_parts, axis=-1)
    if return_outputs:
        return final_state, outs
    return final_state
