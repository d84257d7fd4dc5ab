"""Pallas TPU kernel: fused LSTM-chunk scan.

One `pallas_call` runs the ENTIRE T-step recurrence of one LSTM layer
for a batch tile: the recurrent weights live in VMEM for all T steps,
the per-step input projections stream in from HBM double-buffered, the
per-step hidden states stream back out — no HBM round-trip for the
carries and no per-step XLA dispatch. This is the hot op of the
hierarchical model (SURVEY.md §7 "fused two-level LSTM scan"): the
teacher's L1 runs it with batch B*20 on 15-step chunks.

Math is the TF1 BasicLSTMCell + dynamic_rnn masking of ops/lstm.py
(gates i,j,f,o; forget_bias inside the sigmoid; state frozen and output
zeroed past seq_len) — differential tests pin it to `multi_lstm_scan`.

Layout: everything is TIME-MAJOR ([T, B, ...]) so the per-step HBM DMAs
slice the leading (untiled) axis — Mosaic requires the last two dims of
an HBM slice to stay tile-aligned. The input projection x @ Wx stays
OUTSIDE the kernel as one big XLA matmul (the MXU already runs it near
peak); the kernel covers what XLA schedules poorly — the sequential tail
of small matmuls and VPU gate math with their intermediate traffic.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lstm_chunk_kernel(
    seq_ref,  # [TILE_B, 1] int32 VMEM
    bias_ref,  # [1, 4H] f32 VMEM
    wh_ref,  # [H, 4H] bf16 VMEM
    xp_hbm,  # [T, B, 4H] bf16 ANY (streamed)
    outs_hbm,  # [T, B, H] bf16 ANY (streamed)
    cfin_ref,  # [TILE_B, H] f32 VMEM
    hfin_ref,  # [TILE_B, H] f32 VMEM
    xbuf,  # VMEM scratch (2, TILE_B, 4H) bf16
    obuf,  # VMEM scratch (2, TILE_B, H) bf16
    in_sems,  # DMA sems (2,)
    out_sems,  # DMA sems (2,)
    *,
    T: int,
    tile_b: int,
    forget_bias: float,
):
    i = pl.program_id(0)
    row0 = i * tile_b
    H = wh_ref.shape[0]

    def in_dma(slot, t):
        return pltpu.make_async_copy(
            xp_hbm.at[t, pl.ds(row0, tile_b), :], xbuf.at[slot],
            in_sems.at[slot],
        )

    def out_dma(slot, t):
        return pltpu.make_async_copy(
            obuf.at[slot], outs_hbm.at[t, pl.ds(row0, tile_b), :],
            out_sems.at[slot],
        )

    in_dma(0, 0).start()

    seq = seq_ref[:]  # [TILE_B, 1]
    bias = bias_ref[:]  # [1, 4H]

    c0 = jnp.zeros((tile_b, H), jnp.float32)
    h0 = jnp.zeros((tile_b, H), jnp.float32)

    def step(t, carry):
        c, h = carry

        @pl.when(t + 1 < T)
        def _():
            in_dma((t + 1) % 2, t + 1).start()

        in_dma(t % 2, t).wait()
        gates = (
            xbuf[t % 2].astype(jnp.float32)
            + bias
            + jnp.dot(h.astype(jnp.bfloat16), wh_ref[:],
                      preferred_element_type=jnp.float32)
        )
        i_g = gates[:, :H]
        j_g = gates[:, H : 2 * H]
        f_g = gates[:, 2 * H : 3 * H]
        o_g = gates[:, 3 * H :]
        new_c = c * jax.nn.sigmoid(f_g + forget_bias) + jax.nn.sigmoid(
            i_g
        ) * jnp.tanh(j_g)
        new_h = jnp.tanh(new_c) * jax.nn.sigmoid(o_g)
        valid = t < seq  # [TILE_B, 1] bool
        c = jnp.where(valid, new_c, c)
        h = jnp.where(valid, new_h, h)

        # stream the (masked) output; wait for the slot's previous DMA
        @pl.when(t >= 2)
        def _():
            out_dma(t % 2, t - 2).wait()

        obuf[t % 2] = jnp.where(valid, new_h, 0.0).astype(jnp.bfloat16)
        out_dma(t % 2, t).start()
        return (c, h)

    c_fin, h_fin = jax.lax.fori_loop(0, T, step, (c0, h0), unroll=True)
    cfin_ref[:] = c_fin
    hfin_ref[:] = h_fin
    # drain the last two output DMAs
    @pl.when(T >= 2)
    def _():
        out_dma((T - 2) % 2, T - 2).wait()

    out_dma((T - 1) % 2, T - 1).wait()


def lstm_chunk_scan_pallas(
    x_proj_tm: jax.Array,  # [T, B, 4H] bf16, time-major (x @ Wx, no bias)
    w_h: jax.Array,  # [H, 4H] (any float dtype; cast to bf16)
    bias: jax.Array,  # [4H] f32
    seq_len: jax.Array,  # [B] int32
    forget_bias: float = 1.0,
    tile_b: int = 256,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Fused T-step LSTM layer scan (time-major IO). Returns
    (outputs bf16 [T,B,H], final_c f32 [B,H], final_h f32 [B,H])."""
    T, B, G = x_proj_tm.shape
    H = G // 4
    assert B % tile_b == 0, (B, tile_b)
    grid = (B // tile_b,)

    kernel = functools.partial(
        _lstm_chunk_kernel, T=T, tile_b=tile_b, forget_bias=forget_bias
    )
    outs, c_fin, h_fin = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_b, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),  # seq_len
            pl.BlockSpec((1, G), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),  # bias
            pl.BlockSpec((H, G), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),  # w_h (grid-invariant)
            pl.BlockSpec(memory_space=pl.ANY),  # x_proj (streamed)
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # outs (streamed)
            pl.BlockSpec((tile_b, H), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, H), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, H), jnp.bfloat16),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, tile_b, G), jnp.bfloat16),
            pltpu.VMEM((2, tile_b, H), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(
        seq_len.astype(jnp.int32).reshape(B, 1),
        bias.astype(jnp.float32).reshape(1, G),
        w_h.astype(jnp.bfloat16),
        x_proj_tm.astype(jnp.bfloat16),
    )
    return outs, c_fin, h_fin


def _lstm_chunk_kernel_int8(
    seq_ref,  # [TILE_B, 1] int32 VMEM
    bias_ref,  # [1, 4H] f32 VMEM
    wh_ref,  # [H, 4H] int8 VMEM
    whs_ref,  # [1, 4H] f32 VMEM (per-column weight scales)
    xp_hbm,  # [T, B, 4H] f32-dequantized proj, stored bf16 (streamed)
    outs_hbm,  # [T, B, H] bf16 ANY (streamed)
    cfin_ref,  # [TILE_B, H] f32 VMEM
    hfin_ref,  # [TILE_B, H] f32 VMEM
    xbuf,  # VMEM scratch (2, TILE_B, 4H) bf16
    obuf,  # VMEM scratch (2, TILE_B, H) bf16
    in_sems,
    out_sems,
    *,
    T: int,
    tile_b: int,
    forget_bias: float,
):
    """_lstm_chunk_kernel with the recurrent matmul on the int8 MXU
    path: h is quantized per row in VMEM each step (dynamic symmetric
    scale), multiplied against the resident int8 weights with int32
    accumulation, and rescaled in f32 — the same math as
    ops/quantize._quantized_lstm_layer_scan, minus the per-step XLA
    loop overhead the fused kernel exists to remove."""
    i = pl.program_id(0)
    row0 = i * tile_b
    H = wh_ref.shape[0]

    def in_dma(slot, t):
        return pltpu.make_async_copy(
            xp_hbm.at[t, pl.ds(row0, tile_b), :], xbuf.at[slot],
            in_sems.at[slot],
        )

    def out_dma(slot, t):
        return pltpu.make_async_copy(
            obuf.at[slot], outs_hbm.at[t, pl.ds(row0, tile_b), :],
            out_sems.at[slot],
        )

    in_dma(0, 0).start()

    seq = seq_ref[:]
    bias = bias_ref[:]
    wh_scale = whs_ref[:]  # [1, 4H]

    c0 = jnp.zeros((tile_b, H), jnp.float32)
    h0 = jnp.zeros((tile_b, H), jnp.float32)

    def step(t, carry):
        c, h = carry

        @pl.when(t + 1 < T)
        def _():
            in_dma((t + 1) % 2, t + 1).start()

        # dynamic per-row int8 quantization of h (ops/quantize._row_quant)
        h_amax = jnp.max(jnp.abs(h), axis=1, keepdims=True)
        h_scale = jnp.maximum(h_amax / 127.0, 1e-12)
        h_q = jnp.clip(jnp.round(h / h_scale), -127, 127).astype(jnp.int8)

        in_dma(t % 2, t).wait()
        acc = jnp.dot(h_q, wh_ref[:], preferred_element_type=jnp.int32)
        gates = (
            xbuf[t % 2].astype(jnp.float32)
            + bias
            + acc.astype(jnp.float32) * h_scale * wh_scale
        )
        i_g = gates[:, :H]
        j_g = gates[:, H : 2 * H]
        f_g = gates[:, 2 * H : 3 * H]
        o_g = gates[:, 3 * H :]
        new_c = c * jax.nn.sigmoid(f_g + forget_bias) + jax.nn.sigmoid(
            i_g
        ) * jnp.tanh(j_g)
        new_h = jnp.tanh(new_c) * jax.nn.sigmoid(o_g)
        valid = t < seq
        c = jnp.where(valid, new_c, c)
        h = jnp.where(valid, new_h, h)

        @pl.when(t >= 2)
        def _():
            out_dma(t % 2, t - 2).wait()

        obuf[t % 2] = jnp.where(valid, new_h, 0.0).astype(jnp.bfloat16)
        out_dma(t % 2, t).start()
        return (c, h)

    c_fin, h_fin = jax.lax.fori_loop(0, T, step, (c0, h0), unroll=True)
    cfin_ref[:] = c_fin
    hfin_ref[:] = h_fin

    @pl.when(T >= 2)
    def _():
        out_dma((T - 2) % 2, T - 2).wait()

    out_dma((T - 1) % 2, T - 1).wait()


def lstm_chunk_scan_pallas_int8(
    x_proj_tm: jax.Array,  # [T, B, 4H] f32/bf16 (already descaled x @ Wx)
    wh_q: jax.Array,  # [H, 4H] int8
    wh_scale: jax.Array,  # [4H] f32
    bias: jax.Array,  # [4H] f32
    seq_len: jax.Array,  # [B] int32
    forget_bias: float = 1.0,
    tile_b: int = 256,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Fused int8 T-step LSTM layer scan (time-major IO)."""
    T, B, G = x_proj_tm.shape
    H = G // 4
    assert B % tile_b == 0, (B, tile_b)
    grid = (B // tile_b,)

    kernel = functools.partial(
        _lstm_chunk_kernel_int8, T=T, tile_b=tile_b, forget_bias=forget_bias
    )
    outs, c_fin, h_fin = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_b, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),  # seq_len
            pl.BlockSpec((1, G), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),  # bias
            pl.BlockSpec((H, G), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),  # wh_q (grid-invariant)
            pl.BlockSpec((1, G), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),  # wh_scale
            pl.BlockSpec(memory_space=pl.ANY),  # x_proj (streamed)
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # outs (streamed)
            pl.BlockSpec((tile_b, H), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, H), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, H), jnp.bfloat16),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, tile_b, G), jnp.bfloat16),
            pltpu.VMEM((2, tile_b, H), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(
        seq_len.astype(jnp.int32).reshape(B, 1),
        bias.astype(jnp.float32).reshape(1, G),
        wh_q,
        wh_scale.astype(jnp.float32).reshape(1, G),
        x_proj_tm.astype(jnp.bfloat16),
    )
    return outs, c_fin, h_fin


def multi_lstm_scan_pallas(
    params: Sequence[dict],
    xs: jax.Array,  # [B, T, D]
    seq_len: jax.Array,  # [B]
    forget_bias: float = 1.0,
    tile_b: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Stacked-LSTM forward with the fused chunk kernel per layer.

    Drop-in (inference-path) replacement for ops.lstm.multi_lstm_scan:
    returns the [c0, h0, c1, h1, ...] final state. One transpose to
    time-major up front; the inter-layer projections consume the
    time-major outputs directly (dot over the trailing feature axis).
    """
    B, T, _ = xs.shape
    state_parts = []
    layer_in = jnp.swapaxes(xs, 0, 1)  # [T, B, D]
    for p in params:
        D = layer_in.shape[-1]
        w_x = p["kernel"][:D].astype(jnp.bfloat16)
        x_proj = jax.lax.dot_general(
            layer_in.astype(jnp.bfloat16), w_x,
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.bfloat16,
        )  # [T, B, 4H]
        outs, c_fin, h_fin = lstm_chunk_scan_pallas(
            x_proj, p["kernel"][D:], p["bias"], seq_len,
            forget_bias=forget_bias, tile_b=tile_b, interpret=interpret,
        )
        state_parts.extend([c_fin, h_fin])
        layer_in = outs
    return jnp.concatenate(state_parts, axis=-1)
