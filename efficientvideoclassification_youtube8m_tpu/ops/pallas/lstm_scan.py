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

# The train kernels keep f32 residual/cotangent streams plus the resident
# [4H, H] bf16 Wh^T (8 MB at H=1024); Mosaic's default 16 MB scoped-VMEM
# budget rejects that at any useful batch tile (20.5 MB at bwd tile 32 on
# flagship dims). v5e has 128 MB of physical VMEM per core and a Pallas
# kernel is the whole program while it runs, so raise the per-kernel cap —
# this is the whole fix that unblocked the measured +38% train win.
_TRAIN_VMEM_LIMIT = 100 * 1024 * 1024

# Default batch tiles for the train kernels (largest divisor of the batch
# that is <= these is used; see models/frame_level.py). r4 tile sweep on
# v5e at flagship dims/batch 512 (bf16 dgates stream, f32 residuals):
# 64/64 2785, 128/128 3004, 256/128 3019, 256/256 3027, 512/256 3028,
# 512/512 3019 v/s — flat past 256, so 256/256 (smallest VMEM footprint
# on the plateau).
TRAIN_TILE_B = 256
TRAIN_BWD_TILE_B = 256

# Largest LSTM cell count the train kernels are validated for on
# hardware: the resident Wh (8*H^2 bytes bf16 fwd+bwd) plus Mosaic's
# stack-allocated per-step temp chain fits the raised cap at H=1024
# (flagship) with the default tiles; beyond that the bwd footprint is
# unmeasured, so callers fall back to the XLA scan instead of risking a
# Mosaic compile error (models/frame_level.py via train_tile_for).
TRAIN_MAX_CELLS = 1024


def train_tile_for(batch: int, cells: int) -> "int | None":
    """Batch tile for the train kernels, or None when the fused path
    should fall back to the XLA scan (unvalidated dims, or no
    tile-divisible batch)."""
    if cells > TRAIN_MAX_CELLS:
        return None
    return next(
        (t for t in (256, 128, 64, 32, 16, 8)
         if t <= TRAIN_TILE_B and batch % t == 0),
        None,
    )


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


# ---------------------------------------------------------------------
# Train-mode kernels: a forward that additionally streams the f32 gate
# POST-activations and masked cell states (the residuals the backward
# needs), and a fused backward that runs the reversed dh/dc chain with
# the per-step gate-derivative math and the dgates @ Wh^T matmul in ONE
# kernel — removing the per-step XLA loop overhead from the backward
# scan the same way the inference kernels do for the forward. The big
# weight-gradient matmuls (dWh, dWx, dxs) stay outside as single XLA
# matmuls over the whole [B*T] axis.
# ---------------------------------------------------------------------


def _lstm_chunk_kernel_train_fwd(
    seq_ref,  # [TILE_B, 1] int32 VMEM
    bias_ref,  # [1, 4H] f32 VMEM
    wh_ref,  # [H, 4H] bf16 VMEM
    xp_hbm,  # [T, B, 4H] bf16 ANY (streamed)
    outs_hbm,  # [T, B, H] bf16 ANY (streamed; masked h_t)
    gates_hbm,  # [T, B, 4H] f32 ANY (streamed; POST-activation
    #   [sig_i, tanh_j, sig_f, sig_o] — the exact values the gate
    #   derivatives need, so the backward does no transcendentals on
    #   the 4H stream; bit-identical to recomputing them from the f32
    #   pre-activations, ~35% faster bwd kernel measured on v5e)
    cs_hbm,  # [T, B, H] f32 ANY (streamed; masked c_t)
    cfin_ref,  # [TILE_B, H] f32 VMEM
    hfin_ref,  # [TILE_B, H] f32 VMEM
    xbuf,  # VMEM scratch (2, TILE_B, 4H) bf16
    obuf,  # VMEM scratch (2, TILE_B, H) bf16
    gbuf,  # VMEM scratch (2, TILE_B, 4H) f32
    cbuf,  # VMEM scratch (2, TILE_B, H) f32
    in_sems,
    out_sems,
    g_sems,
    c_sems,
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

    def out_dma(buf, hbm, sems, slot, t):
        return pltpu.make_async_copy(
            buf.at[slot], hbm.at[t, pl.ds(row0, tile_b), :], sems.at[slot]
        )

    in_dma(0, 0).start()

    seq = seq_ref[:]
    bias = bias_ref[:]
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
        sig_i = jax.nn.sigmoid(gates[:, :H])
        tanh_j = jnp.tanh(gates[:, H : 2 * H])
        sig_f = jax.nn.sigmoid(gates[:, 2 * H : 3 * H] + forget_bias)
        sig_o = jax.nn.sigmoid(gates[:, 3 * H :])
        new_c = c * sig_f + sig_i * tanh_j
        new_h = jnp.tanh(new_c) * sig_o
        valid = t < seq
        c = jnp.where(valid, new_c, c)
        h = jnp.where(valid, new_h, h)

        @pl.when(t >= 2)
        def _():
            out_dma(obuf, outs_hbm, out_sems, t % 2, t - 2).wait()
            out_dma(gbuf, gates_hbm, g_sems, t % 2, t - 2).wait()
            out_dma(cbuf, cs_hbm, c_sems, t % 2, t - 2).wait()

        obuf[t % 2] = jnp.where(valid, new_h, 0.0).astype(jnp.bfloat16)
        gbuf[t % 2] = jnp.concatenate([sig_i, tanh_j, sig_f, sig_o],
                                      axis=-1)
        cbuf[t % 2] = c
        out_dma(obuf, outs_hbm, out_sems, t % 2, t).start()
        out_dma(gbuf, gates_hbm, g_sems, t % 2, t).start()
        out_dma(cbuf, cs_hbm, c_sems, t % 2, t).start()
        return (c, h)

    c_fin, h_fin = jax.lax.fori_loop(0, T, step, (c0, h0))
    cfin_ref[:] = c_fin
    hfin_ref[:] = h_fin

    @pl.when(T >= 2)
    def _():
        out_dma(obuf, outs_hbm, out_sems, (T - 2) % 2, T - 2).wait()
        out_dma(gbuf, gates_hbm, g_sems, (T - 2) % 2, T - 2).wait()
        out_dma(cbuf, cs_hbm, c_sems, (T - 2) % 2, T - 2).wait()

    out_dma(obuf, outs_hbm, out_sems, (T - 1) % 2, T - 1).wait()
    out_dma(gbuf, gates_hbm, g_sems, (T - 1) % 2, T - 1).wait()
    out_dma(cbuf, cs_hbm, c_sems, (T - 1) % 2, T - 1).wait()


def _lstm_chunk_kernel_train_bwd(
    seq_ref,  # [TILE_B, 1] int32 VMEM
    dcfin_ref,  # [TILE_B, H] f32 VMEM
    dhfin_ref,  # [TILE_B, H] f32 VMEM
    wht_ref,  # [4H, H] bf16 VMEM (Wh transposed)
    gates_hbm,  # [T, B, 4H] f32 ANY (fwd residual)
    cs_hbm,  # [T, B, H] f32 ANY (fwd residual, masked c_t)
    douts_hbm,  # [T, B, H] f32 ANY (output cotangents)
    dgates_hbm,  # [T, B, 4H] bf16 ANY (result stream)
    gbuf,  # VMEM scratch (2, TILE_B, 4H) f32
    cbuf,  # VMEM scratch (2, TILE_B, H) f32  (c_t)
    cpbuf,  # VMEM scratch (2, TILE_B, H) f32  (c_{t-1})
    dobuf,  # VMEM scratch (2, TILE_B, H) f32
    dgbuf,  # VMEM scratch (2, TILE_B, 4H) bf16
    g_sems,
    c_sems,
    cp_sems,
    do_sems,
    dg_sems,
    *,
    T: int,
    tile_b: int,
    forget_bias: float,
):
    """Reversed loop k = 0..T-1 over t = T-1-k; carries (dc, dh)."""
    i = pl.program_id(0)
    row0 = i * tile_b
    H = wht_ref.shape[1]

    def in_dma(buf, hbm, sems, slot, t):
        return pltpu.make_async_copy(
            hbm.at[t, pl.ds(row0, tile_b), :], buf.at[slot], sems.at[slot]
        )

    def cp_dma(slot, t):
        # c_{t-1} = cs[t-1]; t == 0 handled by zeroing in the step
        return pltpu.make_async_copy(
            cs_hbm.at[jnp.maximum(t - 1, 0), pl.ds(row0, tile_b), :],
            cpbuf.at[slot], cp_sems.at[slot],
        )

    def dg_dma(slot, t):
        return pltpu.make_async_copy(
            dgbuf.at[slot], dgates_hbm.at[t, pl.ds(row0, tile_b), :],
            dg_sems.at[slot],
        )

    t0 = T - 1
    in_dma(gbuf, gates_hbm, g_sems, 0, t0).start()
    in_dma(cbuf, cs_hbm, c_sems, 0, t0).start()
    in_dma(dobuf, douts_hbm, do_sems, 0, t0).start()
    cp_dma(0, t0).start()

    seq = seq_ref[:]
    dc0 = dcfin_ref[:]
    dh0 = dhfin_ref[:]

    def step(k, carry):
        dc, dh = carry
        t = T - 1 - k
        slot = k % 2

        @pl.when(k + 1 < T)
        def _():
            nxt = (k + 1) % 2
            in_dma(gbuf, gates_hbm, g_sems, nxt, t - 1).start()
            in_dma(cbuf, cs_hbm, c_sems, nxt, t - 1).start()
            in_dma(dobuf, douts_hbm, do_sems, nxt, t - 1).start()
            cp_dma(nxt, t - 1).start()

        in_dma(gbuf, gates_hbm, g_sems, slot, t).wait()
        in_dma(cbuf, cs_hbm, c_sems, slot, t).wait()
        in_dma(dobuf, douts_hbm, do_sems, slot, t).wait()
        cp_dma(slot, t).wait()

        acts = gbuf[slot]  # post-activations from the fwd stream
        c_t = cbuf[slot]
        c_prev = jnp.where(t > 0, cpbuf[slot], 0.0)
        d_out = dobuf[slot]

        sig_i = acts[:, :H]
        tanh_j = acts[:, H : 2 * H]
        sig_f = acts[:, 2 * H : 3 * H]
        sig_o = acts[:, 3 * H :]
        tanh_c = jnp.tanh(c_t)

        valid = t < seq
        dnew_h = jnp.where(valid, dh + d_out, 0.0)
        dnew_c = jnp.where(valid, dc, 0.0) + dnew_h * sig_o * (
            1.0 - tanh_c * tanh_c
        )
        d_i = dnew_c * tanh_j * sig_i * (1.0 - sig_i)
        d_j = dnew_c * sig_i * (1.0 - tanh_j * tanh_j)
        d_f = dnew_c * c_prev * sig_f * (1.0 - sig_f)
        d_o = dnew_h * tanh_c * sig_o * (1.0 - sig_o)
        dgates = jnp.concatenate([d_i, d_j, d_f, d_o], axis=-1)

        # XLA's scan AD runs this cotangent matmul in f32 (it upcasts
        # the bf16 weight exactly); a plain bf16 cast of dgates would
        # COMPOUND quantization noise through the sequential dh chain
        # and measurably degrades convergence. Two-term hi/lo bf16
        # split recovers ~f32 left-operand precision at 2x bf16 matmul
        # cost (the weight side is exact: bf16 -> f32 is lossless).
        dg_hi = dgates.astype(jnp.bfloat16)
        dg_lo = (dgates - dg_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        dh_prev = (
            jnp.dot(dg_hi, wht_ref[:], preferred_element_type=jnp.float32)
            + jnp.dot(dg_lo, wht_ref[:], preferred_element_type=jnp.float32)
            + jnp.where(valid, 0.0, dh)
        )
        dc_prev = dnew_c * sig_f + jnp.where(valid, 0.0, dc)

        @pl.when(k >= 2)
        def _():
            dg_dma(slot, T - 1 - (k - 2)).wait()

        # The EMITTED stream is plain bf16 (dg_hi): the dW/dx consumers
        # are bf16-operand matmuls exactly like XLA AD's (which casts
        # its f32 dgates to bf16 at the dot), so this is convergence-
        # equivalent — and halves the dgates HBM write+read traffic.
        # Only the sequential dh chain above needs the hi/lo precision.
        # KNOWN DEVIATION: d_bias (a reduce, not a matmul — see the
        # wrapper) sums this bf16-rounded stream where XLA AD sums f32
        # dgates; emitting dg_lo too would double the stream traffic for
        # a ~2^-9 relative-error term. The f64-oracle check (CLAUDE.md
        # r4) puts this path's total grad error BELOW XLA's bf16 scan AD.
        dgbuf[slot] = dg_hi
        dg_dma(slot, t).start()
        return (dc_prev, dh_prev)

    dc_fin, dh_fin = jax.lax.fori_loop(0, T, step, (dc0, dh0))
    # reuse the cotangent refs as outputs for (dc_0, dh_0)? No — separate
    # outputs would need more refs; the wrapper only consumes dgates (the
    # input cotangent d_xs comes from dgates @ Wx^T, and the initial
    # state is constant zero so dc_0/dh_0 are discarded).
    @pl.when(T >= 2)
    def _():
        dg_dma((T - 2) % 2, T - 1 - (T - 2)).wait()

    dg_dma((T - 1) % 2, 0).wait()


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


def _train_fwd_pallas(kernel, bias, xs_tm, seq_len, forget_bias, tile_b,
                      interpret):
    """x-projection (XLA) + the train fwd kernel. xs_tm is [T, B, D]
    time-major. Returns (outs_tm bf16, c_fin, h_fin, gates_tm, cs_tm)."""
    T, B, D = xs_tm.shape
    H = kernel.shape[-1] // 4
    G = 4 * H
    w_x = kernel[:D].astype(jnp.bfloat16)
    x_proj = jax.lax.dot_general(
        xs_tm.astype(jnp.bfloat16), w_x,
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.bfloat16,
    )
    fwd = functools.partial(
        _lstm_chunk_kernel_train_fwd, T=T, tile_b=tile_b,
        forget_bias=forget_bias,
    )
    outs, gates, cs, c_fin, h_fin = pl.pallas_call(
        fwd,
        grid=(B // tile_b,),
        in_specs=[
            pl.BlockSpec((tile_b, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, G), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # outs
            pl.BlockSpec(memory_space=pl.ANY),  # gates
            pl.BlockSpec(memory_space=pl.ANY),  # cs
            pl.BlockSpec((tile_b, H), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, H), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, H), jnp.bfloat16),
            jax.ShapeDtypeStruct((T, B, G), jnp.float32),
            jax.ShapeDtypeStruct((T, B, H), jnp.float32),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, tile_b, G), jnp.bfloat16),
            pltpu.VMEM((2, tile_b, H), jnp.bfloat16),
            pltpu.VMEM((2, tile_b, G), jnp.float32),
            pltpu.VMEM((2, tile_b, H), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_TRAIN_VMEM_LIMIT),
        interpret=interpret,
    )(
        seq_len.astype(jnp.int32).reshape(B, 1),
        bias.astype(jnp.float32).reshape(1, G),
        kernel[D:].astype(jnp.bfloat16),
        x_proj,
    )
    return outs, gates, cs, c_fin, h_fin


def make_lstm_layer_train_pallas(forget_bias: float = 1.0, tile_b: int = 64,
                                 bwd_tile_b: int = 32,
                                 interpret: bool = False):
    """Build fn(kernel, bias, xs, seq_len) -> (outs [B,T,H] bf16, c_fin,
    h_fin) whose VJP runs the fused Pallas backward. The weight/input
    gradients are three big XLA matmuls over the dgates stream; the
    sequential dh/dc chain and all gate-derivative math run in ONE
    kernel (no per-step XLA loop overhead)."""

    @jax.custom_vjp
    def layer(kernel, bias, xs, seq_len):
        xs_tm = jnp.swapaxes(xs, 0, 1)
        outs, _, _, c_fin, h_fin = _train_fwd_pallas(
            kernel, bias, xs_tm, seq_len, forget_bias, tile_b, interpret
        )
        return jnp.swapaxes(outs, 0, 1), c_fin, h_fin

    def fwd(kernel, bias, xs, seq_len):
        xs_tm = jnp.swapaxes(xs, 0, 1)
        outs, gates, cs, c_fin, h_fin = _train_fwd_pallas(
            kernel, bias, xs_tm, seq_len, forget_bias, tile_b, interpret
        )
        res = (kernel, xs_tm, seq_len, outs, gates, cs)
        return (jnp.swapaxes(outs, 0, 1), c_fin, h_fin), res

    def bwd(res, cotangents):
        kernel, xs_tm, seq_len, outs_tm, gates_tm, cs_tm = res
        d_outs, d_cfin, d_hfin = cotangents
        T, B, D = xs_tm.shape
        H = kernel.shape[-1] // 4
        G = 4 * H
        w_x = kernel[:D].astype(jnp.bfloat16)
        w_h = kernel[D:].astype(jnp.bfloat16)

        # separate pallas_call at its own tile (no coupling to the fwd's)
        bwd_k = functools.partial(
            _lstm_chunk_kernel_train_bwd, T=T, tile_b=bwd_tile_b,
            forget_bias=forget_bias,
        )
        (dgates_tm,) = pl.pallas_call(
            bwd_k,
            grid=(B // bwd_tile_b,),
            in_specs=[
                pl.BlockSpec((bwd_tile_b, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bwd_tile_b, H), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bwd_tile_b, H), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((G, H), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),  # gates
                pl.BlockSpec(memory_space=pl.ANY),  # cs
                pl.BlockSpec(memory_space=pl.ANY),  # d_outs
            ],
            out_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_shape=[jax.ShapeDtypeStruct((T, B, G), jnp.bfloat16)],
            scratch_shapes=[
                pltpu.VMEM((2, bwd_tile_b, G), jnp.float32),
                pltpu.VMEM((2, bwd_tile_b, H), jnp.float32),
                pltpu.VMEM((2, bwd_tile_b, H), jnp.float32),
                pltpu.VMEM((2, bwd_tile_b, H), jnp.float32),
                pltpu.VMEM((2, bwd_tile_b, G), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_TRAIN_VMEM_LIMIT),
            interpret=interpret,
        )(
            seq_len.astype(jnp.int32).reshape(B, 1),
            d_cfin.astype(jnp.float32),
            d_hfin.astype(jnp.float32),
            jnp.swapaxes(w_h, 0, 1),  # [4H, H]
            gates_tm,
            cs_tm,
            jnp.swapaxes(d_outs, 0, 1).astype(jnp.float32),
        )

        # h_{t-1} stream: the masked outputs shifted by one step
        h_prev_tm = jnp.concatenate(
            [jnp.zeros((1, B, H), outs_tm.dtype), outs_tm[:-1]], axis=0
        )
        # bf16-operand matmuls with f32 accumulation — exactly what XLA
        # AD emits for these cotangent dots (it casts dgates to bf16 at
        # the dot; the r2 xplane profile showed them at bf16 MXU peak)
        flat_dg = dgates_tm.reshape(T * B, G)  # bf16 from the kernel
        d_wh = jax.lax.dot_general(
            h_prev_tm.reshape(T * B, H).astype(jnp.bfloat16), flat_dg,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        d_wx = jax.lax.dot_general(
            xs_tm.reshape(T * B, D).astype(jnp.bfloat16), flat_dg,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        d_kernel = jnp.concatenate([d_wx, d_wh], axis=0)
        # f32 accumulation over the bf16-rounded stream — a documented
        # precision deviation from XLA AD's f32-dgates sum (see the
        # kernel's dg_hi comment; f64-oracle-validated).
        d_bias = jnp.sum(flat_dg.astype(jnp.float32), axis=0)
        d_xs_tm = jax.lax.dot_general(
            flat_dg, w_x,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(T, B, D)
        d_xs = jnp.swapaxes(d_xs_tm, 0, 1)
        return d_kernel, d_bias, d_xs, None

    layer.defvjp(fwd, bwd)
    return layer


def multi_lstm_scan_train_pallas(
    params: Sequence[dict],
    xs: jax.Array,  # [B, T, D]
    seq_len: jax.Array,
    forget_bias: float = 1.0,
    tile_b: int = 64,
    bwd_tile_b: int = None,
    interpret: bool = False,
):
    """Differentiable stacked-LSTM forward with the fused train kernels;
    returns the [c0, h0, c1, h1, ...] final state like multi_lstm_scan."""
    state_parts = []
    layer_in = xs
    for p in params:
        layer_fn = make_lstm_layer_train_pallas(
            forget_bias, tile_b,
            bwd_tile_b=bwd_tile_b if bwd_tile_b is not None else tile_b,
            interpret=interpret)
        outs, c_fin, h_fin = layer_fn(p["kernel"], p["bias"], layer_in,
                                      seq_len)
        state_parts.extend([c_fin, h_fin])
        layer_in = outs
    return jnp.concatenate(state_parts, axis=-1)


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
