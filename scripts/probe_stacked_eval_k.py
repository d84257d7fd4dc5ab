"""Probe: stacked-eval steps_per_dispatch (K) sweep on the real chip.

Measures the end-to-end rate of the cli.eval --steps_per_dispatch loop
(device scan of K batches per launch + packed [K, B, ...] fetch + host
epoch accumulation) at batch 1024 bf16, to pick the auto-K default.
r4 recorded (bf16): lag-1 19.6k, K=8 37.2k, K=16 32.7k, K=24 48.2k,
K=32 47.9k videos/s (device step rate 56k) -> K=24.

--quantize int8 runs the quantized student instead (cli.eval composes
--quantize int8 with --steps_per_dispatch K): the packed D2H bytes are
identical either way, so the int8-vs-bf16 delta is pure device compute.
r4 recorded int8 K=24: 62.5k vs 52.9k bf16 same-session (+18%) on an
idle host — a concurrent pytest depressed one window to 36.5k, so
measure alone.

Usage: python scripts/probe_stacked_eval_k.py [--quantize int8] [K ...]
"""

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quantize", default="none", choices=["none", "int8"])
    ap.add_argument("ks", nargs="*", type=int)
    args = ap.parse_args()

    import jax

    from efficientvideoclassification_youtube8m_tpu.metrics import (
        EvaluationMetrics,
    )
    from efficientvideoclassification_youtube8m_tpu.ops.preprocess import (
        host_subsample,
    )
    from efficientvideoclassification_youtube8m_tpu.parallel import (
        build_sharded_eval_step_stacked,
        create_mesh,
        distributed,
        shard_stacked_batch,
    )
    from efficientvideoclassification_youtube8m_tpu.train import (
        init_distill_state,
        make_optimizer,
        student_state_from_distill,
    )
    from efficientvideoclassification_youtube8m_tpu.utils.config import (
        TrainConfig,
    )

    int8 = args.quantize == "int8"
    ks = args.ks or ([24] if int8 else [16, 24, 32])
    B = 1024
    cfg = TrainConfig(batch_size=B, compute_dtype="bfloat16")
    opt = make_optimizer(cfg.optimizer, cfg.clip_gradient_norm)
    state = student_state_from_distill(init_distill_state(cfg, opt), opt)
    mesh = create_mesh()
    if int8:
        from efficientvideoclassification_youtube8m_tpu.ops.quantize import (
            quantize_hierarchical_params,
        )

        params_host = quantize_hierarchical_params(
            state.params_student, cfg.total_feature_size,
            cfg.lstm_cells, cfg.lstm_layers)
    else:
        params_host = state.params_student
    params = jax.device_put(params_host)

    rng = np.random.default_rng(2)
    feats = rng.integers(0, 256, size=(B, cfg.max_num_frames,
                                       cfg.total_feature_size), dtype=np.uint8)
    labels = np.zeros((B, cfg.num_classes), bool)
    for i in range(B):
        labels[i, rng.choice(cfg.num_classes, 4, replace=False)] = True
    nf = rng.integers(30, cfg.max_num_frames + 1, size=B).astype(np.int32)
    sub = np.asarray(host_subsample(feats, cfg.every_n))

    tag = "int8 " if int8 else ""
    for K in ks:
        stacked = build_sharded_eval_step_stacked(
            cfg, mesh, params_host, top_k=cfg.top_k,
            host_subsampled=True, quantized=int8)
        fk, lk, nk = shard_stacked_batch(
            mesh,
            np.broadcast_to(sub, (K,) + sub.shape),
            np.broadcast_to(labels, (K,) + labels.shape),
            np.broadcast_to(nf, (K,) + nf.shape),
        )
        metas = [(labels, 0)] * K

        def make_drain(evl):
            def drain(packs):
                for rows in distributed.gather_stacked_outputs(packs, metas):
                    evl.accumulate_topk(
                        rows["topk_val"], rows["topk_idx"], rows["labels"],
                        rows["per_example_loss"],
                        perr_precision=rows["perr_precision"],
                    )
            return drain

        stacks = max(2, (64 + K - 1) // K)
        make_drain(EvaluationMetrics(cfg.num_classes, cfg.top_k))(
            stacked(params, fk, lk, nk))  # compile + settle
        rates = []
        for _ in range(3):
            evl = EvaluationMetrics(cfg.num_classes, cfg.top_k)
            drain = make_drain(evl)
            t0 = time.perf_counter()
            pending = None
            for _ in range(stacks):
                packs = stacked(params, fk, lk, nk)
                if pending is not None:
                    drain(pending)
                pending = packs
            drain(pending)
            assert np.isfinite(evl.get()["gap"])
            rates.append(B * K * stacks / (time.perf_counter() - t0))
        rates.sort(reverse=True)
        print(f"{tag}K={K:3d}: best {rates[0]:,.0f} v/s  "
              f"windows {[round(r) for r in rates]}", flush=True)


if __name__ == "__main__":
    main()
