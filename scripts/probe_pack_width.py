"""Probe: paired-index host pack vs the wide layout, e2e (VERDICT r4 #7).

The packed eval buffer carries top-k indices as int16 PAIRS bitcast into
f32 lanes ([B, k + ceil(k/2) + 2] instead of [B, 2k + 2] — 24% fewer
D2H bytes at k=20, train/step.py:_pack_host_outputs). This probe
measures both layouts in one session: the wide layout is forced by
building the step with the pack function's num_classes gate disabled
(the >PACKED_IDX_MAX fallback path — exactly what a huge-vocab model
would get).

r5 RESULT (v5e, K=24 b=1024): paired 49.1k [49123,48761,46245] vs wide
50.9k [50855,50245,49539] videos/s — e2e-NEUTRAL within relay noise.
The lag ring hides the packed D2H under the next stack's ~440 ms of
device compute (even the wide stack's 4.1 MB is ~137 ms at the relay's
30 MB/s, fully overlapped), so the byte cut only pays when the
transfer ISN'T hidden: slower links relative to compute, un-ringed
consumers, or real hosts where the fetch is latency- not
bandwidth-bound. The paired pack stays (bit-exact, costless, smaller).

Usage: python scripts/probe_pack_width.py [K ...]   (default 24)
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
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
    from efficientvideoclassification_youtube8m_tpu.train import step as step_mod
    from efficientvideoclassification_youtube8m_tpu.train import (
        init_distill_state,
        make_optimizer,
        student_state_from_distill,
    )
    from efficientvideoclassification_youtube8m_tpu.utils.config import (
        TrainConfig,
    )

    ks = [int(a) for a in sys.argv[1:]] or [24]
    B = 1024
    cfg = TrainConfig(batch_size=B, compute_dtype="bfloat16")
    opt = make_optimizer(cfg.optimizer, cfg.clip_gradient_norm)
    state = student_state_from_distill(init_distill_state(cfg, opt), opt)
    mesh = create_mesh()
    params = jax.device_put(state.params_student)

    rng = np.random.default_rng(2)
    feats = rng.integers(0, 256, size=(B, cfg.max_num_frames,
                                       cfg.total_feature_size), dtype=np.uint8)
    labels = np.zeros((B, cfg.num_classes), bool)
    for i in range(B):
        labels[i, rng.choice(cfg.num_classes, 4, replace=False)] = True
    nf = rng.integers(30, cfg.max_num_frames + 1, size=B).astype(np.int32)
    sub = np.asarray(host_subsample(feats, cfg.every_n))

    orig_pack = step_mod._pack_host_outputs

    def wide_pack(topk_val, topk_idx, per_example_loss, perr,
                  num_classes=None):
        return orig_pack(topk_val, topk_idx, per_example_loss, perr,
                         num_classes=None)

    for K in ks:
        for name, patch in (("paired", orig_pack), ("wide  ", wide_pack)):
            # the patch must stay live through the first CALL of the
            # jitted program (jax traces at first execution, not at
            # build), so the whole variant block runs under it
            step_mod._pack_host_outputs = patch
            stacked = build_sharded_eval_step_stacked(
                cfg, mesh, state.params_student, top_k=cfg.top_k,
                host_subsampled=True)
            fk, lk, nk = shard_stacked_batch(
                mesh,
                np.broadcast_to(sub, (K,) + sub.shape),
                np.broadcast_to(labels, (K,) + labels.shape),
                np.broadcast_to(nf, (K,) + nf.shape),
            )
            metas = [(labels, 0)] * K

            def make_drain(evl):
                def drain(packs):
                    for rows in distributed.gather_stacked_outputs(
                            packs, metas):
                        evl.accumulate_topk(
                            rows["topk_val"], rows["topk_idx"],
                            rows["labels"], rows["per_example_loss"],
                            perr_precision=rows["perr_precision"],
                        )
                return drain

            stacks = max(2, (64 + K - 1) // K)
            out0 = stacked(params, fk, lk, nk)
            lanes = out0.shape[-1]
            make_drain(EvaluationMetrics(cfg.num_classes, cfg.top_k))(out0)
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
            step_mod._pack_host_outputs = orig_pack
            print(f"{name} pack ({lanes} lanes) K={K:3d}: "
                  f"best {rates[0]:,.0f} v/s  "
                  f"windows {[round(r) for r in rates]}", flush=True)


if __name__ == "__main__":
    main()
