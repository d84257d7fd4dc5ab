"""Time-boxed measurement for the "serving megakernel" question.

r3 left open whether fusing the int8 x-projection + MoE head into the
fused int8 Pallas LSTM kernel (one serving megakernel) is worth
building. This profiles the production int8 serving step at batch 1024
(jax.profiler -> utils/xplane.py) and attributes device time between:
  * the fused int8 Pallas LSTM kernels (the recurrence),
  * the x-projection / inter-level matmuls (fusion candidates),
  * the MoE head ops (fusion candidate),
  * everything else (quantize/dequantize, preprocess, layout).
The most a megakernel can recover is the dispatch/layout slack AROUND
the candidate ops (their MXU work is the same inside or outside a
kernel) — if that slack is a small share of the step, the megakernel is
struck from the candidate list.

Usage: python scripts/profile_serving_step.py [batch]
"""

import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    import jax
    import jax.numpy as jnp

    from efficientvideoclassification_youtube8m_tpu.ops.preprocess import (
        host_subsample,
    )
    from efficientvideoclassification_youtube8m_tpu.serving import Predictor
    from efficientvideoclassification_youtube8m_tpu.train import (
        init_distill_state,
        make_optimizer,
    )
    from efficientvideoclassification_youtube8m_tpu.utils.config import (
        TrainConfig,
    )
    from efficientvideoclassification_youtube8m_tpu.utils.xplane import (
        summarize_trace,
    )

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    cfg = TrainConfig(batch_size=batch, compute_dtype="bfloat16")
    opt = make_optimizer(cfg.optimizer, cfg.clip_gradient_norm)
    state = init_distill_state(cfg, opt)
    predictor = Predictor(cfg, state.params_student, serve_batch=batch,
                          quantize="int8")

    rng = np.random.default_rng(1)
    feats = rng.integers(
        0, 256, size=(batch, cfg.max_num_frames, cfg.total_feature_size),
        dtype=np.uint8)
    nf = rng.integers(30, cfg.max_num_frames + 1, size=batch).astype(np.int32)
    f = jnp.asarray(host_subsample(feats, cfg.every_n))
    n = jnp.asarray(nf)

    # compile + settle
    preds = predictor._fwd(predictor.params, f, n)
    float(preds[0, 0])

    steps = 10
    trace_dir = "/tmp/serving_trace"
    jax.profiler.start_trace(trace_dir)
    for _ in range(steps):
        preds = predictor._fwd(predictor.params, f, n)
    float(preds[0, 0])
    jax.profiler.stop_trace()

    rows = summarize_trace(trace_dir, top=100, steps=steps)
    total = sum(ms for ms, _ in rows)
    buckets = {"lstm_kernel": 0.0, "matmul": 0.0, "moe": 0.0, "other": 0.0}
    for ms, op in rows:
        low = op.lower()
        if "lstm" in low or "pallas" in low or "custom-call" in low:
            buckets["lstm_kernel"] += ms
        elif "fusion" in low and ("dot" in low or "convert" in low):
            buckets["matmul"] += ms
        elif "dot" in low or "conv" in low:
            buckets["matmul"] += ms
        elif "moe" in low or "softmax" in low:
            buckets["moe"] += ms
        else:
            buckets["other"] += ms
    print("top ops (ms/step):")
    for ms, op in rows[:25]:
        print(f"  {ms:8.3f}  {op[:100]}")
    print(json.dumps({
        "batch": batch,
        "device_ms_per_step": round(total, 3),
        "buckets_ms": {k: round(v, 3) for k, v in buckets.items()},
    }))


if __name__ == "__main__":
    main()
