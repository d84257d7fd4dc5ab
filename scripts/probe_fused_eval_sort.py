"""Probe: eval-step cost of the fused topk+PERR sort vs separate ops.

Times the student eval step (build_sharded_eval_step, host_subsampled)
two ways on device:
  * separate — lax.top_k + perr_precision_on_device's own value sort
    (the pre-fusion form, reconstructed inline);
  * fused    — topk_and_perr_on_device (one stable descending
    sort_key_val), the shipped path.

Outputs are bit-identical (test_metrics_fast pins it); this probe
decides whether the fusion WINS on TPU — lax.top_k may lower to a
cheaper partial sort than a full key-val sort, in which case the fusion
should be reverted (shelf-ware discipline).

Usage: python scripts/probe_fused_eval_sort.py [batch] [iters]
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
    import jax.numpy as jnp

    from efficientvideoclassification_youtube8m_tpu.metrics.eval_util import (
        perr_precision_on_device,
        topk_and_perr_on_device,
    )

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    V, k = 4716, 20

    rng = np.random.default_rng(0)
    preds = jnp.asarray(rng.random((B, V)), jnp.float32)
    labels = jnp.asarray(rng.random((B, V)) < 0.001)

    @jax.jit
    def separate(p, l):
        tv, ti = jax.lax.top_k(p, k)
        return tv, ti, perr_precision_on_device(p, l)

    @jax.jit
    def fused(p, l):
        return topk_and_perr_on_device(p, l, k)

    for name, fn in (("separate", separate), ("fused", fused)):
        out = fn(preds, labels)
        float(out[2][0])  # compile + settle (value fetch, not b_u_r)
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(preds, labels)
            float(out[2][0])
            dt = (time.perf_counter() - t0) / iters
            print(f"{name:9s}: {dt * 1000:7.3f} ms  "
                  f"({B / dt:,.0f} rows/s)", flush=True)

    # parity spot-check on device
    a = separate(preds, labels)
    b = fused(preds, labels)
    for x, y, nm in zip(a, b, ("topk_val", "topk_idx", "perr")):
        same = bool(jnp.all(x == y))
        print(f"parity {nm}: {'OK' if same else 'MISMATCH'}")


if __name__ == "__main__":
    main()
