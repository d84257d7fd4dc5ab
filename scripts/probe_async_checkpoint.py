"""Probe: training stall from a periodic checkpoint save, sync vs async.

Runs the flagship distill step N times with one checkpoint save issued
mid-window and compares wall time against the no-save window:
  * sync  — save_checkpoint inline (device_get of the full state blocks
            the step stream; through the sandbox relay the D2H is the
            dominant cost);
  * async — AsyncCheckpointSaver (jitted on-device snapshot + writer
            thread; the fetch/write overlaps the dispatched steps).

Usage: python scripts/probe_async_checkpoint.py [batch] [steps] [modes]
  modes — comma-separated window sequence (default
  "none,sync,async,none,sync,async"); the sync window costs the full
  ~3.4GB relay fetch (~5 min here), skip it once recorded.
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

    from efficientvideoclassification_youtube8m_tpu.parallel import (
        build_sharded_distill_step,
        create_mesh,
        place_state,
        shard_batch,
    )
    from efficientvideoclassification_youtube8m_tpu.train import (
        AsyncCheckpointSaver,
        init_distill_state,
        make_optimizer,
        save_checkpoint,
    )
    from efficientvideoclassification_youtube8m_tpu.utils.config import (
        TrainConfig,
    )

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    cfg = TrainConfig(batch_size=B, compute_dtype="bfloat16")
    opt = make_optimizer(cfg.optimizer, cfg.clip_gradient_norm)
    mesh = create_mesh()
    state_host = init_distill_state(cfg, opt)
    state = place_state(state_host, mesh)
    step = build_sharded_distill_step(cfg, opt, mesh, state_host,
                                      top_k=cfg.top_k)

    rng = np.random.default_rng(0)
    feats = rng.integers(0, 256, size=(B, cfg.max_num_frames,
                                       cfg.total_feature_size), dtype=np.uint8)
    labels = np.zeros((B, cfg.num_classes), bool)
    for i in range(B):
        labels[i, rng.choice(cfg.num_classes, 4, replace=False)] = True
    nf = rng.integers(30, cfg.max_num_frames + 1, size=B).astype(np.int32)
    f, l, n = shard_batch(mesh, feats, labels, nf)

    state, m = step(state, f, l, n)
    float(m["teacher_label_loss"])  # compile + settle

    import tempfile

    def window(mode):
        nonlocal state
        tmp = tempfile.mkdtemp(prefix=f"ckpt_{mode}_")
        saver = AsyncCheckpointSaver()
        t0 = time.perf_counter()
        for i in range(N):
            state, m = step(state, f, l, n)
            if i == 2:
                if mode == "sync":
                    save_checkpoint(tmp, state,
                                    int(jax.device_get(state.global_step)))
                elif mode == "async":
                    saver.save(tmp, state,
                               int(jax.device_get(state.global_step)))
                elif mode == "snap":
                    # snapshot only (device -> pinned_host copy, no
                    # writer drain): isolates the on-critical-path cost
                    # a real host sees — the relay drain in the "async"
                    # windows queues ahead of this window's final metric
                    # fetch and is sandbox bandwidth, not a train stall
                    assert saver._snapshot(state) is not None
        if mode == "async":
            # do NOT wait: the write is designed to drain behind the
            # steps; assert below that it finished inside the window
            pass
        float(m["teacher_label_loss"])
        dt = time.perf_counter() - t0
        done_in_window = mode != "async" or not (
            saver._thread and saver._thread.is_alive())
        saver.wait()
        return dt, done_in_window

    modes = (sys.argv[3].split(",") if len(sys.argv) > 3
             else ["none", "sync", "async", "none", "sync", "async"])
    for mode in modes:
        dt, done = window(mode)
        extra = "" if mode != "async" else (
            " (write drained inside window)" if done
            else " (write still in flight at window end)")
        print(f"{mode:5s}: {dt*1000/N:8.1f} ms/step  "
              f"({B*N/dt:,.0f} v/s){extra}", flush=True)


if __name__ == "__main__":
    main()
