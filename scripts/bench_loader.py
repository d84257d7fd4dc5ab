"""Host input-pipeline throughput: native parse vs full loader.

Measures, on a synthetic full-scale shard (300-frame videos, 1152
feature bytes, vocab 4716):
  * raw C parse (data/native.read_frame_file, views discarded);
  * FrameDataLoader end-to-end (parse -> queue -> batch assembly) at
    frame_stride 1 (teacher/validate paths) and every_n=10 (student
    eval/serving paths), shuffle on and off.

Each configuration runs in its OWN subprocess: allocator state (arena
growth, glibc's dynamic mmap threshold) and page-cache warmth otherwise
bleed between configs and swamp the differences being measured. Each
child also runs TWICE and the best is what matters: sandbox runs are
bimodal at the process level (host page-reclaim can charge seconds of
system time to an unlucky process — observed 5,136 vs 489 v/s for the
identical config minutes apart), so the best-of-2 is the honest
steady-state figure and the spread is environment noise.

Context for the numbers (single sandbox core; real hosts scale with
reader threads): the parser runs at memcpy speed (~110ns per
frame-feature including the payload copy), and the loader's remaining
cost over raw parse is the batch-assembly copy plus per-video Python.
The mallopt arena tuning in data/loader.py (+20-25% steady state) is on
by default; YT8M_NO_MALLOPT=1 compares without it.

Usage: python scripts/bench_loader.py [videos_per_shard] [epochs]
"""

import os
import subprocess
import sys
import tempfile
import time

_REPO = __file__.rsplit("/", 2)[0]
sys.path.insert(0, _REPO)

os.environ.setdefault("JAX_PLATFORMS", "cpu")


def _child(path: str, mode: str, stride: int, shuffle: int, epochs: int):
    import resource

    from efficientvideoclassification_youtube8m_tpu.data import native
    from efficientvideoclassification_youtube8m_tpu.data.loader import (
        FrameDataLoader,
    )

    if mode == "raw":
        best = 0.0
        for _ in range(max(2, epochs)):
            t0 = time.perf_counter()
            n = sum(1 for _ in native.read_frame_file(path, stride=stride))
            best = max(best, n / (time.perf_counter() - t0))
        print(f"raw native parse  stride={stride:2d}: {best:10,.0f} v/s")
        return
    loader = FrameDataLoader(
        path, batch_size=128, feature_names=["rgb", "audio"],
        feature_sizes=[1024, 128], max_frames=300, vocab_size=4716,
        num_readers=1, num_epochs=epochs, shuffle=bool(shuffle),
        use_native=True, frame_stride=stride,
    )
    t0 = time.perf_counter()
    n = 0
    for b in loader:
        n += b.features.shape[0]
    dt = time.perf_counter() - t0
    ru = resource.getrusage(resource.RUSAGE_SELF)
    print(f"loader stride={stride:2d} shuffle={shuffle}: "
          f"{n / dt:10,.0f} v/s  (user {ru.ru_utime:.2f}s sys "
          f"{ru.ru_stime:.2f}s rss {ru.ru_maxrss / 1e6:.2f} GB)")


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        _, _, path, mode, stride, shuffle, epochs = sys.argv
        _child(path, mode, int(stride), int(shuffle), int(epochs))
        return

    from efficientvideoclassification_youtube8m_tpu.data.yt8m import (
        write_learnable_frame_shard,
    )

    n_videos = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    tmp = tempfile.mkdtemp(prefix="bench_loader_")
    path = os.path.join(tmp, "shard-0.tfrecord")
    write_learnable_frame_shard(path, n_videos, vocab_size=4716,
                                feature_sizes=(1024, 128), max_frames=300)
    print(f"shard: {n_videos} videos, {os.path.getsize(path) / 1e6:.1f} MB")

    env = {**os.environ, "PYTHONPATH": _REPO}
    configs = [("raw", 1, 0), ("raw", 10, 0),
               ("loader", 1, 0), ("loader", 1, 1),
               ("loader", 10, 0), ("loader", 10, 1)]
    for mode, stride, shuffle in configs:
        for _ in range(2):
            subprocess.run(
                [sys.executable, __file__, "--child", path, mode,
                 str(stride), str(shuffle), str(epochs)],
                env=env, check=True,
            )


if __name__ == "__main__":
    main()
