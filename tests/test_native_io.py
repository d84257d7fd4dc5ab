"""Differential tests: C++ native parser vs the pure-Python parser."""

import time

import numpy as np
import pytest

from efficientvideoclassification_youtube8m_tpu.data import (
    FrameDataLoader,
    crc32c,
    write_synthetic_frame_shard,
)
from efficientvideoclassification_youtube8m_tpu.data import native
from efficientvideoclassification_youtube8m_tpu.data.yt8m import read_frame_file

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native parser could not be built"
)


@pytest.fixture(scope="module")
def shard(tmp_path_factory):
    d = tmp_path_factory.mktemp("native_shards")
    path = str(d / "shard.tfrecord")
    truth = write_synthetic_frame_shard(
        path, num_videos=23, seed=7, feature_names=("rgb", "audio"),
        feature_sizes=(16, 4), max_frames=30, vocab_size=100)
    return path, truth


def test_native_crc_matches_python():
    for data in [b"", b"a", b"123456789", bytes(1000), b"x" * 8191]:
        assert native.crc32c(data) == crc32c(data)


def test_native_crc_incremental():
    """Chained calls (crc != 0) route through the C kernel and match
    both the whole-buffer value and the table-fallback chain."""
    from efficientvideoclassification_youtube8m_tpu.data import tfrecord as tfr

    rng = np.random.default_rng(3)
    for n1, n2 in [(0, 5), (7, 0), (13, 29), (4096, 3), (9, 8192)]:
        a = rng.integers(0, 256, n1, dtype=np.uint8).tobytes()
        b = rng.integers(0, 256, n2, dtype=np.uint8).tobytes()
        whole = native.crc32c(a + b)
        assert native.crc32c(b, native.crc32c(a)) == whole
        # pure-python chain (fallback forced) agrees
        saved = list(tfr._NATIVE_CRC)
        tfr._NATIVE_CRC[:] = [True, None]
        try:
            assert tfr.crc32c(b, tfr.crc32c(a)) == whole
        finally:
            tfr._NATIVE_CRC[:] = saved


def test_native_matches_python_parser(shard):
    path, truth = shard
    py_videos = list(read_frame_file(path, ("rgb", "audio"), (16, 4), 30))
    nat_videos = list(native.read_frame_file(path, ("rgb", "audio"), (16, 4), 30))
    assert len(py_videos) == len(nat_videos) == len(truth)
    for pv, nv in zip(py_videos, nat_videos):
        assert pv.video_id == nv.video_id
        assert pv.labels == nv.labels
        assert pv.num_frames == nv.num_frames
        # native returns padded [max_frames, total]; python returns true rows
        np.testing.assert_array_equal(nv.features[: pv.num_frames], pv.features)
        assert np.all(nv.features[pv.num_frames :] == 0)


def test_native_with_crc_verification(shard):
    path, truth = shard
    videos = list(native.read_frame_file(path, ("rgb", "audio"), (16, 4), 30,
                                         verify_crc=True))
    assert len(videos) == len(truth)


def test_native_truncates_at_max_frames(shard):
    path, truth = shard
    videos = list(native.read_frame_file(path, ("rgb", "audio"), (16, 4),
                                         max_frames=5))
    for v, t in zip(videos, truth):
        assert v.num_frames == min(t.num_frames, 5)
        np.testing.assert_array_equal(v.features[:5], t.features[:5])


def test_loader_uses_native(shard):
    path, truth = shard
    loader = FrameDataLoader(
        path, batch_size=6, feature_names=("rgb", "audio"),
        feature_sizes=(16, 4), max_frames=30, vocab_size=100, num_epochs=1,
        shuffle=False, use_native=True)
    assert loader._native is not None
    seen = sum(len(b.video_ids) - b.pad for b in loader)
    assert seen == len(truth)


def test_native_is_faster_than_python(tmp_path):
    """Sanity throughput check (not a benchmark): native >= python."""
    path = str(tmp_path / "perf.tfrecord")
    write_synthetic_frame_shard(path, num_videos=60, seed=1,
                                feature_names=("rgb", "audio"),
                                feature_sizes=(1024, 128), max_frames=300,
                                vocab_size=4716)
    # warm both paths (page cache + lazy init)
    sum(1 for _ in native.read_frame_file(path))
    sum(1 for _ in read_frame_file(path))
    t0 = time.perf_counter()
    n_nat = sum(1 for _ in native.read_frame_file(path))
    t_nat = time.perf_counter() - t0
    t0 = time.perf_counter()
    n_py = sum(1 for _ in read_frame_file(path))
    t_py = time.perf_counter() - t0
    assert n_nat == n_py == 60
    assert t_nat < t_py


def test_native_stride_matches_python_stride(shard):
    """Parser-level frame stride (the student paths' every_n): the C++
    parser decodes only every stride-th frame; rows equal the Python
    parse strided with [::stride], num_frames stays the ORIGINAL count,
    and padding rows are zero."""
    path, truth = shard
    for stride in (2, 3, 7):
        out_rows = (30 + stride - 1) // stride
        py_videos = list(read_frame_file(path, ("rgb", "audio"), (16, 4), 30))
        nat_videos = list(native.read_frame_file(
            path, ("rgb", "audio"), (16, 4), 30, stride=stride))
        assert len(py_videos) == len(nat_videos)
        for pv, nv in zip(py_videos, nat_videos):
            assert nv.features.shape == (out_rows, 20)
            assert nv.num_frames == pv.num_frames  # original count
            want = pv.features[::stride]
            np.testing.assert_array_equal(nv.features[: want.shape[0]], want)
            assert np.all(nv.features[want.shape[0]:] == 0)


def test_loader_frame_stride_matches_host_subsample(shard):
    """FrameDataLoader(frame_stride=e) batches equal striding the
    full-frame batches on the host — for BOTH parser backends."""
    from efficientvideoclassification_youtube8m_tpu.data.loader import (
        FrameDataLoader,
    )
    from efficientvideoclassification_youtube8m_tpu.ops.preprocess import (
        host_subsample,
    )

    path, _ = shard
    for use_native in (True, False):
        kw = dict(
            batch_size=5, feature_names=("rgb", "audio"),
            feature_sizes=(16, 4), max_frames=30, vocab_size=100,
            num_epochs=1, shuffle=False, pad_final_batch=True,
            use_native=use_native,
        )
        full = list(FrameDataLoader(path, **kw))
        strided = list(FrameDataLoader(path, frame_stride=3, **kw))
        assert len(full) == len(strided)
        for fb, sb in zip(full, strided):
            assert sb.features.shape[1] == 10  # ceil(30 / 3)
            np.testing.assert_array_equal(
                sb.features, host_subsample(fb.features, 3))
            np.testing.assert_array_equal(sb.num_frames, fb.num_frames)
            np.testing.assert_array_equal(sb.labels, fb.labels)
            assert sb.pad == fb.pad


def _drain_native(path, **kw):
    return list(native.read_frame_file(path, ("rgb", "audio"), (16, 4), 30,
                                       **kw))


def test_native_rejects_implausible_record_length(shard, tmp_path):
    """A corrupt 8-byte length header is UNTRUSTED input: it must surface
    as IOError, not a multi-exabyte resize whose C++ exception would
    cross the ctypes frame and terminate the process."""
    path, _ = shard
    data = bytearray(open(path, "rb").read())
    for huge in ((1 << 63) | 12345, (1 << 40), (1 << 30) + 1):
        bad = bytearray(data)
        bad[0:8] = int(huge).to_bytes(8, "little")
        p = str(tmp_path / f"huge_{huge % 97}.tfrecord")
        open(p, "wb").write(bytes(bad))
        with pytest.raises(IOError, match="implausible|allocation"):
            _drain_native(p)


def test_native_fuzz_corrupted_shards_never_crash(shard, tmp_path):
    """Random truncations, byte flips, and zeroed spans over a valid
    shard: the native parser must either finish (possibly with garbled
    videos — CRC checks are off by default, like TF's reader) or raise
    IOError. Anything else (segfault, terminate, hang) fails the suite
    by killing it."""
    path, _ = shard
    data = open(path, "rb").read()
    rng = np.random.default_rng(13)
    cases = []
    for _ in range(10):  # truncation
        cases.append(data[: int(rng.integers(0, len(data)))])
    for _ in range(15):  # byte flips (1-8 per case)
        bad = bytearray(data)
        for _ in range(int(rng.integers(1, 9))):
            i = int(rng.integers(0, len(bad)))
            bad[i] ^= int(rng.integers(1, 256))
        cases.append(bytes(bad))
    for _ in range(10):  # zeroed span
        bad = bytearray(data)
        i = int(rng.integers(0, len(bad)))
        j = min(len(bad), i + int(rng.integers(1, 4096)))
        bad[i:j] = bytes(j - i)
        cases.append(bytes(bad))
    for n, case in enumerate(cases):
        p = str(tmp_path / f"fuzz_{n}.tfrecord")
        open(p, "wb").write(case)
        try:
            _drain_native(p)
            _drain_native(p, verify_crc=True)
        except IOError:
            pass


def test_native_crc_verification_catches_payload_flip(shard, tmp_path):
    path, _ = shard
    data = bytearray(open(path, "rb").read())
    data[20] ^= 0xFF  # inside the first record's payload
    p = str(tmp_path / "flip.tfrecord")
    open(p, "wb").write(bytes(data))
    with pytest.raises(IOError, match="crc"):
        _drain_native(p, verify_crc=True)


def test_native_label_count_bounded(tmp_path):
    """A record packing an absurd number of int64 labels must not
    balloon memory OR silently truncate (truncation would diverge from
    the pure-Python parser): the parser reports the true count and the
    binding raises IOError when it exceeds labels_cap (r5 — no real
    video carries more distinct labels than the vocabulary; the loader
    sizes the cap accordingly)."""
    from efficientvideoclassification_youtube8m_tpu.data.tfrecord import (
        TFRecordWriter,
    )
    from efficientvideoclassification_youtube8m_tpu.data.yt8m import (
        encode_frame_record,
    )

    feats = np.zeros((2, 20), np.uint8)
    rec = encode_frame_record("v0", [0, 1, 2], feats,
                              feature_names=("rgb", "audio"),
                              feature_sizes=(16, 4))
    # a record carrying 200k int64 labels (well past any real vocab)
    rec_many = encode_frame_record("vbig", [1] * 200_000, feats,
                                   feature_names=("rgb", "audio"),
                                   feature_sizes=(16, 4))
    p = str(tmp_path / "labels.tfrecord")
    with TFRecordWriter(p) as w:
        w.write(rec_many)
        w.write(rec)
    with pytest.raises(IOError, match="labels_cap"):
        _drain_native(p)
    # a clean shard with the same features still parses fine
    p2 = str(tmp_path / "ok.tfrecord")
    with TFRecordWriter(p2) as w:
        w.write(rec)
    videos = _drain_native(p2)
    assert len(videos) == 1 and videos[0].labels == [0, 1, 2]


def test_both_parsers_reject_missized_frame_payload(tmp_path):
    """A frame byte-string of the wrong length whose TOTAL still divides
    by the feature size must raise on BOTH parser backends — the Python
    parser's reshape(-1, size) would otherwise silently shift every
    later frame's columns (4 x 8-byte 'rgb' frames reshape to 2 x 16
    garbage rows) while the native parser raised, i.e. different ground
    truth by compiler availability."""
    from efficientvideoclassification_youtube8m_tpu.data import proto
    from efficientvideoclassification_youtube8m_tpu.data.tfrecord import (
        TFRecordWriter,
    )
    from efficientvideoclassification_youtube8m_tpu.data.yt8m import (
        parse_frame_record,
    )

    context = {"id": ("bytes", [b"bad0"]), "labels": ("int64", [1])}
    feature_lists = {
        # rgb frames carry 8 bytes each instead of 16 (total 32 = 2*16)
        "rgb": [("bytes", [bytes(8)]) for _ in range(4)],
        "audio": [("bytes", [bytes(4)]) for _ in range(2)],
    }
    rec = proto.encode_sequence_example(context, feature_lists)
    with pytest.raises(ValueError, match="size mismatch"):
        parse_frame_record(rec, ("rgb", "audio"), (16, 4), 30)
    path = str(tmp_path / "missized.tfrecord")
    with TFRecordWriter(path) as w:
        w.write(rec)
    with pytest.raises(IOError, match="size mismatch"):
        list(native.read_frame_file(path, ("rgb", "audio"), (16, 4), 30))
