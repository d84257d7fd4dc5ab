"""Data layer tests: proto wire round-trips, TFRecord framing + CRC32C,
YT8M record round-trips, and the threaded loader."""

import os
import zlib

import numpy as np
import pytest

from efficientvideoclassification_youtube8m_tpu.data import (
    FrameDataLoader,
    TFRecordReader,
    TFRecordWriter,
    crc32c,
    encode_aggregated_record,
    encode_frame_record,
    masked_crc32c,
    parse_aggregated_record,
    parse_frame_record,
    write_synthetic_frame_shard,
)
from efficientvideoclassification_youtube8m_tpu.data import proto


# ---------------------------------------------------------------------------
# CRC32C (known vectors from RFC 3720 / public test suites)
# ---------------------------------------------------------------------------

def test_crc32c_known_vectors():
    assert crc32c(b"") == 0x0
    assert crc32c(b"a") == 0xC1D04330
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(bytes(32)) == 0x8A9136AA
    assert crc32c(bytes([0xFF] * 32)) == 0x62A8AB43


def test_masked_crc_roundtrip():
    from efficientvideoclassification_youtube8m_tpu.data.tfrecord import unmask_crc32c

    for data in [b"", b"hello", bytes(100)]:
        m = masked_crc32c(data)
        assert unmask_crc32c(m) == crc32c(data)


# ---------------------------------------------------------------------------
# proto wire format
# ---------------------------------------------------------------------------

def test_varint_roundtrip():
    for v in [0, 1, 127, 128, 300, 2**32, 2**63 - 1]:
        buf = proto.write_varint(v)
        got, pos = proto.read_varint(buf, 0)
        assert got == v and pos == len(buf)


def test_feature_roundtrip():
    for kind, values in [
        ("bytes", [b"abc", b"", b"\x00\xff"]),
        ("float", [0.0, 1.5, -2.25]),
        ("int64", [0, 1, -1, 2**40, -(2**40)]),
    ]:
        buf = proto.encode_feature(kind, values)
        # encode_feature wraps in a Feature message; decode it directly
        k, vals = proto.decode_feature(memoryview(buf))
        assert k == kind
        if kind == "float":
            np.testing.assert_allclose(vals, values, rtol=1e-6)
        else:
            assert vals == values


def test_sequence_example_roundtrip():
    context = {
        "id": ("bytes", [b"video123"]),
        "labels": ("int64", [5, 17, 4000]),
    }
    fl = {
        "rgb": [("bytes", [bytes(range(10))]), ("bytes", [bytes(range(10, 20))])],
    }
    buf = proto.encode_sequence_example(context, fl)
    ctx, lists = proto.decode_sequence_example(buf)
    assert ctx["id"] == ("bytes", [b"video123"])
    assert ctx["labels"] == ("int64", [5, 17, 4000])
    assert lists["rgb"][0] == ("bytes", [bytes(range(10))])
    assert lists["rgb"][1] == ("bytes", [bytes(range(10, 20))])


def test_wire_compat_against_protobuf_lib():
    """Cross-check our encoder against the installed google.protobuf
    decoder using a dynamically-built descriptor of Example."""
    pb = pytest.importorskip("google.protobuf")
    from google.protobuf import descriptor_pb2, descriptor_pool, message_factory

    pool = descriptor_pool.DescriptorPool()
    fdp = descriptor_pb2.FileDescriptorProto()
    fdp.name = "tfx.proto"
    fdp.package = "tfx"
    for name, fields in {
        "BytesList": [("value", 12, 3)],  # bytes, repeated
        "FloatList": [("value", 2, 3)],  # float, repeated
        "Int64List": [("value", 3, 3)],  # int64, repeated
    }.items():
        m = fdp.message_type.add()
        m.name = name
        for fname, ftype, flabel in fields:
            f = m.field.add()
            f.name, f.number, f.type, f.label = fname, 1, ftype, flabel
    feat = fdp.message_type.add()
    feat.name = "Feature"
    for i, (fname, tname) in enumerate(
        [("bytes_list", "BytesList"), ("float_list", "FloatList"),
         ("int64_list", "Int64List")], start=1):
        f = feat.field.add()
        f.name, f.number, f.type, f.label = fname, i, 11, 1
        f.type_name = f".tfx.{tname}"
    pool.Add(fdp)
    factory = message_factory.GetMessageClass(pool.FindMessageTypeByName("tfx.Feature"))

    buf = proto.encode_feature("int64", [1, 2, 300000])
    msg = factory.FromString(bytes(buf))
    assert list(msg.int64_list.value) == [1, 2, 300000]

    buf = proto.encode_feature("float", [1.5, -2.0])
    msg = factory.FromString(bytes(buf))
    np.testing.assert_allclose(list(msg.float_list.value), [1.5, -2.0])


# ---------------------------------------------------------------------------
# TFRecord framing
# ---------------------------------------------------------------------------

def test_tfrecord_roundtrip(tmp_path):
    path = str(tmp_path / "test.tfrecord")
    records = [b"first", b"", b"x" * 1000]
    with TFRecordWriter(path) as w:
        for r in records:
            w.write(r)
    got = list(TFRecordReader(path, verify_crc=True))
    assert got == records


def test_tfrecord_detects_corruption(tmp_path):
    path = str(tmp_path / "bad.tfrecord")
    with TFRecordWriter(path) as w:
        w.write(b"hello world")
    data = bytearray(open(path, "rb").read())
    data[14] ^= 0xFF  # flip a payload byte
    open(path, "wb").write(bytes(data))
    with pytest.raises(IOError):
        list(TFRecordReader(path, verify_crc=True))


# ---------------------------------------------------------------------------
# YT8M records
# ---------------------------------------------------------------------------

def test_frame_record_roundtrip():
    rng = np.random.default_rng(0)
    feats = rng.integers(0, 256, size=(7, 12), dtype=np.uint8)
    buf = encode_frame_record("vidA", [3, 99], feats,
                              feature_names=("rgb", "audio"),
                              feature_sizes=(8, 4))
    v = parse_frame_record(buf, ("rgb", "audio"), (8, 4), max_frames=300)
    assert v.video_id == "vidA"
    assert v.labels == [3, 99]
    assert v.num_frames == 7
    np.testing.assert_array_equal(v.features, feats)


def test_frame_record_truncates_at_max_frames():
    feats = np.arange(20 * 4, dtype=np.uint8).reshape(20, 4)
    buf = encode_frame_record("v", [1], feats, ("rgb",), (4,))
    v = parse_frame_record(buf, ("rgb",), (4,), max_frames=10)
    assert v.num_frames == 10
    np.testing.assert_array_equal(v.features, feats[:10])


def test_aggregated_record_roundtrip():
    feats = np.linspace(-1, 1, 12).astype(np.float32)
    buf = encode_aggregated_record("agg1", [7], feats,
                                   ("mean_rgb", "mean_audio"), (8, 4))
    v = parse_aggregated_record(buf, ("mean_rgb", "mean_audio"), (8, 4))
    assert v.video_id == "agg1"
    assert v.labels == [7]
    np.testing.assert_allclose(v.features, feats, rtol=1e-6)


# ---------------------------------------------------------------------------
# loader
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def shard_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("shards")
    truths = {}
    for s in range(2):
        path = str(d / f"train-{s:04d}.tfrecord")
        truths[path] = write_synthetic_frame_shard(
            path, num_videos=13, seed=s, feature_names=("rgb", "audio"),
            feature_sizes=(6, 2), max_frames=20, vocab_size=40)
    return d, truths


def test_loader_sees_every_video_once(shard_dir):
    d, truths = shard_dir
    loader = FrameDataLoader(
        str(d / "*.tfrecord"), batch_size=4, feature_names=("rgb", "audio"),
        feature_sizes=(6, 2), max_frames=20, vocab_size=40, num_epochs=1,
        shuffle=True, num_readers=2, use_native=False)
    seen = []
    for batch in loader:
        assert batch.features.shape[1:] == (20, 8)
        assert batch.features.dtype == np.uint8
        seen.extend(batch.video_ids[: len(batch.video_ids) - batch.pad])
    all_ids = [v.video_id for t in truths.values() for v in t]
    assert sorted(seen) == sorted(all_ids)


def test_loader_content_matches_truth(shard_dir):
    d, truths = shard_dir
    loader = FrameDataLoader(
        str(d / "*.tfrecord"), batch_size=5, feature_names=("rgb", "audio"),
        feature_sizes=(6, 2), max_frames=20, vocab_size=40, num_epochs=1,
        shuffle=False, num_readers=1, use_native=False)
    truth_by_id = {v.video_id: v for t in truths.values() for v in t}
    count = 0
    for batch in loader:
        for i, vid in enumerate(batch.video_ids):
            t = truth_by_id[vid]
            nf = batch.num_frames[i]
            assert nf == t.num_frames
            np.testing.assert_array_equal(batch.features[i, :nf], t.features[:nf])
            assert np.all(batch.features[i, nf:] == 0)  # zero padding
            np.testing.assert_array_equal(
                np.nonzero(batch.labels[i])[0], np.asarray(t.labels))
            count += 1
    assert count == len(truth_by_id)


def test_loader_pad_final_batch(shard_dir):
    d, _ = shard_dir
    loader = FrameDataLoader(
        str(d / "*.tfrecord"), batch_size=4, feature_names=("rgb", "audio"),
        feature_sizes=(6, 2), max_frames=20, vocab_size=40, num_epochs=1,
        shuffle=False, pad_final_batch=True, use_native=False)
    batches = list(loader)
    assert all(b.features.shape[0] == 4 for b in batches)
    total = sum(len(b.video_ids) - b.pad for b in batches)
    assert total == 26
    assert batches[-1].pad == (4 - 26 % 4) % 4


def test_loader_sharding(shard_dir):
    d, truths = shard_dir
    ids = []
    for shard_index in range(2):
        loader = FrameDataLoader(
            str(d / "*.tfrecord"), batch_size=4, feature_names=("rgb", "audio"),
            feature_sizes=(6, 2), max_frames=20, vocab_size=40, num_epochs=1,
            shuffle=False, shard_index=shard_index, num_shards=2,
            use_native=False)
        ids.append(sorted(
            vid for b in loader for vid in b.video_ids[: len(b.video_ids) - b.pad]
        ))
    assert not (set(ids[0]) & set(ids[1]))
    all_ids = sorted(v.video_id for t in truths.values() for v in t)
    assert sorted(ids[0] + ids[1]) == all_ids


def test_loader_deterministic_multireader(tmp_path):
    """deterministic=True: the multi-reader batch stream is EXACTLY the
    single-reader stream (round-robin file dispatch + in-order drain),
    and identical across re-iterations — batch composition no longer
    depends on thread timing. Shards have UNEVEN sizes so work-stealing
    order would genuinely diverge."""
    for s, n in enumerate([3, 17, 1, 9]):
        write_synthetic_frame_shard(
            str(tmp_path / f"train-{s:04d}.tfrecord"), num_videos=n, seed=s,
            feature_names=("rgb", "audio"), feature_sizes=(6, 2),
            max_frames=20, vocab_size=40)

    def stream(num_readers, deterministic, shuffle):
        loader = FrameDataLoader(
            str(tmp_path / "*.tfrecord"), batch_size=4,
            feature_names=("rgb", "audio"), feature_sizes=(6, 2),
            max_frames=20, vocab_size=40, num_epochs=2, seed=11,
            shuffle=shuffle, num_readers=num_readers,
            deterministic=deterministic, use_native=False)
        return [tuple(b.video_ids) for b in loader]

    for shuffle in (False, True):
        single = stream(1, False, shuffle)
        det3 = stream(3, True, shuffle)
        assert det3 == single, (shuffle, det3[:3], single[:3])
        # more readers than files + re-iteration stability
        assert stream(7, True, shuffle) == single
        assert stream(3, True, shuffle) == det3


def test_deterministic_input_training_replays_bit_identical(tmp_path):
    """--deterministic_input end-to-end guarantee: two cli.train runs
    over the same shards with MULTIPLE reader threads produce
    byte-identical checkpoints (same batches in the same order through
    the same compiled program)."""
    from efficientvideoclassification_youtube8m_tpu.cli import train as train_cli
    from efficientvideoclassification_youtube8m_tpu.train import latest_checkpoint

    for s, n in enumerate([5, 19, 8]):
        write_synthetic_frame_shard(
            str(tmp_path / f"train-{s:04d}.tfrecord"), num_videos=n, seed=s,
            feature_names=("rgb", "audio"), feature_sizes=(6, 2),
            max_frames=40, vocab_size=30)
    ckpts = []
    for run in ("a", "b"):
        train_dir = str(tmp_path / f"model_{run}") + "/"
        train_cli.main([
            "--num_classes", "30", "--batch_size", "8", "--lstm_cells", "8",
            "--lstm_layers", "2", "--max_num_frames", "40",
            "--num_inputs_to_lstm", "4", "--num_inputs_L1", "2",
            "--every_n", "2", "--feature_names", "rgb, audio",
            "--feature_sizes", "6, 2", "--compute_dtype", "float32",
            "--scan_unroll", "1", "--top_k", "5", "--num_epochs", "2",
            "--num_readers", "3", "--deterministic_input", "true",
            "--train_dir", train_dir,
            "--train_data_pattern", str(tmp_path / "train-*.tfrecord"),
            "--start_new_model", "true",
        ])
        with open(latest_checkpoint(train_dir), "rb") as f:
            ckpts.append(f.read())
    assert ckpts[0] == ckpts[1]


def test_loader_deterministic_propagates_parse_errors(tmp_path):
    write_synthetic_frame_shard(
        str(tmp_path / "train-0000.tfrecord"), num_videos=3, seed=0,
        feature_names=("rgb", "audio"), feature_sizes=(6, 2),
        max_frames=20, vocab_size=40)
    with open(tmp_path / "train-0001.tfrecord", "wb") as f:
        f.write(b"\x13garbage not a tfrecord")
    loader = FrameDataLoader(
        str(tmp_path / "*.tfrecord"), batch_size=4,
        feature_names=("rgb", "audio"), feature_sizes=(6, 2),
        max_frames=20, vocab_size=40, num_epochs=1, shuffle=False,
        num_readers=2, deterministic=True, use_native=False)
    with pytest.raises(Exception):
        list(loader)


def test_loader_missing_files():
    with pytest.raises(IOError):
        FrameDataLoader("/nonexistent/*.tfrecord", batch_size=4)


def test_loader_infinite_epochs(shard_dir):
    """num_epochs=None cycles forever (string_input_producer semantics)."""
    d, truths = shard_dir
    total = sum(len(t) for t in truths.values())
    loader = FrameDataLoader(
        str(d / "*.tfrecord"), batch_size=4, feature_names=("rgb", "audio"),
        feature_sizes=(6, 2), max_frames=20, vocab_size=40, num_epochs=None,
        shuffle=True, num_readers=1, use_native=False)
    it = iter(loader)
    seen = 0
    for _ in range(2 * total // 4 + 2):  # more than two epochs of batches
        batch = next(it)
        seen += len(batch.video_ids) - batch.pad
    assert seen > total  # wrapped past one epoch


def test_step_timer():
    from efficientvideoclassification_youtube8m_tpu.utils.profiling import (
        StepTimer,
    )

    t = StepTimer(window=3)
    assert t.stats() == {}
    for _ in range(5):
        t.start()
        t.stop(examples=10)
    stats = t.stats()
    assert set(stats) == {"p50_ms", "p90_ms", "mean_ms"}
    assert len(t._times) == 3


def test_dequantize_bit_identical_formula():
    """utils.Dequantize (reference utils.py:Dequantize): with
    max=2, min=-2 the formula is x * range/255 + (range/512 + min)
    = x*(4/255) + (4/512 - 2). Pinned bit-for-bit over all 256 bytes."""
    import jax.numpy as jnp

    from efficientvideoclassification_youtube8m_tpu.ops.preprocess import (
        dequantize,
    )

    x = np.arange(256, dtype=np.uint8)
    got = np.asarray(dequantize(jnp.asarray(x)))
    want = (x.astype(np.float32) * np.float32(4.0 / 255.0)
            + (np.float32(4.0 / 512.0) - np.float32(2.0)))
    np.testing.assert_array_equal(got, want)
    assert got.dtype == np.float32


def test_native_parser_many_labels_parity_and_overflow(tmp_path):
    """A record with more labels than the old 64 cap: the native parser
    must return ALL of them (parity with the pure-Python parser — the
    loader sizes labels_cap to the vocabulary), and an explicitly tiny
    cap must RAISE instead of silently truncating."""
    from efficientvideoclassification_youtube8m_tpu.data import native
    from efficientvideoclassification_youtube8m_tpu.data.loader import (
        FrameDataLoader,
    )
    from efficientvideoclassification_youtube8m_tpu.data.tfrecord import (
        TFRecordWriter,
    )

    if not native.available():
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(0)
    many = sorted(rng.choice(200, size=100, replace=False).tolist())
    feats = rng.integers(0, 256, size=(5, 12), dtype=np.uint8)
    path = str(tmp_path / "many-0000.tfrecord")
    with TFRecordWriter(path) as w:
        w.write(encode_frame_record("v0", many, feats,
                                    feature_names=("rgb", "audio"),
                                    feature_sizes=(8, 4)))

    got = list(native.read_frame_file(
        path, ("rgb", "audio"), (8, 4), max_frames=10, labels_cap=200))
    assert sorted(got[0].labels) == many  # nothing dropped

    with pytest.raises(IOError, match="labels_cap"):
        list(native.read_frame_file(
            path, ("rgb", "audio"), (8, 4), max_frames=10, labels_cap=64))

    # the loader path end-to-end: vocab-sized cap, full label row
    loader = FrameDataLoader(
        str(tmp_path / "many-*.tfrecord"), batch_size=1,
        feature_names=("rgb", "audio"), feature_sizes=(8, 4),
        max_frames=10, vocab_size=200, num_epochs=1, shuffle=False,
        num_readers=1)
    batch = next(iter(loader))
    assert int(batch.labels[0].sum()) == 100


def test_aggregated_misaligned_feature_lengths_raise():
    """Per-feature value counts are validated: wrong lengths that happen
    to sum to the total would otherwise concatenate into silently
    misaligned columns."""
    from efficientvideoclassification_youtube8m_tpu.data.yt8m import (
        encode_aggregated_record,
        parse_aggregated_record,
    )

    rng = np.random.default_rng(1)
    # encode with sizes (10, 2) but parse expecting (8, 4): same total
    buf = encode_aggregated_record(
        "v", [1], rng.normal(size=12).astype(np.float32),
        feature_names=("mean_rgb", "mean_audio"), feature_sizes=(10, 2))
    with pytest.raises(IOError, match="mean_rgb"):
        parse_aggregated_record(buf, ("mean_rgb", "mean_audio"), (8, 4))


def test_shuffle_buffer_smaller_than_batch_is_clamped(shard_dir):
    """shuffle_buffer < batch_size must not produce undersized batches
    mid-stream (the jitted step's shapes are static)."""
    from efficientvideoclassification_youtube8m_tpu.data.loader import (
        FrameDataLoader,
    )

    d, _ = shard_dir
    loader = FrameDataLoader(
        str(d / "train-*.tfrecord"), batch_size=8,
        feature_names=("rgb", "audio"), feature_sizes=(6, 2),
        max_frames=20, vocab_size=40, num_epochs=1, shuffle=True,
        shuffle_buffer=2, num_readers=1, seed=7)
    sizes = [b.features.shape[0] - b.pad for b in loader]
    assert all(s == 8 for s in sizes[:-1]), sizes  # only the tail short


def test_abandoned_loader_iterator_unwinds_reader_threads(shard_dir):
    """Dropping a loader iterator mid-epoch must not leave reader
    threads parked on a full queue pinning parsed videos for the
    process lifetime."""
    import threading
    import time as _time

    from efficientvideoclassification_youtube8m_tpu.data.loader import (
        FrameDataLoader,
    )

    d, _ = shard_dir
    baseline = threading.active_count()
    for deterministic in (False, True):
        loader = FrameDataLoader(
            str(d / "train-*.tfrecord"), batch_size=2,
            feature_names=("rgb", "audio"), feature_sizes=(6, 2),
            max_frames=20, vocab_size=40, num_epochs=None,  # infinite
            shuffle=False, num_readers=2, deterministic=deterministic)
        it = iter(loader)
        next(it)
        assert threading.active_count() > baseline
        it.close()  # GeneratorExit -> stop event -> readers drain out
        del it, loader
        deadline = _time.time() + 10
        while threading.active_count() > baseline and _time.time() < deadline:
            _time.sleep(0.05)
        assert threading.active_count() == baseline, (
            deterministic, threading.active_count(), baseline)


def test_native_perm_validator_leaves_global_rng_alone():
    """The one-time C-permutation self-check must not perturb the
    process-global random module state (the module's own contract)."""
    import random

    from efficientvideoclassification_youtube8m_tpu.data import native
    from efficientvideoclassification_youtube8m_tpu.metrics import (
        average_precision as ap,
    )

    if not native.available():
        pytest.skip("no native toolchain")
    random.seed(123)
    want = [random.random() for _ in range(4)]
    random.seed(123)
    ap._PERM_VALIDATED[0] = None  # force the validator to re-run
    assert ap._native_perm_ok(native)
    got = [random.random() for _ in range(4)]
    assert got == want


def test_decode_feature_merge_semantics():
    """Proto merge semantics like a real protobuf parser: repeated
    occurrences of the same list field concatenate (legal chunked wire
    encoding), and the kind oneof takes the LAST member present."""
    import struct

    from efficientvideoclassification_youtube8m_tpu.data.proto import (
        decode_feature,
        write_varint,
    )

    def ld(num, payload):
        return write_varint((num << 3) | 2) + write_varint(len(payload)) + payload

    def float_list(vals):
        packed = struct.pack(f"<{len(vals)}f", *vals)
        return ld(1, packed)

    # FloatList split into two field-2 occurrences -> values concatenate
    chunked = ld(2, float_list([1.0, 2.0])) + ld(2, float_list([3.0]))
    kind, vals = decode_feature(chunked)
    assert kind == "float" and vals == [1.0, 2.0, 3.0]

    # oneof: bytes_list then float_list -> last wins
    both = ld(1, ld(1, b"abc")) + ld(2, float_list([7.0]))
    kind, vals = decode_feature(both)
    assert kind == "float" and vals == [7.0]
    # ...and in the opposite order the bytes win
    kind, vals = decode_feature(ld(2, float_list([7.0])) + ld(1, ld(1, b"abc")))
    assert kind == "bytes" and vals == [b"abc"]
