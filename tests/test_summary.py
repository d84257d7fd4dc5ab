"""Summary writer tests: event-file wire format (round-tripped through
our own proto parser) and the reference's log-line formats."""

import glob
import struct

import numpy as np

from efficientvideoclassification_youtube8m_tpu.data.proto import iter_fields
from efficientvideoclassification_youtube8m_tpu.data.tfrecord import TFRecordReader
from efficientvideoclassification_youtube8m_tpu.utils import summary as summary_lib


def _decode_event(buf):
    out = {"values": []}
    for fn, wt, v in iter_fields(buf):
        if fn == 1 and wt == 1:
            out["wall_time"] = struct.unpack("<d", bytes(v))[0]
        elif fn == 2 and wt == 0:
            out["step"] = v
        elif fn == 3 and wt == 2:
            out["file_version"] = bytes(v).decode()
        elif fn == 5 and wt == 2:
            for sfn, swt, sv in iter_fields(bytes(v)):
                if sfn == 1 and swt == 2:
                    tag, val = None, None
                    for vfn, vwt, vv in iter_fields(bytes(sv)):
                        if vfn == 1 and vwt == 2:
                            tag = bytes(vv).decode()
                        elif vfn == 2 and vwt == 5:
                            val = struct.unpack("<f", bytes(vv))[0]
                    out["values"].append((tag, val))
    return out


def test_event_file_roundtrip(tmp_path):
    w = summary_lib.SummaryWriter(str(tmp_path))
    w.scalar("model/Training_GAP", 0.75, global_step=42)
    w.scalar("Epoch/Eval_MAP", 0.5, global_step=42)
    w.close()
    files = glob.glob(str(tmp_path / "events.out.tfevents.*"))
    assert len(files) == 1
    events = [_decode_event(r) for r in TFRecordReader(files[0])]
    assert events[0]["file_version"] == "brain.Event:2"
    assert events[1]["step"] == 42
    assert events[1]["values"][0][0] == "model/Training_GAP"
    np.testing.assert_allclose(events[1]["values"][0][1], 0.75)
    assert events[2]["values"][0] == ("Epoch/Eval_MAP", 0.5)


def _decode_histo_event(buf):
    """(tag, histo dict) from an Event holding one histogram Value."""
    for fn, wt, v in iter_fields(buf):
        if fn == 5 and wt == 2:
            for sfn, swt, sv in iter_fields(bytes(v)):
                if sfn == 1 and swt == 2:
                    tag, histo = None, None
                    for vfn, vwt, vv in iter_fields(bytes(sv)):
                        if vfn == 1 and vwt == 2:
                            tag = bytes(vv).decode()
                        elif vfn == 5 and vwt == 2:  # Value.histo
                            histo = {}
                            for hfn, hwt, hv in iter_fields(bytes(vv)):
                                if hwt == 1:
                                    histo[hfn] = struct.unpack("<d", bytes(hv))[0]
                                elif hwt == 2:  # packed doubles
                                    histo[hfn] = np.frombuffer(
                                        bytes(hv), dtype="<f8")
                    return tag, histo
    return None, None


def test_histogram_event_wire_format(tmp_path):
    """SummaryWriter.histogram writes a TB-parseable HistogramProto:
    min/max/num/sum/sum_squares + collapsed bucket limits/counts whose
    counts sum to num (train.py:426-427 per-variable histograms)."""
    rng = np.random.default_rng(0)
    values = np.concatenate([rng.normal(size=500), [-3.5, 0.0, 7.25]])
    w = summary_lib.SummaryWriter(str(tmp_path))
    w.histogram("model/rnn_l1/0/kernel", values, global_step=11)
    w.close()
    files = glob.glob(str(tmp_path / "events.out.tfevents.*"))
    records = list(TFRecordReader(files[0]))
    tag, histo = _decode_histo_event(records[1])
    assert tag == "model/rnn_l1/0/kernel"
    np.testing.assert_allclose(histo[1], values.min())
    np.testing.assert_allclose(histo[2], values.max())
    np.testing.assert_allclose(histo[3], values.size)
    np.testing.assert_allclose(histo[4], values.sum())
    np.testing.assert_allclose(histo[5], np.square(values).sum())
    limits, counts = histo[6], histo[7]
    assert len(limits) == len(counts)
    np.testing.assert_allclose(counts.sum(), values.size)
    assert np.all(np.diff(limits) > 0)  # strictly increasing limits
    # every value lies within [first bucket's implied lower bound, last limit]
    assert values.max() <= limits[-1]


def test_write_variable_histograms(tmp_path):
    params = {"rnn_l1": [{"kernel": np.ones((4, 8)), "bias": np.zeros(8)}]}
    w = summary_lib.SummaryWriter(str(tmp_path))
    summary_lib.write_variable_histograms(w, params, "model", 5)
    w.close()
    files = glob.glob(str(tmp_path / "events.out.tfevents.*"))
    records = list(TFRecordReader(files[0]))
    tags = set()
    for r in records[1:]:
        tag, histo = _decode_histo_event(r)
        tags.add(tag)
        assert histo[3] in (32.0, 8.0)  # num elements
    assert tags == {"model/rnn_l1/0/kernel", "model/rnn_l1/0/bias"}


def test_global_step_log_format():
    """utils.py:74-78 format string parity."""
    info = {"hit_at_one": 0.5, "perr": 0.25, "loss": 3.141,
            "examples_per_second": 123.4}
    line = summary_lib.add_global_step_summary(None, 7, info, "Eval")
    assert line == ("global_step 7 | Batch Hit@1: 0.500 | Batch PERR: 0.250 "
                    "| Batch Loss: 3.141 | Examples_per_sec: 123.400")


def test_epoch_log_format():
    """utils.py:122-125 format string parity."""
    info = {"epoch_id": 3, "avg_hit_at_one": 0.9, "avg_perr": 0.8,
            "avg_loss": 1.5, "aps": [0.2, 0.4], "gap": 0.7}
    line = summary_lib.add_epoch_summary(None, 3, info, "Eval")
    assert line == ("epoch/eval number 3 | Avg_Hit@1: 0.900 | Avg_PERR: 0.800 "
                    "| MAP: 0.300 | GAP: 0.700 | Avg_Loss: 1.500000")
