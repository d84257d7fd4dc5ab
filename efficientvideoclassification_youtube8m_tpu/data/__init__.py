from efficientvideoclassification_youtube8m_tpu.data.loader import (
    FrameBatch,
    FrameDataLoader,
)
from efficientvideoclassification_youtube8m_tpu.data.tfrecord import (
    TFRecordReader,
    TFRecordWriter,
    crc32c,
    masked_crc32c,
)
from efficientvideoclassification_youtube8m_tpu.data.yt8m import (
    AggregatedVideo,
    FrameVideo,
    encode_aggregated_record,
    encode_frame_record,
    parse_aggregated_record,
    parse_frame_record,
    read_frame_file,
    write_synthetic_frame_shard,
)

__all__ = [
    "FrameBatch",
    "FrameDataLoader",
    "TFRecordReader",
    "TFRecordWriter",
    "crc32c",
    "masked_crc32c",
    "AggregatedVideo",
    "FrameVideo",
    "encode_aggregated_record",
    "encode_frame_record",
    "parse_aggregated_record",
    "parse_frame_record",
    "read_frame_file",
    "write_synthetic_frame_shard",
]
