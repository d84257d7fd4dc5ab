from efficientvideoclassification_youtube8m_tpu.data.loader import (
    AggregatedBatch,
    AggregatedDataLoader,
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
    write_synthetic_aggregated_shard,
    FrameVideo,
    encode_aggregated_record,
    encode_frame_record,
    parse_aggregated_record,
    parse_frame_record,
    read_frame_file,
    write_synthetic_frame_shard,
)

__all__ = [
    "AggregatedBatch",
    "AggregatedDataLoader",
    "write_synthetic_aggregated_shard",
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
