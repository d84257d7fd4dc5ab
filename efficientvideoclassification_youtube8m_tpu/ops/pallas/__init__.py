from efficientvideoclassification_youtube8m_tpu.ops.pallas.lstm_scan import (
    lstm_chunk_scan_pallas,
    lstm_chunk_scan_pallas_int8,
    multi_lstm_scan_pallas,
)

__all__ = [
    "lstm_chunk_scan_pallas",
    "lstm_chunk_scan_pallas_int8",
    "multi_lstm_scan_pallas",
]
