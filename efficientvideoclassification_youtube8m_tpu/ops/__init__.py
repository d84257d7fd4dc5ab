from efficientvideoclassification_youtube8m_tpu.ops.lstm import (
    BasicLSTMCellParams,
    init_multi_lstm,
    lstm_cell_step,
    multi_lstm_scan,
)
from efficientvideoclassification_youtube8m_tpu.ops.preprocess import (
    dequantize,
    l2_normalize,
    resize_axis,
    uniform_subsample,
)

__all__ = [
    "BasicLSTMCellParams",
    "init_multi_lstm",
    "lstm_cell_step",
    "multi_lstm_scan",
    "dequantize",
    "l2_normalize",
    "resize_axis",
    "uniform_subsample",
]
