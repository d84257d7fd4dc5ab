from efficientvideoclassification_youtube8m_tpu.utils.config import (
    TrainConfig,
    parse_feature_csv,
)

__all__ = ["TrainConfig", "parse_feature_csv"]
