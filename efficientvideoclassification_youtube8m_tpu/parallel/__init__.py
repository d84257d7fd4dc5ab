from efficientvideoclassification_youtube8m_tpu.parallel import distributed
from efficientvideoclassification_youtube8m_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    create_mesh,
    device_prefetch,
    make_params_specs,
    shard_batch,
    shard_state_specs,
    to_named,
)
from efficientvideoclassification_youtube8m_tpu.parallel.sequence_parallel import (
    build_sequence_parallel_state_fn,
)
from efficientvideoclassification_youtube8m_tpu.parallel.sharded_step import (
    build_shardmap_distill_step,
    build_shardmap_eval_step,
    build_shardmap_finetune_step,
    build_sharded_distill_step,
    build_sharded_eval_step,
    build_sharded_finetune_step,
    build_sharded_quantized_eval_step,
    build_sharded_validate_step,
    place_fields,
    place_state,
    state_sharding,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "create_mesh",
    "device_prefetch",
    "make_params_specs",
    "shard_batch",
    "distributed",
    "shard_state_specs",
    "to_named",
    "build_sequence_parallel_state_fn",
    "build_shardmap_distill_step",
    "build_shardmap_eval_step",
    "build_shardmap_finetune_step",
    "build_sharded_distill_step",
    "build_sharded_eval_step",
    "build_sharded_finetune_step",
    "build_sharded_quantized_eval_step",
    "build_sharded_validate_step",
    "place_fields",
    "place_state",
    "state_sharding",
]
