from efficientvideoclassification_youtube8m_tpu.train.checkpoint import (
    AsyncCheckpointSaver,
    latest_checkpoint,
    restore_checkpoint,
    restore_subtree,
    save_checkpoint,
)
from efficientvideoclassification_youtube8m_tpu.train.optimizer import (
    Optimizer,
    clip_grads_per_variable,
    exponential_decay,
    make_optimizer,
)
from efficientvideoclassification_youtube8m_tpu.train.state import (
    DistillState,
    StudentState,
    init_distill_state,
    student_state_from_distill,
)
from efficientvideoclassification_youtube8m_tpu.train.step import (
    build_distill_train_step,
    build_eval_step,
    build_finetune_step,
    build_validate_step,
    preprocess_batch,
)

__all__ = [
    "AsyncCheckpointSaver",
    "latest_checkpoint",
    "restore_checkpoint",
    "restore_subtree",
    "save_checkpoint",
    "Optimizer",
    "clip_grads_per_variable",
    "exponential_decay",
    "make_optimizer",
    "DistillState",
    "StudentState",
    "init_distill_state",
    "student_state_from_distill",
    "build_distill_train_step",
    "build_eval_step",
    "build_finetune_step",
    "build_validate_step",
    "preprocess_batch",
]
