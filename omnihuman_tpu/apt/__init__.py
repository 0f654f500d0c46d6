from omnihuman_tpu.apt.distill import (
    DistillState,
    distill_train_step,
    init_distill_state,
)

__all__ = ["DistillState", "init_distill_state", "distill_train_step"]
