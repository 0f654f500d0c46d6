from omnihuman_tpu.omni.model import (
    OmniModelConfig,
    init_omni_model,
    omni_model_forward,
)

__all__ = ["OmniModelConfig", "init_omni_model", "omni_model_forward"]
