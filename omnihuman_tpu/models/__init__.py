from omnihuman_tpu.models.wan_dit import (
    init_wan_model,
    sinusoidal_embedding_1d,
    wan_model_forward,
)

__all__ = ["init_wan_model", "wan_model_forward", "sinusoidal_embedding_1d"]
