from omnihuman_tpu.ops.norms import adaln_modulate, layer_norm, rms_norm
from omnihuman_tpu.ops.rope import Rope3D, apply_rope, rope_angles_3d
from omnihuman_tpu.ops.attention import attention, flash_attention

__all__ = [
    "rms_norm", "layer_norm", "adaln_modulate",
    "Rope3D", "rope_angles_3d", "apply_rope",
    "attention", "flash_attention",
]
