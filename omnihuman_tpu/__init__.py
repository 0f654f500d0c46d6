"""omnihuman_tpu — TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of johndpope/OmniHuman-1-hack.

Subpackages
-----------
configs    : named model registry (t2v-1.3B / t2v-14B / i2v-14B / ...)
ops        : Pallas flash attention, 3D RoPE, norms, causal convs
models     : Wan DiT denoiser, 3D causal VAE, umT5 encoder, CLIP encoder
samplers   : flow-matching UniPC / DPM-Solver++ step functions
pipelines  : text2video / image2video / one-step APT inference
parallel   : device mesh + sharding rules ((data, fsdp, sp) axes)
apt        : Seaweed-APT stack (teacher data, distillation, GAN, f-distill)
omni       : OmniHuman conditioning, 3-stage trainer, dataset, evaluation
utils      : logging, checkpointing, media IO, torch-weight conversion
"""

__version__ = "0.1.0"
