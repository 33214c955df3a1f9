"""audio_motion_avatar_tpu — TPU-native audio-driven 3D Gaussian avatar framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
liubingqi7/audio-motion-avatar reference (PyTorch/CUDA): single-image +
speech-audio -> full-body talking avatar as SMPLX tokens + triplane tokens
decoded into 3D Gaussians and splat-rendered.

Layout:
  ops/       pure-function compute: rotations, cameras, SH, SMPLX LBS,
             mesh subdivision, triplane scatter/sample, Gaussian splatting
             (XLA reference + Pallas TPU tile rasterizer), serialization curves
  models/    flax.linen modules: transformer stack, triplane encoder, fusion,
             renderer, point refiner, image/audio encoders, audio rollout net
  training/  train steps (jit/pjit), optimizer, checkpointing, metrics
  parallel/  device mesh + sharding specs + host-sync collectives
  data/      host-side dataset pipelines, batch containers, synthetic fixtures
  configs/   YAML config system (defaults merge + ${} interpolation)
  utils/     losses, profiling, video IO
"""

__version__ = "0.1.0"
