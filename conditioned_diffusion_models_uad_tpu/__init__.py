"""conditioned_diffusion_models_uad_tpu — TPU-native framework for conditioned-diffusion
unsupervised anomaly detection in brain MRI.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
``raymondfdavey/Conditioned-Diffusion-Models-UAD`` (reference mounted read-only at
/root/reference; see SURVEY.md).  Nothing here is a translation of the reference's
torch code: compute paths are functional JAX programs laid out for the TPU MXU/VPU,
parallelism is expressed with `jax.sharding.Mesh` + XLA collectives, and the one
native-performance component of the reference (the numba OpenSimplex kernel,
reference src/utils/generate_noise.py) is rebuilt as a vectorized XLA program plus a
Pallas TPU kernel.

Layer map (mirrors SURVEY.md §1):
  config.py       L1   typed config tree + experiment composition + CLI overrides
  train/          L2   orchestration (fold loop, fit/test, checkpoints, resume)
  data/           L3   NIfTI IO, transforms, datamodules (IXI/BraTS21/MSLUB/ATLAS/WMH)
  models/         L4/5 task modules + flax nets (UNet, ResNet-50 encoder, SparK)
  diffusion/      L5   schedules + Gaussian diffusion math + scan-based samplers
  ops/            L6   simplex noise (XLA + Pallas), stencils, resampling kernels
  eval/           L7   anomaly scoring, post-processing, metrics, threshold protocol
  log/            L8   CSV/JSONL loggers, image grids, hyperparam snapshots
  parallel/       —    mesh/sharding helpers (data-parallel train, slice-parallel eval)
"""

__version__ = "0.1.0"
