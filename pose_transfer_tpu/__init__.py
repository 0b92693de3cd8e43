"""pose_transfer_tpu — TPU-native (JAX/XLA/Pallas) Deformable-GAN pose transfer.

A from-scratch rebuild of the capabilities of ``saurabhsharma1993/pose-transfer``
(PyTorch port of "Deformable GANs for Pose-based Human Image Generation",
arXiv 1801.00055), designed TPU-first:

- NHWC layouts, bfloat16-friendly convs that tile onto the MXU
- keypoint→heatmap rasterization, polygon masks and feature warping all
  in-graph (XLA / Pallas) instead of the reference's host-side numpy/skimage
- a single jitted two-phase GAN train step (disc + gen) with optax Adam
- data-parallel scaling via ``jax.sharding.Mesh`` + NamedSharding over ICI
- atomic/async checkpointing, SSIM/PSNR eval, CLI parity with the
  reference's flags, and an online micro-batching inference server

Layering (mirrors SURVEY.md §1):
  core/      L0 pose geometry (device + host halves)
  ops/       L2 differentiable ops (warp, volume instance norm, nn_loss, ssim)
  models/    L3 networks (encoder/decoder/generators/discriminator, VGG)
  train/     L4 GAN engine (losses, train step, checkpointing)
  data/      L1 dataset + pair tools + prefetch loader
  parallel/  device mesh + sharded train step
  cli/       L5 flag-compatible drivers (main/test/serve/opts)
  serve.py   static-shape micro-batching inference server
  utils/     visualization (pose drawing, sample grids)
"""

__version__ = "0.1.0"
