"""ipdm_tpu — a TPU-native (JAX/XLA/Pallas) framework for Iterative Partial
Diffusion Model (IPDM) low-dose CT denoising.

A from-scratch redesign, for TPU, of the capabilities of the reference
implementation LFY1998/IPDM-PyTorch (unsupervised dual-domain LDCT denoising
with guided partial diffusion + native CT reconstruction kernels).

Layer map (mirrors reference layers, re-architected TPU-first):
  config/    — frozen config tree, JSON-compatible with the reference presets
  models/    — Flax UNet denoisers (NHWC, bf16-capable)
  diffusion/ — DDPM schedules, Gaussian diffusion core, guided samplers
  ops/       — XLA/Pallas compute ops (λ maps, sharpen, projector kernels)
  recon/     — fan-beam CT physics: FBP, footprint projectors, OS-SART, LDCT sim
  data/      — unit conversions, npz dataset, deterministic resumable sampler
  engine/    — trainer, progressive denoiser orchestrator, checkpointing, logging
  metrics/   — PSNR/SSIM/NQM/VIF/FSIM implemented natively (no skimage/piq)
  parallel/  — jax.sharding Mesh utilities, sharded train/infer steps
"""

__version__ = "0.1.0"
