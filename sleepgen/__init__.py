"""sleepgen — a TPU-native (JAX/XLA/Pallas/pjit) framework for synthetic
sleep-EEG generation with latent diffusion models.

Re-designed from scratch with the capabilities of
`bruAristimunha/Synthetic-Sleep-EEG-Signal-Generation-using-Latent-Diffusion-Models`
(NeurIPS 2023 DGM4H). The reference is a collection of PyTorch/MONAI scripts;
sleepgen is a structured framework whose compute path is pure JAX (jit/scan/
pjit over a device mesh), with optional Pallas TPU kernels for hot ops.

Layers (bottom-up):
  parallel/   device mesh + sharding: the data-parallel "backend"
  diffusion/  noise schedules, DDPM/DDIM steps, scan samplers, inferer
  losses/     spectral (Jukebox-FFT), LSGAN patch-adversarial, KL
  nn/         AutoencoderKL, PatchDiscriminator, UNet1d, USleep (flax.linen)
  data/       windowing pipeline, synthetic EEG fixture, EDF ingest
  train/      jitted G/D + diffusion train steps, orbax checkpoints
  sample/     batched-seed DDIM/DDPM sampling (lax.scan, bf16)
  eval/       MS-SSIM(1d), FID, PSD/Welch, band metrics
"""

__version__ = "0.1.0"
