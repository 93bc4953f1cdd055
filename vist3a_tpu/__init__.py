"""VIST3A-TPU: a TPU-native (JAX/XLA/Pallas) text-to-3D-Gaussian-Splat framework.

Re-implements the capabilities of gohyojun15/VIST3A ("Text-to-3D by Stitching a
Multi-view Reconstruction Network to a Video Generator", ICLR 2026) as an
idiomatic TPU framework:

  * Wan 2.1 text-to-video latent diffusion (DiT + causal-3D VAE + UMT5 + UniPC)
  * conv3d stitching layer (the learned latent->token bridge)
  * chopped AnySplat multi-view reconstruction network (VGGT alternating
    attention + camera/depth/Gaussian heads)
  * differentiable 3D Gaussian splatting rasterizer (Pallas + XLA reference)
  * stitching-layer search (streaming ridge regression)
  * LoRA distillation training and reward-aligned VDM fine-tuning
  * NVS / generation evaluation benches and PLY/video export

Compute path is JAX/XLA/Pallas over a `jax.sharding.Mesh`; there is no torch
dependency anywhere in the package.
"""

__version__ = "0.1.0"
