"""Flow-matching SFT loss pieces (`train_vdm.py:541-563`).

z₀ is the NORMALIZED VAE latent ((z − mean)/std; the reference stores
latents_std as 1/std, `train_vdm.py:498-503`), σ ~ U(0,1) per sample,
z_σ = (1−σ)z₀ + σ·ε, target v = ε − z₀, MSE in fp32, timestep = 1000σ.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def make_flow_batch(key: jax.Array, z0: jnp.ndarray):
    """z0: (B, C, T, H, W) normalized latent → (z_sigma, timestep, target)."""
    k_eps, k_sig = jax.random.split(key)
    eps = jax.random.normal(k_eps, z0.shape, jnp.float32)
    sigma = jax.random.uniform(k_sig, (z0.shape[0],), jnp.float32)
    s = sigma[:, None, None, None, None]
    z0f = z0.astype(jnp.float32)
    z_sigma = (1.0 - s) * z0f + s * eps
    return z_sigma, sigma * 1000.0, eps - z0f


def flow_matching_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(
        jnp.square(pred.astype(jnp.float32) - target.astype(jnp.float32)))
