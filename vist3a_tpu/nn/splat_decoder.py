"""Splatting decoder: Gaussians + cameras → rendered color/depth/alpha.

Parity target: `src/model/decoder/decoder_splatting_cuda.py:28-152`
(`DecoderSplattingCUDA`): c2w extrinsics are inverted to w2c viewmats,
normalized intrinsics are denormalized by (W, H), RGB+D render with explicit
covariances, near_plane=1e-10, radius_clip=0.1, background color, color
clamped to [0,1].  The reference loops batch×view over `gsplat.rasterization`;
here one call to the Pallas rasterizer handles all views and an unrolled
loop handles batch (B=1 everywhere this runs).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from vist3a_tpu.kernels.rasterizer import rasterize
from vist3a_tpu.nn.gaussians import Gaussians


class DecoderOutput(NamedTuple):
    color: jnp.ndarray   # (B, V, 3, H, W) in [0, 1]
    depth: jnp.ndarray   # (B, V, H, W)
    alpha: jnp.ndarray   # (B, V, H, W)


def render(gaussians: Gaussians, extrinsics_c2w: jnp.ndarray,
           intrinsics_norm: jnp.ndarray, image_shape: tuple[int, int],
           *, background=None, pair_budget: int | None = None,
           remat_views: bool = False) -> DecoderOutput:
    """extrinsics_c2w: (B, V, 4, 4); intrinsics_norm: (B, V, 3, 3) with
    fx/W-normalized first row, fy/H second (`decoder_splatting_cuda.py:
    81-86`)."""
    h, w = image_shape
    bg = (jnp.zeros((3,), jnp.float32) if background is None
          else jnp.asarray(background, jnp.float32))

    scale = jnp.asarray([[w], [h], [1.0]], jnp.float32)

    def one_scene(means, covars, harmonics, opacities, c2w, k_norm):
        v = c2w.shape[0]
        viewmats = jnp.linalg.inv(c2w.astype(jnp.float32))
        ks = k_norm.astype(jnp.float32) * scale[None]
        rgb, dep, alp = rasterize(
            means, covars, harmonics, opacities, viewmats, ks, w, h,
            sh_degree=None, background=bg, near_plane=1e-10,
            radius_clip=0.1, pair_budget=pair_budget,
            remat_views=remat_views)
        return jnp.clip(rgb, 0.0, 1.0).transpose(0, 3, 1, 2), dep, alp

    # unrolled scene loop, NOT vmap: the rasterizer's Pallas composite is
    # wrapped in a shard_map for multi-chip lowering
    # (`kernels/partitioning.py`), which has no vmap batching rule; B is 1
    # everywhere this runs (reward step, NVS eval, orbit export) and the
    # reference loops batch×view serially anyway
    # (`decoder_splatting_cuda.py:87-111`).
    outs = [one_scene(gaussians.means[b], gaussians.covariances[b],
                      gaussians.harmonics[b], gaussians.opacities[b],
                      extrinsics_c2w[b], intrinsics_norm[b])
            for b in range(extrinsics_c2w.shape[0])]
    color, depth, alpha = (jnp.stack(x) for x in zip(*outs))
    return DecoderOutput(color, depth, alpha)
