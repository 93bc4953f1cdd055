"""Voxel fusion: confidence-softmax scatter aggregation of Gaussians.

Parity target: `src/model/encoder/anysplat.py:298-335`
(`voxelizaton_with_fusion`, torch_scatter `scatter_max`/`scatter_add` +
`torch.unique(dim=0)`): quantize points to voxel indices, per-voxel softmax
over confidences, confidence-weighted mean of positions and features.
(Off by default — `voxelize=False` forced at
`model_stitching_training.py:331-332` — but part of the encoder surface.)

TPU design: `torch.unique` has data-dependent output shape; XLA needs static
shapes.  We sort the voxel keys, build segment ids via a sorted-unique scan,
and use `jax.ops.segment_max/segment_sum` with `num_segments = N` (every
point its own voxel in the worst case).  Unused segment slots stay at the
fill value and are flagged by a validity mask — callers keep static padded
buffers exactly like the encoder's Gaussian padding.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _voxel_coords(pts: jnp.ndarray, voxel_size: float) -> jnp.ndarray:
    """(N,3) points → (N,3) int32 voxel coordinates."""
    return jnp.round(pts / voxel_size).astype(jnp.int32)


def voxelize_with_fusion(img_feat: jnp.ndarray, pts3d: jnp.ndarray,
                         voxel_size: float, conf: jnp.ndarray):
    """img_feat (N, C), pts3d (N, 3), conf (N,) →
    (voxel_pts (N,3), voxel_feats (N,C), valid (N,) bool).

    Row i of the output is voxel i in sorted-key order; rows with
    valid=False are padding (fewer unique voxels than points)."""
    n = pts3d.shape[0]
    coords = _voxel_coords(pts3d.astype(jnp.float32), voxel_size)
    # collision-free lexicographic sort over the 3 int32 columns
    order = jnp.lexsort((coords[:, 2], coords[:, 1], coords[:, 0]))
    coords_s = coords[order]
    pts_s = pts3d[order].astype(jnp.float32)
    feat_s = img_feat[order].astype(jnp.float32)
    conf_s = conf[order].astype(jnp.float32)

    row_new = jnp.any(coords_s[1:] != coords_s[:-1], axis=-1)
    is_new = jnp.concatenate([jnp.ones((1,), jnp.int32),
                              row_new.astype(jnp.int32)])
    seg = jnp.cumsum(is_new) - 1                   # (N,) segment ids
    n_voxels = seg[-1] + 1

    conf_max = jax.ops.segment_max(conf_s, seg, num_segments=n)
    conf_exp = jnp.exp(conf_s - conf_max[seg])
    denom = jax.ops.segment_sum(conf_exp, seg, num_segments=n)
    w = (conf_exp / (denom[seg] + 1e-6))[:, None]

    voxel_pts = jax.ops.segment_sum(pts_s * w, seg, num_segments=n)
    voxel_feats = jax.ops.segment_sum(feat_s * w, seg, num_segments=n)
    valid = jnp.arange(n) < n_voxels
    return voxel_pts, voxel_feats, valid
