"""Camera-path interpolation + video export.

Parity target: `src/misc/image_io.py:80-240` — `save_video` (imageio mp4,
uint8) and `save_interpolated_video`: t=10 in-between cameras per adjacent
pair (lerped translation/intrinsics, SVD-orthogonalized lerped rotations,
final frame duplicated), rendered through the splatting decoder at
near 0.1 / far 100, color video + turbo-colormapped depth video at 20 fps.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np

from vist3a_tpu.nn.splat_decoder import render


def interpolate_cameras(extrinsics_c2w: np.ndarray,
                        intrinsics_norm: np.ndarray, t: int = 10):
    """(B,V,4,4), (B,V,3,3) → interpolated (B,V',4,4), (B,V',3,3) with V' =
    (V−1)·(t+1) + 1 frames, matching `save_interpolated_video`'s loop
    (`image_io.py:126-184` — the reference appends the last frame once
    more; we keep it once, same rendered content)."""
    ex = np.asarray(extrinsics_c2w, np.float64)
    kk = np.asarray(intrinsics_norm, np.float64)
    b, v = ex.shape[:2]
    out_e, out_k = [], []
    for i in range(v - 1):
        out_e.append(ex[:, i])
        out_k.append(kk[:, i])
        for j in range(1, t + 1):
            alpha = j / (t + 1)
            rot = (1 - alpha) * ex[:, i, :3, :3] + alpha * ex[:, i + 1, :3, :3]
            u, _, vt = np.linalg.svd(rot)
            rot = u @ vt
            trans = (1 - alpha) * ex[:, i, :3, 3] + alpha * ex[:, i + 1, :3, 3]
            e = np.broadcast_to(np.eye(4), (b, 4, 4)).copy()
            e[:, :3, :3] = rot
            e[:, :3, 3] = trans
            out_e.append(e)
            out_k.append((1 - alpha) * kk[:, i] + alpha * kk[:, i + 1])
    out_e.append(ex[:, -1])
    out_k.append(kk[:, -1])
    return (np.stack(out_e, 1).astype(np.float32),
            np.stack(out_k, 1).astype(np.float32))


def save_video(frames: np.ndarray, path, fps: int = 20):
    """frames: (N, 3, H, W) float in [0,1] → mp4 (`image_io.py:80-109`).

    imageio (ffmpeg) when present; OpenCV VideoWriter fallback otherwise."""
    path = Path(path)
    path.parent.mkdir(exist_ok=True, parents=True)
    video = (np.clip(np.transpose(np.asarray(frames), (0, 2, 3, 1)), 0, 1)
             * 255).astype(np.uint8)
    try:
        import imageio

        writer = imageio.get_writer(str(path), fps=fps)
        for frame in video:
            writer.append_data(frame)
        writer.close()
    except (ImportError, ValueError):
        import cv2

        h, w = video.shape[1:3]
        writer = cv2.VideoWriter(str(path),
                                 cv2.VideoWriter_fourcc(*"mp4v"), fps,
                                 (w, h))
        for frame in video:
            writer.write(frame[..., ::-1])     # RGB → BGR
        writer.release()
    return str(path)


def turbo_depth(depth: np.ndarray, num_views: int) -> np.ndarray:
    """Normalize by the 1/99 quantiles of the KEY frames (every
    `num_views`-th, `image_io.py:205-214`) and apply the turbo colormap.
    Returns (N, 3, H, W)."""
    from matplotlib import cm

    d = np.asarray(depth, np.float32)
    keys = d[::num_views]
    lo, hi = np.quantile(keys, 0.01), np.quantile(keys, 0.99)
    dn = (d - lo) / max(hi - lo, 1e-12)
    colored = cm.turbo(dn)[..., :3]
    return np.clip(np.transpose(colored, (0, 3, 1, 2)), 0, 1)


def save_interpolated_video(extrinsics_c2w, intrinsics_norm, gaussians,
                            image_shape, save_path, *, t: int = 10,
                            fps: int = 20, pair_budget: int | None = None):
    """Full orbit export: interpolate cameras, render, write gs.mp4 +
    depth.mp4.  Returns (gs_path, depth_path)."""
    ex, kk = interpolate_cameras(np.asarray(extrinsics_c2w),
                                 np.asarray(intrinsics_norm), t)
    import jax.numpy as jnp

    out = render(gaussians, jnp.asarray(ex), jnp.asarray(kk), image_shape,
                 pair_budget=pair_budget)
    color = np.asarray(out.color[0])
    depth = np.asarray(out.depth[0])
    num_views = np.asarray(extrinsics_c2w).shape[1]
    os.makedirs(save_path, exist_ok=True)
    gs_path = save_video(color, os.path.join(save_path, "gs.mp4"), fps)
    depth_path = save_video(turbo_depth(depth, num_views),
                            os.path.join(save_path, "depth.mp4"), fps)
    return gs_path, depth_path
