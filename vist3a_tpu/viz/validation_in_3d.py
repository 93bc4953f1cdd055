"""3-D validation visualizations: axis-aligned Gaussian projections and
camera-pose plots.

Parity target: `third_party_model/anysplat/src/visualization/
validation_in_3d.py` (`render_projections`, `render_cameras`, `pad`).  The
reference's orthographic render goes through
`cuda_splatting.render_cuda_orthographic` (`cuda_splatting.py:150-200`):
a FAKE orthographic projection — pick a tiny field of view (10° here) and
move the camera back by `0.5·width/tan(fov_x/2)` so perspective
foreshortening is negligible.  The same trick maps directly onto our
Pallas rasterizer via `nn/splat_decoder.render`, which subsumes the INRIA
`diff-gaussian-rasterization` path (SURVEY §2.3).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from vist3a_tpu.nn.gaussians import Gaussians
from vist3a_tpu.nn.splat_decoder import render
from vist3a_tpu.viz.annotation import add_label
from vist3a_tpu.viz.drawing import (compute_equal_aabb_with_margin,
                                    draw_cameras)


def pad(images: list[np.ndarray]) -> list[np.ndarray]:
    """Pad a list of arrays to their elementwise-max shape with ones
    (`validation_in_3d.py:12-23`)."""
    shapes = np.stack([np.array(x.shape) for x in images])
    padded = shapes.max(axis=0)
    results = []
    for image in images:
        out = np.ones(padded.tolist(), dtype=image.dtype)
        sel = tuple(slice(0, s) for s in image.shape)
        out[sel] = image
        results.append(out)
    return results


def _fake_ortho_camera(extrinsics: np.ndarray, width: np.ndarray,
                       height: np.ndarray, fov_degrees: float):
    """Orthographic-by-distance camera (`cuda_splatting.py:174-185`):
    returns (c2w moved back along local z, normalized pinhole K)."""
    b = extrinsics.shape[0]
    tan_fov_x = math.tan(0.5 * math.radians(fov_degrees))
    distance = 0.5 * np.asarray(width) / tan_fov_x          # (B,)
    tan_fov_y = 0.5 * np.asarray(height) / distance

    move_back = np.tile(np.eye(4), (b, 1, 1))
    move_back[:, 2, 3] = -distance
    c2w = extrinsics @ move_back

    k = np.zeros((b, 3, 3), np.float64)
    k[:, 0, 0] = 0.5 / tan_fov_x                            # fx / W
    k[:, 1, 1] = 0.5 / tan_fov_y                            # fy / H
    k[:, 0, 2] = k[:, 1, 2] = 0.5
    k[:, 2, 2] = 1.0
    return c2w, k


def render_projections(gaussians: Gaussians, resolution: int,
                       margin: float = 0.1, draw_label: bool = True,
                       extra_label: str = "") -> np.ndarray:
    """Render the scene's Gaussians orthographically down each world axis
    → (B, 3, 3, H', W') (`validation_in_3d.py:26-105`).  The scene AABB is
    computed over LIVE Gaussians only (opacity > 0) — our Gaussians ride
    static pad slots with zero opacity (`nn/encoder.py`), which must not
    stretch the box."""
    means = np.asarray(gaussians.means, np.float64)          # (B, G, 3)
    opac = np.asarray(gaussians.opacities, np.float64)       # (B, G)
    b = means.shape[0]
    live = opac > 0.0
    minima = np.stack([means[i][live[i]].min(axis=0) if live[i].any()
                       else np.zeros(3) for i in range(b)])
    maxima = np.stack([means[i][live[i]].max(axis=0) if live[i].any()
                       else np.ones(3) for i in range(b)])
    scene_min, scene_max = compute_equal_aabb_with_margin(minima, maxima,
                                                          margin)

    projections = []
    for look in range(3):
        right, down = (look + 1) % 3, (look + 2) % 3

        extr = np.zeros((b, 4, 4), np.float64)
        extr[:, right, 0] = 1.0                              # cam x → right
        extr[:, down, 1] = 1.0                               # cam y → down
        extr[:, look, 2] = 1.0                               # cam z → look
        extr[:, right, 3] = 0.5 * (scene_min[:, right] + scene_max[:, right])
        extr[:, down, 3] = 0.5 * (scene_min[:, down] + scene_max[:, down])
        extr[:, look, 3] = scene_min[:, look]
        extr[:, 3, 3] = 1.0

        extents = scene_max - scene_min
        c2w, k = _fake_ortho_camera(extr, extents[:, right],
                                    extents[:, down], fov_degrees=10.0)

        out = render(gaussians, jnp.asarray(c2w, jnp.float32)[:, None],
                     jnp.asarray(k, jnp.float32)[:, None],
                     (resolution, resolution))
        imgs = np.asarray(out.color[:, 0])                   # (B, 3, H, W)
        if draw_label:
            label = (f"{'XYZ'[right]}{'XYZ'[down]} Projection "
                     f"{extra_label}").strip()
            imgs = np.stack([add_label(x, label) for x in imgs])
        projections.append(imgs)

    return np.stack(pad(projections), axis=1)


def render_camera_poses(batch: dict, resolution: int) -> np.ndarray:
    """Plot context (white) + target (red) camera frustums on the three
    axis planes → (3, 3, res', res') (`validation_in_3d.py:108-131`)."""
    ctx, tgt = batch["context"], batch["target"]
    n_ctx = np.asarray(ctx["extrinsics"]).shape[1]
    n_tgt = np.asarray(tgt["extrinsics"]).shape[1]
    color = np.ones((n_ctx + n_tgt, 3), np.float32)
    color[n_ctx:, 1:] = 0.0                                  # targets red

    return draw_cameras(
        resolution,
        np.concatenate([np.asarray(ctx["extrinsics"])[0],
                        np.asarray(tgt["extrinsics"])[0]]),
        np.concatenate([np.asarray(ctx["intrinsics"])[0],
                        np.asarray(tgt["intrinsics"])[0]]),
        color,
        np.concatenate([np.asarray(ctx["near"])[0],
                        np.asarray(tgt["near"])[0]]),
        np.concatenate([np.asarray(ctx["far"])[0],
                        np.asarray(tgt["far"])[0]]),
    )
