"""Camera geometry: quaternions, SE3, pose encodings, depth unprojection.

Behavioral parity with the reference:
  * `vggt/utils/rotation.py` — scalar-last (xyzw) quaternion ↔ matrix,
  * `vggt/utils/pose_enc.py` — absT_quaR_FoV 9-d pose encoding,
  * `vggt/utils/geometry.py` — batched depth→world unprojection with
    closed-form SE3 inverse.

All math in fp32 with explicit `precision="highest"` on the small matmuls
(pose math is accuracy-critical; see `anysplat.py:421` forcing fp32).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_P = "highest"


# --------------------------------------------------------------------------- #
# quaternions (scalar-last, xyzw)                                             #
# --------------------------------------------------------------------------- #
def quat_to_mat(q: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    """(..., 4) xyzw → (..., 3, 3)."""
    i, j, k, r = jnp.moveaxis(q, -1, 0)
    two_s = 2.0 / (jnp.sum(q * q, axis=-1) + eps)
    o = jnp.stack(
        [
            1 - two_s * (j * j + k * k),
            two_s * (i * j - k * r),
            two_s * (i * k + j * r),
            two_s * (i * j + k * r),
            1 - two_s * (i * i + k * k),
            two_s * (j * k - i * r),
            two_s * (i * k - j * r),
            two_s * (j * k + i * r),
            1 - two_s * (i * i + j * j),
        ],
        axis=-1,
    )
    return o.reshape(q.shape[:-1] + (3, 3))


def mat_to_quat(m: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) → (..., 4) xyzw, branchless (pytorch3d-style best-column
    selection, `rotation.py:mat_to_quat`)."""
    batch = m.shape[:-2]
    f = m.reshape(batch + (9,))
    m00, m01, m02, m10, m11, m12, m20, m21, m22 = jnp.moveaxis(f, -1, 0)

    q_abs2 = jnp.stack(
        [
            1.0 + m00 + m11 + m22,
            1.0 + m00 - m11 - m22,
            1.0 - m00 + m11 - m22,
            1.0 - m00 - m11 + m22,
        ],
        axis=-1,
    )
    q_abs = jnp.sqrt(jnp.maximum(q_abs2, 0.0))

    # rows of candidate quaternions (r, i, j, k) * 4|q|
    quat_by_rijk = jnp.stack(
        [
            jnp.stack([q_abs[..., 0] ** 2, m21 - m12, m02 - m20, m10 - m01], -1),
            jnp.stack([m21 - m12, q_abs[..., 1] ** 2, m10 + m01, m02 + m20], -1),
            jnp.stack([m02 - m20, m10 + m01, q_abs[..., 2] ** 2, m12 + m21], -1),
            jnp.stack([m10 - m01, m20 + m02, m21 + m12, q_abs[..., 3] ** 2], -1),
        ],
        axis=-2,
    )  # (..., 4, 4) in rijk order
    flr = 0.1
    denom = 2.0 * jnp.maximum(flr, q_abs[..., None])
    quat_candidates = quat_by_rijk / denom

    best = jnp.argmax(q_abs2, axis=-1)
    quat_rijk = jnp.take_along_axis(
        quat_candidates, best[..., None, None].repeat(4, -1), axis=-2
    )[..., 0, :]
    # rijk → ijkr (scalar last)
    out = jnp.concatenate([quat_rijk[..., 1:], quat_rijk[..., :1]], axis=-1)
    # canonical sign: positive scalar part
    return jnp.where(out[..., 3:4] < 0, -out, out)


# --------------------------------------------------------------------------- #
# SE3                                                                         #
# --------------------------------------------------------------------------- #
def closed_form_inverse_se3(se3: jnp.ndarray) -> jnp.ndarray:
    """(..., 3|4, 4) world→cam [R|t] → (..., 4, 4) cam→world."""
    r = se3[..., :3, :3]
    t = se3[..., :3, 3:]
    rt = jnp.swapaxes(r, -1, -2)
    top = jnp.concatenate([rt, -jnp.matmul(rt, t, precision=_P)], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], se3.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


# --------------------------------------------------------------------------- #
# pose encoding (absT_quaR_FoV)                                               #
# --------------------------------------------------------------------------- #
def pose_encoding_to_extri_intri(
    pose_enc: jnp.ndarray, image_size_hw: tuple[int, int],
    build_intrinsics: bool = True,
):
    """(..., 9) = [T(3), quat_xyzw(4), fov_h, fov_w] → ([R|t] (...,3,4), K)."""
    t = pose_enc[..., :3]
    quat = pose_enc[..., 3:7]
    fov_h = pose_enc[..., 7]
    fov_w = pose_enc[..., 8]
    r = quat_to_mat(quat)
    extrinsics = jnp.concatenate([r, t[..., None]], axis=-1)
    intrinsics = None
    if build_intrinsics:
        h, w = image_size_hw
        fy = (h / 2.0) / (jnp.tan(fov_h / 2.0) + 1e-3)
        fx = (w / 2.0) / (jnp.tan(fov_w / 2.0) + 1e-3)
        zeros = jnp.zeros_like(fx)
        ones = jnp.ones_like(fx)
        intrinsics = jnp.stack(
            [
                jnp.stack([fx, zeros, jnp.full_like(fx, w / 2)], -1),
                jnp.stack([zeros, fy, jnp.full_like(fy, h / 2)], -1),
                jnp.stack([zeros, zeros, ones], -1),
            ],
            axis=-2,
        )
    return extrinsics, intrinsics


def extri_intri_to_pose_encoding(
    extrinsics: jnp.ndarray, intrinsics: jnp.ndarray,
    image_size_hw: tuple[int, int],
) -> jnp.ndarray:
    r = extrinsics[..., :3, :3]
    t = extrinsics[..., :3, 3]
    quat = mat_to_quat(r)
    h, w = image_size_hw
    fov_h = 2 * jnp.arctan((h / 2) / intrinsics[..., 1, 1])
    fov_w = 2 * jnp.arctan((w / 2) / intrinsics[..., 0, 0])
    return jnp.concatenate(
        [t, quat, fov_h[..., None], fov_w[..., None]], axis=-1
    ).astype(jnp.float32)


# --------------------------------------------------------------------------- #
# depth unprojection                                                          #
# --------------------------------------------------------------------------- #
def unproject_depth(
    depth: jnp.ndarray, extrinsics: jnp.ndarray, intrinsics: jnp.ndarray
) -> jnp.ndarray:
    """depth (B,V,H,W[,1]), extrinsics (B,V,3,4) world→cam, intrinsics
    (B,V,3,3) → world points (B,V,H,W,3)
    (`geometry.py:batchify_unproject_depth_map_to_point_map`)."""
    if depth.ndim == 5:
        depth = depth[..., 0]
    b, v, h, w = depth.shape
    fu = intrinsics[..., 0, 0][..., None, None]
    fv = intrinsics[..., 1, 1][..., None, None]
    cu = intrinsics[..., 0, 2][..., None, None]
    cv = intrinsics[..., 1, 2][..., None, None]
    u = jnp.arange(w, dtype=depth.dtype)[None, None, None, :]
    vv = jnp.arange(h, dtype=depth.dtype)[None, None, :, None]
    x_cam = (u - cu) * depth / fu
    y_cam = (vv - cv) * depth / fv
    cam = jnp.stack([x_cam, y_cam, depth], axis=-1)  # (B,V,H,W,3)

    c2w = closed_form_inverse_se3(extrinsics)  # (B,V,4,4)
    r = c2w[..., :3, :3]
    t = c2w[..., :3, 3]
    world = jnp.einsum("bvij,bvhwj->bvhwi", r, cam, precision=_P) + t[:, :, None, None, :]
    return world
