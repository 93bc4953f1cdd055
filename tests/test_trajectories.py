"""Camera-trajectory generators (`vist3a_tpu/viz/trajectories.py`) vs the
reference semantics (`src/visualization/camera_trajectory/`): structural
properties pin each generator (orbit geometry, wobble phase, endpoint
consistency and focus-preservation of the pivot interpolation)."""

import numpy as np

from vist3a_tpu.viz import (
    generate_spin,
    generate_wobble,
    generate_wobble_transformation,
    interpolate_extrinsics,
    interpolate_intrinsics,
)


def _look_at(origin, target, up=(0.0, 1.0, 0.0)):
    """c2w with +Z look (OpenCV convention, as the pipeline uses)."""
    origin = np.asarray(origin, np.float64)
    z = np.asarray(target, np.float64) - origin
    z /= np.linalg.norm(z)
    x = np.cross(np.asarray(up, np.float64), z)
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    out = np.eye(4)
    out[:3, :3] = np.stack([x, y, z], axis=-1)
    out[:3, 3] = origin
    return out


def test_spin_orbit_geometry():
    n, elev, radius = 12, 20.0, 3.5
    traj = generate_spin(n, elev, radius)
    assert traj.shape == (n, 4, 4) and traj.dtype == np.float32
    # rotation blocks orthonormal, det +1
    r = traj[:, :3, :3].astype(np.float64)
    np.testing.assert_allclose(r @ np.swapaxes(r, 1, 2),
                               np.broadcast_to(np.eye(3), r.shape),
                               atol=1e-6)
    np.testing.assert_allclose(np.linalg.det(r), 1.0, atol=1e-6)
    # camera sits at distance `radius` from the origin at every frame
    np.testing.assert_allclose(np.linalg.norm(traj[:, :3, 3], axis=-1),
                               radius, rtol=1e-6)
    # elevation: constant height (rotation about y preserves the y coord)
    np.testing.assert_allclose(traj[:, 1, 3], traj[0, 1, 3], atol=1e-6)
    # frame k is frame 0 azimuth-rotated by 2πk/n about y
    phi = 2 * np.pi / n
    ry = np.array([[np.cos(phi), 0, np.sin(phi), 0], [0, 1, 0, 0],
                   [-np.sin(phi), 0, np.cos(phi), 0], [0, 0, 0, 1]])
    np.testing.assert_allclose(traj[1], (ry @ traj[0]).astype(np.float32),
                               atol=1e-5)


def test_wobble_phase_and_composition():
    radius = np.array([0.5])
    t = np.linspace(0, 1, 5)
    tf = generate_wobble_transformation(radius, t)
    assert tf.shape == (1, 5, 4, 4)
    # t=0: radius scaled to 0 -> identity
    np.testing.assert_allclose(tf[0, 0], np.eye(4), atol=1e-7)
    # translation-only, in the image plane: sin/-cos phase, scaled by r·t
    np.testing.assert_allclose(tf[0, :, :3, :3],
                               np.broadcast_to(np.eye(3), (5, 3, 3)),
                               atol=1e-7)
    np.testing.assert_allclose(tf[0, :, 0, 3],
                               np.sin(2 * np.pi * t) * radius * t,
                               atol=1e-6)
    np.testing.assert_allclose(tf[0, :, 1, 3],
                               -np.cos(2 * np.pi * t) * radius * t,
                               atol=1e-6)
    # unscaled: fixed radius circle
    tf2 = generate_wobble_transformation(radius, t,
                                         scale_radius_with_t=False)
    np.testing.assert_allclose(
        np.linalg.norm(tf2[0, :, :2, 3], axis=-1), float(radius[0]),
        rtol=1e-5)
    # generate_wobble right-multiplies in the camera frame
    ext = _look_at([0, 0, -4], [0, 0, 0]).astype(np.float32)
    out = generate_wobble(ext, radius, t)
    np.testing.assert_allclose(out[0], (ext @ tf[0]).astype(np.float32),
                               atol=1e-6)


def test_interpolate_intrinsics_linear():
    k0 = np.diag([100.0, 100.0, 1.0]).astype(np.float32)
    k1 = np.diag([200.0, 300.0, 1.0]).astype(np.float32)
    t = np.array([0.0, 0.5, 1.0])
    out = interpolate_intrinsics(k0, k1, t)
    np.testing.assert_allclose(out[0], k0, atol=1e-5)
    np.testing.assert_allclose(out[1], (k0 + k1) / 2, atol=1e-4)
    np.testing.assert_allclose(out[2], k1, atol=1e-5)


def test_interpolate_extrinsics_endpoints_and_focus():
    # two cameras on a circle, both looking at the same focus point
    focus = np.array([0.2, -0.1, 0.4])
    e0 = _look_at([2.0, 0.5, -2.0], focus)
    e1 = _look_at([-1.5, 0.8, -2.2], focus)
    t = np.linspace(0, 1, 7)
    out = interpolate_extrinsics(e0, e1, t)
    assert out.shape == (7, 4, 4)
    np.testing.assert_allclose(out[0], e0.astype(np.float32), atol=1e-4)
    np.testing.assert_allclose(out[-1], e1.astype(np.float32), atol=1e-4)
    # rotations stay orthonormal along the path
    r = out[:, :3, :3].astype(np.float64)
    np.testing.assert_allclose(r @ np.swapaxes(r, 1, 2),
                               np.broadcast_to(np.eye(3), r.shape),
                               atol=1e-5)
    # every in-between camera keeps looking (nearly) at the shared focus:
    # the pivot point is the look-ray intersection by construction
    for m in out:
        d = focus - m[:3, 3]
        d = d / np.linalg.norm(d)
        cos = float(d @ m[:3, 2])
        assert cos > 0.999, cos


def test_interpolate_extrinsics_parallel_looks():
    # identical look directions -> midpoint pivot branch
    e0 = _look_at([1.0, 0.0, -3.0], [1.0, 0.0, 5.0])
    e1 = _look_at([-1.0, 0.0, -3.0], [-1.0, 0.0, 5.0])
    out = interpolate_extrinsics(e0, e1, np.array([0.0, 0.5, 1.0]))
    np.testing.assert_allclose(out[0], e0.astype(np.float32), atol=1e-4)
    np.testing.assert_allclose(out[2], e1.astype(np.float32), atol=1e-4)
    # translation midpoint at t=.5 for pure-translation pairs
    np.testing.assert_allclose(out[1, :3, 3],
                               (e0[:3, 3] + e1[:3, 3]) / 2, atol=1e-4)
