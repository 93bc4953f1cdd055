"""Visualization suite: layout/annotation/color-map/drawing/3-D validation.

Covers the TPU-native counterparts of the reference's
`third_party_model/anysplat/src/visualization/` package.  The drawing
primitives use analytic SDF coverage (documented deviation from the
reference's recursive-MSAA estimator, `drawing/rendering.py:76-121`), so
tests assert interiors/exteriors exactly and edges within the 1-px
anti-aliasing band.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from vist3a_tpu.viz import (
    add_border,
    add_label,
    apply_color_map_2d,
    apply_color_map_to_image,
    draw_cameras,
    draw_label,
    draw_lines,
    draw_points,
    get_distinct_color,
    hcat,
    overlay,
    pad,
    render_camera_poses,
    render_projections,
    vcat,
)
from vist3a_tpu.viz.color_map import _lab_to_srgb, _srgb_to_lab


# --------------------------------------------------------------------------- #
# layout                                                                       #
# --------------------------------------------------------------------------- #


def test_hcat_vcat_shapes_and_gap():
    a = np.zeros((3, 10, 4), np.float32)
    b = np.zeros((3, 6, 8), np.float32)
    h = hcat(a, b, gap=8)
    assert h.shape == (3, 10, 4 + 8 + 8)
    # gap column is the default white
    np.testing.assert_allclose(h[:, :, 4:12], 1.0)
    v = vcat(a, b, gap=2, gap_color=0)
    assert v.shape == (3, 10 + 2 + 6, 8)
    np.testing.assert_allclose(v[:, 10:12, :], 0.0)


def test_hcat_alignment():
    tall = np.zeros((3, 8, 2), np.float32)
    short = np.full((3, 4, 2), 0.5, np.float32)
    top = hcat(tall, short, align="top", gap=0)
    assert np.allclose(top[:, :4, 2:], 0.5) and np.allclose(top[:, 4:, 2:], 1.0)
    bottom = hcat(tall, short, align="bottom", gap=0)
    assert np.allclose(bottom[:, 4:, 2:], 0.5)


def test_add_border_and_overlay():
    im = np.zeros((3, 4, 4), np.float32)
    out = add_border(im, border=2, color=1)
    assert out.shape == (3, 8, 8)
    np.testing.assert_allclose(out[:, :2], 1.0)
    np.testing.assert_allclose(out[:, 2:6, 2:6], 0.0)

    base = np.zeros((3, 6, 6), np.float32)
    child = np.ones((3, 2, 2), np.float32)
    ov = overlay(base, child, "horizontal", "end", "center")
    assert ov[0, 2, 5] == 1.0 and ov[0, 0, 0] == 0.0


# --------------------------------------------------------------------------- #
# annotation                                                                   #
# --------------------------------------------------------------------------- #


def test_draw_label_and_add_label():
    lab = draw_label("hello")
    assert lab.ndim == 3 and lab.shape[0] == 3
    assert lab.min() >= 0.0 and lab.max() <= 1.0
    assert lab.min() < 0.5  # some dark glyph pixels exist

    # equal heights across different strings (height from full charset)
    assert draw_label("iii").shape[1] == draw_label("WWW").shape[1]

    im = np.zeros((3, 8, max(lab.shape[2], 8)), np.float32)
    labeled = add_label(im, "hello")
    assert labeled.shape[1] > im.shape[1]  # label + 4-px gap stacked above


# --------------------------------------------------------------------------- #
# color maps / colors                                                          #
# --------------------------------------------------------------------------- #


def test_apply_color_map_to_image():
    x = np.linspace(0, 1, 12).reshape(3, 4)
    out = apply_color_map_to_image(x)
    assert out.shape == (3, 3, 4)
    assert out.min() >= 0.0 and out.max() <= 1.0
    # inferno is monotone in luminance: the max value maps brighter
    assert out[:, -1, -1].mean() > out[:, 0, 0].mean()


def test_lab_round_trip_and_2d_map_corners():
    rgb = np.random.default_rng(0).uniform(0, 1, (32, 3))
    np.testing.assert_allclose(_lab_to_srgb(_srgb_to_lab(rgb)), rgb,
                               atol=1e-7)
    # y=0 → white regardless of x; x-extremes at y=1 → the red/blue anchors
    np.testing.assert_allclose(apply_color_map_2d(0.3, 0.0), 1.0, atol=1e-6)
    np.testing.assert_allclose(apply_color_map_2d(1.0, 1.0),
                               np.array([189, 0, 0]) / 255.0, atol=1e-6)
    np.testing.assert_allclose(apply_color_map_2d(0.0, 1.0),
                               np.array([0, 45, 255]) / 255.0, atol=1e-6)


def test_distinct_colors_cycle():
    c0 = get_distinct_color(0)
    assert c0 == pytest.approx((0xE6 / 255, 0x19 / 255, 0x4B / 255))
    assert get_distinct_color(22) == c0  # cycles past the 22-entry palette
    assert all(0.0 <= v <= 1.0 for v in get_distinct_color(7))


# --------------------------------------------------------------------------- #
# drawing primitives                                                           #
# --------------------------------------------------------------------------- #


def test_draw_points_disc_interior_exterior():
    im = jnp.zeros((3, 32, 32), jnp.float32)
    out = np.asarray(draw_points(im, [[16.0, 16.0]], color=(1.0, 0.0, 0.0),
                                 radius=5))
    np.testing.assert_allclose(out[:, 16, 16], [1.0, 0.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(out[:, 16, 12], [1.0, 0.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(out[:, 0, 0], 0.0, atol=1e-6)  # far outside
    assert out.min() >= 0.0 and out.max() <= 1.0


def test_draw_points_annulus():
    im = jnp.zeros((3, 32, 32), jnp.float32)
    out = np.asarray(draw_points(im, [[16.0, 16.0]], color=1.0, radius=8,
                                 inner_radius=4))
    assert out[0, 16, 16] == 0.0          # hole
    assert out[0, 16, 10] == 1.0          # ring body


def test_draw_lines_coverage_and_painter_order():
    im = jnp.zeros((3, 32, 32), jnp.float32)
    out = np.asarray(draw_lines(im, [[4.0, 16.0]], [[28.0, 16.0]],
                                color=(0.0, 1.0, 0.0), width=3))
    np.testing.assert_allclose(out[:, 16, 16], [0.0, 1.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(out[:, 4, 16], 0.0, atol=1e-6)  # off the line

    # two crossing lines: the LATER one wins the intersection pixel
    out2 = np.asarray(draw_lines(
        im, [[4.0, 16.0], [16.0, 4.0]], [[28.0, 16.0], [16.0, 28.0]],
        color=[[1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], width=3))
    np.testing.assert_allclose(out2[:, 16, 16], [0.0, 0.0, 1.0], atol=1e-6)


def test_draw_lines_world_range_mapping():
    im = jnp.zeros((3, 20, 20), jnp.float32)
    # world box [0,1]² mapped onto the image: the midpoint lands mid-image
    out = np.asarray(draw_lines(im, [[0.0, 0.5]], [[1.0, 0.5]], color=1.0,
                                width=2, x_range=(0, 1), y_range=(0, 1)))
    assert out[0, 10, 10] > 0.5
    assert out[0, 2, 10] == 0.0


def test_draw_cameras_projections():
    b = 3
    extr = np.tile(np.eye(4), (b, 1, 1))
    extr[:, 0, 3] = np.array([-0.5, 0.0, 0.5])
    intr = np.tile(np.eye(3), (b, 1, 1))
    intr[:, 0, 0] = intr[:, 1, 1] = 1.2
    intr[:, 0, 2] = intr[:, 1, 2] = 0.5
    color = np.asarray([get_distinct_color(i) for i in range(b)], np.float32)
    out = draw_cameras(48, extr, intr, color, near=0.1, far=2.0)
    assert out.shape[0] == 3 and out.shape[1] == 3     # 3 planes, RGB
    assert out.shape[2] >= 48 and out.shape[3] >= 48   # label padding only
    assert np.isfinite(out).all()
    assert out.max() > 0.0                             # something drew


# --------------------------------------------------------------------------- #
# validation_in_3d                                                             #
# --------------------------------------------------------------------------- #


def test_pad_to_common_shape():
    a = np.zeros((3, 4, 6), np.float32)
    b = np.zeros((3, 8, 2), np.float32)
    pa, pb = pad([a, b])
    assert pa.shape == pb.shape == (3, 8, 6)
    assert pa[0, 5, 0] == 1.0  # pad value is one


def _toy_gaussians(g=24, g_pad=8, seed=0):
    """Random cloud + zero-opacity pad slots (static-shape convention)."""
    from vist3a_tpu.nn.gaussians import Gaussians, build_covariance

    rng = np.random.default_rng(seed)
    n = g + g_pad
    means = rng.uniform(-1, 1, (1, n, 3)).astype(np.float32)
    means[:, g:] = 50.0  # pad slots far away; opacity 0 must hide them
    scales = np.full((1, n, 3), 0.15, np.float32)
    q = np.concatenate([np.zeros((1, n, 3)), np.ones((1, n, 1))],
                       axis=-1).astype(np.float32)
    covars = build_covariance(jnp.asarray(scales), jnp.asarray(q))
    harmonics = np.zeros((1, n, 3, 25), np.float32)
    harmonics[..., 0] = rng.uniform(0.5, 1.5, (1, n, 3))
    opac = np.concatenate([np.full((1, g), 0.9), np.zeros((1, g_pad))],
                          axis=1).astype(np.float32)
    return Gaussians(jnp.asarray(means), covars, jnp.asarray(harmonics),
                     jnp.asarray(opac), jnp.asarray(scales), jnp.asarray(q))


def test_render_projections_shape_and_pad_exclusion():
    gaussians = _toy_gaussians()
    out = render_projections(gaussians, resolution=32, draw_label=False)
    assert out.shape[:3] == (1, 3, 3)                  # (B, plane, RGB)
    assert out.shape[3] == out.shape[4] == 32          # no label → square
    assert np.isfinite(out).all()
    # live cloud spans [-1,1]³; pad slots at 50 are opacity-0 and must not
    # stretch the AABB — the cloud then covers the image center
    assert out[0, :, :, 16, 16].max() > 0.05


def test_render_projections_labels():
    gaussians = _toy_gaussians(g=8, g_pad=0)
    out = render_projections(gaussians, resolution=24, draw_label=True,
                             extra_label="(test)")
    assert out.shape[3] > 24                           # label stacked above


def test_render_camera_poses():
    def views(n, off):
        extr = np.tile(np.eye(4), (1, n, 1, 1))
        extr[0, :, 0, 3] = off + 0.1 * np.arange(n)
        intr = np.tile(np.eye(3), (1, n, 1, 1))
        intr[0, :, 0, 2] = intr[0, :, 1, 2] = 0.5
        return {"extrinsics": extr, "intrinsics": intr,
                "near": np.full((1, n), 0.05), "far": np.full((1, n), 1.0)}

    batch = {"context": views(2, -0.3), "target": views(1, 0.3)}
    out = render_camera_poses(batch, resolution=40)
    assert out.shape[0] == 3 and out.shape[1] == 3
    assert np.isfinite(out).all() and out.max() > 0.0
