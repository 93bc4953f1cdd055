"""Per-scene post-optimization (`train/post_opt.py`) vs reference semantics
(`src/post_opt/simple_trainer.py`): parametrization round-trip, 6D-rotation
identity, and an end-to-end refinement that must recover a perturbed scene
(loss ↓, photometric error ↓) through the Pallas rasterizer VJP."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vist3a_tpu.kernels.rasterizer import rasterize
from vist3a_tpu.nn.gaussians import Gaussians, build_covariance
from vist3a_tpu.train import post_opt


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(7)
    g = 48
    means = jnp.asarray(rng.normal(0, 0.8, (g, 3)), jnp.float32)
    means = means.at[:, 2].add(4.0)
    scales = jnp.asarray(rng.uniform(0.08, 0.3, (g, 3)), jnp.float32)
    quats = jnp.asarray(rng.normal(size=(g, 4)), jnp.float32)
    quats = quats / jnp.linalg.norm(quats, axis=-1, keepdims=True)
    harmonics = jnp.zeros((g, 3, 25), jnp.float32)
    harmonics = harmonics.at[:, :, 0].set(
        jnp.asarray(rng.uniform(0.2, 1.5, (g, 3)), jnp.float32))
    opacities = jnp.asarray(rng.uniform(0.35, 0.95, (g,)), jnp.float32)
    gaussians = Gaussians(
        means=means[None],
        covariances=build_covariance(scales, quats)[None],
        harmonics=harmonics[None],
        opacities=opacities[None],
        scales=scales[None],
        rotations=quats[None],
    )
    # three slightly-translated cameras looking down +z
    w = h = 32
    c2w = jnp.stack([jnp.eye(4).at[0, 3].set(dx)
                     for dx in (-0.4, 0.0, 0.4)])
    k_norm = jnp.asarray([[0.9, 0, 0.5], [0, 0.9, 0.5], [0, 0, 1]],
                         jnp.float32)
    k_norm = jnp.broadcast_to(k_norm, (3, 3, 3))
    return gaussians, c2w, k_norm, (h, w)


def _render_views(gaussians, c2w, k_norm, hw):
    h, w = hw
    ks = k_norm * jnp.asarray([[w], [h], [1.0]], jnp.float32)[None]
    viewmats = jnp.linalg.inv(c2w)
    rgb, _, _ = rasterize(
        gaussians.means[0], gaussians.covariances[0], gaussians.harmonics[0],
        gaussians.opacities[0], viewmats, ks, w, h, pair_budget=4096)
    return jnp.clip(rgb, 0.0, 1.0)                       # (V, H, W, 3)


def test_splats_round_trip(scene):
    gaussians, *_ = scene
    splats, live = post_opt.splats_from_gaussians(gaussians)
    assert float(live.min()) == 1.0                      # all above prune
    back = post_opt.gaussians_from_splats(splats, live)
    np.testing.assert_allclose(back.means, gaussians.means, rtol=1e-5)
    np.testing.assert_allclose(back.scales, gaussians.scales, rtol=1e-5)
    np.testing.assert_allclose(back.opacities, gaussians.opacities,
                               rtol=1e-4)
    np.testing.assert_allclose(back.harmonics, gaussians.harmonics,
                               atol=1e-6)
    np.testing.assert_allclose(back.covariances, gaussians.covariances,
                               rtol=1e-4, atol=1e-7)
    # quats may flip sign; covariance equality above is the invariant
    # prune mask: low-opacity splats get exactly zero opacity
    low = dataclasses.replace  # noqa: F841  (readability no-op)
    g2 = gaussians._replace(
        opacities=gaussians.opacities.at[0, 0].set(0.001))
    splats2, live2 = post_opt.splats_from_gaussians(g2)
    back2 = post_opt.gaussians_from_splats(splats2, live2)
    assert float(live2[0]) == 0.0
    assert float(back2.opacities[0, 0]) == 0.0


def test_rotation_6d_identity_and_pose_adjust():
    ident = jnp.asarray([1.0, 0, 0, 0, 1.0, 0])
    np.testing.assert_allclose(post_opt.rotation_6d_to_matrix(ident),
                               jnp.eye(3), atol=1e-6)
    c2w = jnp.eye(4).at[0, 3].set(0.7)
    np.testing.assert_allclose(
        post_opt._apply_pose_adjust(c2w, jnp.zeros(9)), c2w, atol=1e-6)
    # pure translation delta moves the camera in its own frame
    out = post_opt._apply_pose_adjust(c2w, jnp.zeros(9).at[2].set(0.1))
    np.testing.assert_allclose(out[:3, 3], jnp.asarray([0.7, 0, 0.1]),
                               atol=1e-6)


def test_refine_recovers_perturbed_scene(scene):
    gaussians, c2w, k_norm, hw = scene
    target = _render_views(gaussians, c2w, k_norm, hw)

    rng = np.random.default_rng(3)
    perturbed = gaussians._replace(
        means=gaussians.means
        + jnp.asarray(rng.normal(0, 0.05, gaussians.means.shape),
                      jnp.float32),
        harmonics=gaussians.harmonics
        + jnp.asarray(rng.normal(0, 0.15, gaussians.harmonics.shape),
                      jnp.float32),
    )
    err0 = float(jnp.mean(jnp.abs(
        _render_views(perturbed, c2w, k_norm, hw) - target)))

    cfg = post_opt.PostOptConfig(max_steps=60, pose_opt=False,
                                 opacity_reg=0.001, scale_reg=0.001,
                                 pair_budget=4096)
    result = post_opt.refine(perturbed, target, c2w, k_norm,
                             jax.random.key(0), cfg)
    assert result.losses.shape == (60,)
    late, early = result.losses[-10:].mean(), result.losses[:5].mean()
    assert float(late) < 0.7 * float(early), (float(early), float(late))
    err1 = float(jnp.mean(jnp.abs(
        _render_views(result.gaussians, c2w, k_norm, hw) - target)))
    assert err1 < 0.6 * err0, (err0, err1)


def test_refine_pose_opt_fixes_camera_error(scene):
    gaussians, c2w, k_norm, hw = scene
    target = _render_views(gaussians, c2w, k_norm, hw)
    # corrupt the *cameras*, keep the gaussians: only pose_opt can fix this
    # (all other groups frozen — jointly-trained splats could otherwise
    # absorb the camera error, the reconstruction gauge being ambiguous)
    c2w_bad = c2w.at[:, 0, 3].add(jnp.asarray([0.05, -0.05, 0.05]))
    cfg = post_opt.PostOptConfig(max_steps=200, pose_opt=True,
                                 lr_pose=5e-3, lr_means=0.0, lr_scales=0.0,
                                 lr_quats=0.0, lr_opacities=0.0, lr_sh=0.0,
                                 pair_budget=4096)
    result = post_opt.refine(gaussians, target, c2w_bad, k_norm,
                             jax.random.key(1), cfg)
    # photometric loss collapses and the extrinsics move back toward truth
    # (pose gauge is partly ambiguous at 32², so distance shrinks slowly)
    assert float(result.losses[-5:].mean()) < 0.15 * float(
        result.losses[:5].mean())
    d_before = float(jnp.mean(jnp.abs(c2w_bad - c2w)))
    d_after = float(jnp.mean(jnp.abs(result.c2w_refined - c2w)))
    assert d_after < d_before, (d_before, d_after)
