"""Pallas 3DGS rasterizer vs. a trusted naive per-pixel compositor.

The naive reference replicates the exact semantics (tile-bbox membership,
σ<0 / α<1/255 skips, 0.999 clamp, permanent T<1e-4 stop, accumulated depth,
background over T) as a plain `lax.scan` over depth-sorted Gaussians, so JAX
autodiff of the reference checks the custom-VJP backward kernels too.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vist3a_tpu.kernels import rasterizer as ras


# --------------------------------------------------------------------------- #
# naive reference                                                             #
# --------------------------------------------------------------------------- #
def naive_rasterize_view(means, covars, colors, opacities, viewmat, K, W, H,
                         bg):
    proj = ras.project_gaussians(means, covars, viewmat, K, W, H)
    order = jnp.argsort(jnp.where(proj.valid, proj.depth, jnp.inf))
    mean2d = proj.mean2d[order]
    conic = proj.conic[order]
    depth = proj.depth[order]
    radius = proj.radius[order]
    valid = proj.valid[order]
    op = jnp.where(valid, opacities[order], 0.0)
    col = colors[order]

    ntx, nty = -(-W // ras.TILE), -(-H // ras.TILE)
    x0 = jnp.clip(jnp.floor((mean2d[:, 0] - radius) / ras.TILE), 0, ntx)
    x1 = jnp.clip(jnp.ceil((mean2d[:, 0] + radius) / ras.TILE), 0, ntx)
    y0 = jnp.clip(jnp.floor((mean2d[:, 1] - radius) / ras.TILE), 0, nty)
    y1 = jnp.clip(jnp.ceil((mean2d[:, 1] + radius) / ras.TILE), 0, nty)

    def pixel(py, px):
        tx, ty = px // ras.TILE, py // ras.TILE
        in_tile = valid & (x0 <= tx) & (tx < x1) & (y0 <= ty) & (ty < y1)
        pcx, pcy = px.astype(jnp.float32) + 0.5, py.astype(jnp.float32) + 0.5

        def step(carry, i):
            t, done, rgb, dep, alp = carry
            dx, dy = pcx - mean2d[i, 0], pcy - mean2d[i, 1]
            sigma = (0.5 * (conic[i, 0] * dx * dx + conic[i, 2] * dy * dy)
                     + conic[i, 1] * dx * dy)
            a_raw = op[i] * jnp.exp(-sigma)
            a_ok = in_tile[i] & (sigma >= 0) & (a_raw >= ras.ALPHA_MIN)
            alpha = jnp.where(a_ok, jnp.minimum(a_raw, ras.ALPHA_CLAMP), 0.0)
            t_test = t * (1.0 - alpha)
            fails = a_ok & (t_test < ras.T_EPS)
            live = a_ok & jnp.logical_not(done) & jnp.logical_not(fails)
            w = jnp.where(live, alpha * t, 0.0)
            rgb = rgb + w * col[i]
            dep = dep + w * depth[i]
            alp = alp + w
            t = jnp.where(live, t_test, t)
            done = done | (fails & jnp.logical_not(done))
            return (t, done, rgb, dep, alp), None

        init = (jnp.float32(1.0), jnp.bool_(False), jnp.zeros(3),
                jnp.float32(0.0), jnp.float32(0.0))
        (t, _, rgb, dep, alp), _ = jax.lax.scan(
            step, init, jnp.arange(means.shape[0]))
        return rgb + t * bg, dep, alp

    py = jnp.arange(H)[:, None] * jnp.ones((1, W), jnp.int32)
    px = jnp.arange(W)[None, :] * jnp.ones((H, 1), jnp.int32)
    return jax.vmap(jax.vmap(pixel))(py, px)


def make_scene(rng, g=48, seed_spread=1.0):
    means = jnp.asarray(rng.normal(0, seed_spread, (g, 3)), jnp.float32)
    means = means.at[:, 2].add(4.0)                     # in front of camera
    a = jnp.asarray(rng.normal(0, 0.12, (g, 3, 3)), jnp.float32)
    covars = jnp.einsum("gij,gkj->gik", a, a) + 1e-3 * jnp.eye(3)
    d_sh = 25
    harmonics = jnp.asarray(rng.normal(0, 0.3, (g, 3, d_sh)), jnp.float32)
    opacities = jnp.asarray(rng.uniform(0.3, 0.95, (g,)), jnp.float32)
    viewmat = jnp.eye(4, dtype=jnp.float32)
    W = H = 64
    K = jnp.asarray([[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1]],
                    jnp.float32)
    bg = jnp.asarray([0.2, 0.5, 0.1], jnp.float32)
    return means, covars, harmonics, opacities, viewmat, K, W, H, bg


def test_forward_matches_naive(rng):
    means, covars, harmonics, opacities, viewmat, K, W, H, bg = make_scene(rng)
    rgb, dep, alp = jax.jit(
        lambda *a: ras.rasterize(*a, viewmats=viewmat[None], Ks=K[None],
                                 width=W, height=H, background=bg,
                                 pair_budget=4096),
        static_argnames=())(means, covars, harmonics, opacities)

    campos = jnp.zeros(3)
    colors = ras.eval_sh(harmonics, means - campos, 4)
    n_rgb, n_dep, n_alp = naive_rasterize_view(
        means, covars, colors, opacities, viewmat, K, W, H, bg)

    np.testing.assert_allclose(rgb[0], n_rgb, atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(dep[0], n_dep, atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(alp[0], n_alp, atol=2e-5, rtol=1e-4)
    # scene actually covers pixels and leaves some background
    assert float(jnp.max(alp)) > 0.5 and float(jnp.min(alp)) < 0.2


def test_empty_scene_renders_background(rng):
    means, covars, harmonics, opacities, viewmat, K, W, H, bg = make_scene(
        rng, g=8)
    rgb, dep, alp = ras.rasterize(
        means, covars, harmonics, jnp.zeros_like(opacities),
        viewmat[None], K[None], W, H, background=bg)
    np.testing.assert_allclose(rgb[0], jnp.broadcast_to(bg, (H, W, 3)),
                               atol=1e-6)
    np.testing.assert_allclose(alp[0], 0.0, atol=1e-6)
    np.testing.assert_allclose(dep[0], 0.0, atol=1e-6)


def test_gradients_match_naive(rng):
    means, covars, harmonics, opacities, viewmat, K, W, H, bg = make_scene(
        rng, g=32)
    gw = jnp.asarray(rng.normal(0, 1, (H, W, 3)), jnp.float32)
    dw = jnp.asarray(rng.normal(0, 1, (H, W)), jnp.float32)

    def loss_pallas(m, c, h, o):
        rgb, dep, alp = ras.rasterize(m, c, h, o, viewmat[None], K[None],
                                      W, H, background=bg)
        return jnp.sum(rgb[0] * gw) + jnp.sum(dep[0] * dw) + jnp.sum(alp[0])

    def loss_naive(m, c, h, o):
        colors = ras.eval_sh(h, m - jnp.zeros(3), 4)
        rgb, dep, alp = naive_rasterize_view(m, c, colors, o, viewmat, K,
                                             W, H, bg)
        return jnp.sum(rgb * gw) + jnp.sum(dep * dw) + jnp.sum(alp)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(
        means, covars, harmonics, opacities)
    gn = jax.grad(loss_naive, argnums=(0, 1, 2, 3))(
        means, covars, harmonics, opacities)

    for a, b, name, tol in zip(
            gp, gn, ["means", "covars", "harmonics", "opacities"],
            [5e-3, 5e-3, 5e-3, 5e-3]):
        denom = np.maximum(np.abs(np.asarray(b)), 1e-2)
        rel = np.abs(np.asarray(a) - np.asarray(b)) / denom
        assert np.max(rel) < tol, f"{name}: max rel err {np.max(rel)}"


def test_multiview_and_pair_budget(rng):
    means, covars, harmonics, opacities, viewmat, K, W, H, bg = make_scene(
        rng, g=24)
    # second camera: shifted right, looking at the same scene
    vm2 = viewmat.at[0, 3].set(-0.5)
    vms = jnp.stack([viewmat, vm2])
    rgb, dep, alp = ras.rasterize(means, covars, harmonics, opacities,
                                  vms, jnp.stack([K, K]), W, H,
                                  background=bg)
    assert rgb.shape == (2, H, W, 3)
    assert not np.allclose(np.asarray(rgb[0]), np.asarray(rgb[1]))

    # a tight pair budget must not crash (overflow pairs dropped)
    rgb2, _, _ = ras.rasterize(means, covars, harmonics, opacities,
                               viewmat[None], K[None], W, H, background=bg,
                               pair_budget=256)
    assert np.isfinite(np.asarray(rgb2)).all()


@pytest.mark.parametrize("w,h", [(48, 32)])
def test_non_tile_multiple_size(rng, w, h):
    means, covars, harmonics, opacities, viewmat, K, _, _, bg = make_scene(
        rng, g=16)
    K = jnp.asarray([[40.0, 0, w / 2], [0, 40.0, h / 2], [0, 0, 1]],
                    jnp.float32)
    rgb, dep, alp = ras.rasterize(means, covars, harmonics, opacities,
                                  viewmat[None], K[None], w, h,
                                  background=bg)
    assert rgb.shape == (1, h, w, 3)
    colors = ras.eval_sh(harmonics, means, 4)
    n_rgb, _, _ = naive_rasterize_view(means, covars, colors, opacities,
                                       viewmat, K, w, h, bg)
    np.testing.assert_allclose(rgb[0], n_rgb, atol=5e-5, rtol=1e-4)


def test_gather_transpose_matches_scatter(rng):
    """The sort/prefix-sum backward of `_gather_pair_rows` must equal the
    scatter-add transpose THROUGH real build_pairs outputs — including its
    bounds invariant (per-gid surviving-pair prefix = min(offsets, p1)),
    under tight budgets (farthest-first drops) and culled gaussians."""
    for seed, budget in [(0, 4096), (1, 256), (2, 640)]:
        r = np.random.default_rng(seed)
        means, covars, harmonics, opacities, viewmat, K, W, H, bg = \
            make_scene(np.random.default_rng(100 + seed), g=40)
        proj = ras.project_gaussians(means, covars, viewmat, K, W, H)
        ntx, nty = -(-W // ras.TILE), -(-H // ras.TILE)
        op = jnp.where(proj.valid, opacities, 0.0)
        gid, *_rest, bounds = ras.build_pairs(
            proj, ntx, nty, budget, extra_valid=op >= ras.ALPHA_MIN)
        g = means.shape[0]
        table = jnp.asarray(r.normal(size=(g, 10)).astype(np.float32))
        drows = jnp.asarray(
            r.normal(size=(gid.shape[0], 10)).astype(np.float32))

        def via_custom(t):
            return jnp.sum(ras._gather_pair_rows(t, gid, bounds) * drows)

        def via_scatter(t):
            ok = (gid >= 0).astype(t.dtype)
            return jnp.sum(t[jnp.clip(gid, 0, g - 1)] * ok[:, None] * drows)

        g1 = np.asarray(jax.grad(via_custom)(table))
        g2 = np.asarray(jax.grad(via_scatter)(table))
        np.testing.assert_allclose(g1, g2, atol=2e-4, rtol=1e-4,
                                   err_msg=f"seed={seed} budget={budget}")
