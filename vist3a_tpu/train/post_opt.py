"""Per-scene 3DGS post-optimization (TPU-native `post_opt`).

Parity target: `third_party_model/anysplat/src/post_opt/simple_trainer.py`
(`Runner.train` :804-1030, `create_splats_with_optimizers` :402-461,
`Config` :238-399) and `post_opt/utils.py:12-49` (`CameraOptModule`).  The
reference refines the feed-forward Gaussians per scene with gsplat + Adam:

  * parametrization: raw means, log scales, raw quats, logit opacities,
    SH split into sh0 / shN (shN at lr/20)  (:418-438);
  * init prune: opacity ≤ 0.01 dropped (:427) — here a frozen 0/1 mask
    multiplied into opacity (static shapes, identical renders);
  * per step: one random training view, loss = (1−λ)·L1 + λ·(1−SSIM)
    with λ=0.2 (:941-946), optional opacity/scale L1 regs (:966-977),
    optional random background (:925-927);
  * per-group Adam lrs (means 1.6e-4 · exp-decayed ×0.01 over the run,
    scales 5e-3, quats 1e-3, opacities 5e-2, sh0 2.5e-3, shN 1.25e-4)
    (:369-373, :818-822);
  * camera-pose refinement (on by default, :98): per-view 3D translation +
    6D-rotation delta right-multiplied onto c2w, zero-init, lr 1e-5
    exp-decayed (`utils.py:28-49`).

TPU-first: gsplat's default densify/prune strategy is disabled in the
reference config (`refine_start_iter=30000 > max_steps`, :389-392), so the
Gaussian count is constant — the whole refinement is ONE jitted
`lax.scan` over steps driving the Pallas rasterizer fwd+bwd; view selection
is a folded-PRNG `randint` + `dynamic_index`.  Not implemented (off by
default upstream): bilateral grid, depth loss, MCMC strategy, appearance
embeddings.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from vist3a_tpu.eval.metrics import compute_ssim
from vist3a_tpu.kernels.rasterizer import rasterize
from vist3a_tpu.nn.gaussians import Gaussians, build_covariance

__all__ = ["PostOptConfig", "refine", "splats_from_gaussians",
           "gaussians_from_splats", "rotation_6d_to_matrix"]


@dataclasses.dataclass(frozen=True)
class PostOptConfig:
    """Deployed subset of `post_opt.simple_trainer.Config` (:238-399)."""
    max_steps: int = 3_000
    ssim_lambda: float = 0.2
    lr_means: float = 1.6e-4
    lr_scales: float = 5e-3
    lr_quats: float = 1e-3
    lr_opacities: float = 5e-2
    lr_sh: float = 2.5e-3
    lr_pose: float = 1e-5
    pose_opt: bool = True
    opacity_reg: float = 0.0
    scale_reg: float = 0.0
    random_bkgd: bool = False
    prune_opacity: float = 0.01
    final_lr_ratio: float = 0.01     # ExponentialLR gamma = ratio**(1/steps)
    pair_budget: int | None = None   # rasterizer tile-pair budget


# --------------------------------------------------------------------------- #
# parametrization                                                             #
# --------------------------------------------------------------------------- #
def splats_from_gaussians(g: Gaussians, prune_opacity: float = 0.01):
    """Adapter Gaussians (batch 1) → trainable splat pytree + live mask
    (`create_splats_with_optimizers` :419-438; the reference drops
    low-opacity splats, we freeze them via the mask)."""
    means = g.means[0].astype(jnp.float32)
    scales = jnp.log(jnp.maximum(g.scales[0].astype(jnp.float32), 1e-10))
    quats = g.rotations[0].astype(jnp.float32)
    op = jnp.clip(g.opacities[0].astype(jnp.float32), 1e-6, 1.0 - 1e-6)
    opacities = jnp.log(op) - jnp.log1p(-op)               # logit
    sh = g.harmonics[0].astype(jnp.float32).transpose(0, 2, 1)  # (G, d_sh, 3)
    splats = {
        "means": means,
        "scales": scales,
        "quats": quats,
        "opacities": opacities,
        "sh0": sh[:, :1],
        "shN": sh[:, 1:],
    }
    live = (g.opacities[0] > prune_opacity).astype(jnp.float32)
    return splats, live


def gaussians_from_splats(splats: dict, live: jnp.ndarray) -> Gaussians:
    """Inverse of `splats_from_gaussians` (batch dim restored)."""
    scales = jnp.exp(splats["scales"])
    quats = splats["quats"]
    quats = quats / (jnp.linalg.norm(quats, axis=-1, keepdims=True) + 1e-8)
    harmonics = jnp.concatenate([splats["sh0"], splats["shN"]],
                                axis=1).transpose(0, 2, 1)
    return Gaussians(
        means=splats["means"][None],
        covariances=build_covariance(scales, quats)[None],
        harmonics=harmonics[None],
        opacities=(jax.nn.sigmoid(splats["opacities"]) * live)[None],
        scales=scales[None],
        rotations=quats[None],
    )


def rotation_6d_to_matrix(d6: jnp.ndarray) -> jnp.ndarray:
    """Zhou et al. 6D → rotation matrix, Gram–Schmidt (`utils.py:118-141`)."""
    a1, a2 = d6[..., :3], d6[..., 3:]
    b1 = a1 / (jnp.linalg.norm(a1, axis=-1, keepdims=True) + 1e-12)
    a2 = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = a2 / (jnp.linalg.norm(a2, axis=-1, keepdims=True) + 1e-12)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


def _apply_pose_adjust(c2w: jnp.ndarray, delta9: jnp.ndarray) -> jnp.ndarray:
    """c2w @ [R(id6+Δ6) | Δt] (`utils.py:28-49`, zero delta ⇒ identity)."""
    ident = jnp.asarray([1.0, 0.0, 0.0, 0.0, 1.0, 0.0], c2w.dtype)
    rot = rotation_6d_to_matrix(delta9[..., 3:] + ident)
    tf = jnp.eye(4, dtype=c2w.dtype)
    tf = tf.at[:3, :3].set(rot).at[:3, 3].set(delta9[..., :3])
    return c2w @ tf


# --------------------------------------------------------------------------- #
# optimizer                                                                   #
# --------------------------------------------------------------------------- #
def _make_optimizer(cfg: PostOptConfig):
    gamma = cfg.final_lr_ratio ** (1.0 / cfg.max_steps)

    def decayed(lr):
        return optax.adam(optax.exponential_decay(lr, 1, gamma))

    transforms = {
        "means": decayed(cfg.lr_means),
        "scales": optax.adam(cfg.lr_scales),
        "quats": optax.adam(cfg.lr_quats),
        "opacities": optax.adam(cfg.lr_opacities),
        "sh0": optax.adam(cfg.lr_sh),
        "shN": optax.adam(cfg.lr_sh / 20.0),   # :438
        "pose": decayed(cfg.lr_pose),
    }
    return optax.multi_transform(
        transforms, lambda params: {k: k for k in params})


class RefineResult(NamedTuple):
    gaussians: Gaussians
    c2w_refined: jnp.ndarray   # (V, 4, 4)
    losses: jnp.ndarray        # (max_steps,)


# --------------------------------------------------------------------------- #
# refinement loop                                                             #
# --------------------------------------------------------------------------- #
def refine(gaussians: Gaussians, images: jnp.ndarray, c2w: jnp.ndarray,
           k_norm: jnp.ndarray, key: jax.Array,
           cfg: PostOptConfig = PostOptConfig()) -> RefineResult:
    """Refine batch-1 Gaussians against V posed views.

    images (V, H, W, 3) in [0,1]; c2w (V, 4, 4); k_norm (V, 3, 3)
    width/height-normalized intrinsics (decoder convention).  The whole
    loop is one jitted scan; compile once per (V, H, W, G) shape.
    """
    v, h, w = images.shape[:3]
    splats, live = splats_from_gaussians(gaussians, cfg.prune_opacity)
    params = dict(splats)
    if cfg.pose_opt:
        params["pose"] = jnp.zeros((v, 9), jnp.float32)   # zero_init (:659)
    tx = _make_optimizer(cfg)
    scale = jnp.asarray([[w], [h], [1.0]], jnp.float32)
    ks = k_norm.astype(jnp.float32) * scale[None]

    def loss_fn(p, view, bg, pixels):
        cam = c2w[view].astype(jnp.float32)
        if cfg.pose_opt:
            cam = _apply_pose_adjust(cam, p["pose"][view])
        viewmat = jnp.linalg.inv(cam)
        g = gaussians_from_splats({k: p[k] for k in splats}, live)
        rgb, _, _ = rasterize(
            g.means[0], g.covariances[0], g.harmonics[0], g.opacities[0],
            viewmat[None], ks[view][None], w, h, sh_degree=None,
            background=bg, near_plane=1e-10, radius_clip=0.1,
            pair_budget=cfg.pair_budget)
        colors = rgb[0]                                   # (H, W, 3), raw
        l1 = jnp.mean(jnp.abs(colors - pixels))
        ssim = compute_ssim(pixels.transpose(2, 0, 1)[None],
                            colors.transpose(2, 0, 1)[None])[0]
        loss = l1 * (1.0 - cfg.ssim_lambda) + (1.0 - ssim) * cfg.ssim_lambda
        n_live = jnp.maximum(jnp.sum(live), 1.0)
        if cfg.opacity_reg > 0.0:
            loss = loss + cfg.opacity_reg * jnp.sum(
                jnp.abs(jax.nn.sigmoid(p["opacities"])) * live) / n_live
        if cfg.scale_reg > 0.0:
            loss = loss + cfg.scale_reg * jnp.sum(
                jnp.abs(jnp.exp(p["scales"])) * live[:, None]) / (3 * n_live)
        return loss

    def step_fn(carry, step):
        p, opt_state = carry
        k_step = jax.random.fold_in(key, step)
        view = jax.random.randint(jax.random.fold_in(k_step, 0), (), 0, v)
        bg = (jax.random.uniform(jax.random.fold_in(k_step, 1), (3,))
              if cfg.random_bkgd else jnp.zeros((3,), jnp.float32))
        pixels = jax.lax.dynamic_index_in_dim(images, view, 0,
                                              keepdims=False)
        loss, grads = jax.value_and_grad(loss_fn)(p, view, bg,
                                                  pixels.astype(jnp.float32))
        updates, opt_state = tx.update(grads, opt_state, p)
        return (optax.apply_updates(p, updates), opt_state), loss

    @jax.jit
    def run(p0):
        opt_state = tx.init(p0)
        (p, _), losses = jax.lax.scan(step_fn, (p0, opt_state),
                                      jnp.arange(cfg.max_steps))
        return p, losses

    p_final, losses = run(params)
    refined = gaussians_from_splats({k: p_final[k] for k in splats}, live)
    if cfg.pose_opt:
        c2w_out = jax.vmap(_apply_pose_adjust)(
            c2w.astype(jnp.float32), p_final["pose"])
    else:
        c2w_out = c2w.astype(jnp.float32)
    return RefineResult(refined, c2w_out, losses)
