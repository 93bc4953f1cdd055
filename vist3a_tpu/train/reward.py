"""Reward models: PickScore + DFN5B-CLIP mixed loss, rendered-view reward.

Parity target: `utils/reward.py` —
  * `_pickscore_preprocess` (:62-88): [−1,1]→[0,1]→×255, BICUBIC antialias
    resize with shorter side 224 (aspect kept), center crop 224, /255, CLIP
    normalize;
  * `_peclip_preprocess` (:107-111): bilinear-antialias resize to 378², CLIP
    normalize;
  * `loss_fn` (:117-193): pick loss = |target − diag(logit_scale·T@Iᵀ)/100|,
    pe loss = 1 − cos diag; mix with weights 0.25/0.25; text features frozen
    (no-grad) — here they are INPUTS (host-precomputed);
  * `calculate_reward` (:198-256): stitched decode of the rollout latents
    (feedforward resize 448 trilinear align_corners=TRUE), render 13
    randomly-permuted predicted views at 448², score renders + 1 random
    decoded frame; returns the summed loss and the image pair for logging.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

from vist3a_tpu.nn import clip as clip_mod
from vist3a_tpu.nn.splat_decoder import render
from vist3a_tpu.stitch import chopped_anysplat as ca

_MEAN = jnp.asarray(clip_mod.CLIP_MEAN).reshape(1, 3, 1, 1)
_STD = jnp.asarray(clip_mod.CLIP_STD).reshape(1, 3, 1, 1)


def pickscore_preprocess(im_pm1: jnp.ndarray, size: int = 224) -> jnp.ndarray:
    """(B,3,H,W) in [−1,1] → CLIP-normalized size² (`utils/reward.py:62-88`;
    deployed size 224)."""
    im = jnp.clip(im_pm1 / 2.0 + 0.5, 0.0, 1.0)
    b, c, h, w = im.shape
    if h < w:
        height, width = size, w * size // h
    else:
        width, height = size, h * size // w
    im = jax.image.resize(im, (b, c, height, width), method="bicubic",
                          antialias=True)
    startx = width // 2 - size // 2
    starty = height // 2 - size // 2
    im = im[:, :, starty:starty + size, startx:startx + size]
    return (im - _MEAN.astype(im.dtype)) / _STD.astype(im.dtype)


def peclip_preprocess(im_pm1: jnp.ndarray, size: int = 378) -> jnp.ndarray:
    im = jnp.clip(im_pm1 / 2.0 + 0.5, 0.0, 1.0)
    b, c, _, _ = im.shape
    im = jax.image.resize(im, (b, c, size, size), method="linear",
                          antialias=True)
    return (im - _MEAN.astype(im.dtype)) / _STD.astype(im.dtype)


@dataclasses.dataclass(frozen=True)
class RewardConfig:
    pickscore_weight: float = 0.25
    peclip_weight: float = 0.25
    pickscore_target: float = 1.0
    pickscore_div: float = 100.0
    pick_cfg: clip_mod.CLIPVisionConfig = clip_mod.CLIP_H_224
    pe_cfg: clip_mod.CLIPVisionConfig = clip_mod.DFN5B_H_378


def make_loss_fn(pick_params, pe_params, *, pick_text=None, pe_text=None,
                 logit_scale: float, cfg: RewardConfig = RewardConfig()
                 ) -> Callable:
    """pick_text / pe_text: L2-normalized text features (B_txt, D) computed
    off-path (no grad, `utils/reward.py:152-158,171-174`).  They may be
    bound here (fixed prompt) or passed per call — the per-call form keeps
    the jitted train step's cache key independent of the prompt (the
    reference recomputes text features in-loop, `utils/reward.py:152-174`).
    Returns loss_fn(im_pm1, pick_text=None, pe_text=None)
    → (loss, mixed_score, scores).

    The CLIP tower params may also arrive per call (pick_params/pe_params
    overrides): `vdm_train_step` passes `loss_fn.reward_params` as traced
    jit ARGUMENTS so the ~2.5 GB of frozen towers are not baked into the
    compiled program as constants (which would double their HBM and ship
    them through the remote-compile tunnel on every variant)."""
    bound_pick, bound_pe = pick_text, pe_text
    bound_pick_params, bound_pe_params = pick_params, pe_params

    def loss_fn(im_pm1, pick_text=None, pe_text=None,
                pick_params=None, pe_params=None):
        pick_params = bound_pick_params if pick_params is None else pick_params
        pe_params = bound_pe_params if pe_params is None else pe_params
        pick_text = bound_pick if pick_text is None else pick_text
        pe_text = bound_pe if pe_text is None else pe_text
        if pick_text is None or pe_text is None:
            raise ValueError(
                "reward loss needs text features: bind pick_text/pe_text in "
                "make_loss_fn or pass them per call (vdm_train_step's "
                "reward_text)")
        b = im_pm1.shape[0]
        pick_im = pickscore_preprocess(im_pm1, cfg.pick_cfg.image_size)
        pick_img = clip_mod.image_features(pick_params, pick_im,
                                           cfg.pick_cfg)
        pt = jnp.broadcast_to(pick_text, (b, pick_text.shape[-1])) \
            if pick_text.shape[0] == 1 else pick_text
        pick_diag = logit_scale * jnp.sum(pt * pick_img, axis=-1)
        pick_scaled = pick_diag / cfg.pickscore_div
        pick_loss = jnp.mean(jnp.abs(cfg.pickscore_target - pick_scaled))

        pe_im = peclip_preprocess(im_pm1, cfg.pe_cfg.image_size)
        pe_img = clip_mod.image_features(pe_params, pe_im, cfg.pe_cfg)
        et = jnp.broadcast_to(pe_text, (b, pe_text.shape[-1])) \
            if pe_text.shape[0] == 1 else pe_text
        pe_diag = jnp.sum(et * pe_img, axis=-1)
        pe_loss = jnp.mean(1.0 - pe_diag)

        loss = cfg.pickscore_weight * pick_loss + cfg.peclip_weight * pe_loss
        mixed = (cfg.pickscore_weight * jnp.mean(pick_scaled)
                 + cfg.peclip_weight * jnp.mean(pe_diag))
        scores = {"pickscore_raw": jnp.mean(pick_diag),
                  "pickscore_scaled": jnp.mean(pick_scaled),
                  "peclip_score": jnp.mean(pe_diag)}
        return loss, mixed, scores

    # picked up by vdm_train_step and threaded as traced args (see above)
    loss_fn.reward_params = {"pick": pick_params, "pe": pe_params}
    # stable jit-cache key: two loss_fns with the same token trace the SAME
    # program (towers/text ride as traced args), so `train/vdm._vdm_step_jit`
    # keys its lru_cache on this instead of function identity — rebuilding a
    # loss_fn per prompt must never silently recompile the whole train step
    loss_fn.cache_token = ("reward_loss_v1", cfg, float(logit_scale),
                           pick_text is not None, pe_text is not None)
    return loss_fn


def calculate_reward(key: jax.Array, gen_latents: jnp.ndarray,
                     video: jnp.ndarray, stitched_params: dict,
                     scfg: ca.StitchedConfig, loss_fn: Callable, *,
                     num_render_views: int = 13, render_size: int = 448,
                     pair_budget: int | None = None,
                     text_feats=None, reward_params=None):
    """`utils/reward.py:198-256` for batch size 1 (the reference's loop body).

    gen_latents: (1,16,T,h,w) un-normalized; video: (1,3,T_pix,H,W) decoded
    frames in [−1,1].  text_feats: optional (pick_text, pe_text) runtime
    features forwarded to loss_fn (per-prompt, traced — see make_loss_fn).
    reward_params: optional {"pick","pe"} tower params forwarded the same
    way (traced, so they are jit ARGUMENTS rather than baked constants).
    Returns (reward_loss, (decoded_frame, rendered_views))
    — images in [0,1] (B,H,W,3) for logging."""
    tkw = ({} if text_feats is None
           else {"pick_text": text_feats[0], "pe_text": text_feats[1]})
    if reward_params:
        tkw["pick_params"] = reward_params["pick"]
        tkw["pe_params"] = reward_params["pe"]
    if pair_budget is None:
        # the reward-path setting is the 1×G budget (PARITY: graceful
        # depth-ordered degradation, val loss within 0.06%); the
        # rasterizer's own default (4×G) triples the pair-stream buffers in
        # the deployed RL step's HBM plan
        pair_budget = scfg.latent_t * render_size * render_size
    k_views, k_frame = jax.random.split(key)
    t_pix = video.shape[2]
    feedforward = ca.resize_align_corners_nd(
        video, {3: render_size, 4: render_size})
    out = ca.forward_with_latent(stitched_params, gen_latents,
                                 feedforward.astype(jnp.float32), scfg)

    n_views = out.extrinsic_c2w.shape[1]
    perm = jax.random.permutation(k_views, n_views)[:num_render_views]
    tgt_ex = out.extrinsic_c2w[:, perm]
    tgt_k = out.intrinsic_norm[:, perm]
    # remat per view: 13 views' rasterizer grad residuals measured 20.3 GB
    # without it (kernels/rasterizer.rasterize docstring)
    rendered = render(out.gaussians, tgt_ex, tgt_k,
                      (render_size, render_size), remat_views=True,
                      pair_budget=pair_budget).color[0]     # (V,3,H,W) [0,1]
    rendered_pm1 = rendered * 2.0 - 1.0
    loss_r, _, _ = loss_fn(rendered_pm1, **tkw)

    gt_idx = jax.random.randint(k_frame, (1,), 0, t_pix)
    decoded = feedforward[:, :, gt_idx[0]]                      # (1,3,H,W)
    loss_d, _, _ = loss_fn(decoded, **tkw)

    imgs = (jnp.transpose((decoded + 1) / 2, (0, 2, 3, 1)),
            jnp.transpose(rendered, (0, 2, 3, 1)))
    return loss_r + loss_d, imgs
