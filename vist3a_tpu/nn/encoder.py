"""Full AnySplat encoder: aggregator → camera/depth/GS heads → Gaussians.

Behavioral parity with `src/model/encoder/anysplat.py:337-620` (the teacher /
full feed-forward model) and the head-composition half of
`models/anysplat_stitched.py:330-525` (shared by the stitched student via
`vist3a_tpu/stitch/chopped_anysplat.py`):

  * camera head (fp32, 4 refinement iterations) → pose enc → extri/intri;
  * depth DPT head → depth + confidence → world-point unprojection;
  * Gaussian DPT head (RGB skip) → 83 raw channels + confidence;
  * confidence mask by global quantile (`render_conf`), density sigmoid →
    `map_pdf_to_opacity`, optional `opacity_conf` reweighting;
  * `UnifiedGaussianAdapter` → calibrated Gaussians;
  * context pose dict: c2w 4×4 + width/height-normalized intrinsics.

TPU note — static shapes: the reference gathers confidence-masked pixels into
ragged per-batch lists and pads with −1e10/−1e4 sentinels
(`anysplat.py:486-499`).  Here every pixel stays resident and the mask is
folded into opacity (masked Gaussians have opacity 0 ⇒ identical renders),
so G = S·H·W is static.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from vist3a_tpu.nn import aggregator as agg_mod
from vist3a_tpu.nn import vit as vit_mod
from vist3a_tpu.nn.gaussians import (
    Gaussians,
    map_pdf_to_opacity,
    unified_gaussian_adapter,
)
from vist3a_tpu.nn.geometry import (
    closed_form_inverse_se3,
    pose_encoding_to_extri_intri,
    unproject_depth,
)
from vist3a_tpu.nn.heads import (
    CameraHeadConfig,
    DPTConfig,
    GSHeadConfig,
    camera_head_apply,
    camera_head_init,
    dpt_apply,
    dpt_init,
    gs_head_apply,
    gs_head_init,
)


@dataclasses.dataclass(frozen=True)
class EncoderConfig:
    """Mirrors the deployed `EncoderAnySplatCfg` fields that the forward uses
    (`anysplat.py:82-125`; voxelize forced off by
    `model_stitching_training.py:331-332`)."""
    vit: vit_mod.ViTConfig = vit_mod.VIT_LARGE
    agg: agg_mod.AggregatorConfig = agg_mod.AggregatorConfig()
    camera: CameraHeadConfig = CameraHeadConfig()
    depth: DPTConfig = DPTConfig(activation="exp", conf_activation="expp1")
    # point head: DPT predicting xyz directly (`anysplat.py:428-433`;
    # VGGT-1B `point_head` = DPTHead(output_dim=4, activation="inv_log"))
    point: DPTConfig = DPTConfig(activation="inv_log",
                                 conf_activation="expp1", output_dim=4)
    gs: GSHeadConfig = GSHeadConfig(output_dim=84, head2_features=128,
                                    pos_embed=False)
    sh_degree: int = 4
    # "depth" (deployed VIST3A path) or "point" (`anysplat.py:108,428-443`)
    pred_head_type: str = "depth"
    render_conf: bool = True
    conf_threshold: float = 0.1
    opacity_conf: bool = False
    # DPT-cascade activation dtype.  "float32" reproduces the reference
    # (`anysplat.py:421` runs heads fp32); "bfloat16" halves the HBM traffic
    # of the 448²-resolution conv temporaries on the inference decode.  The
    # MXU numerics are identical either way (fp32 convs already run as
    # single-pass bf16 products, see `heads._P`); bf16 only adds 2^-8
    # STORAGE rounding between ops.  Final activations (exp/quantile/
    # assembly) always compute fp32.  Part of the (frozen, hashable) config,
    # so it participates in every jit cache key.
    head_dtype: str = "float32"

    @property
    def raw_gs_dim(self) -> int:
        # 1 density + 3 scales + 4 quat + 3·(deg+1)² SH = 83 at degree 4
        return self.gs.output_dim - 1


class EncoderOutput(NamedTuple):
    gaussians: Gaussians
    pred_pose_enc_list: list
    extrinsic_c2w: jnp.ndarray      # (B, S, 4, 4)
    intrinsic_norm: jnp.ndarray     # (B, S, 3, 3), fx/W fy/H normalized
    depth: jnp.ndarray              # (B, S, H, W, 1)
    depth_conf: jnp.ndarray         # (B, S, H, W)
    conf_valid_mask: jnp.ndarray    # (B, S, H, W) bool
    scene_scale: jnp.ndarray        # ()
    anchor_feats: jnp.ndarray       # (B, S, raw_gs_dim, H, W)
    gs_conf: jnp.ndarray            # (B, S, H, W)


def init(key: jax.Array, cfg: EncoderConfig = EncoderConfig(),
         dtype=jnp.float32) -> dict:
    keys = jax.random.split(key, 6)
    params = {
        "vit": vit_mod.init(keys[0], cfg.vit, dtype),
        "aggregator": agg_mod.init(keys[1], cfg.agg, dtype),
        "camera_head": camera_head_init(keys[2], cfg.camera, dtype),
        "depth_head": dpt_init(keys[3], cfg.depth, dtype),
        "gs_head": gs_head_init(keys[4], cfg.gs, dtype),
    }
    if cfg.pred_head_type == "point":
        params["point_head"] = dpt_init(keys[5], cfg.point, dtype)
    return params


def cast_trunk_bf16(params: dict) -> dict:
    """Selective bf16 weight cast skipping head modules — the reference's
    `cast_to_bfloat16` (`utils/utils_for_thirdparty.py:53-69`) skips any
    module with "head" in its name; heads compute fp32."""
    out = {}
    for k, v in params.items():
        if "head" in k:
            out[k] = v
        else:
            out[k] = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16)
                if jnp.issubdtype(x.dtype, jnp.floating) else x, v)
    return out


def heads_pipeline(params: dict, cfg: EncoderConfig, taps: list,
                   images01: jnp.ndarray, *,
                   remat: bool = False) -> EncoderOutput:
    """taps (4 × (B,S,P,2C)) + images (B,S,3,H,W) in [0,1] → EncoderOutput.

    Heads default to fp32 activations regardless of trunk dtype
    (`anysplat.py:421`, `models/anysplat_stitched.py:335`); the DPT
    cascades honor `cfg.head_dtype` (bf16 on the inference decode).  The
    camera head, activations, quantile, and Gaussian assembly are always
    fp32.
    """
    b, s, _, h, w = images01.shape
    psi = cfg.agg.patch_start_idx

    # camera: last tap (un-cast — the camera head computes fp32 internally),
    # 4 refinement iterations
    pose_enc_list = camera_head_apply(params["camera_head"], taps[-1],
                                      cfg.camera)

    # DPT cascades run at cfg.head_dtype (see its docstring)
    hdt = jnp.dtype(cfg.head_dtype)
    taps = [t.astype(hdt) for t in taps]
    images01 = images01.astype(hdt)
    last_pose_enc = pose_enc_list[-1]
    extrinsic, intrinsic = pose_encoding_to_extri_intri(last_pose_enc, (h, w))

    if cfg.pred_head_type == "point":
        # point head predicts xyz directly (`anysplat.py:428-433`).  The
        # reference leaves `depth_conf` undefined on this branch (it would
        # crash under `render_conf`); we define it as the point confidence
        # and report depth as the points' z (documented deviation — the
        # only self-consistent completion of the reference behavior).
        pts, depth_conf = dpt_apply(params["point_head"], taps, (h, w), psi,
                                    cfg.point, (b, s),
                                    remat=remat)             # (B,S,H,W,3)
        depth = pts[..., 2:3]
    else:
        # depth → world points (deployed path, `anysplat.py:434-443`)
        depth, depth_conf = dpt_apply(params["depth_head"], taps, (h, w),
                                      psi, cfg.depth, (b, s), remat=remat)
        pts = unproject_depth(depth, extrinsic, intrinsic)    # (B,S,H,W,3)

    # confidence mask (global quantile over all views/pixels).  Computed
    # once and shared with the opacity shift below — the two sites use the
    # identical expression but XLA does NOT CSE the 2.6M-value sort across
    # them (measured 2.8 ms each, r4 `tools/gap_probe.py`).
    thresh = (jnp.quantile(depth_conf, cfg.conf_threshold)
              if cfg.render_conf or cfg.opacity_conf else None)
    if cfg.render_conf:
        conf_valid = depth_conf > thresh
    else:
        conf_valid = jnp.ones_like(depth_conf, dtype=bool)

    # Gaussian params head (with RGB skip); raw is channels-last (B,S,H,W,84)
    raw = gs_head_apply(params["gs_head"], taps, images01, psi, cfg.gs,
                        remat=remat)
    gs_conf = raw[..., cfg.raw_gs_dim]                        # (B,S,H,W)
    # reference-layout (B,S,83,H,W) view for the API/loss surface; the
    # assembly below reads the NHWC form directly (no 0.9 GB transpose on
    # the decode path — XLA drops this moveaxis when anchor_feats is unused)
    anchor_feats = jnp.moveaxis(raw[..., : cfg.raw_gs_dim], -1, 2)

    scene_scale = jnp.clip(
        jnp.mean(jnp.linalg.norm(pts.reshape(b, -1, 3), axis=-1)), 1e-8)

    # static-shape Gaussian assembly: mask → opacity (see module docstring)
    feats = raw[..., : cfg.raw_gs_dim].reshape(b, -1, cfg.raw_gs_dim)
    means = pts.reshape(b, -1, 3)
    mask = conf_valid.reshape(b, -1)
    densities = jax.nn.sigmoid(feats[..., 0])
    opacity = map_pdf_to_opacity(densities)
    if cfg.opacity_conf:
        opacity = opacity * jax.nn.sigmoid(depth_conf.reshape(b, -1) - thresh)
    opacity = opacity * mask

    gaussians = unified_gaussian_adapter(means, opacity, feats[..., 1:],
                                         cfg.sh_degree)

    # context pose: pad [0,0,0,1], invert to c2w; normalize K by (w, h)
    pad = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], extrinsic.dtype), (b, s, 1, 4))
    extri44 = jnp.concatenate([extrinsic, pad], axis=2)
    c2w = closed_form_inverse_se3(extri44.reshape(b * s, 4, 4)).reshape(
        b, s, 4, 4)
    scale = jnp.asarray([[1.0 / w], [1.0 / h], [1.0]], intrinsic.dtype)
    intrinsic_norm = intrinsic * scale

    return EncoderOutput(
        gaussians=gaussians,
        pred_pose_enc_list=pose_enc_list,
        extrinsic_c2w=c2w,
        intrinsic_norm=intrinsic_norm,
        depth=depth,
        depth_conf=depth_conf,
        conf_valid_mask=conf_valid,
        scene_scale=scene_scale,
        anchor_feats=anchor_feats,
        gs_conf=gs_conf,
    )


def forward(params: dict, images01: jnp.ndarray,
            cfg: EncoderConfig = EncoderConfig(), *,
            remat: bool = True) -> EncoderOutput:
    """Full (un-chopped) encoder — the frozen distillation teacher.

    images01: (B, S, 3, H, W) in [0, 1] (`anysplat.py:337-620`; the
    stitching trainer feeds `(imgs+1)/2`, `model_stitching_training.py:129`).
    """
    taps, _ = agg_mod.forward(params["aggregator"], params["vit"], images01,
                              cfg.agg, cfg.vit, remat=remat)
    return heads_pipeline(params, cfg, taps, images01, remat=remat)
