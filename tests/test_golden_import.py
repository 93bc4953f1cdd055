"""Recorded-golden FULL-FORWARD parity tests for the weight importer.

The single place a silent layout mistake could survive every per-module
parity test is `io/weight_import.py`'s key mapping.  These tests close it:

  * a tiny torch model is assembled from the ACTUAL reference modules with
    the REAL hub-checkpoint prefixes (`encoder.aggregator.patch_embed.*`,
    `encoder.camera_head.*`, ... — the `lhjiang/anysplat` layout consumed by
    `cli/model_loading.load_anysplat_encoder`), its state_dict goes through
    `import_anysplat_encoder`, and the complete JAX encoder forward is
    compared against a restatement of the reference orchestration
    (`src/model/encoder/anysplat.py:414-620`) executed with the reference's
    own torch modules;
  * a reference-format stitched checkpoint (`model_stitching_training.py:
    57-72`: LoRA via the reference's own `utils/lora_util` surgery with
    target_modules=None — i.e. EVERY Linear/Conv2d incl. head convs — plus
    stitching conv + special tokens) goes through
    `import_stitched_checkpoint` → `lora_from_flat` → `graft`/`merge_lora`
    (the exact `load_stitched_model` assembly) and the chopped stitched
    forward (`models/anysplat_stitched.py:167-525`) is compared end to end.
"""

import sys
from pathlib import Path

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).parent))
import ref_loader

from vist3a_tpu.core.partition import graft
from vist3a_tpu.io import weight_import as wi
from vist3a_tpu.nn import aggregator as agg_mod
from vist3a_tpu.nn import encoder as enc_mod
from vist3a_tpu.nn import heads as H
from vist3a_tpu.nn import vit as vit_mod
from vist3a_tpu.stitch import chopped_anysplat as ca
from vist3a_tpu.stitch import lora as lora_mod

if not ref_loader.available():
    pytest.skip("reference not mounted", allow_module_level=True)

ref_loader.setup()

_VGGT = "third_party_model.anysplat.src.model.encoder.vggt"
_HEADS = "third_party_model.anysplat.src.model.encoder.heads"
_COMMON = "third_party_model.anysplat.src.model.encoder.common"

DIM = 64          # tiny embed dim (heads see 2·DIM taps)
AGG_DEPTH = 4
VIT_DEPTH = 3


def _sd(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


def _randomize(module, seed=0, scale=0.02):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * scale)
    return module


def _build_container(vit_img_size=28):
    """Tiny torch model with the hub checkpoint's module tree."""
    am = ref_loader.load(f"{_VGGT}.models.aggregator")
    vt = ref_loader.load(f"{_VGGT}.layers.vision_transformer")
    cam = ref_loader.load(f"{_VGGT}.heads.camera_head")
    dpt = ref_loader.load(f"{_VGGT}.heads.dpt_head")
    gsm = ref_loader.load(f"{_HEADS}.vggt_dpt_gs_head")

    torch.manual_seed(0)
    agg = am.Aggregator(img_size=vit_img_size, patch_size=14, embed_dim=DIM,
                        depth=AGG_DEPTH, num_heads=2, patch_embed="conv",
                        rope_freq=100, init_values=0.01)
    agg.use_checkpoint = False
    dino = vt.DinoVisionTransformer(
        img_size=vit_img_size, patch_size=14, embed_dim=DIM, depth=VIT_DEPTH,
        num_heads=2, num_register_tokens=4, init_values=1.0, block_chunks=0,
        interpolate_antialias=True, interpolate_offset=0.0)
    dino.use_checkpoint = False
    agg.patch_embed = dino

    enc = torch.nn.Module()
    enc.aggregator = agg
    enc.camera_head = cam.CameraHead(dim_in=2 * DIM, trunk_depth=2,
                                     num_heads=4)
    enc.depth_head = dpt.DPTHead(dim_in=2 * DIM, patch_size=14, output_dim=2,
                                 activation="exp", conf_activation="expp1",
                                 features=16, out_channels=[8, 12, 16, 16])
    enc.gaussian_param_head = gsm.VGGT_DPT_GS_Head(
        dim_in=2 * DIM, patch_size=(14, 14), output_dim=84, features=256,
        out_channels=[8, 12, 16, 16])
    outer = torch.nn.Module()
    outer.encoder = enc
    return _randomize(outer)


def _jax_cfg(vit_img_size=28):
    return enc_mod.EncoderConfig(
        vit=vit_mod.ViTConfig(img_size=vit_img_size, patch_size=14,
                              embed_dim=DIM, depth=VIT_DEPTH, num_heads=2,
                              layerscale=1.0, attn_impl="xla"),
        agg=agg_mod.AggregatorConfig(embed_dim=DIM, depth=AGG_DEPTH,
                                     num_heads=2, taps=(0, 1, 2, 3),
                                     attn_impl="xla"),
        camera=H.CameraHeadConfig(dim_in=2 * DIM, trunk_depth=2, num_heads=4),
        depth=H.DPTConfig(dim_in=2 * DIM, output_dim=2, features=16,
                          out_channels=(8, 12, 16, 16), activation="exp",
                          conf_activation="expp1"),
        gs=H.GSHeadConfig(dim_in=2 * DIM, features=256,
                          out_channels=(8, 12, 16, 16)),
        # render_conf off: the quantile mask flips borderline pixels under
        # fp32 noise (threshold tie-breaks), which would misalign the
        # reference's ragged gather vs our masked-opacity Gaussians.  With it
        # off EVERY pixel is compared; depth_conf itself is asserted above.
        pred_head_type="depth", render_conf=False, conf_threshold=0.1)


def _torch_heads(enc, tokens_list, psi, images01):
    """Restates `anysplat.py:421-620` (shared by the stitched forward,
    `models/anysplat_stitched.py:334-525`) with the reference's modules."""
    pe_mod = ref_loader.load(f"{_VGGT}.utils.pose_enc")
    geo_mod = ref_loader.load(f"{_VGGT}.utils.geometry")
    ga = ref_loader.load(f"{_COMMON}.gaussian_adapter")
    b, s = images01.shape[:2]
    h, w = images01.shape[-2:]

    pose_enc_list = enc.camera_head(tokens_list)
    extrinsic, intrinsic = pe_mod.pose_encoding_to_extri_intri(
        pose_enc_list[-1], (h, w))
    depth_map, depth_conf = enc.depth_head(
        tokens_list, images=images01, patch_start_idx=psi)
    pts_all = geo_mod.batchify_unproject_depth_map_to_point_map(
        depth_map, extrinsic, intrinsic)
    conf_valid = torch.ones_like(depth_conf, dtype=torch.bool)  # render_conf off
    out = enc.gaussian_param_head(
        tokens_list, pts_all.flatten(0, 1).permute(0, 3, 1, 2), images01,
        patch_start_idx=psi, image_size=(h, w))
    anchor_feats, _conf = out[:, :, :83], out[:, :, 83]
    scene_scale = pts_all.flatten(2, 3).norm(dim=-1).mean().clip(min=1e-8)

    assert b == 1  # ragged gather; b=1 keeps the restatement pad-free
    neural_feats = anchor_feats[0].permute(0, 2, 3, 1)[conf_valid[0]][None]
    neural_pts = pts_all[0][conf_valid[0]][None]
    densities = neural_feats[..., 0].sigmoid()
    # map_pdf_to_opacity at global_step 0 with the deployed opacity_mapping
    # (initial=final=0 ⇒ exponent 2**0=1 ⇒ identity)
    opacity = 0.5 * (1 - (1 - densities) + densities)
    adapter = ga.UnifiedGaussianAdapter(ga.GaussianAdapterCfg(
        gaussian_scale_min=0.5, gaussian_scale_max=15.0, sh_degree=4))
    gaussians = adapter.forward(neural_pts, neural_pts[..., -1:].contiguous(),
                                opacity, neural_feats[..., 1:])
    padrow = torch.tensor([0.0, 0.0, 0.0, 1.0]).view(1, 1, 1, 4).repeat(
        b, s, 1, 1)
    c2w = torch.cat([extrinsic, padrow], dim=2).inverse()
    intr_norm = torch.stack(
        [intrinsic[:, :, 0] / w, intrinsic[:, :, 1] / h, intrinsic[:, :, 2]],
        dim=2)
    return dict(pose_enc_list=pose_enc_list, depth=depth_map,
                depth_conf=depth_conf, conf_valid=conf_valid,
                gaussians=gaussians, c2w=c2w, intr_norm=intr_norm,
                scene_scale=scene_scale)


def _compare(out, ref, tol=2e-3, atol=None):
    atol = tol if atol is None else atol
    for mine, theirs in zip(out.pred_pose_enc_list, ref["pose_enc_list"]):
        np.testing.assert_allclose(np.asarray(mine), theirs.numpy(),
                                   rtol=tol, atol=atol)
    np.testing.assert_allclose(np.asarray(out.depth), ref["depth"].numpy(),
                               rtol=tol, atol=atol)
    np.testing.assert_allclose(np.asarray(out.depth_conf),
                               ref["depth_conf"].numpy(), rtol=tol, atol=atol)
    assert np.array_equal(np.asarray(out.conf_valid_mask),
                          ref["conf_valid"].numpy())
    np.testing.assert_allclose(np.asarray(out.extrinsic_c2w),
                               ref["c2w"].numpy(), rtol=tol, atol=atol)
    np.testing.assert_allclose(np.asarray(out.intrinsic_norm),
                               ref["intr_norm"].numpy(), rtol=tol, atol=atol)
    np.testing.assert_allclose(float(out.scene_scale),
                               float(ref["scene_scale"]), rtol=tol)
    # static-shape Gaussians: ours keep every pixel with opacity masked to 0;
    # the reference gathers mask-true pixels (b=1: flatten order matches)
    mask = np.asarray(out.conf_valid_mask).reshape(-1)
    g, rg = out.gaussians, ref["gaussians"]
    for name in ("means", "covariances", "harmonics", "scales", "opacities"):
        mine = np.asarray(getattr(g, name))[0][mask]
        theirs = getattr(rg, name).numpy()[0]
        np.testing.assert_allclose(mine, theirs, rtol=tol, atol=atol,
                                   err_msg=f"gaussians.{name}")
    # masked-out pixels must render as nothing
    assert np.all(np.asarray(g.opacities)[0][~mask] == 0.0)


# --------------------------------------------------------------------------- #
# 1. full hub-checkpoint import → full encoder forward                        #
# --------------------------------------------------------------------------- #
@pytest.mark.parametrize("hw", [28, 56])
def test_full_encoder_import_forward_parity(hw):
    """hw=28: identity pos-embed; hw=56: interpolated 2×2→4×4 (the stitched
    deployment always interpolates)."""
    outer = _build_container().eval()
    cfg = _jax_cfg()
    params = wi.import_anysplat_encoder(_sd(outer), prefix="encoder.")

    b, s = 1, 2
    x01 = np.random.default_rng(3).uniform(0, 1, (b, s, 3, hw, hw)) \
        .astype(np.float32)
    with torch.no_grad():
        tokens_list, psi = outer.encoder.aggregator(
            torch.from_numpy(x01), intermediate_layer_idx=[0, 1, 2])
        assert len(tokens_list) == 4 and psi == 5
        ref = _torch_heads(outer.encoder, tokens_list, psi,
                           torch.from_numpy(x01))

    out = enc_mod.forward(params, jnp.asarray(x01), cfg, remat=False)
    _compare(out, ref)


# --------------------------------------------------------------------------- #
# 2. stitched checkpoint (reference LoRA surgery) → chopped stitched forward  #
# --------------------------------------------------------------------------- #
def _torch_stitched_forward(outer, stitch_conv, latent, images_m11):
    """Restates `models/anysplat_stitched.py:167-330` +
    `models/stitched_model.py:92-173` with the reference's modules
    (the chopped container produced by `convert_model_to_stitched_model`)."""
    am = ref_loader.load(f"{_VGGT}.models.aggregator")
    enc = outer.encoder
    agg = enc.aggregator
    b, _, s, h, w = images_m11.shape
    with torch.no_grad():
        t_out = (latent.shape[2] - 1) * 4 + 1
        lat = F.interpolate(latent,
                            size=(t_out, latent.shape[3], latent.shape[4]),
                            mode="trilinear", align_corners=True)
        x = stitch_conv(lat)                         # (B, D, S, gh, gw)
        images01 = (images_m11.permute(0, 2, 1, 3, 4) + 1) / 2

        pe = agg.patch_embed                         # chopped DINOv2
        tok = x.permute(0, 2, 3, 4, 1).reshape(b * s, -1, x.shape[1])
        tok = torch.cat([pe.cls_token.expand(tok.shape[0], -1, -1), tok],
                        dim=1)
        tok = tok + pe.interpolate_pos_encoding(tok, w, h)
        tok = torch.cat(
            (tok[:, :1], pe.register_tokens.expand(tok.shape[0], -1, -1),
             tok[:, 1:]), dim=1)
        for blk in pe.blocks:
            tok = blk(tok)
        tok = pe.norm(tok)
        patch_tokens = tok[:, pe.num_register_tokens + 1:]

        camera_token = am.slice_expand_and_flatten(agg.camera_token, b, s)
        register_token = am.slice_expand_and_flatten(agg.register_token, b, s)
        tokens = torch.cat([camera_token, register_token, patch_tokens],
                           dim=1)
        pos = agg.position_getter(b * s, h // agg.patch_size,
                                  w // agg.patch_size, device=tokens.device)
        pos = pos + 1
        pos = torch.cat(
            [torch.zeros(b * s, agg.patch_start_idx, 2).to(pos.dtype), pos],
            dim=1)
        _, p, c = tokens.shape
        frame_idx = global_idx = 0
        output_list = []
        layer_idx = 0
        required = {0, 1, 2, agg.depth - 1}
        for _ in range(agg.aa_block_num):
            tokens, frame_idx, fi = agg._process_frame_attention(
                tokens, b, s, p, c, frame_idx, pos=pos)
            tokens, global_idx, gi = agg._process_global_attention(
                tokens, b, s, p, c, global_idx, pos=pos)
            for i in range(len(fi)):
                if layer_idx + i in required:
                    output_list.append(torch.cat([fi[i], gi[i]], dim=-1))
                layer_idx += agg.aa_block_size
        return _torch_heads(enc, output_list, agg.patch_start_idx, images01)


def test_stitched_checkpoint_golden_import():
    lu = ref_loader.load("utils.lora_util.utils")
    k_chop = 1
    outer = _build_container()
    base_sd = _sd(outer)                    # the pretrained "anysplat.pth"

    # reference chop (`anysplat_stitched.py:158-165`): blocks renumber from 0
    dino = outer.encoder.aggregator.patch_embed
    del dino.patch_embed
    for _ in range(k_chop):
        del dino.blocks[0]
    # reference LoRA surgery; target_modules=None wraps EVERY Linear/Conv2d
    lu.add_lora(outer, target_modules=None, r=4, alpha=8)
    g = torch.Generator().manual_seed(7)
    with torch.no_grad():
        for n, p in outer.named_parameters():
            if "lora_" in n:                # B is zero-init; force real deltas
                p.copy_(torch.randn(p.shape, generator=g) * 0.05)

    torch.manual_seed(11)
    stitch_conv = torch.nn.Conv3d(6, DIM, (5, 3, 3), stride=(1, 2, 2),
                                  padding=(2, 1, 1))
    with torch.no_grad():
        stitch_conv.weight.mul_(0.2)

    # the exact `model_stitching_training.py:57-72` checkpoint payload
    save = {
        "lora": lu.lora_state_dict(outer, bias="lora_only"),
        "stitching_layer": {k: v.detach() for k, v in
                            stitch_conv.state_dict().items()},
        "mask_token": dino.mask_token.data,
        "cls_token": dino.cls_token.data,
        "register_tokens": dino.register_tokens.data,
    }
    assert any(".scratch." in k for k in save["lora"])      # head convs in
    assert any(".poseLN_modulation.1." in k for k in save["lora"])

    # ---- our side: the `load_stitched_model` assembly ----------------------
    encoder = wi.import_anysplat_encoder(base_sd, prefix="encoder.")
    pieces = wi.import_stitched_checkpoint(save, vit_chop=k_chop)
    lora_flat = {k.removeprefix("encoder/"): v
                 for k, v in pieces["lora"].items()}
    lora_tree, bias_over = lora_mod.lora_from_flat(lora_flat, encoder)
    encoder = graft(encoder, bias_over)
    encoder = lora_mod.merge_lora(encoder, lora_tree,
                                  lora_mod.LoraConfig(r=4, alpha=8))
    encoder["vit"] = {
        **encoder["vit"],
        "mask_token": pieces["special"]["mask_token"],
        "cls_token": pieces["special"]["cls_token"],
        "register_tokens": pieces["special"]["register_tokens"],
    }
    scfg = ca.StitchedConfig(
        encoder=_jax_cfg(), stitch_layer_index=k_chop,
        conv_spec="conv3d_k5x3x3_o64_s1x2x2_p2x1x1", latent_channels=6)
    params = {"encoder": encoder, "stitch_conv": pieces["stitch_conv"]}

    rng = np.random.default_rng(5)
    latent = rng.standard_normal((1, 6, 2, 8, 8)).astype(np.float32)
    s = (latent.shape[2] - 1) * 4 + 1                        # 5 views
    images = rng.uniform(-1, 1, (1, 3, s, 56, 56)).astype(np.float32)

    ref = _torch_stitched_forward(outer, stitch_conv,
                                  torch.from_numpy(latent),
                                  torch.from_numpy(images))
    out = ca.forward_with_latent(params, jnp.asarray(latent),
                                 jnp.asarray(images), scfg, remat=False)
    # deeper chain than the full-forward test (trilinear pre-upsample +
    # stitch conv + LoRA deltas at every site): fp32 noise reaches ~6e-3 on
    # a 1% tail of near-zero harmonics; a key-mapping bug would be gross
    _compare(out, ref, atol=1e-2)
