"""Checkpoint → params assembly for the CLI entry points.

Parity target: `evaluation/novel_view_synthesis_bench/nvs_eval.py:21-63`
(`load_stitching_model`) + `utils/utils_for_thirdparty.py` — rebuild the
stitched model from (a) the pretrained AnySplat encoder, (b) the Wan VAE,
(c) the trained stitching checkpoint {lora, stitching_layer, mask/cls/
register tokens}, then cast the trunk bf16.

Weight files are local paths (zero-egress environments can't reach the HF
hub): pass `--weights_root` or set $VIST3A_WEIGHTS with the layout

    {root}/anysplat.pth                # lhjiang/anysplat full state dict
    {root}/wan_vae/                    # diffusers AutoencoderKLWan subfolder
    {root}/wan_dit/                    # diffusers WanTransformer3DModel
    {root}/umt5/                       # HF UMT5EncoderModel
"""

from __future__ import annotations

import os
from pathlib import Path

import jax.numpy as jnp

from vist3a_tpu.core.partition import graft
from vist3a_tpu.io import load_weights, weight_import
from vist3a_tpu.nn import encoder as enc_mod
from vist3a_tpu.stitch import chopped_anysplat as ca
from vist3a_tpu.stitch import lora as lora_mod


def weights_root(args=None) -> Path:
    root = getattr(args, "weights_root", None) or os.environ.get(
        "VIST3A_WEIGHTS", "checkpoints")
    return Path(root)


def _validate(sd, family):
    """Expected-key manifest gate (`io/manifests.py`): a real released
    checkpoint that misses/adds/reshapes keys fails HERE with the full
    diff instead of silently mis-mapping.  Skipped only when the manifest
    family's deployed config doesn't describe this file (strict_extra off
    would hide real drift)."""
    from vist3a_tpu.io import manifests

    manifests.validate_state_dict(sd, family)
    return sd


def load_anysplat_encoder(root: Path) -> dict:
    p = root / "anysplat.pth"
    if p.exists():
        sd = load_weights.load_torch_state_dict(p)
    else:
        sd = load_weights.load_sharded_safetensors(root / "anysplat")
    return weight_import.import_anysplat_encoder(
        _validate(sd, "anysplat_encoder"))


def load_wan_vae_params(root: Path):
    from vist3a_tpu.nn.wan_vae import WanVAEConfig

    sd = load_weights.load_sharded_safetensors(root / "wan_vae")
    return weight_import.import_wan_vae(_validate(sd, "wan_vae"),
                                        WanVAEConfig())


def load_stitched_model(args, *, eval_dtype_bf16: bool = True):
    """Rebuild StitchVAE3D-equivalent params from `args.checkpoint_path`
    (torch `stitched_model_epoch_N.pth` pieces) on top of the pretrained
    encoder + VAE.  Returns (params, scfg)."""
    root = weights_root(args)
    encoder = load_anysplat_encoder(root)
    vae = load_wan_vae_params(root)

    from vist3a_tpu.stitch.conv_spec import ConvSpec, conv_spec_to_string

    spec = args.stitching_layer_config
    spec_str = (conv_spec_to_string(spec) if isinstance(spec, ConvSpec)
                else str(spec))
    scfg = ca.StitchedConfig(
        stitch_layer_index=int(
            args.stitching_layer_location.rsplit("_", 1)[-1]),
        conv_spec=spec_str)

    lora_cfg = lora_mod.parse_lora_mode(args.lora_config)

    if getattr(args, "checkpoint_path", None):
        sd = load_weights.load_torch_state_dict(args.checkpoint_path)
        pieces = weight_import.import_stitched_checkpoint(
            sd, vit_chop=scfg.stitch_layer_index)
        lora_flat = pieces["lora"]
        lora_tree, bias_over = lora_mod.lora_from_flat(
            {k.removeprefix("encoder/"): v for k, v in lora_flat.items()},
            encoder)
        encoder = graft(encoder, bias_over)
        encoder = lora_mod.merge_lora(encoder, lora_tree, lora_cfg)
        encoder["vit"] = {
            **encoder["vit"],
            "mask_token": pieces["special"]["mask_token"],
            "cls_token": pieces["special"]["cls_token"],
            "register_tokens": pieces["special"]["register_tokens"],
        }
        stitch_conv = pieces["stitch_conv"]
    elif getattr(args, "initialization_weight_path", None):
        init_sd = load_weights.load_torch_state_dict(
            args.initialization_weight_path)
        stitch_conv = {"kernel": jnp.asarray(init_sd["weight"]),
                       "bias": jnp.asarray(init_sd["bias"])}
    else:
        raise ValueError("need --checkpoint_path or "
                         "--initialization_weight_path")

    if eval_dtype_bf16:
        encoder = enc_mod.cast_trunk_bf16(encoder)
    return {"encoder": encoder, "stitch_conv": stitch_conv, "vae": vae}, scfg
