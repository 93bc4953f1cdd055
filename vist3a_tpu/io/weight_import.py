"""Torch-checkpoint → JAX param-tree import.

Maps the reference state_dict layouts (VGGT-1B / AnySplat / Wan diffusers /
`anysplat_stitched.pth`) onto this framework's pytrees:

  * torch ``nn.Linear`` weight (out,in) → ``{"w": (in,out)}`` (transposed),
  * torch convs keep their OIHW / (I,O,kh,kw) layouts (our conv helpers use
    torch layouts natively),
  * ``LayerNorm.weight/bias`` → ``{"scale","bias"}``,
  * per-layer blocks ``blocks.{i}.*`` → one stacked pytree (leading layer
    axis) for `lax.scan`.

Input is a flat ``dict[str, np.ndarray]`` (load .pt/.safetensors on host,
convert tensors with ``.numpy()``).  No torch dependency here.
"""

from __future__ import annotations

import re

import jax.numpy as jnp
import numpy as np


def _t(sd, key):
    return jnp.asarray(np.asarray(sd[key]))


def _linear(sd, prefix):
    p = {"w": jnp.asarray(np.asarray(sd[f"{prefix}.weight"]).T)}
    if f"{prefix}.bias" in sd:
        p["b"] = _t(sd, f"{prefix}.bias")
    return p


def _conv(sd, prefix):
    p = {"kernel": _t(sd, f"{prefix}.weight")}
    if f"{prefix}.bias" in sd:
        p["bias"] = _t(sd, f"{prefix}.bias")
    return p


def _conv_hwio(sd, prefix):
    """ConvTranspose2d sites store the HWIO transpose of torch's IOHW
    weight (`nn/heads.py:conv_transpose2d`)."""
    w = np.asarray(sd[f"{prefix}.weight"])
    p = {"kernel_hwio": jnp.asarray(w.transpose(2, 3, 1, 0))}
    if f"{prefix}.bias" in sd:
        p["bias"] = _t(sd, f"{prefix}.bias")
    return p


def _conv_mat(sd, prefix):
    """Head Conv2d sites store the kernel as a 2D (kh·kw·ci, co) matrix
    under `kernel_mat<k>` (`nn/heads.py:conv2d` — conv-operand layouts pad
    small spatial dims 56.9× on TPU)."""
    w = np.asarray(sd[f"{prefix}.weight"])          # OIHW
    o, i, kh, kw = w.shape
    mat = w.transpose(2, 3, 1, 0).reshape(kh * kw * i, o)
    p = {f"kernel_mat{kh}": jnp.asarray(mat)}
    if f"{prefix}.bias" in sd:
        p["bias"] = _t(sd, f"{prefix}.bias")
    return p


def _ln(sd, prefix):
    return {"scale": _t(sd, f"{prefix}.weight"), "bias": _t(sd, f"{prefix}.bias")}


def import_block(sd, prefix: str) -> dict:
    """One transformer Block (`vggt/layers/block.py`)."""
    p = {
        "norm1": _ln(sd, f"{prefix}.norm1"),
        "attn": {
            "qkv": _linear(sd, f"{prefix}.attn.qkv"),
            "proj": _linear(sd, f"{prefix}.attn.proj"),
        },
        "norm2": _ln(sd, f"{prefix}.norm2"),
        "mlp": {
            "fc1": _linear(sd, f"{prefix}.mlp.fc1"),
            "fc2": _linear(sd, f"{prefix}.mlp.fc2"),
        },
    }
    if f"{prefix}.attn.q_norm.weight" in sd:
        p["attn"]["q_norm"] = _ln(sd, f"{prefix}.attn.q_norm")
        p["attn"]["k_norm"] = _ln(sd, f"{prefix}.attn.k_norm")
    if f"{prefix}.ls1.gamma" in sd:
        p["ls1"] = {"gamma": _t(sd, f"{prefix}.ls1.gamma")}
        p["ls2"] = {"gamma": _t(sd, f"{prefix}.ls2.gamma")}
    return p


def stack_blocks(blocks: list[dict]) -> dict:
    import jax

    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)


def _block_indices(sd, prefix: str) -> list[int]:
    idx = set()
    for k in sd:
        if k.startswith(prefix):
            rest = k[len(prefix):]
            idx.add(int(rest.split(".")[0]))
    return sorted(idx)


def import_vit(sd, prefix: str = "") -> dict:
    """DINOv2 trunk (`vision_transformer.py`); prefix e.g.
    'aggregator.patch_embed.'."""
    p = prefix
    blocks = [import_block(sd, f"{p}blocks.{i}")
              for i in _block_indices(sd, f"{p}blocks.")]
    return {
        "patch_proj": _conv(sd, f"{p}patch_embed.proj"),
        "cls_token": _t(sd, f"{p}cls_token"),
        "register_tokens": _t(sd, f"{p}register_tokens"),
        "mask_token": _t(sd, f"{p}mask_token"),
        "pos_embed": _t(sd, f"{p}pos_embed"),
        "blocks": stack_blocks(blocks),
        "norm": _ln(sd, f"{p}norm"),
    }


def import_aggregator(sd, prefix: str = "aggregator.") -> dict:
    p = prefix
    frame = [import_block(sd, f"{p}frame_blocks.{i}")
             for i in _block_indices(sd, f"{p}frame_blocks.")]
    glob = [import_block(sd, f"{p}global_blocks.{i}")
            for i in _block_indices(sd, f"{p}global_blocks.")]
    return {
        "camera_token": _t(sd, f"{p}camera_token"),
        "register_token": _t(sd, f"{p}register_token"),
        "frame_blocks": stack_blocks(frame),
        "global_blocks": stack_blocks(glob),
    }


def import_camera_head(sd, prefix: str = "camera_head.") -> dict:
    p = prefix
    trunk = [import_block(sd, f"{p}trunk.{i}")
             for i in _block_indices(sd, f"{p}trunk.")]
    return {
        "trunk": stack_blocks(trunk),
        "token_norm": _ln(sd, f"{p}token_norm"),
        "trunk_norm": _ln(sd, f"{p}trunk_norm"),
        "empty_pose_tokens": _t(sd, f"{p}empty_pose_tokens"),
        "embed_pose": _linear(sd, f"{p}embed_pose"),
        # poseLN_modulation = Sequential(SiLU, Linear) → index 1
        "modulation": _linear(sd, f"{p}poseLN_modulation.1"),
        "pose_branch": {
            "fc1": _linear(sd, f"{p}pose_branch.fc1"),
            "fc2": _linear(sd, f"{p}pose_branch.fc2"),
        },
    }


def import_dpt_head(sd, prefix: str = "depth_head.") -> dict:
    """DPTHead (`vggt/heads/dpt_head.py`); also the base of the GS head."""
    p = prefix
    params = {
        "norm": _ln(sd, f"{p}norm"),
        "projects": [_conv_mat(sd, f"{p}projects.{i}") for i in range(4)],
        "resize0": _conv_hwio(sd, f"{p}resize_layers.0"),
        "resize1": _conv_hwio(sd, f"{p}resize_layers.1"),
        "resize3": _conv_mat(sd, f"{p}resize_layers.3"),
        "layer_rn": [_conv_mat(sd, f"{p}scratch.layer{i + 1}_rn") for i in range(4)],
        "output_conv1": _conv_mat(sd, f"{p}scratch.output_conv1"),
        "output_conv2": [
            _conv_mat(sd, f"{p}scratch.output_conv2.0"),
            _conv_mat(sd, f"{p}scratch.output_conv2.2"),
        ],
    }
    for n in (1, 2, 3, 4):
        rn = f"{p}scratch.refinenet{n}"
        fp = {
            "res2": {
                "conv1": _conv_mat(sd, f"{rn}.resConfUnit2.conv1"),
                "conv2": _conv_mat(sd, f"{rn}.resConfUnit2.conv2"),
            },
            "out_conv": _conv_mat(sd, f"{rn}.out_conv"),
        }
        if f"{rn}.resConfUnit1.conv1.weight" in sd:
            fp["res1"] = {
                "conv1": _conv_mat(sd, f"{rn}.resConfUnit1.conv1"),
                "conv2": _conv_mat(sd, f"{rn}.resConfUnit1.conv2"),
            }
        params[f"refinenet{n}"] = fp
    return params


def import_gs_head(sd, prefix: str = "gaussian_param_head.") -> dict:
    params = import_dpt_head(sd, prefix)
    params["input_merger"] = _conv_mat(sd, f"{prefix}input_merger.0")
    return params


# --------------------------------------------------------------------------- #
# Wan causal-3D VAE (`utils/wan_utils.py:534-1000`)                           #
# --------------------------------------------------------------------------- #
def _conv3d_cl(sd, prefix):
    """torch Conv3d (O,I,kt,kh,kw) → channels-last DHWIO (kt,kh,kw,I,O)."""
    w = np.asarray(sd[f"{prefix}.weight"])
    return {"kernel": jnp.asarray(w.transpose(2, 3, 4, 1, 0)),
            "bias": _t(sd, f"{prefix}.bias")}


def _conv2d_cl(sd, prefix):
    """torch Conv2d (O,I,kh,kw) → HWIO."""
    w = np.asarray(sd[f"{prefix}.weight"])
    return {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
            "bias": _t(sd, f"{prefix}.bias")}


def _rms(sd, prefix):
    return {"gamma": jnp.asarray(np.asarray(sd[f"{prefix}.gamma"]).reshape(-1))}


def _wan_res(sd, p):
    out = {"norm1": _rms(sd, f"{p}.norm1"), "conv1": _conv3d_cl(sd, f"{p}.conv1"),
           "norm2": _rms(sd, f"{p}.norm2"), "conv2": _conv3d_cl(sd, f"{p}.conv2")}
    if f"{p}.conv_shortcut.weight" in sd:
        out["conv_shortcut"] = _conv3d_cl(sd, f"{p}.conv_shortcut")
    return out


def _wan_attn(sd, p):
    return {"norm": _rms(sd, f"{p}.norm"),
            "to_qkv": _conv2d_cl(sd, f"{p}.to_qkv"),
            "proj": _conv2d_cl(sd, f"{p}.proj")}


def _wan_resample(sd, p):
    out = {"conv": _conv2d_cl(sd, f"{p}.resample.1")}
    if f"{p}.time_conv.weight" in sd:
        out["time_conv"] = _conv3d_cl(sd, f"{p}.time_conv")
    return out


def _wan_mid(sd, p):
    return {"resnets": [_wan_res(sd, f"{p}.resnets.0"),
                        _wan_res(sd, f"{p}.resnets.1")],
            "attentions": [_wan_attn(sd, f"{p}.attentions.0")]}


def import_wan_vae(sd, cfg=None) -> dict:
    """Full `AutoencoderKLWan` state_dict → `vist3a_tpu.nn.wan_vae` tree.

    cfg: WanVAEConfig (layout plan must match the checkpoint)."""
    from vist3a_tpu.nn.wan_vae import WanVAEConfig, _encoder_plan

    cfg = cfg or WanVAEConfig()
    down = []
    for i, (kind, ci, co) in enumerate(_encoder_plan(cfg)):
        p = f"encoder.down_blocks.{i}"
        if kind == "res":
            down.append(_wan_res(sd, p))
        elif kind == "attn":
            down.append(_wan_attn(sd, p))
        else:
            down.append(_wan_resample(sd, p))
    encoder = {
        "conv_in": _conv3d_cl(sd, "encoder.conv_in"),
        "down_blocks": down,
        "mid_block": _wan_mid(sd, "encoder.mid_block"),
        "norm_out": _rms(sd, "encoder.norm_out"),
        "conv_out": _conv3d_cl(sd, "encoder.conv_out"),
    }
    ups = []
    n_up = len(cfg.dim_mult)
    for i in range(n_up):
        p = f"decoder.up_blocks.{i}"
        blk = {"resnets": [_wan_res(sd, f"{p}.resnets.{j}")
                           for j in range(cfg.num_res_blocks + 1)]}
        if f"{p}.upsamplers.0.resample.1.weight" in sd:
            blk["upsamplers"] = [_wan_resample(sd, f"{p}.upsamplers.0")]
        ups.append(blk)
    decoder = {
        "conv_in": _conv3d_cl(sd, "decoder.conv_in"),
        "mid_block": _wan_mid(sd, "decoder.mid_block"),
        "up_blocks": ups,
        "norm_out": _rms(sd, "decoder.norm_out"),
        "conv_out": _conv3d_cl(sd, "decoder.conv_out"),
    }
    return {
        "encoder": encoder,
        "quant_conv": _conv3d_cl(sd, "quant_conv"),
        "post_quant_conv": _conv3d_cl(sd, "post_quant_conv"),
        "decoder": decoder,
    }


# --------------------------------------------------------------------------- #
# UMT5 encoder (HF `UMT5EncoderModel`)                                        #
# --------------------------------------------------------------------------- #
def import_umt5(sd, num_layers: int) -> dict:
    """HF UMT5EncoderModel state_dict → `vist3a_tpu.nn.umt5` tree."""
    def tr(key):
        return jnp.asarray(np.asarray(sd[key]).T)

    layers = []
    for i in range(num_layers):
        p = f"encoder.block.{i}.layer"
        # HF names the MLP "DenseReluDense" even when gated (wi_0/wi_1)
        ff = ("DenseReluDense"
              if f"{p}.1.DenseReluDense.wo.weight" in sd
              else "DenseGatedActDense")
        layers.append({
            "ln1": _t(sd, f"{p}.0.layer_norm.weight"),
            "q": tr(f"{p}.0.SelfAttention.q.weight"),
            "k": tr(f"{p}.0.SelfAttention.k.weight"),
            "v": tr(f"{p}.0.SelfAttention.v.weight"),
            "o": tr(f"{p}.0.SelfAttention.o.weight"),
            "rel_bias": _t(
                sd, f"{p}.0.SelfAttention.relative_attention_bias.weight"),
            "ln2": _t(sd, f"{p}.1.layer_norm.weight"),
            "wi_0": tr(f"{p}.1.{ff}.wi_0.weight"),
            "wi_1": tr(f"{p}.1.{ff}.wi_1.weight"),
            "wo": tr(f"{p}.1.{ff}.wo.weight"),
        })
    import jax
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)
    embed_key = ("shared.weight" if "shared.weight" in sd
                 else "encoder.embed_tokens.weight")
    return {
        "embed": _t(sd, embed_key),
        "layers": stacked,
        "final_ln": _t(sd, "encoder.final_layer_norm.weight"),
    }


# --------------------------------------------------------------------------- #
# full model assembly + stitched-checkpoint import                            #
# --------------------------------------------------------------------------- #
def import_anysplat_encoder(sd, prefix: str = "encoder.") -> dict:
    """Full EncoderAnySplat tree from the AnySplat hub checkpoint
    (`lhjiang/anysplat` — prefixes `encoder.aggregator.*`,
    `encoder.camera_head.*`, `encoder.depth_head.*`,
    `encoder.gaussian_param_head.*`)."""
    p = prefix
    out = {
        "vit": import_vit(sd, f"{p}aggregator.patch_embed."),
        "aggregator": import_aggregator(sd, f"{p}aggregator."),
        "camera_head": import_camera_head(sd, f"{p}camera_head."),
        "depth_head": import_dpt_head(sd, f"{p}depth_head."),
        "gs_head": import_gs_head(sd, f"{p}gaussian_param_head."),
    }
    # VGGT-1B ships a point head (`anysplat.py:153`); import it when the
    # checkpoint carries one so `pred_head_type="point"` works out of the box.
    if any(k.startswith(f"{p}point_head.") for k in sd):
        out["point_head"] = import_dpt_head(sd, f"{p}point_head.")
    return out


# torch module names inside the DPT/GS/camera heads → this framework's tree
# keys (the same mapping the structural importers above apply one call at a
# time).  Needed for LoRA checkpoints: the reference's `add_lora` with
# target_modules=None wraps EVERY nn.Linear/nn.Conv2d in the stitched model
# (`utils/lora_util/utils.py:139-189`), so saved LoRA keys reach into
# `scratch.refinenetN...`, `poseLN_modulation.1`, `input_merger.0`, ...
_LORA_RENAMES = (
    (re.compile(r"\.poseLN_modulation\.1\b"), ".modulation"),
    (re.compile(r"\.scratch\.layer(\d)_rn\b"),
     lambda m: f".layer_rn.{int(m.group(1)) - 1}"),
    (re.compile(r"\.scratch\.output_conv2\.0\b"), ".output_conv2.0"),
    (re.compile(r"\.scratch\.output_conv2\.2\b"), ".output_conv2.1"),
    (re.compile(r"\.scratch\.output_conv1\b"), ".output_conv1"),
    (re.compile(r"\.scratch\.refinenet(\d)\.resConfUnit(\d)\.conv(\d)\b"),
     r".refinenet\1.res\2.conv\3"),
    (re.compile(r"\.scratch\.refinenet(\d)\.out_conv\b"), r".refinenet\1.out_conv"),
    (re.compile(r"\.resize_layers\.3\b"), ".resize3"),
    (re.compile(r"\.input_merger\.0\b"), ".input_merger"),
)

_VIT_BLOCK_RE = re.compile(r"^(encoder/vit/blocks/)(\d+)(/.*)$")


def import_stitched_checkpoint(sd, vit_chop: int = 0) -> dict:
    """`stitched_model_epoch_N.pth` pieces (`model_stitching_training.py:
    57-72`): {"lora": torch-LoRA state dict, "stitching_layer",
    "mask_token", "cls_token", "register_tokens"} → framework trees.

    vit_chop: the stitch layer index k ("enc_blocks_k").  The reference
    DELETES the first k ViT blocks (`models/anysplat_stitched.py:158-165`),
    so saved `patch_embed.blocks.{i}` LoRA keys refer to ORIGINAL block
    k+i; pass k so factors land on the right rows of the full-depth stack.

    Returns {"stitch_conv", "special", "lora"} where lora maps our tree
    paths → {"a","b"} factors (torch lora_A/lora_B transposed); biases saved
    under bias="lora_only" come along as {"b"/"bias"} leaf overrides."""
    st = sd["stitching_layer"]
    # ConvSpec keeps the torch OIDHW kernel layout natively — no transpose
    out = {"stitch_conv": {"kernel": jnp.asarray(np.asarray(st["weight"])),
                           "bias": jnp.asarray(np.asarray(st["bias"]))}}
    out["special"] = {
        "mask_token": _t(sd, "mask_token"),
        "cls_token": _t(sd, "cls_token"),
        "register_tokens": _t(sd, "register_tokens"),
    }

    # torch module names → our tree paths
    def map_name(name: str):
        for pat, repl in _LORA_RENAMES:
            name = pat.sub(repl, name)
        name = name.replace("encoder.aggregator.patch_embed.",
                            "encoder/vit/")
        name = name.replace("encoder.aggregator.", "encoder/aggregator/")
        name = name.replace("encoder.camera_head.", "encoder/camera_head/")
        name = name.replace("encoder.depth_head.", "encoder/depth_head/")
        name = name.replace("encoder.gaussian_param_head.",
                            "encoder/gs_head/")
        name = name.replace(".", "/")
        if vit_chop:
            m = _VIT_BLOCK_RE.match(name)
            if m:
                name = f"{m.group(1)}{int(m.group(2)) + vit_chop}{m.group(3)}"
        return name

    lora: dict = {}
    for name, value in sd.get("lora", {}).items():
        arr = np.asarray(value)
        path = map_name(name)
        if path.endswith("/lora_A"):
            key, leaf = path[:-7], "a"
            arr = arr.T
        elif path.endswith("/lora_B"):
            key, leaf = path[:-7], "b"
            arr = arr.T
        elif path.endswith("/bias"):
            key, leaf = path[:-5], "bias"
        else:
            continue
        lora.setdefault(key, {})[leaf] = jnp.asarray(arr)
    out["lora"] = lora
    return out


# --------------------------------------------------------------------------- #
# Wan DiT (diffusers WanTransformer3DModel) + PEFT LoRA                       #
# --------------------------------------------------------------------------- #
def import_wan_dit(sd, num_layers: int | None = None) -> dict:
    """diffusers `WanTransformer3DModel` state dict →
    `vist3a_tpu.nn.wan_dit` tree."""
    if num_layers is None:
        num_layers = 1 + max(int(k.split(".")[1]) for k in sd
                             if k.startswith("blocks."))

    def attn(p):
        return {
            "q": _linear(sd, f"{p}.to_q"),
            "k": _linear(sd, f"{p}.to_k"),
            "v": _linear(sd, f"{p}.to_v"),
            "o": _linear(sd, f"{p}.to_out.0"),
            "norm_q": _t(sd, f"{p}.norm_q.weight"),
            "norm_k": _t(sd, f"{p}.norm_k.weight"),
        }

    blocks = []
    for i in range(num_layers):
        p = f"blocks.{i}"
        blocks.append({
            "scale_shift_table":
                jnp.asarray(np.asarray(sd[f"{p}.scale_shift_table"])
                            .reshape(6, -1)),
            "attn1": attn(f"{p}.attn1"),
            "attn2": attn(f"{p}.attn2"),
            "norm2": _ln(sd, f"{p}.norm2"),
            "ffn": {"fc1": _linear(sd, f"{p}.ffn.net.0.proj"),
                    "fc2": _linear(sd, f"{p}.ffn.net.2")},
        })
    patch_w = np.asarray(sd["patch_embedding.weight"])   # (D,C,pt,ph,pw)
    return {
        "patch_embedding": {
            "kernel": jnp.asarray(patch_w.transpose(2, 3, 4, 1, 0)),
            "bias": _t(sd, "patch_embedding.bias")},
        "time_embedder": {
            "fc1": _linear(sd, "condition_embedder.time_embedder.linear_1"),
            "fc2": _linear(sd, "condition_embedder.time_embedder.linear_2")},
        "time_proj": _linear(sd, "condition_embedder.time_proj"),
        "text_embedder": {
            "fc1": _linear(sd, "condition_embedder.text_embedder.linear_1"),
            "fc2": _linear(sd, "condition_embedder.text_embedder.linear_2")},
        "blocks": stack_blocks(blocks),
        "scale_shift_table":
            jnp.asarray(np.asarray(sd["scale_shift_table"]).reshape(2, -1)),
        "proj_out": _linear(sd, "proj_out"),
    }


def apply_peft_lora(dit_params: dict, lora_sd: dict, *, r: int = 8,
                    alpha: int = 16) -> dict:
    """Merge a PEFT LoRA adapter (`train_vdm.py:370-388` targets: attn
    q/k/v/out of attn1+attn2) into imported DiT params.  PEFT names:
    `base_model.model.blocks.{i}.attn1.to_q.lora_A.weight` (r,in) /
    `lora_B.weight` (out,r)."""
    import jax

    scaling = alpha / r
    name_map = {"to_q": "q", "to_k": "k", "to_v": "v", "to_out.0": "o",
                "to_out": "o"}
    out = dict(dit_params)

    deltas: dict = {}
    for key, val in lora_sd.items():
        if ".lora_A." not in key and ".lora_B." not in key:
            continue
        k = key.replace("base_model.model.", "").replace(".weight", "")
        part, ab = k.rsplit(".lora_", 1)
        segs = part.split(".")
        layer = int(segs[1])
        attn = segs[2]
        proj = name_map[".".join(segs[3:])]
        deltas.setdefault((attn, proj), {}).setdefault(ab, {})[layer] = \
            np.asarray(val)

    new_blocks = dict(out["blocks"])
    for (attn, proj), ab in deltas.items():
        site = dict(new_blocks[attn])
        w = np.array(site[proj]["w"])                    # (L, in, out) copy
        for layer in ab.get("A", {}):
            a = ab["A"][layer]                           # (r, in)
            b = ab["B"][layer]                           # (out, r)
            w[layer] = w[layer] + (b @ a).T * scaling
        site[proj] = {**site[proj], "w": jnp.asarray(w)}
        new_blocks[attn] = site
    return {**out, "blocks": new_blocks}
