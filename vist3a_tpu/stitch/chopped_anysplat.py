"""Chopped AnySplat + conv3d stitching layer (the stitched decoder).

Behavioral parity:
  * `models/anysplat_stitched.py:144-211` — chop the DINOv2 patch-embed conv
    and the first k ViT blocks; inject conv-stitched latent tokens: prepend
    cls, add interpolated pos-enc (cls+patches only), insert register tokens,
    run the remaining blocks + final norm, strip the 5 special tokens;
  * `models/anysplat_stitched.py:213-525` — VGGT aggregator + heads (shared
    `vist3a_tpu.nn.encoder.heads_pipeline`);
  * `models/stitched_model.py:92-173` — StitchVAE3D: trilinear
    (align_corners=True) pre-upsample of Wan latents to (T=13, H/8, W/8),
    then the conv3d stitching layer (`ConvSpec`), then the chopped model.
    `forward_with_latent` needs no VAE; `forward` (pixel input) lives with
    the Wan VAE module.

TPU notes: align-corners trilinear has no jax.image equivalent → separable
interpolation-matrix contractions per axis (MXU).  The chopped trunk is a
`lax.scan` over the remaining stacked blocks (per-block remat, mirroring the
reference's torch checkpointing).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from vist3a_tpu.nn import aggregator as agg_mod
from vist3a_tpu.nn import vit as vit_mod
from vist3a_tpu.nn.encoder import EncoderConfig, EncoderOutput, heads_pipeline
from vist3a_tpu.nn.heads import _interp_matrix
from vist3a_tpu.nn.layers import layer_norm, scan_blocks, slice_stack
from vist3a_tpu.nn.wan_vae import WanVAEConfig
from vist3a_tpu.stitch.conv_spec import ConvSpec, parse_conv_spec

CANONICAL_CONV_SPEC = "conv3d_k5x3x3_o1024_s1x2x2_p2x1x1"


@dataclasses.dataclass(frozen=True)
class StitchedConfig:
    encoder: EncoderConfig = EncoderConfig()
    stitch_layer_index: int = 16         # "enc_blocks_16" → chop blocks [0,16)
    conv_spec: str = CANONICAL_CONV_SPEC
    latent_channels: int = 16            # Wan z dim
    latent_t: int = 13                   # Wan temporal latent length (T=13)
    vae: WanVAEConfig = WanVAEConfig()   # frozen Wan VAE (pixel-input path)

    @property
    def conv(self) -> ConvSpec:
        return parse_conv_spec(self.conv_spec)


def init_stitch_conv(key: jax.Array, cfg: StitchedConfig,
                     dtype=jnp.float32) -> dict:
    return cfg.conv.init(key, cfg.latent_channels, dtype=dtype)


def resize_align_corners_nd(x: jnp.ndarray, sizes: dict[int, int]) -> jnp.ndarray:
    """Separable align_corners=True linear resize along the given axes."""
    for axis, n_out in sizes.items():
        n_in = x.shape[axis]
        if n_in == n_out:
            continue
        m = jnp.asarray(_interp_matrix(n_in, n_out), x.dtype)  # (n_out, n_in)
        x = jnp.moveaxis(
            jnp.tensordot(m, jnp.moveaxis(x, axis, 0), axes=((1,), (0,))),
            0, axis)
    return x


def pre_upsample(latent: jnp.ndarray, cfg: StitchedConfig) -> jnp.ndarray:
    """Wan latent (B, 16, T_vae, h, w) → (B, 16, (T_vae−1)·4+1, h_lat, w_lat)
    trilinear align_corners=True (`models/stitched_model.py:92-107`).

    Spatial target stays the latent grid (resolution//8); temporal length is
    restored to the pixel frame count.
    """
    t_out = (latent.shape[2] - 1) * 4 + 1
    return resize_align_corners_nd(
        latent, {2: t_out, 3: latent.shape[3], 4: latent.shape[4]})


def chopped_vit_forward(vit_params: dict, tokens: jnp.ndarray,
                        grid_hw: tuple[int, int], cfg: StitchedConfig, *,
                        remat: bool = True) -> jnp.ndarray:
    """Stitched tokens (N, gh·gw, D) → normalized patch tokens (N, gh·gw, D).

    Token injection per `models/anysplat_stitched.py:179-211`.
    """
    vcfg = cfg.encoder.vit
    # trunk dtype follows the params (see `aggregator.run_trunk`); the
    # stitch conv before this boundary stays at the latent dtype
    tokens = tokens.astype(
        jax.tree_util.tree_leaves(vit_params["blocks"])[0].dtype)
    n = tokens.shape[0]
    d = tokens.shape[-1]
    cls = jnp.broadcast_to(vit_params["cls_token"].astype(tokens.dtype),
                           (n, 1, d))
    x = jnp.concatenate([cls, tokens], axis=1)
    pe = vit_mod.interpolate_pos_embed(vit_params["pos_embed"], *grid_hw)
    x = x + pe.astype(x.dtype)
    reg = jnp.broadcast_to(
        vit_params["register_tokens"].astype(x.dtype),
        (n, vcfg.num_register_tokens, d))
    x = jnp.concatenate([x[:, :1], reg, x[:, 1:]], axis=1)

    blocks = slice_stack(vit_params["blocks"], cfg.stitch_layer_index,
                         vcfg.depth)
    x = scan_blocks(blocks, x, vcfg.block_config(), remat=remat)
    x = layer_norm(vit_params["norm"], x, vcfg.ln_eps)
    return x[:, 1 + vcfg.num_register_tokens:]


def stitched_forward(params: dict, stitched_tokens: jnp.ndarray,
                     images: jnp.ndarray, cfg: StitchedConfig, *,
                     remat: bool = True) -> EncoderOutput:
    """Chopped-AnySplat forward.

    stitched_tokens: (B, D, S, gh, gw) — output of the stitching conv.
    images: (B, 3, S, H, W) in [−1, 1] (reference layout,
    `models/anysplat_stitched.py:172-175`); converted to (B,S,3,H,W) [0,1].
    """
    b, d, s, gh, gw = stitched_tokens.shape
    images01 = (jnp.swapaxes(images, 1, 2) + 1.0) / 2.0       # (B,S,3,H,W)

    tok = stitched_tokens.transpose(0, 2, 3, 4, 1).reshape(b * s, gh * gw, d)
    patch_tokens = chopped_vit_forward(params["encoder"]["vit"], tok,
                                       (gh, gw), cfg, remat=remat)

    agg_params = params["encoder"]["aggregator"]
    acfg = cfg.encoder.agg
    cam = agg_mod.expand_special_tokens(
        agg_params["camera_token"].astype(patch_tokens.dtype), b, s)
    reg = agg_mod.expand_special_tokens(
        agg_params["register_token"].astype(patch_tokens.dtype), b, s)
    tokens = jnp.concatenate([cam, reg, patch_tokens], axis=1)
    tokens = tokens.reshape(b, s, tokens.shape[1], -1)

    _, taps = agg_mod.run_trunk(agg_params, tokens, acfg, (gh, gw),
                                remat=remat)
    return heads_pipeline(params["encoder"], cfg.encoder, taps,
                          images01, remat=remat)


def forward_with_latent(params: dict, latent: jnp.ndarray,
                        images: jnp.ndarray, cfg: StitchedConfig, *,
                        remat: bool = True) -> EncoderOutput:
    """StitchVAE3D.forward_with_latent (`models/stitched_model.py:165-173`):
    un-normalized Wan latent (B, 16, T_vae, h, w) + feedforward images
    (B, 3, S, H, W) in [−1,1] → EncoderOutput.
    """
    lat = pre_upsample(latent, cfg)
    stitched = cfg.conv.apply(params["stitch_conv"], lat)
    return stitched_forward(params, stitched, images, cfg, remat=remat)


def forward_from_video(params: dict, video: jnp.ndarray,
                       images: jnp.ndarray, cfg: StitchedConfig, *,
                       key: jax.Array | None = None,
                       remat: bool = True) -> EncoderOutput:
    """StitchVAE3D.forward (`models/stitched_model.py:123-163`): pixel input
    (B, 3, T, H, W) in [−1,1] → frozen Wan-VAE encode (posterior SAMPLE under
    no_grad, `:133`; deterministic mode when `key` is None) → stitched
    decoder.  Requires `params["vae"]` (see `vist3a_tpu.nn.wan_vae`).
    """
    from vist3a_tpu.nn import wan_vae

    mu, logvar = wan_vae.encode(params["vae"], video, cfg.vae, remat=remat)
    latent = wan_vae.sample_posterior(key, mu, logvar) if key is not None \
        else mu
    latent = jax.lax.stop_gradient(latent)   # VAE frozen, encode is no_grad
    return forward_with_latent(params, latent, images, cfg, remat=remat)
