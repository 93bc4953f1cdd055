"""DINOv2 vision transformer (the VGGT patch-embed trunk).

Behavioral spec: `vggt/layers/vision_transformer.py` — ViT-L/14 with 4
register tokens, LayerScale init 1.0, LN eps 1e-6, exact GELU, no QK-norm,
bicubic-antialias positional-embedding interpolation (offset 0.0,
antialias=True as built by the aggregator, `aggregator.py:163-203`).

Token layout after `prepare_tokens`: [cls, reg×4, patch...]; positional
embedding is added to cls+patches BEFORE register insertion (registers carry
no positional signal).  The final LayerNorm is applied before handing patch
tokens to the aggregator (`forward_features` → ``x_norm_patchtokens``).

The stitched model chops the first k blocks of this trunk and injects
conv-stitched tokens; `interpolate_pos_embed` and the special tokens are
therefore exposed as standalone functions (used by
`vist3a_tpu/stitch/chopped_anysplat.py`).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax import lax

from vist3a_tpu.nn.layers import (
    BlockConfig,
    layer_norm,
    layer_norm_init,
    scan_blocks,
    scan_blocks_with_taps,
    stack_init,
)


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    img_size: int = 518
    patch_size: int = 14
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    mlp_ratio: float = 4.0
    num_register_tokens: int = 4
    layerscale: float = 1.0
    ln_eps: float = 1e-6
    attn_impl: str = "auto"

    @property
    def grid(self):
        return self.img_size // self.patch_size

    @property
    def num_patches(self):
        return self.grid * self.grid

    def block_config(self) -> BlockConfig:
        return BlockConfig(
            dim=self.embed_dim,
            num_heads=self.num_heads,
            mlp_ratio=self.mlp_ratio,
            qk_norm=False,
            ln_eps=self.ln_eps,
            layerscale=self.layerscale,
            use_rope=False,
            attn_impl=self.attn_impl,
        )


VIT_LARGE = ViTConfig()  # dinov2_vitl14_reg — the VGGT-1B trunk


def init(key: jax.Array, cfg: ViTConfig = VIT_LARGE, dtype=jnp.float32) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    d = cfg.embed_dim
    return {
        "patch_proj": {
            # conv2d stride=patch stored as (D, 3, p, p) torch layout
            "kernel": 0.02 * jax.random.normal(
                k1, (d, 3, cfg.patch_size, cfg.patch_size), dtype
            ),
            "bias": jnp.zeros((d,), dtype),
        },
        "cls_token": 1e-6 * jax.random.normal(k2, (1, 1, d), dtype),
        "register_tokens": 1e-6 * jax.random.normal(
            k3, (1, cfg.num_register_tokens, d), dtype
        ),
        "mask_token": jnp.zeros((1, d), dtype),
        "pos_embed": 0.02 * jax.random.normal(
            jax.random.fold_in(key, 7), (1, cfg.num_patches + 1, d), dtype
        ),
        "blocks": stack_init(
            jax.random.fold_in(key, 8), cfg.block_config(), cfg.depth, dtype
        ),
        "norm": layer_norm_init(d, dtype),
    }


def patch_embed(params: dict, images: jnp.ndarray, cfg: ViTConfig) -> jnp.ndarray:
    """images: (B, 3, H, W) → patch tokens (B, H/p·W/p, D), row-major."""
    kernel = params["patch_proj"]["kernel"].astype(images.dtype)
    out = lax.conv_general_dilated(
        images,
        kernel,
        window_strides=(cfg.patch_size, cfg.patch_size),
        padding="VALID",
        dimension_numbers=lax.conv_dimension_numbers(
            images.shape, kernel.shape, ("NCHW", "OIHW", "NCHW")
        ),
        preferred_element_type=jnp.float32,
    ).astype(images.dtype)
    out = out + params["patch_proj"]["bias"].astype(out.dtype)[None, :, None, None]
    b, d, gh, gw = out.shape
    return out.reshape(b, d, gh * gw).swapaxes(1, 2)


def interpolate_pos_embed(
    pos_embed: jnp.ndarray, grid_h: int, grid_w: int
) -> jnp.ndarray:
    """(1, 1+M², D) → (1, 1+grid_h·grid_w, D); bicubic antialias resize of
    the patch part (`vision_transformer.py:184-216`, offset 0.0)."""
    n = pos_embed.shape[1] - 1
    m = int(round(n ** 0.5))
    if (grid_h, grid_w) == (m, m):
        return pos_embed
    cls_pe, patch_pe = pos_embed[:, :1], pos_embed[:, 1:]
    d = pos_embed.shape[-1]
    grid = patch_pe.astype(jnp.float32).reshape(1, m, m, d)
    grid = jax.image.resize(
        grid, (1, grid_h, grid_w, d), method="bicubic", antialias=True
    )
    out = jnp.concatenate([cls_pe.astype(jnp.float32),
                           grid.reshape(1, grid_h * grid_w, d)], axis=1)
    return out.astype(pos_embed.dtype)


def prepare_tokens(
    params: dict, images: jnp.ndarray, cfg: ViTConfig
) -> jnp.ndarray:
    """images (B,3,H,W) → token sequence [cls, reg*, patches] with pos-enc."""
    b, _, h, w = images.shape
    x = patch_embed(params, images, cfg)
    cls = jnp.broadcast_to(params["cls_token"].astype(x.dtype),
                           (b, 1, x.shape[-1]))
    x = jnp.concatenate([cls, x], axis=1)
    pe = interpolate_pos_embed(
        params["pos_embed"], h // cfg.patch_size, w // cfg.patch_size
    )
    x = x + pe.astype(x.dtype)
    reg = jnp.broadcast_to(
        params["register_tokens"].astype(x.dtype),
        (b, cfg.num_register_tokens, x.shape[-1]),
    )
    return jnp.concatenate([x[:, :1], reg, x[:, 1:]], axis=1)


def forward_features(
    params: dict,
    images: jnp.ndarray,
    cfg: ViTConfig = VIT_LARGE,
    *,
    remat: bool = True,
) -> dict:
    """Full trunk; returns normalized cls/register/patch token groups.

    Block compute dtype follows the params (bf16 deployed) — see the
    boundary-cast note in `aggregator.run_trunk`."""
    x = prepare_tokens(params, images, cfg)
    x = x.astype(jax.tree_util.tree_leaves(params["blocks"])[0].dtype)
    x = scan_blocks(params["blocks"], x, cfg.block_config(), remat=remat)
    xn = layer_norm(params["norm"], x, cfg.ln_eps)
    r = cfg.num_register_tokens
    return {
        "cls": xn[:, 0],
        "registers": xn[:, 1:1 + r],
        "patch": xn[:, 1 + r:],
        "prenorm": x,
    }


def forward_with_block_taps(
    params: dict,
    images: jnp.ndarray,
    taps: list[int],
    cfg: ViTConfig = VIT_LARGE,
    *,
    remat: bool = True,
):
    """Stitching-layer search support: per-block intermediate outputs.

    Replaces the reference's forward hooks on ``patch_embed.blocks``
    (`find_layer_for_stitching.py:196-203`) with explicit scan-segment taps.
    Returns (features_dict, {f"enc_blocks_{i+1}": tokens_after_block_i}).
    """
    x = prepare_tokens(params, images, cfg)
    x, tapped = scan_blocks_with_taps(
        params["blocks"], x, cfg.block_config(), taps, remat=remat
    )
    xn = layer_norm(params["norm"], x, cfg.ln_eps)
    r = cfg.num_register_tokens
    feats = {"cls": xn[:, 0], "registers": xn[:, 1:1 + r], "patch": xn[:, 1 + r:]}
    return feats, {f"enc_blocks_{t + 1}": v for t, v in zip(taps, tapped)}
