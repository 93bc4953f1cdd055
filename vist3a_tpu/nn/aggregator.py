"""VGGT aggregator: alternating frame/global attention trunk.

Behavioral spec: `vggt/models/aggregator.py` —
  * DINOv2 ViT-L/14 patch tokens (post final-norm) + dual camera/register
    special tokens (slot 0 for the first frame, slot 1 for the rest,
    `slice_expand_and_flatten`, :376-399);
  * 24 layer pairs: frame attention over (B·S, P, C), then global attention
    over (B, S·P, C); blocks have QK-norm, LayerScale 0.01, 2-D RoPE
    (freq 100) with special tokens pinned at position (0,0);
  * taps: concat(frame_out, global_out) → (B,S,P,2C) at layers
    {4,11,17,23}; the last tap (layer 23) also feeds the camera head.

TPU design: one `lax.scan` body covers a frame+global pair; taps are scan
segment boundaries (free); per-pair remat mirrors the reference's per-block
torch checkpointing.  Input images are expected in [0,1]; ImageNet
normalisation happens here (`aggregator.py:227-228`).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from vist3a_tpu.nn import vit as vit_mod
from vist3a_tpu.nn.layers import (
    BlockConfig,
    block_apply,
    slice_stack,
    stack_init,
    take_layer,
)
from vist3a_tpu.ops.rope import grid_positions, rope2d_cos_sin

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

NUM_SPECIAL = 5  # 1 camera + 4 register tokens
DEFAULT_TAPS = (4, 11, 17, 23)


@dataclasses.dataclass(frozen=True)
class AggregatorConfig:
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    mlp_ratio: float = 4.0
    num_register_tokens: int = 4
    patch_size: int = 14
    rope_freq: float = 100.0
    taps: Sequence[int] = DEFAULT_TAPS
    attn_impl: str = "auto"

    def block_config(self) -> BlockConfig:
        return BlockConfig(
            dim=self.embed_dim,
            num_heads=self.num_heads,
            mlp_ratio=self.mlp_ratio,
            qk_norm=True,
            ln_eps=1e-5,         # torch LayerNorm default in aggregator blocks
            layerscale=0.01,
            use_rope=self.rope_freq > 0,
            attn_impl=self.attn_impl,
        )

    @property
    def patch_start_idx(self) -> int:
        return 1 + self.num_register_tokens


def init(key: jax.Array, cfg: AggregatorConfig = AggregatorConfig(),
         dtype=jnp.float32) -> dict:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "camera_token": 1e-6 * jax.random.normal(k1, (1, 2, 1, cfg.embed_dim), dtype),
        "register_token": 1e-6 * jax.random.normal(
            k2, (1, 2, cfg.num_register_tokens, cfg.embed_dim), dtype
        ),
        "frame_blocks": stack_init(k3, cfg.block_config(), cfg.depth, dtype),
        "global_blocks": stack_init(k4, cfg.block_config(), cfg.depth, dtype),
    }


def expand_special_tokens(tok: jnp.ndarray, b: int, s: int) -> jnp.ndarray:
    """(1, 2, X, C): slot 0 → first frame, slot 1 → remaining S-1 frames;
    returns (B·S, X, C) (`aggregator.py:376-399`)."""
    first = jnp.broadcast_to(tok[:, 0:1], (b, 1, *tok.shape[2:]))
    rest = jnp.broadcast_to(tok[:, 1:2], (b, s - 1, *tok.shape[2:]))
    return jnp.concatenate([first, rest], axis=1).reshape(b * s, *tok.shape[2:])


def rope_tables(cfg: AggregatorConfig, grid_h: int, grid_w: int, n_frames: int):
    """Precompute fused cos/sin for frame (P tokens) and global (S·P) attention."""
    head_dim = cfg.embed_dim // cfg.num_heads
    pos = grid_positions(grid_h, grid_w, special=cfg.patch_start_idx)
    cos, sin = rope2d_cos_sin(pos, head_dim, cfg.rope_freq)
    cos_g = jnp.tile(cos, (n_frames, 1))
    sin_g = jnp.tile(sin, (n_frames, 1))
    return (cos, sin), (cos_g, sin_g)


def _layer_pair(frame_p, global_p, tokens, blk_cfg, rope_f, rope_g,
                kv_f=None, kv_g=None):
    """One frame-attention + global-attention pair.  tokens: (B,S,P,C).

    kv_f/kv_g: optional key-validity masks ((P,)/(S·P,)) — the padded-token
    inference layout (see `run_trunk`)."""
    b, s, p, c = tokens.shape
    x = tokens.reshape(b * s, p, c)
    x = block_apply(frame_p, x, blk_cfg, *rope_f, key_valid=kv_f)
    frame_out = x.reshape(b, s, p, c)
    xg = frame_out.reshape(b, s * p, c)
    xg = block_apply(global_p, xg, blk_cfg, *rope_g, key_valid=kv_g)
    return xg.reshape(b, s, p, c), frame_out


def run_trunk(
    params: dict,
    tokens: jnp.ndarray,
    cfg: AggregatorConfig,
    grid_hw: tuple[int, int],
    *,
    start_layer: int = 0,
    remat: bool = True,
    tap_mode: str = "auto",
):
    """Run aggregator layers [start_layer, depth) over (B,S,P,C) tokens.

    Returns (final_tokens, taps) where taps is a list of (B,S,P,2C) arrays —
    concat(frame_out, global_out) at each tap layer ≥ start_layer.
    `start_layer` supports nothing here (the full model always uses 0) but
    keeps symmetry with the chopped stitched path.

    tap_mode selects how taps are captured:
      * "split" — break the scan at tap layers (segments + explicit tap
        pairs).  Memory-friendliest under remat: only the 4 tap outputs
        survive the trunk, so this is the training form.  Re-slicing the
        stacked params at segment boundaries costs one full param pass
        (~2.4 GB bf16) per call: measured 351.3 ms vs 335.7 unbroken at
        the 13-view 448p decode shape (r4 `tools/gap_probe.py`).
      * "ys" — ONE unbroken scan over all layer pairs, emitting each pair's
        concat(frame, global) as a scan output and indexing the 4 tap
        layers afterwards.  Avoids the segment slicing but holds a
        (depth,B,S,P,2C) buffer live (~2.7 GB bf16 at the decode shape) —
        measured to give back most of the isolated win inside the full
        decode, whose workspace already sits near the 15.75 GB HBM.
      * "carry" — ONE unbroken scan collecting taps into an
        (n_taps+1,B,S,P,2C) carry buffer via dynamic_update_index_in_dim
        (each layer writes slot tap_index, or the dummy last slot for
        non-tap layers; the update is in-place on the donated carry).
        Same write traffic as "ys", 1/5 the live memory — the inference
        form.
      * "auto" — "carry" when remat is off (inference), else "split".
    """
    blk_cfg = cfg.block_config()
    # trunk compute dtype follows the params (bf16 deployed): without this
    # boundary cast an fp32 entry (training/NVS latents, teacher images)
    # silently upcasts every trunk matmul to fp32 — the reference runs the
    # trunk bf16 both in autocast training and at inference
    dt = jax.tree_util.tree_leaves(params["frame_blocks"])[0].dtype
    tokens = tokens.astype(dt)
    b, s, p, c = tokens.shape
    rope_f, rope_g = rope_tables(cfg, *grid_hw, n_frames=s)

    # Padded-token inference layout: P=1029 is not a sublane multiple, so
    # the per-layer (B,S,P,C)↔(B,S·P,C) reshape around global attention is
    # a ~0.8 ms repack COPY of the 27 MB token tensor (measured r5,
    # `tools/trunk_bisect.py`: global-with-reshape 250.7 ms vs isolated
    # 230.9 over 24 layers).  Padding P to a multiple of 16 makes every
    # reshape a layout bitcast; the dummy tokens are masked as attention
    # KEYS via the flash kernel's bias-feature mask (+1% global-attention
    # flops).  Inference only — the masked kernel entry has no VJP, and the
    # remat'd training path keeps the reference layout.
    p_real, kv_f, kv_g = p, None, None
    pad = (-p) % 16
    if pad and not remat:
        tokens = jnp.pad(tokens, ((0, 0), (0, 0), (0, pad), (0, 0)))
        p = p + pad
        cos_f, sin_f = rope_f
        rope_f = (jnp.pad(cos_f, ((0, pad), (0, 0)), constant_values=1.0),
                  jnp.pad(sin_f, ((0, pad), (0, 0))))
        rope_g = (jnp.tile(rope_f[0], (s, 1)), jnp.tile(rope_f[1], (s, 1)))
        kv_f = jnp.arange(p) < p_real
        kv_g = jnp.tile(kv_f, s)

    def unpad(x):
        return x[:, :, :p_real] if pad and not remat else x

    def pair_fn(fp, gp, tok):
        return _layer_pair(fp, gp, tok, blk_cfg, rope_f, rope_g, kv_f, kv_g)

    pair_scan = jax.checkpoint(pair_fn) if remat else pair_fn

    if tap_mode not in ("auto", "split", "ys", "carry"):
        raise ValueError(
            f"tap_mode must be one of 'auto'/'split'/'ys'/'carry', "
            f"got {tap_mode!r}")
    taps = [t for t in sorted(cfg.taps) if t >= start_layer]
    # with no taps every mode degenerates to the tap-free single-segment
    # scan — an explicit 'ys'/'carry' would otherwise build per-layer
    # (B,S,P,2C) concats into a buffer nobody reads
    unbroken = bool(taps) and (tap_mode in ("ys", "carry") or (
        tap_mode == "auto" and not remat))
    if unbroken:
        fb = slice_stack(params["frame_blocks"], start_layer, cfg.depth)
        gb = slice_stack(params["global_blocks"], start_layer, cfg.depth)

        if tap_mode == "ys":
            def body_ys(carry, layer_params):
                fp, gp = layer_params
                out, frame_out = pair_scan(fp, gp, carry)
                return out, jnp.concatenate([frame_out, out], axis=-1)

            tokens, ys = jax.lax.scan(body_ys, tokens, (fb, gb))
            return unpad(tokens), [unpad(ys[t - start_layer]) for t in taps]

        n_taps = len(taps)
        slot = np.full((cfg.depth - start_layer,), n_taps, np.int32)
        for i, t in enumerate(taps):
            slot[t - start_layer] = i
        tapbuf = jnp.zeros((n_taps + 1, b, s, p, 2 * c), dt)

        def body_carry(carry, xs):
            tok, buf = carry
            (fp, gp), sl = xs
            out, frame_out = pair_scan(fp, gp, tok)
            cat = jnp.concatenate([frame_out, out], axis=-1)
            buf = jax.lax.dynamic_update_index_in_dim(buf, cat, sl, 0)
            return (out, buf), None

        (tokens, tapbuf), _ = jax.lax.scan(
            body_carry, (tokens, tapbuf), ((fb, gb), jnp.asarray(slot)))
        return unpad(tokens), [unpad(tapbuf[i]) for i in range(n_taps)]

    def scan_segment(tok, lo, hi):
        """Layers [lo, hi) without taps, as one scan."""
        if hi <= lo:
            return tok
        fb = slice_stack(params["frame_blocks"], lo, hi)
        gb = slice_stack(params["global_blocks"], lo, hi)

        def body(carry, layer_params):
            fp, gp = layer_params
            out, _ = pair_scan(fp, gp, carry)
            return out, None

        tok, _ = jax.lax.scan(body, tok, (fb, gb))
        return tok

    outs = []
    cur = start_layer
    for t in taps:
        tokens = scan_segment(tokens, cur, t)
        # tap layer applied explicitly to capture frame/global halves
        fp = take_layer(params["frame_blocks"], t)
        gp = take_layer(params["global_blocks"], t)
        tokens, frame_out = pair_scan(fp, gp, tokens)
        outs.append(unpad(jnp.concatenate([frame_out, tokens], axis=-1)))
        cur = t + 1
    tokens = scan_segment(tokens, cur, cfg.depth)
    return unpad(tokens), outs


def forward(
    agg_params: dict,
    vit_params: dict,
    images: jnp.ndarray,
    cfg: AggregatorConfig = AggregatorConfig(),
    vit_cfg: vit_mod.ViTConfig = vit_mod.VIT_LARGE,
    *,
    remat: bool = True,
):
    """Full aggregator: images (B,S,3,H,W) in [0,1] → (taps, patch_start_idx).

    taps: list of 4 arrays (B,S,P,2C) at layers {4,11,17,23}; taps[-1] also
    serves as the camera-head input (reference keeps a 5th duplicate entry
    for layer 23 — callers here just reuse taps[-1]).
    """
    b, s, _, h, w = images.shape
    mean = jnp.asarray(_IMAGENET_MEAN, images.dtype).reshape(1, 1, 3, 1, 1)
    std = jnp.asarray(_IMAGENET_STD, images.dtype).reshape(1, 1, 3, 1, 1)
    images = (images - mean) / std

    flat = images.reshape(b * s, 3, h, w)
    patch_tokens = vit_mod.forward_features(vit_params, flat, vit_cfg,
                                            remat=remat)["patch"]

    cam = expand_special_tokens(params_dtype(agg_params["camera_token"],
                                             patch_tokens.dtype), b, s)
    reg = expand_special_tokens(params_dtype(agg_params["register_token"],
                                             patch_tokens.dtype), b, s)
    tokens = jnp.concatenate([cam, reg, patch_tokens], axis=1)
    p = tokens.shape[1]
    tokens = tokens.reshape(b, s, p, -1)

    grid_hw = (h // cfg.patch_size, w // cfg.patch_size)
    _, taps = run_trunk(agg_params, tokens, cfg, grid_hw, remat=remat)
    return taps, cfg.patch_start_idx


def params_dtype(x, dtype):
    return x.astype(dtype)
