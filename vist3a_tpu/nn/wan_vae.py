"""Wan 2.1 causal-3D VAE (encoder + decoder), TPU-native.

Parity target: `utils/wan_utils.py:60-1180` (the reference's trainable copy of
diffusers `AutoencoderKLWan`): causal conv3d with 2·pad front padding (:96-147),
channel-L2 RMSNorm (:150-184), 2D/3D resample blocks (:202-331), residual
blocks (:333-425), single-head per-frame spatial attention (:428-476), mid
block (:478-531), encoder (:534-662) dims 96·[1,2,4,4] z=16 temporal
downsample [F,T,T], decoder (:745-901) symmetric, latents mean/std constants
(:925-960), chunked encode 1+(t−1)/4 iterations (:1021-1047) and per-latent-
frame decode (:1078-1117) with `CacheState` causal-conv caches.

TPU design — full-sequence equivalence instead of chunk loops.  The
reference's chunked execution with 2-frame conv caches is mathematically
identical to running the full sequence through causal convolutions, because
the cache merely replays the previous chunk's tail into the next chunk's
receptive field.  The two special stages reduce to closed forms (derived from
the cache automaton; verified by parity tests against the chunked torch code):

  * downsample3d:  y = concat([x[:, :1], conv_{k3,s2,VALID}(x)], time)
    — frame 0 passes through (first chunk is 1 frame and skips time_conv,
      :316-331); windows then start at frame 0 with stride 2;
  * upsample3d:    y = concat([x[:, :1], interleave₂(conv_causal(x[:, 1:]))])
    — frame 0 passes through (the "Rep" marker path, :260-268) and the time
      conv NEVER sees frame 0: its first window is [0, 0, x₁] (:283-306).

One jit, static shapes, big MXU convs, no host loop — and no 13-iteration
Python decode.  Internal layout is channels-last (B, T, H, W, C) for the
TPU lane dimension; the public API keeps the reference's (B, C, T, H, W).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from vist3a_tpu.ops.attention import dot_product_attention

LATENTS_MEAN = (
    -0.7571, -0.7089, -0.9113, 0.1075, -0.1745, 0.9653, -0.1517, 1.5508,
    0.4134, -0.0715, 0.5517, -0.3632, -0.1922, -0.9497, 0.2503, -0.2921,
)
LATENTS_STD = (
    2.8184, 1.4541, 2.3275, 2.6558, 1.2196, 1.7708, 2.6052, 2.0743,
    3.2687, 2.1526, 2.8652, 1.5579, 1.6382, 1.1253, 2.8251, 1.9160,
)


@dataclasses.dataclass(frozen=True)
class WanVAEConfig:
    base_dim: int = 96
    z_dim: int = 16
    dim_mult: tuple = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attn_scales: tuple = ()
    temperal_downsample: tuple = (False, True, True)

    @property
    def temperal_upsample(self) -> tuple:
        return self.temperal_downsample[::-1]

    @property
    def enc_dims(self) -> tuple:
        return tuple(self.base_dim * u for u in (1,) + tuple(self.dim_mult))

    @property
    def dec_dims(self) -> tuple:
        m = tuple(self.dim_mult)
        return tuple(self.base_dim * u for u in (m[-1],) + m[::-1])


# --------------------------------------------------------------------------- #
# primitives (channels-last)                                                  #
# --------------------------------------------------------------------------- #
# fp32 inputs run bf16x3 (~14 mantissa bits): the reference's "fp32" VAE
# convs execute under cuDNN TF32 (10 bits) on its GH200s, so HIGH still
# EXCEEDS reference precision while halving the MXU passes vs HIGHEST
# (6-pass true fp32) — measured 1.13 s → ~0.6 s for the 13×512p training
# encode.  bf16 inputs (inference decode) run single-pass natively.
_P32 = jax.lax.Precision.HIGH


def _prec(x):
    return _P32 if x.dtype == jnp.float32 else None


def conv3d_init(key, ci, co, k: tuple, dtype=jnp.float32):
    fan_in = ci * int(np.prod(k))
    bound = 1.0 / np.sqrt(fan_in)
    wk, bk = jax.random.split(key)
    return {
        "kernel": jax.random.uniform(wk, (*k, ci, co), dtype, -bound, bound),
        "bias": jax.random.uniform(bk, (co,), dtype, -bound, bound),
    }


def causal_conv3d(params, x, *, stride=(1, 1, 1), pad=(1, 1, 1)):
    """x: (B,T,H,W,C).  Time padded 2·pad_t at the FRONT only
    (`wan_utils.py:126-135`); H/W padded symmetrically."""
    kern = params["kernel"].astype(x.dtype)
    pt, ph, pw = pad
    if pt or ph or pw:
        x = jnp.pad(x, ((0, 0), (2 * pt, 0), (ph, ph), (pw, pw), (0, 0)))
    # preferred_element_type only for fp32 operands: with bf16 operands the
    # fp32-preferred conv's TRANSPOSE meets an fp32 cotangent against the
    # bf16 kernel and fails to trace, while the MXU accumulates fp32 either
    # way (bf16 output = same single rounding the astype below applies)
    pet = jnp.float32 if x.dtype == jnp.float32 else None
    out = lax.conv_general_dilated(
        x, kern, stride, "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        precision=_prec(x), preferred_element_type=pet,
    ).astype(x.dtype)
    return out + params["bias"].astype(x.dtype)


def conv2d_init(key, ci, co, k: int, dtype=jnp.float32):
    fan_in = ci * k * k
    bound = 1.0 / np.sqrt(fan_in)
    wk, bk = jax.random.split(key)
    return {
        "kernel": jax.random.uniform(wk, (k, k, ci, co), dtype, -bound, bound),
        "bias": jax.random.uniform(bk, (co,), dtype, -bound, bound),
    }


def conv2d_frames(params, x, *, stride=1, pad=((1, 1), (1, 1))):
    """Per-frame 2D conv on (B,T,H,W,C) — fold T into batch."""
    b, t, h, w, c = x.shape
    kern = params["kernel"].astype(x.dtype)
    pet = jnp.float32 if x.dtype == jnp.float32 else None  # see causal_conv3d
    out = lax.conv_general_dilated(
        x.reshape(b * t, h, w, c), kern, (stride, stride), list(pad),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=_prec(x), preferred_element_type=pet,
    ).astype(x.dtype)
    out = out + params["bias"].astype(x.dtype)
    return out.reshape(b, t, *out.shape[1:])


def rms_norm_init(dim, dtype=jnp.float32):
    return {"gamma": jnp.ones((dim,), dtype)}


def rms_norm(params, x, eps: float = 1e-12):
    """torch `F.normalize(x, dim=C) * √dim * gamma` (`wan_utils.py:178-184`).

    The norm reduction is always fp32; the elementwise rescale runs in the
    INPUT dtype (one reciprocal-rounding ulp vs the previous all-fp32 form
    for fp32 inputs), so the bf16 RL-branch VAE (autocast parity) avoids
    materializing fp32 (13,512,512,96) intermediates in the decode backward
    (1.2-2 GB each — the last 2.1 GiB of the deployed AOT gate's
    overshoot).  torch under autocast computes F.normalize in bf16 the
    same way."""
    xf = x.astype(jnp.float32)
    norm = jnp.linalg.norm(xf, axis=-1, keepdims=True)
    scale = (np.sqrt(x.shape[-1]) / jnp.maximum(norm, eps)).astype(x.dtype)
    return x * scale * params["gamma"].astype(x.dtype)


def _nearest2x(x):
    """nearest-exact 2× spatial upsample == pixel repeat for scale 2."""
    b, t, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, :, None, :, None, :], (b, t, h, 2, w, 2, c))
    return x.reshape(b, t, 2 * h, 2 * w, c)


# --------------------------------------------------------------------------- #
# blocks                                                                      #
# --------------------------------------------------------------------------- #
def residual_block_init(key, ci, co, dtype=jnp.float32):
    keys = jax.random.split(key, 3)
    p = {
        "norm1": rms_norm_init(ci, dtype),
        "conv1": conv3d_init(keys[0], ci, co, (3, 3, 3), dtype),
        "norm2": rms_norm_init(co, dtype),
        "conv2": conv3d_init(keys[1], co, co, (3, 3, 3), dtype),
    }
    if ci != co:
        p["conv_shortcut"] = conv3d_init(keys[2], ci, co, (1, 1, 1), dtype)
    return p


def residual_block(params, x):
    h = causal_conv3d(params["conv_shortcut"], x, pad=(0, 0, 0)) \
        if "conv_shortcut" in params else x
    x = jax.nn.silu(rms_norm(params["norm1"], x))
    x = causal_conv3d(params["conv1"], x)
    x = jax.nn.silu(rms_norm(params["norm2"], x))
    x = causal_conv3d(params["conv2"], x)
    return x + h


def attention_block_init(key, dim, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {
        "norm": rms_norm_init(dim, dtype),
        "to_qkv": conv2d_init(k1, dim, dim * 3, 1, dtype),
        "proj": conv2d_init(k2, dim, dim, 1, dtype),
    }


def attention_block(params, x):
    """Single-head spatial attention per frame (`wan_utils.py:428-476`)."""
    b, t, h, w, c = x.shape
    y = rms_norm(params["norm"], x)
    qkv = conv2d_frames(params["to_qkv"], y, pad=((0, 0), (0, 0)))
    qkv = qkv.reshape(b * t, h * w, 3 * c)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    o = dot_product_attention(q[:, :, None, :], k[:, :, None, :],
                              v[:, :, None, :], impl="xla")
    o = o.reshape(b, t, h, w, c)
    o = conv2d_frames(params["proj"], o, pad=((0, 0), (0, 0)))
    return o + x


def mid_block_init(key, dim, dtype=jnp.float32):
    keys = jax.random.split(key, 3)
    return {
        "resnets": [residual_block_init(keys[0], dim, dim, dtype),
                    residual_block_init(keys[1], dim, dim, dtype)],
        "attentions": [attention_block_init(keys[2], dim, dtype)],
    }


def mid_block(params, x, *, remat=False):
    res = jax.checkpoint(residual_block) if remat else residual_block
    att = jax.checkpoint(attention_block) if remat else attention_block
    x = res(params["resnets"][0], x)
    x = att(params["attentions"][0], x)
    return res(params["resnets"][1], x)


# resample -------------------------------------------------------------------
def resample_init(key, dim, mode, dtype=jnp.float32):
    keys = jax.random.split(key, 2)
    if mode in ("upsample2d", "upsample3d"):
        p = {"conv": conv2d_init(keys[0], dim, dim // 2, 3, dtype)}
        if mode == "upsample3d":
            p["time_conv"] = conv3d_init(keys[1], dim, dim * 2, (3, 1, 1),
                                         dtype)
    elif mode in ("downsample2d", "downsample3d"):
        p = {"conv": conv2d_init(keys[0], dim, dim, 3, dtype)}
        if mode == "downsample3d":
            p["time_conv"] = conv3d_init(keys[1], dim, dim, (3, 1, 1), dtype)
    else:
        raise ValueError(mode)
    return p


def _interleave_time(x):
    """(B,T,H,W,2C) → (B,2T,H,W,C): frame 2i = chans [0:C), 2i+1 = [C:2C)
    (`wan_utils.py:303-306`)."""
    b, t, h, w, c2 = x.shape
    c = c2 // 2
    x = jnp.stack([x[..., :c], x[..., c:]], axis=2)      # (B,T,2,H,W,C)
    return x.reshape(b, 2 * t, h, w, c)


def resample(params, x, mode):
    if mode == "upsample3d" and x.shape[1] > 1:
        head, tail = x[:, :1], x[:, 1:]
        tail = causal_conv3d(params["time_conv"], tail, pad=(1, 0, 0))
        x = jnp.concatenate([head, _interleave_time(tail)], axis=1)
    if mode in ("upsample2d", "upsample3d"):
        x = _nearest2x(x)
        x = conv2d_frames(params["conv"], x)
    elif mode in ("downsample2d", "downsample3d"):
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 1), (0, 0)))
        x = conv2d_frames(params["conv"], x, stride=2, pad=((0, 0), (0, 0)))
        if mode == "downsample3d" and x.shape[1] >= 3:
            tail = causal_conv3d(params["time_conv"], x,
                                 stride=(2, 1, 1), pad=(0, 0, 0))
            x = jnp.concatenate([x[:, :1], tail], axis=1)
        elif mode == "downsample3d":
            x = x[:, :1]        # single frame passes through (first chunk)
    return x


# --------------------------------------------------------------------------- #
# encoder / decoder                                                           #
# --------------------------------------------------------------------------- #
def _encoder_plan(cfg: WanVAEConfig):
    """Flat down_blocks layout mirroring `WanEncoder3d.__init__`
    (`wan_utils.py:575-590`): per stage num_res_blocks residuals (+attn at
    matching scales) then a resample (except last stage)."""
    dims = cfg.enc_dims
    plan, scale = [], 1.0
    for i, (ci, co) in enumerate(zip(dims[:-1], dims[1:])):
        for _ in range(cfg.num_res_blocks):
            plan.append(("res", ci, co))
            if scale in cfg.attn_scales:
                plan.append(("attn", co, co))
            ci = co
        if i != len(cfg.dim_mult) - 1:
            mode = ("downsample3d" if cfg.temperal_downsample[i]
                    else "downsample2d")
            plan.append((mode, co, co))
            scale /= 2.0
    return plan


def encoder_init(key, cfg: WanVAEConfig, dtype=jnp.float32) -> dict:
    plan = _encoder_plan(cfg)
    keys = jax.random.split(key, len(plan) + 4)
    dims = cfg.enc_dims
    blocks = []
    for k, (kind, ci, co) in zip(keys[4:], plan):
        if kind == "res":
            blocks.append(residual_block_init(k, ci, co, dtype))
        elif kind == "attn":
            blocks.append(attention_block_init(k, co, dtype))
        else:
            blocks.append(resample_init(k, co, kind, dtype))
    return {
        "conv_in": conv3d_init(keys[0], 3, dims[0], (3, 3, 3), dtype),
        "down_blocks": blocks,
        "mid_block": mid_block_init(keys[1], dims[-1], dtype),
        "norm_out": rms_norm_init(dims[-1], dtype),
        "conv_out": conv3d_init(keys[2], dims[-1], 2 * cfg.z_dim, (3, 3, 3),
                                dtype),
    }


def encoder_apply(params, x, cfg: WanVAEConfig, *, remat=False):
    """x: (B,T,H,W,C=3) → (B, 1+(T−1)/4, H/8, W/8, 2·z)."""
    res = jax.checkpoint(residual_block) if remat else residual_block
    x = causal_conv3d(params["conv_in"], x)
    for (kind, ci, co), p in zip(_encoder_plan(cfg), params["down_blocks"]):
        if kind == "res":
            x = res(p, x)
        elif kind == "attn":
            x = attention_block(p, x)
        else:
            x = resample(p, x, kind)
    x = mid_block(params["mid_block"], x, remat=remat)
    x = jax.nn.silu(rms_norm(params["norm_out"], x))
    return causal_conv3d(params["conv_out"], x)


def decoder_init(key, cfg: WanVAEConfig, dtype=jnp.float32) -> dict:
    dims = cfg.dec_dims
    keys = jax.random.split(key, 4 + len(dims))
    up_blocks = []
    for i, (ci, co) in enumerate(zip(dims[:-1], dims[1:])):
        if i > 0:
            ci //= 2
        bkeys = jax.random.split(keys[4 + i], cfg.num_res_blocks + 2)
        resnets, cur = [], ci
        for j in range(cfg.num_res_blocks + 1):
            resnets.append(residual_block_init(bkeys[j], cur, co, dtype))
            cur = co
        blk = {"resnets": resnets}
        if i != len(cfg.dim_mult) - 1:
            mode = ("upsample3d" if cfg.temperal_upsample[i] else "upsample2d")
            blk["upsamplers"] = [resample_init(bkeys[-1], co, mode, dtype)]
        up_blocks.append(blk)
    return {
        "conv_in": conv3d_init(keys[0], cfg.z_dim, dims[0], (3, 3, 3), dtype),
        "mid_block": mid_block_init(keys[1], dims[0], dtype),
        "up_blocks": up_blocks,
        "norm_out": rms_norm_init(dims[-1], dtype),
        "conv_out": conv3d_init(keys[2], dims[-1], 3, (3, 3, 3), dtype),
    }


def decoder_apply(params, z, cfg: WanVAEConfig, *, remat=False):
    """z: (B,T,h,w,z_dim) → (B, 1+(T−1)·4, 8h, 8w, 3), clamped [−1,1]."""
    res = jax.checkpoint(residual_block) if remat else residual_block
    x = causal_conv3d(params["conv_in"], z)
    x = mid_block(params["mid_block"], x, remat=remat)
    for i, blk in enumerate(params["up_blocks"]):
        for p in blk["resnets"]:
            x = res(p, x)
        if "upsamplers" in blk:
            mode = ("upsample3d" if cfg.temperal_upsample[i] else "upsample2d")
            x = resample(blk["upsamplers"][0], x, mode)

    def tail(pn, pc, x):
        x = jax.nn.silu(rms_norm(pn, x))
        x = causal_conv3d(pc, x)
        return jnp.clip(x, -1.0, 1.0)

    # the tail runs at the FINEST resolution (96ch × 8h×8w × full T): left
    # un-remat'd it saves the silu/norm intermediates (1-2 GB at 13×512p)
    # through the whole backward — the last overshoot of the deployed RL
    # AOT gate
    if remat:
        tail = jax.checkpoint(tail)
    return tail(params["norm_out"], params["conv_out"], x)


# --------------------------------------------------------------------------- #
# top level                                                                   #
# --------------------------------------------------------------------------- #
def init(key, cfg: WanVAEConfig = WanVAEConfig(), dtype=jnp.float32) -> dict:
    keys = jax.random.split(key, 4)
    return {
        "encoder": encoder_init(keys[0], cfg, dtype),
        "quant_conv": conv3d_init(keys[1], 2 * cfg.z_dim, 2 * cfg.z_dim,
                                  (1, 1, 1), dtype),
        "post_quant_conv": conv3d_init(keys[2], cfg.z_dim, cfg.z_dim,
                                       (1, 1, 1), dtype),
        "decoder": decoder_init(keys[3], cfg, dtype),
    }


def _to_channels_last(x):
    return jnp.moveaxis(x, 1, -1)        # (B,C,T,H,W) → (B,T,H,W,C)


def _to_channels_first(x):
    return jnp.moveaxis(x, -1, 1)


def encode(params, video, cfg: WanVAEConfig = WanVAEConfig(), *, remat=False):
    """video: (B,3,T,H,W) in [−1,1] → (mu, logvar), each (B,z,T',H/8,W/8).

    `AutoencoderKLWan._encode` (`wan_utils.py:1021-1047`) without the chunk
    loop (full-sequence equivalence, see module docstring)."""
    t = video.shape[2]
    assert t % 4 == 1, (
        f"Wan VAE needs T ≡ 1 (mod 4) frames, got {t} — the reference's "
        "chunked encode silently DROPS frames beyond 1+4k "
        "(`wan_utils.py:1027`); we refuse instead.")
    x = _to_channels_last(video)
    h = encoder_apply(params["encoder"], x, cfg, remat=remat)
    h = causal_conv3d(params["quant_conv"], h, pad=(0, 0, 0))
    mu, logvar = jnp.split(h, 2, axis=-1)
    return _to_channels_first(mu), _to_channels_first(logvar)


def sample_posterior(key, mu, logvar):
    """DiagonalGaussianDistribution.sample: clamp logvar to ±30 like
    diffusers."""
    logvar = jnp.clip(logvar, -30.0, 20.0)
    std = jnp.exp(0.5 * logvar)
    return mu + std * jax.random.normal(key, mu.shape, mu.dtype)


def decode(params, z, cfg: WanVAEConfig = WanVAEConfig(), *, remat=False):
    """z: (B,z,T',h,w) un-normalized → video (B,3,T,8h,8w) in [−1,1]."""
    x = _to_channels_last(z)
    x = causal_conv3d(params["post_quant_conv"], x, pad=(0, 0, 0))
    out = decoder_apply(params["decoder"], x, cfg, remat=remat)
    return _to_channels_first(out)


def normalize_latents(z, dtype=None):
    """pipeline-space z_norm = (z − mean) / std (`inference_t23d.py:105-113`
    inverts this before the stitched decoder)."""
    mean = jnp.asarray(LATENTS_MEAN, z.dtype).reshape(1, -1, 1, 1, 1)
    std = jnp.asarray(LATENTS_STD, z.dtype).reshape(1, -1, 1, 1, 1)
    return (z - mean) / std


def unnormalize_latents(z_norm):
    mean = jnp.asarray(LATENTS_MEAN, z_norm.dtype).reshape(1, -1, 1, 1, 1)
    std = jnp.asarray(LATENTS_STD, z_norm.dtype).reshape(1, -1, 1, 1, 1)
    return z_norm * std + mean
