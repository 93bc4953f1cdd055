"""Prediction heads: camera (iterative refinement), depth DPT, Gaussian DPT.

Behavioral parity:
  * `vggt/heads/camera_head.py` — 4-iteration adaLN-modulated trunk on the
    camera token, delta pose updates with detach between iterations, ReLU on
    the FoV channels;
  * `vggt/heads/dpt_head.py` — DPT fusion over 4 tapped 2048-d token maps:
    per-tap 1×1 projection → sinusoidal UV embedding (×0.1) → multiscale
    resize (×4, ×2, ×1, ÷2) → refinenet cascade → output convs; depth uses
    exp/expp1 activations (`models/vggt.py:35-40`);
  * `heads/vggt_dpt_gs_head.py` — DPT variant emitting 84 raw Gaussian
    channels with a conv7×7 RGB skip (`input_merger`).

All heads run fp32 (`anysplat.py:421`, `models/anysplat_stitched.py:335`).

TPU design notes: torch's `align_corners=True` bilinear resize (used
throughout DPT) has no jax.image equivalent, so it is implemented as two
small interpolation-matrix matmuls — MXU work instead of gathers.  Sinusoidal
tables are built in host numpy (fp64) once per static shape.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from vist3a_tpu.nn.layers import (
    BlockConfig,
    layer_norm,
    layer_norm_init,
    linear,
    linear_init,
    mlp_init,
    scan_blocks,
)

# Head-conv MXU precision policy.
#   "default" = single-pass bf16 (8 mantissa bits, fp32 accumulation)
#   "high"    = bf16x3 (~14 bits, 3 passes, ~2.1× slower on the DPT heads)
# Measured end-to-end (CPU fp32 vs simulated bf16 convs, real head configs,
# bf16-quantized taps): switching the whole cascade to single-pass bf16
# moves the final depth by 2.9e-4 mean / 9.7e-4 max relative — 5× BELOW the
# 1.4e-3 activation-quantization noise the (reference-matching) bf16 trunk
# already injects into the taps, so the extra passes buy nothing the trunk
# hasn't already thrown away.  The reference's own effective precision here
# is cuDNN TF32 (10 bits).  Set "high" to reproduce the old behavior.
_P = "default"


def set_head_conv_precision(mode: str) -> None:
    """'default' (bf16, fast) or 'high' (bf16x3) — module-wide policy."""
    global _P
    assert mode in ("default", "high"), mode
    _P = mode


# --------------------------------------------------------------------------- #
# conv helpers (torch OIHW layout so checkpoints import without surgery)      #
# --------------------------------------------------------------------------- #
def conv2d_init(key, c_in, c_out, k, *, bias=True, dtype=jnp.float32):
    fan_in = c_in * k * k
    bound = 1.0 / np.sqrt(fan_in)
    wk, bk = jax.random.split(key)
    p = {f"kernel_mat{k}": jax.random.uniform(
        wk, (k * k * c_in, c_out), dtype, -bound, bound)}
    if bias:
        p["bias"] = jax.random.uniform(bk, (c_out,), dtype, -bound, bound)
    return p


def conv_mat_key(params) -> str:
    """The single `kernel_mat<k>` key of a heads conv node (k = static
    spatial size, encoded in the KEY so it never rides a traced leaf)."""
    for key in params:
        if key.startswith("kernel_mat"):
            return key
    raise KeyError(f"no kernel_mat<k> in {list(params)}")


def conv2d(params, x, *, stride=1, padding=0, channels_last=False):
    """Kernel stored as a 2D (kh·kw·ci, co) matrix under `kernel_mat<k>`
    (row-major over (kh, kw, ci); importers flatten from torch OIHW; the
    static spatial size k lives in the key name).

    WHY 2D: XLA assigns conv KERNEL operands a spatial-minor layout that
    tiles a 3×3 kernel's (3, 3) dims at T(4,128) — 56.9× padding.  For the
    LoRA-merged 1024² head kernels that meant 1–2 GB per live temp (merged
    kernel, its remat residual, and its cotangent), the dominant OOM source
    for the single-chip training step.  Stored 2D, the merge/add, the remat
    residual, and the im2col matmul all stay on cleanly tiled matrices;
    only small-channel sites reshape to 4D for `conv_general_dilated`.

    Big-channel 3×3 sites run as explicit im2col matmuls; the patches are
    transient and small at the ≤64² resolutions where those sites live.
    channels_last=True runs convs in NHWC (the DPT pipeline is fully NHWC
    internally)."""
    key = conv_mat_key(params)
    ksize = int(key[len("kernel_mat"):])
    k2 = params[key].astype(x.dtype)
    co = k2.shape[1]
    kh = kw = ksize
    ci = k2.shape[0] // (kh * kw)
    if channels_last and ksize == 3 and max(ci, co) >= 512:
        out = _conv3x3_matmul(k2, ci, x, stride, padding)
    else:
        k = k2.reshape(kh, kw, ci, co)
        lay = ("NHWC", "HWIO", "NHWC") if channels_last else \
            ("NCHW", "HWIO", "NCHW")
        dn = lax.conv_dimension_numbers(x.shape, k.shape, lay)
        # fp32-preferred output only for fp32 inputs: with bf16 operands the
        # conv TRANSPOSE meets an fp32 cotangent against the bf16 kernel
        # and fails to trace; the MXU accumulates fp32 either way
        pet = jnp.float32 if x.dtype == jnp.float32 else None
        out = lax.conv_general_dilated(
            x, k, (stride, stride), [(padding, padding)] * 2,
            dimension_numbers=dn, precision=_P,
            preferred_element_type=pet,
        ).astype(x.dtype)
    if "bias" in params:
        b = params["bias"].astype(x.dtype)
        out = out + (b if channels_last else b[None, :, None, None])
    return out


def _conv3x3_matmul(k2, ci, x, stride, padding):
    """NHWC 3×3 conv as im2col + one matmul (see `conv2d` docstring).
    k2: (9·ci, co) row-major over (kh, kw, ci); x: (N, H, W, ci)."""
    co = k2.shape[1]
    n, h, w, _ = x.shape
    xp = jnp.pad(x, ((0, 0), (padding, padding), (padding, padding), (0, 0)))
    oh = (h + 2 * padding - 3) // stride + 1
    ow = (w + 2 * padding - 3) // stride + 1
    patches = jnp.concatenate(
        [xp[:, dy:dy + oh * stride:stride, dx:dx + ow * stride:stride, :]
         for dy in range(3) for dx in range(3)], axis=-1)
    out = jnp.dot(patches.reshape(n * oh * ow, 9 * ci), k2, precision=_P,
                  preferred_element_type=jnp.float32)
    return out.reshape(n, oh, ow, co).astype(x.dtype)


def conv_transpose2d_init(key, c_in, c_out, k, *, dtype=jnp.float32):
    # stored (kh, kw, c_out, c_in) — the HWIO form of torch's
    # ConvTranspose2d (in, out, kh, kw) weight
    fan_in = c_out * k * k  # torch uses weight.size(1)*k*k for init bounds
    bound = 1.0 / np.sqrt(fan_in)
    wk, bk = jax.random.split(key)
    return {
        "kernel_hwio": jax.random.uniform(
            wk, (k, k, c_out, c_in), dtype, -bound, bound),
        "bias": jax.random.uniform(bk, (c_out,), dtype, -bound, bound),
    }


def conv_transpose2d(params, x, *, stride, channels_last=False):
    # torch ConvTranspose2d weight (in,out,kh,kw) is the OIHW kernel of the
    # forward conv being transposed (stored here as its HWIO transpose);
    # transpose_kernel flips/swaps it for us.
    k = params["kernel_hwio"].astype(x.dtype)
    lay = ("NHWC", "HWIO", "NHWC") if channels_last else \
        ("NCHW", "HWIO", "NCHW")
    out = lax.conv_transpose(
        x, k, (stride, stride), "VALID",
        dimension_numbers=lay,
        transpose_kernel=True, precision=_P,
    )
    b = params["bias"].astype(x.dtype)
    return out + (b if channels_last else b[None, :, None, None])


# --------------------------------------------------------------------------- #
# align-corners bilinear resize as two matmuls                                #
# --------------------------------------------------------------------------- #
@functools.lru_cache(maxsize=64)
def _interp_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) bilinear align_corners=True interpolation weights."""
    m = np.zeros((n_out, n_in), np.float32)
    if n_out == 1 or n_in == 1:
        m[:, 0] = 1.0
        return m
    coords = np.arange(n_out) * (n_in - 1) / (n_out - 1)
    lo = np.floor(coords).astype(np.int64)
    hi = np.minimum(lo + 1, n_in - 1)
    w = (coords - lo).astype(np.float32)
    m[np.arange(n_out), lo] += 1 - w
    m[np.arange(n_out), hi] += w
    return m


def resize_bilinear_align_corners(x: jnp.ndarray, size: tuple[int, int], *,
                                  channels_last=False) -> jnp.ndarray:
    """x: (..., H, W) (or (..., H, W, C) with channels_last) → resized,
    torch align_corners=True semantics."""
    hax = -3 if channels_last else -2
    h, w = x.shape[hax], x.shape[hax + 1]
    oh, ow = size
    if (h, w) == (oh, ow):
        return x
    mh = jnp.asarray(_interp_matrix(h, oh)).astype(x.dtype)
    mw = jnp.asarray(_interp_matrix(w, ow)).astype(x.dtype)
    if channels_last:
        out = jnp.einsum("oh,...hwc->...owc", mh, x, precision=_P)
        return jnp.einsum("pw,...owc->...opc", mw, out, precision=_P)
    out = jnp.einsum("oh,...hw->...ow", mh, x, precision=_P)
    return jnp.einsum("pw,...ow->...op", mw, out, precision=_P)


# --------------------------------------------------------------------------- #
# sinusoidal UV positional embedding (`vggt/heads/utils.py`)                  #
# --------------------------------------------------------------------------- #
@functools.lru_cache(maxsize=64)
def _uv_pos_embed(h: int, w: int, dim: int, aspect: float, omega0: float = 100.0
                  ) -> np.ndarray:
    """(dim, h, w) fp32; grid spans scaled by the image aspect ratio."""
    diag = (aspect**2 + 1.0) ** 0.5
    span_x, span_y = aspect / diag, 1.0 / diag
    xs = np.linspace(-span_x * (w - 1) / w, span_x * (w - 1) / w, w)
    ys = np.linspace(-span_y * (h - 1) / h, span_y * (h - 1) / h, h)
    uu, vv = np.meshgrid(xs, ys)  # (h, w) each

    def sincos(pos):
        half = dim // 4
        omega = 1.0 / omega0 ** (np.arange(half, dtype=np.float64) / half)
        out = pos.reshape(-1)[:, None] * omega[None]
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)  # (hw, dim/2)

    emb = np.concatenate([sincos(uu), sincos(vv)], axis=1)  # (hw, dim)
    return emb.astype(np.float32).reshape(h, w, dim).transpose(2, 0, 1)


def apply_uv_pos_embed(x: jnp.ndarray, img_w: int, img_h: int,
                       ratio: float = 0.1, *,
                       channels_last=False) -> jnp.ndarray:
    """x: (B, C, h, w) (or (B, h, w, C)); adds 0.1× sinusoidal UV embed."""
    if channels_last:
        _, h, w, c = x.shape
        pe = jnp.asarray(_uv_pos_embed(h, w, c, img_w / img_h))
        return x + ratio * pe.astype(x.dtype).transpose(1, 2, 0)[None]
    _, c, h, w = x.shape
    pe = jnp.asarray(_uv_pos_embed(h, w, c, img_w / img_h))
    return x + ratio * pe.astype(x.dtype)[None]


# --------------------------------------------------------------------------- #
# DPT head                                                                    #
# --------------------------------------------------------------------------- #
@dataclasses.dataclass(frozen=True)
class DPTConfig:
    dim_in: int = 2048
    patch_size: int = 14
    output_dim: int = 2                 # depth: 1 + conf
    features: int = 256
    out_channels: tuple = (256, 512, 1024, 1024)
    activation: str = "exp"             # depth head (`models/vggt.py:38`)
    conf_activation: str = "expp1"
    pos_embed: bool = True
    down_ratio: int = 1
    head2_features: int = 32
    frames_chunk_size: int = 8          # `dpt_head.py:128-183`; ≤0 → off


def _residual_unit_init(key, features, dtype):
    k1, k2 = jax.random.split(key)
    return {
        "conv1": conv2d_init(k1, features, features, 3, dtype=dtype),
        "conv2": conv2d_init(k2, features, features, 3, dtype=dtype),
    }


def _residual_unit(params, x):
    out = conv2d(params["conv1"], jax.nn.relu(x), padding=1,
                 channels_last=True)
    out = conv2d(params["conv2"], jax.nn.relu(out), padding=1,
                 channels_last=True)
    return out + x


def _fusion_init(key, features, has_residual, dtype):
    keys = jax.random.split(key, 3)
    p = {
        "res2": _residual_unit_init(keys[1], features, dtype),
        "out_conv": conv2d_init(keys[2], features, features, 1, dtype=dtype),
    }
    if has_residual:
        p["res1"] = _residual_unit_init(keys[0], features, dtype)
    return p


def _fusion(params, x, residual=None, size=None):
    if residual is not None:
        x = x + _residual_unit(params["res1"], residual)
    x = _residual_unit(params["res2"], x)
    if size is None:
        size = (x.shape[-3] * 2, x.shape[-2] * 2)
    x = resize_bilinear_align_corners(x, size, channels_last=True)
    return conv2d(params["out_conv"], x, channels_last=True)


def dpt_init(key, cfg: DPTConfig, dtype=jnp.float32) -> dict:
    keys = jax.random.split(key, 16)
    oc = cfg.out_channels
    f = cfg.features
    p = {
        "norm": layer_norm_init(cfg.dim_in, dtype),
        "projects": [conv2d_init(keys[i], cfg.dim_in, oc[i], 1, dtype=dtype)
                     for i in range(4)],
        "resize0": conv_transpose2d_init(keys[4], oc[0], oc[0], 4, dtype=dtype),
        "resize1": conv_transpose2d_init(keys[5], oc[1], oc[1], 2, dtype=dtype),
        "resize3": conv2d_init(keys[6], oc[3], oc[3], 3, dtype=dtype),
        "layer_rn": [conv2d_init(keys[7 + i], oc[i], f, 3, bias=False, dtype=dtype)
                     for i in range(4)],
        "refinenet1": _fusion_init(keys[11], f, True, dtype),
        "refinenet2": _fusion_init(keys[12], f, True, dtype),
        "refinenet3": _fusion_init(keys[13], f, True, dtype),
        "refinenet4": _fusion_init(keys[14], f, False, dtype),
        "output_conv1": conv2d_init(keys[15], f, f // 2, 3, dtype=dtype),
        "output_conv2": [
            conv2d_init(jax.random.fold_in(key, 91), f // 2, cfg.head2_features,
                        3, dtype=dtype),
            conv2d_init(jax.random.fold_in(key, 92), cfg.head2_features,
                        cfg.output_dim, 1, dtype=dtype),
        ],
    }
    return p


def _dpt_fused_features(params, taps, cfg: DPTConfig, patch_start_idx: int,
                        img_hw: tuple[int, int]):
    """taps: 4 × (N,P,2C) frame-flattened → fused map (N, features//2, ·, ·).

    Returns the output of the refinenet cascade + output_conv1 at 2× patch
    grid resolution ((patch_h·ps/2)·... per DPT wiring) — callers apply the
    final resize + output convs.

    The whole cascade runs channels-last (NHWC): tokens arrive (N, P, C)
    with P row-major over (ph, pw), so the entry reshape is free, and every
    conv sits in the TPU conv engine's preferred layout (the NCHW form
    forced a transpose around each of the ~20 convs).
    """
    h, w = img_hw
    ph, pw = h // cfg.patch_size, w // cfg.patch_size
    outs = []
    for i, tap in enumerate(taps):
        n, p, c = tap.shape
        # compute dtype follows the taps: callers pass fp32 for the
        # reference-parity path (`anysplat.py:421`) or bf16 for the
        # inference decode (EncoderConfig.head_dtype — measured deviation
        # documented there); layer_norm below is internally fp32 either way
        x = tap[:, patch_start_idx:]
        x = layer_norm(params["norm"], x)
        x = x.reshape(n, ph, pw, c)
        x = conv2d(params["projects"][i], x, channels_last=True)
        if cfg.pos_embed:
            x = apply_uv_pos_embed(x, w, h, channels_last=True)
        if i == 0:
            x = conv_transpose2d(params["resize0"], x, stride=4,
                                 channels_last=True)
        elif i == 1:
            x = conv_transpose2d(params["resize1"], x, stride=2,
                                 channels_last=True)
        elif i == 3:
            x = conv2d(params["resize3"], x, stride=2, padding=1,
                       channels_last=True)
        outs.append(x)

    l1, l2, l3, l4 = [conv2d(params["layer_rn"][i], o, padding=1,
                             channels_last=True)
                      for i, o in enumerate(outs)]
    out = _fusion(params["refinenet4"], l4, size=l3.shape[1:3])
    out = _fusion(params["refinenet3"], out, l3, size=l2.shape[1:3])
    out = _fusion(params["refinenet2"], out, l2, size=l1.shape[1:3])
    out = _fusion(params["refinenet1"], out, l1)
    return conv2d(params["output_conv1"], out, padding=1, channels_last=True)


def _frame_chunks(n: int, chunk: int):
    """Frame-chunk bounds à la `vggt/heads/dpt_head.py:128-183` — bounds are
    python ints, so each distinct chunk length compiles once (≤2 variants)."""
    if chunk <= 0 or chunk >= n:
        return [(0, n)]
    return [(i, min(i + chunk, n)) for i in range(0, n, chunk)]


def _dpt_frames(params, taps_flat, *, images_hw, patch_start_idx,
                cfg: DPTConfig):
    """Per-frame DPT pipeline on pre-flattened taps (4 × (N,P,2C)) →
    (N, H', W', output_dim) channels-last.  Pure per-frame math — chunking
    over N is exact."""
    h, w = images_hw
    out = _dpt_fused_features(params, taps_flat, cfg, patch_start_idx,
                              images_hw)
    ph, pw = h // cfg.patch_size, w // cfg.patch_size
    target = (ph * cfg.patch_size // cfg.down_ratio,
              pw * cfg.patch_size // cfg.down_ratio)
    out = resize_bilinear_align_corners(out, target, channels_last=True)
    if cfg.pos_embed:
        out = apply_uv_pos_embed(out, w, h, channels_last=True)
    out = conv2d(params["output_conv2"][0], out, padding=1,
                 channels_last=True)
    return conv2d(params["output_conv2"][1], jax.nn.relu(out),
                  channels_last=True)


def dpt_apply(params, taps, images_hw: tuple[int, int], patch_start_idx: int,
              cfg: DPTConfig, batch_seq: tuple[int, int], *,
              remat: bool = False):
    """Depth-style DPT: returns (preds (B,S,H,W,C-1), conf (B,S,H,W)).

    Frames processed in chunks of `cfg.frames_chunk_size` (HBM bound, same
    scheme as the reference's `frames_chunk_size=8`).  remat=True
    checkpoints each chunk (the 448² conv activations are the largest
    training temps; the reference grad-checkpoints these heads too,
    `models/anysplat_stitched.py:336-407`)."""
    h, w = images_hw
    b, s = batch_seq
    frames_fn = jax.checkpoint(
        functools.partial(_dpt_frames, images_hw=images_hw,
                          patch_start_idx=patch_start_idx, cfg=cfg),
        static_argnums=()) if remat else functools.partial(
        _dpt_frames, images_hw=images_hw,
        patch_start_idx=patch_start_idx, cfg=cfg)
    taps_flat = [t.reshape(b * s, *t.shape[2:]) for t in taps]
    chunks = []
    for lo, hi in _frame_chunks(b * s, cfg.frames_chunk_size):
        chunks.append(frames_fn(params, [t[lo:hi] for t in taps_flat]))
    out = chunks[0] if len(chunks) == 1 else jnp.concatenate(chunks, axis=0)
    # activate (`heads/head_act.py:61-112`); out is already (BS, H, W, C).
    # exp/expm1 run fp32 regardless of the cascade dtype: a bf16 input to
    # exp would turn the 2^-8 storage rounding into ~1% depth error
    fmap = out.astype(jnp.float32)
    xyz, conf = fmap[..., :-1], fmap[..., -1]
    if cfg.activation == "exp":
        preds = jnp.exp(xyz)
    elif cfg.activation == "norm_exp":
        d = jnp.maximum(jnp.linalg.norm(xyz, axis=-1, keepdims=True), 1e-8)
        preds = xyz / d * jnp.expm1(d)
    elif cfg.activation == "inv_log":
        preds = jnp.sign(xyz) * jnp.expm1(jnp.abs(xyz))
    elif cfg.activation == "linear":
        preds = xyz
    else:
        raise ValueError(cfg.activation)
    if cfg.conf_activation == "expp1":
        conf = 1 + jnp.exp(conf)
    elif cfg.conf_activation == "expp0":
        conf = jnp.exp(conf)
    elif cfg.conf_activation == "sigmoid":
        conf = jax.nn.sigmoid(conf)
    else:
        raise ValueError(cfg.conf_activation)
    preds = preds.reshape(b, s, h, w, -1)
    conf = conf.reshape(b, s, h, w)
    return preds, conf


# --------------------------------------------------------------------------- #
# Gaussian DPT head (`heads/vggt_dpt_gs_head.py`)                             #
# --------------------------------------------------------------------------- #
@dataclasses.dataclass(frozen=True)
class GSHeadConfig(DPTConfig):
    output_dim: int = 84                # raw_gs_dim (83) + conf
    head2_features: int = 128           # output_dim > 50 branch


def gs_head_init(key, cfg: GSHeadConfig, dtype=jnp.float32) -> dict:
    # input_merger output must match output_conv1's features//2 channels for
    # the additive RGB skip (`vggt_dpt_gs_head.py:69-84,167-170`; both are 128
    # at the deployed scale since output_dim 84 > 50 ⇒ head_features_2 = 128).
    p = dpt_init(key, cfg, dtype)
    h1 = cfg.features // 2
    h2 = cfg.head2_features
    p["input_merger"] = conv2d_init(jax.random.fold_in(key, 93), 3, h1, 7,
                                    dtype=dtype)
    p["output_conv2"] = [
        conv2d_init(jax.random.fold_in(key, 94), h1, h2, 3, dtype=dtype),
        conv2d_init(jax.random.fold_in(key, 95), h2, cfg.output_dim, 1,
                    dtype=dtype),
    ]
    return p


def _gs_frames(params, taps_flat, imgs, *, cfg: GSHeadConfig,
               patch_start_idx: int):
    """imgs: (N, H, W, 3) channels-last."""
    h, w = imgs.shape[1:3]
    out = _dpt_fused_features(params, taps_flat, cfg, patch_start_idx, (h, w))
    direct = jax.nn.relu(conv2d(params["input_merger"],
                                imgs.astype(out.dtype), padding=3,
                                channels_last=True))
    out = resize_bilinear_align_corners(out, (h, w),
                                        channels_last=True) + direct
    if cfg.pos_embed:
        out = apply_uv_pos_embed(out, w, h, channels_last=True)
    out = conv2d(params["output_conv2"][0], out, padding=1,
                 channels_last=True)
    return conv2d(params["output_conv2"][1], jax.nn.relu(out),
                  channels_last=True)


def gs_head_apply(params, taps, images, patch_start_idx: int,
                  cfg: GSHeadConfig, *, remat: bool = False):
    """images: (B,S,3,H,W) in [0,1].  Returns raw (B,S,H,W,output_dim)
    channels-last (the assembly in `heads_pipeline` consumes NHWC directly;
    the reference's (…,C,H,W) form would force a 0.9 GB transpose).
    Frame-chunked like the reference (`vggt_dpt_gs_head.py:86-121`)."""
    b, s, _, h, w = images.shape
    frames_fn = functools.partial(_gs_frames, cfg=cfg,
                                  patch_start_idx=patch_start_idx)
    if remat:
        frames_fn = jax.checkpoint(frames_fn)
    taps_flat = [t.reshape(b * s, *t.shape[2:]) for t in taps]
    imgs_flat = images.reshape(b * s, 3, h, w).transpose(0, 2, 3, 1)
    chunks = [
        frames_fn(params, [t[lo:hi] for t in taps_flat], imgs_flat[lo:hi])
        for lo, hi in _frame_chunks(b * s, cfg.frames_chunk_size)
    ]
    out = chunks[0] if len(chunks) == 1 else jnp.concatenate(chunks, axis=0)
    # raw Gaussian channels are consumed fp32 by the assembly
    # (`encoder.heads_pipeline`) whatever the cascade dtype
    return out.astype(jnp.float32).reshape(b, s, h, w, cfg.output_dim)


# --------------------------------------------------------------------------- #
# camera head (`vggt/heads/camera_head.py`)                                   #
# --------------------------------------------------------------------------- #
@dataclasses.dataclass(frozen=True)
class CameraHeadConfig:
    dim_in: int = 2048
    trunk_depth: int = 4
    num_heads: int = 16
    mlp_ratio: float = 4.0
    target_dim: int = 9
    num_iterations: int = 4

    def block_config(self) -> BlockConfig:
        return BlockConfig(dim=self.dim_in, num_heads=self.num_heads,
                           mlp_ratio=self.mlp_ratio, layerscale=0.01,
                           ln_eps=1e-5, attn_impl="xla")


def camera_head_init(key, cfg: CameraHeadConfig = CameraHeadConfig(),
                     dtype=jnp.float32) -> dict:
    from vist3a_tpu.nn.layers import stack_init

    keys = jax.random.split(key, 5)
    return {
        "trunk": stack_init(keys[0], cfg.block_config(), cfg.trunk_depth, dtype),
        "token_norm": layer_norm_init(cfg.dim_in, dtype),
        "trunk_norm": layer_norm_init(cfg.dim_in, dtype),
        "empty_pose_tokens": jnp.zeros((1, 1, cfg.target_dim), dtype),
        "embed_pose": linear_init(keys[1], cfg.target_dim, cfg.dim_in, dtype=dtype),
        "modulation": linear_init(keys[2], cfg.dim_in, 3 * cfg.dim_in, dtype=dtype),
        # Mlp(dim_in, hidden=dim_in//2, out=target_dim) (`camera_head.py:80-85`)
        "pose_branch": {
            "fc1": linear_init(keys[3], cfg.dim_in, cfg.dim_in // 2, dtype=dtype),
            "fc2": linear_init(keys[4], cfg.dim_in // 2, cfg.target_dim,
                               dtype=dtype),
        },
    }


def camera_head_apply(params, last_tap: jnp.ndarray,
                      cfg: CameraHeadConfig = CameraHeadConfig()):
    """last_tap: (B,S,P,2C) from aggregator layer 23.  Returns the list of
    per-iteration activated pose encodings (each (B,S,9))."""
    from vist3a_tpu.nn.layers import gelu

    pose_tokens = last_tap[:, :, 0].astype(jnp.float32)  # (B,S,2048)
    pose_tokens = layer_norm(params["token_norm"], pose_tokens)
    blk_cfg = cfg.block_config()

    preds = []
    pred = None
    for _ in range(cfg.num_iterations):
        if pred is None:
            b, s, _ = pose_tokens.shape
            module_input = jnp.broadcast_to(
                params["empty_pose_tokens"].astype(jnp.float32),
                (b, s, cfg.target_dim),
            )
        else:
            module_input = jax.lax.stop_gradient(pred)
        embedded = linear(params["embed_pose"], module_input)
        mod = linear(params["modulation"], jax.nn.silu(embedded))
        shift, scale, gate = jnp.split(mod, 3, axis=-1)
        normed = _ln_no_affine(pose_tokens, eps=1e-6)
        modulated = gate * (normed * (1 + scale) + shift) + pose_tokens
        trunk_out = scan_blocks(params["trunk"], modulated, blk_cfg, remat=True)
        delta = linear(
            params["pose_branch"]["fc2"],
            gelu(linear(params["pose_branch"]["fc1"],
                        layer_norm(params["trunk_norm"], trunk_out))),
        )
        pred = delta if pred is None else pred + delta
        # activate: trans/quat linear, fov relu (`camera_head.py:36-38`)
        activated = jnp.concatenate(
            [pred[..., :7], jax.nn.relu(pred[..., 7:])], axis=-1
        )
        preds.append(activated)
    return preds


def _ln_no_affine(x, eps):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)
