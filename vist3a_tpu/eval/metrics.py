"""Image quality metrics: PSNR / SSIM / LPIPS (JAX).

Parity targets: `src/evaluation/metrics.py:12-52` —
  * PSNR: −10·log10(mean squared error) on [0,1]-clipped images;
  * SSIM: skimage `structural_similarity(win_size=11,
    gaussian_weights=True, channel_axis=0, data_range=1.0)` — Wang et al.
    settings: 11-tap Gaussian σ=1.5 window, C1=(0.01)², C2=(0.03)², sample
    (unbiased) covariance normalization, per-channel mean;
  * LPIPS(vgg): the standard LPIPS-VGG16 metric — imagenet-normalized
    features from conv stages {1..5} (post-ReLU), unit-normalized across
    channels, squared difference weighted by the learned 1×1 linear heads,
    spatially averaged and summed over stages.  Weights load from the lpips
    package's checkpoint layout via `import_lpips_vgg`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def compute_psnr(gt: jnp.ndarray, pred: jnp.ndarray) -> jnp.ndarray:
    """(B,C,H,W) in [0,1] → (B,) PSNR (`metrics.py:12-20`)."""
    gt = jnp.clip(gt, 0.0, 1.0)
    pred = jnp.clip(pred, 0.0, 1.0)
    mse = jnp.mean(jnp.square(gt - pred), axis=(1, 2, 3))
    return -10.0 * jnp.log10(mse)


def _gaussian_window(win_size: int = 11, sigma: float = 1.5) -> np.ndarray:
    r = np.arange(win_size) - (win_size - 1) / 2.0
    w = np.exp(-(r ** 2) / (2 * sigma ** 2))
    return (w / w.sum()).astype(np.float32)


def _filter2(x, win):
    """Separable 'valid' windowed mean over the last two axes of (N,H,W)."""
    w = jnp.asarray(win, x.dtype)
    k = w.shape[0]
    x4 = x[:, None]                                   # (N,1,H,W)
    x4 = jax.lax.conv_general_dilated(
        x4, w.reshape(1, 1, k, 1), (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST)
    x4 = jax.lax.conv_general_dilated(
        x4, w.reshape(1, 1, 1, k), (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST)
    return x4[:, 0]


def compute_ssim(gt: jnp.ndarray, pred: jnp.ndarray, *, win_size: int = 11,
                 sigma: float = 1.5, data_range: float = 1.0) -> jnp.ndarray:
    """(B,C,H,W) → (B,), skimage gaussian-weighted settings.

    skimage with gaussian_weights uses use_sample_covariance=False and
    normalizes moments by the Gaussian window itself."""
    win = _gaussian_window(win_size, sigma)
    b, c = gt.shape[:2]
    x = gt.reshape(b * c, *gt.shape[2:]).astype(jnp.float32)
    y = pred.reshape(b * c, *pred.shape[2:]).astype(jnp.float32)

    ux = _filter2(x, win)
    uy = _filter2(y, win)
    uxx = _filter2(x * x, win)
    uyy = _filter2(y * y, win)
    uxy = _filter2(x * y, win)
    vx = uxx - ux * ux
    vy = uyy - uy * uy
    vxy = uxy - ux * uy

    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    ssim_map = ((2 * ux * uy + c1) * (2 * vxy + c2)) / (
        (ux ** 2 + uy ** 2 + c1) * (vx + vy + c2))
    return jnp.mean(ssim_map.reshape(b, c, *ssim_map.shape[1:]),
                    axis=(1, 2, 3))


# --------------------------------------------------------------------------- #
# LPIPS-VGG                                                                   #
# --------------------------------------------------------------------------- #
_VGG16_PLAN = [  # (out_channels, n_convs) per stage, 3x3 convs + maxpool
    (64, 2), (128, 2), (256, 3), (512, 3), (512, 3),
]
_LPIPS_SHIFT = (-0.030, -0.088, -0.188)
_LPIPS_SCALE = (0.458, 0.448, 0.450)


def lpips_init(key, dtype=jnp.float32) -> dict:
    """Random-init LPIPS-VGG (for tests; real use imports weights)."""
    convs = []
    c_in = 3
    k = key
    for c_out, n in _VGG16_PLAN:
        stage = []
        for _ in range(n):
            k, k2 = jax.random.split(k)
            stage.append({
                "kernel": jax.random.normal(k2, (3, 3, c_in, c_out), dtype)
                * (9 * c_in) ** -0.5,
                "bias": jnp.zeros((c_out,), dtype)})
            c_in = c_out
        convs.append(stage)
    k, k2 = jax.random.split(k)
    lins = [jnp.abs(jax.random.normal(jax.random.fold_in(k2, i),
                                      (c,), dtype)) * 0.1
            for i, (c, _) in enumerate(_VGG16_PLAN)]
    return {"convs": convs, "lins": lins}


def _vgg_stages(params, x):
    """x: (B,3,H,W) imagenet-scaled → list of 5 post-ReLU stage features."""
    feats = []
    x = jnp.moveaxis(x, 1, -1)
    for si, stage in enumerate(params["convs"]):
        for conv in stage:
            x = jax.lax.conv_general_dilated(
                x, conv["kernel"].astype(x.dtype), (1, 1),
                [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32).astype(x.dtype)
            x = jax.nn.relu(x + conv["bias"].astype(x.dtype))
        feats.append(jnp.moveaxis(x, -1, 1))
        if si < len(params["convs"]) - 1:
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                "VALID")
    return feats


def compute_lpips(params, gt: jnp.ndarray, pred: jnp.ndarray) -> jnp.ndarray:
    """(B,C,H,W) in [0,1] → (B,) LPIPS (normalize=True semantics: inputs
    scaled to [−1,1] then LPIPS' own shift/scale)."""
    shift = jnp.asarray(_LPIPS_SHIFT).reshape(1, 3, 1, 1)
    scale = jnp.asarray(_LPIPS_SCALE).reshape(1, 3, 1, 1)

    def prep(im):
        im = im * 2.0 - 1.0
        return (im - shift) / scale

    fx = _vgg_stages(params, prep(gt))
    fy = _vgg_stages(params, prep(pred))
    total = 0.0
    for f1, f2, lin in zip(fx, fy, params["lins"]):
        n1 = f1 / jnp.maximum(
            jnp.linalg.norm(f1, axis=1, keepdims=True), 1e-10)
        n2 = f2 / jnp.maximum(
            jnp.linalg.norm(f2, axis=1, keepdims=True), 1e-10)
        diff = jnp.square(n1 - n2)
        w = lin.reshape(1, -1, 1, 1).astype(diff.dtype)
        total = total + jnp.mean(jnp.sum(diff * w, axis=1), axis=(1, 2))
    return total


def import_lpips_vgg(lpips_sd, vgg_sd) -> dict:
    """lpips package state dicts → our tree.  lpips_sd: `lin{i}.model.1.
    weight` 1×1 convs; vgg_sd: torchvision vgg16 `features.{i}.weight`."""
    order = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    convs, idx = [], 0
    for c_out, n in _VGG16_PLAN:
        stage = []
        for _ in range(n):
            w = np.asarray(vgg_sd[f"features.{order[idx]}.weight"])
            b = np.asarray(vgg_sd[f"features.{order[idx]}.bias"])
            stage.append({"kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
                          "bias": jnp.asarray(b)})
            idx += 1
        convs.append(stage)
    lins = [jnp.asarray(np.asarray(
        lpips_sd[f"lin{i}.model.1.weight"]).reshape(-1))
        for i in range(5)]
    return {"convs": convs, "lins": lins}
