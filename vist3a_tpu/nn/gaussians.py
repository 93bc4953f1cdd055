"""3D Gaussian containers and the unified Gaussian adapter.

Behavioral parity:
  * `src/model/types.py` — Gaussians dataclass,
  * `src/model/encoder/common/gaussian_adapter.py:114-147` —
    UnifiedGaussianAdapter: scales = clamp(0.001·softplus, ≤0.3), unit
    xyzw quaternions, SH coeffs masked per degree (0.1·0.25^deg), covariance
    R·S·Sᵀ·Rᵀ,
  * `src/model/encoder/anysplat.py:225-238` — map_pdf_to_opacity (identity
    for the deployed opacity_mapping initial=final=0).

TPU note: the reference gathers confidence-masked pixels into ragged lists
and pads (`anysplat.py:486-499`).  Here ALL pixels stay resident with
opacity×mask — padded/masked Gaussians have opacity 0 and contribute nothing
to rendering, so the result is identical with fully static shapes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from vist3a_tpu.nn.geometry import quat_to_mat


class Gaussians(NamedTuple):
    means: jnp.ndarray        # (B, G, 3)
    covariances: jnp.ndarray  # (B, G, 3, 3)
    harmonics: jnp.ndarray    # (B, G, 3, d_sh)
    opacities: jnp.ndarray    # (B, G)
    scales: jnp.ndarray       # (B, G, 3)
    rotations: jnp.ndarray    # (B, G, 4) xyzw


def sh_mask(sh_degree: int) -> jnp.ndarray:
    d_sh = (sh_degree + 1) ** 2
    mask = jnp.ones((d_sh,), jnp.float32)
    for degree in range(1, sh_degree + 1):
        mask = mask.at[degree**2:(degree + 1) ** 2].set(0.1 * 0.25**degree)
    return mask


def build_covariance(scale: jnp.ndarray, rotation_xyzw: jnp.ndarray) -> jnp.ndarray:
    """R diag(s)² Rᵀ (`common/gaussians.py:build_covariance`, quat eps 1e-8).

    Computed via the packed per-entry form and reshaped at the end: the
    direct (…, 3, 3) einsum chain materializes T(4,128)-padded temps
    (56.9× = multi-GB at deployed Gaussian counts, see
    `covariance_entries`)."""
    return covariance_entries(scale, rotation_xyzw).reshape(
        *scale.shape[:-1], 3, 3)


def covariance_entries(scale: jnp.ndarray,
                       rotation_xyzw: jnp.ndarray) -> jnp.ndarray:
    """`build_covariance` as a channels-LAST stack (..., 9) of row-major
    entries, computed from (...)-shaped lanes only.

    Same math as `build_covariance`, but no (..., 3, 3) intermediate ever
    exists: XLA tiles a (P, 3, 3) fp32 temp as T(4,128) — 56.9× padding,
    3.4 GB per live copy at the 9-view training shape, which OOMed the
    single-chip distillation step.  The loss path uses this form; the
    (..., 3, 3) API field is unchanged (and dead-code-eliminated when only
    the loss consumes covariances)."""
    r9 = quat_to_mat(rotation_xyzw, eps=1e-8)
    r9 = jnp.moveaxis(r9.reshape(*r9.shape[:-2], 9), -1, 0)   # 9 × (...,)
    s = jnp.moveaxis(scale, -1, 0)                            # 3 × (...,)
    # rows of M = R diag(s): m[a][j] = r[a][j] * s[j]
    m = [[r9[a * 3 + j] * s[j] for j in range(3)] for a in range(3)]

    def sig(a, b):
        return (m[a][0] * m[b][0] + m[a][1] * m[b][1]
                + m[a][2] * m[b][2])

    return jnp.stack([sig(a, b) for a in range(3) for b in range(3)],
                     axis=-1)


def map_pdf_to_opacity(pdf: jnp.ndarray, global_step: int = 0,
                       initial: float = 0.0, final: float = 0.0,
                       warm_up: int = 1) -> jnp.ndarray:
    x = initial + min(global_step / warm_up, 1.0) * (final - initial)
    exponent = 2.0 ** x
    return 0.5 * (1 - (1 - pdf) ** exponent + pdf ** (1 / exponent))


def unified_gaussian_adapter(
    means: jnp.ndarray,        # (..., 3)
    opacities: jnp.ndarray,    # (...)
    raw_gaussians: jnp.ndarray,  # (..., 7 + 3·d_sh)
    sh_degree: int = 4,
    eps: float = 1e-8,
) -> Gaussians:
    """raw → calibrated Gaussians (all fp32)."""
    d_sh = (sh_degree + 1) ** 2
    raw = raw_gaussians.astype(jnp.float32)
    scales = raw[..., :3]
    rotations = raw[..., 3:7]
    sh = raw[..., 7:7 + 3 * d_sh]

    scales = jnp.minimum(0.001 * jax.nn.softplus(scales), 0.3)
    rotations = rotations / (
        jnp.linalg.norm(rotations, axis=-1, keepdims=True) + eps
    )
    sh = sh.reshape(*sh.shape[:-1], 3, d_sh) * sh_mask(sh_degree)
    covariances = build_covariance(scales, rotations)

    return Gaussians(
        means=means.astype(jnp.float32),
        covariances=covariances,
        harmonics=sh,
        opacities=opacities.astype(jnp.float32),
        scales=scales,
        rotations=rotations,
    )
