"""Real spherical-harmonic rotation (Wigner-D on the real basis).

Parity target: `third_party_model/anysplat/src/misc/sh_rotation.py:10-38`
(`rotate_sh` — e3nn `wigner_D` with a YZX→XYZ basis change).  The reference
calls it only from a commented-out gaussian-adapter path, but it is part of
the inventoried API surface, so we provide the TPU-native equivalent.

Instead of e3nn (Euler-angle extraction + complex Wigner matrices — both
host-unfriendly and jit-hostile at the `matrix_to_angles` branch), we build
the block-diagonal real rotation matrices directly from the 3×3 rotation via
the Ivanic–Ruedenberg recurrence (J. Phys. Chem. 1996, incl. erratum) — pure
polynomial arithmetic in the rotation entries: no trig, no branches on data,
exact for any degree, and trivially batched/jitted.

Convention: the degree-1 basis is the renderer's (`kernels/rasterizer.py:
eval_sh`, Sloan/3DGS signs: (−y, z, −x)·C1), so for any direction d and
coefficients c:  eval_sh(rotate_sh(c, R), R @ d) == eval_sh(c, d)
— i.e. `rotate_sh` re-expresses the appearance function in a frame rotated
by R, exactly what transforming a Gaussian's orientation needs (and the
semantics of the reference's camera→world use, `gaussian_adapter.py`
commented path).
"""

from __future__ import annotations

from math import isqrt, sqrt

import jax.numpy as jnp

__all__ = ["rotate_sh", "sh_rotation_matrices"]


def _kd(a: int, b: int) -> float:
    return 1.0 if a == b else 0.0


def _p(i, a, b, l, d1, dp):
    """Recurrence helper P (Ivanic–Ruedenberg Table 1); i∈{-1,0,1};
    d1/dp are the degree-1 / degree-(l−1) matrices as nested lists of
    batched scalars, centered indexing offset by +1 / +(l−1)."""
    if b == l:
        return (d1[i + 1][2] * dp[a + l - 1][2 * l - 2]
                - d1[i + 1][0] * dp[a + l - 1][0])
    if b == -l:
        return (d1[i + 1][2] * dp[a + l - 1][0]
                + d1[i + 1][0] * dp[a + l - 1][2 * l - 2])
    return d1[i + 1][1] * dp[a + l - 1][b + l - 1]


def _next_band(d1, dp, l):
    """Degree-l real rotation matrix from degree-1 and degree-(l−1)."""
    size = 2 * l + 1
    rows = []
    for m in range(-l, l + 1):
        row = []
        for n in range(-l, l + 1):
            denom = float((l + n) * (l - n)) if abs(n) < l \
                else float(2 * l * (2 * l - 1))
            u = sqrt((l + m) * (l - m) / denom)
            v = 0.5 * sqrt((1 + _kd(m, 0)) * (l + abs(m) - 1)
                           * (l + abs(m)) / denom) * (1 - 2 * _kd(m, 0))
            w = -0.5 * sqrt((l - abs(m) - 1) * (l - abs(m)) / denom) \
                * (1 - _kd(m, 0))
            entry = 0.0
            if u != 0.0:
                entry = entry + u * _p(0, m, n, l, d1, dp)
            if v != 0.0:
                if m == 0:
                    vv = _p(1, 1, n, l, d1, dp) + _p(-1, -1, n, l, d1, dp)
                elif m > 0:
                    vv = _p(1, m - 1, n, l, d1, dp) * sqrt(1 + _kd(m, 1)) \
                        - _p(-1, -m + 1, n, l, d1, dp) * (1 - _kd(m, 1))
                else:
                    vv = _p(1, m + 1, n, l, d1, dp) * (1 - _kd(m, -1)) \
                        + _p(-1, -m - 1, n, l, d1, dp) * sqrt(1 + _kd(m, -1))
                entry = entry + v * vv
            if w != 0.0:
                if m > 0:
                    ww = _p(1, m + 1, n, l, d1, dp) \
                        + _p(-1, -m - 1, n, l, d1, dp)
                else:
                    ww = _p(1, m - 1, n, l, d1, dp) \
                        - _p(-1, -m + 1, n, l, d1, dp)
                entry = entry + w * ww
            row.append(entry)
        assert len(row) == size
        rows.append(row)
    return rows


def sh_rotation_matrices(rotations: jnp.ndarray, lmax: int) -> list:
    """Per-degree real Wigner matrices for the renderer's SH basis.

    rotations: (..., 3, 3) → list of length lmax+1; entry l has shape
    (..., 2l+1, 2l+1).  Degree 0 is all-ones (identity 1×1).
    """
    r = rotations.astype(jnp.float32)
    out = [jnp.ones(r.shape[:-2] + (1, 1), r.dtype)]
    if lmax == 0:
        return out
    # degree 1: D1 = S P R Pᵀ S for basis (−y, z, −x) — derived by matching
    # eval_sh's degree-1 term (S = diag(−1,1,−1), P the (y,z,x) permutation)
    perm = (1, 2, 0)
    sgn = (-1.0, 1.0, -1.0)
    d1 = [[sgn[i] * sgn[j] * r[..., perm[i], perm[j]] for j in range(3)]
          for i in range(3)]
    out.append(jnp.stack([jnp.stack(row, axis=-1) for row in d1], axis=-2))
    dp = d1
    for l in range(2, lmax + 1):
        dl = _next_band(d1, dp, l)
        out.append(jnp.stack([jnp.stack(row, axis=-1) for row in dl],
                             axis=-2))
        dp = dl
    return out


def rotate_sh(sh_coefficients: jnp.ndarray,
              rotations: jnp.ndarray) -> jnp.ndarray:
    """Rotate real-SH coefficients (reference `rotate_sh` signature:
    coefficients (*#batch, n), rotations (*#batch, 3, 3), broadcastable).

    n must be a perfect square ((lmax+1)²).  Satisfies
    eval_sh(rotate_sh(c, R), R @ d) == eval_sh(c, d).
    """
    n = sh_coefficients.shape[-1]
    lmax = isqrt(n) - 1
    if (lmax + 1) ** 2 != n:
        raise ValueError(f"n={n} is not a perfect square")
    mats = sh_rotation_matrices(rotations, lmax)
    pieces = []
    for l, d in enumerate(mats):
        block = sh_coefficients[..., l * l:(l + 1) * (l + 1)]
        pieces.append(jnp.einsum("...ij,...j->...i",
                                 d.astype(block.dtype), block))
    return jnp.concatenate(pieces, axis=-1)
