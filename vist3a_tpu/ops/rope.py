"""2-D rotary position embeddings (RoPE) for the VGGT aggregator.

Behavioral spec from the reference (`vggt/layers/rope.py`):
  * head_dim D is split in half: first D/2 channels rotate by the y
    coordinate, last D/2 by the x coordinate;
  * each half uses standard 1-D RoPE with base frequency 100 over dim D/2:
    inv_freq[j] = base**(-2j/(D/2)) for j < D/4, angle table duplicated
    (cat(angles, angles)), rotate-half convention;
  * special (camera/register) tokens sit at position (0,0) — no rotation;
    patch positions are shifted by +1 (`aggregator.py:252-261`).

TPU-native design: instead of gathering per-token cos/sin from a cached table
at runtime (a gather per layer), we precompute the fused per-token cos/sin
tensors ONCE per grid shape and reuse them across all 48 aggregator blocks —
XLA keeps them resident in HBM and fuses the elementwise rotation into the
surrounding matmuls.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


def grid_positions(height: int, width: int, special: int = 0) -> np.ndarray:
    """(P, 2) int32 y,x positions for an h×w patch grid, preceded by
    ``special`` tokens at (0,0); grid positions start at 1 when special>0."""
    ys, xs = np.meshgrid(np.arange(height), np.arange(width), indexing="ij")
    pos = np.stack([ys.reshape(-1), xs.reshape(-1)], axis=-1).astype(np.int32)
    if special:
        pos = np.concatenate(
            [np.zeros((special, 2), np.int32), pos + 1], axis=0
        )
    return pos


@functools.lru_cache(maxsize=32)
def _tables(max_pos: int, half_dim: int, base: float) -> tuple[np.ndarray, np.ndarray]:
    # 1-D tables over dim half_dim: quarter-dim frequency bands, duplicated.
    exponents = np.arange(0, half_dim, 2, dtype=np.float64) / half_dim
    inv_freq = 1.0 / (base ** exponents)
    angles = np.arange(max_pos, dtype=np.float64)[:, None] * inv_freq[None, :]
    angles = np.concatenate([angles, angles], axis=-1)  # (max_pos, half_dim)
    return np.cos(angles).astype(np.float32), np.sin(angles).astype(np.float32)


def rope2d_cos_sin(
    positions: np.ndarray, head_dim: int, base: float = 100.0
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Precompute fused cos/sin for 2-D RoPE.

    positions: (P, 2) integer y,x coords.  Returns (cos, sin) each of shape
    (P, head_dim) where the first half encodes y-rotation and the second half
    x-rotation, both in the duplicated-angle layout expected by
    `apply_rope2d`.
    """
    half = head_dim // 2
    max_pos = int(positions.max()) + 1
    cos_t, sin_t = _tables(max_pos, half, base)
    y, x = positions[:, 0], positions[:, 1]
    cos = np.concatenate([cos_t[y], cos_t[x]], axis=-1)  # (P, head_dim)
    sin = np.concatenate([sin_t[y], sin_t[x]], axis=-1)
    return jnp.asarray(cos), jnp.asarray(sin)


def apply_rope2d(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Rotate tokens.  x: (..., P, head_dim); cos/sin: (P, head_dim).

    Each half-dim block uses the rotate-half convention within itself:
    for half h = [h1, h2]:  out = h*cos + rot(h)*sin, rot(h) = [-h2, h1].
    """
    d = x.shape[-1]
    half, quarter = d // 2, d // 4
    hy, hx = x[..., :half], x[..., half:]

    def rotate_half(h):
        h1, h2 = h[..., :quarter], h[..., quarter:]
        return jnp.concatenate([-h2, h1], axis=-1)

    cy, sy = cos[..., :half], sin[..., :half]
    cx, sx = cos[..., half:], sin[..., half:]
    out_y = hy * cy + rotate_half(hy) * sy
    out_x = hx * cx + rotate_half(hx) * sx
    return jnp.concatenate([out_y, out_x], axis=-1)
