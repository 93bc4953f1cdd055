"""Pallas TPU 3D Gaussian Splatting rasterizer (forward + backward).

TPU-native replacement for the CUDA `gsplat.rasterization` call used by the
reference at `src/model/decoder/decoder_splatting_cuda.py:92-111` with the
deployed argument set: `render_mode="RGB+D"`, explicit covariances,
`rasterize_mode="classic"` (0.3-px dilation, no opacity compensation),
`near_plane=1e-10`, `radius_clip=0.1`, background color, alpha output.

Design (no warp primitives on TPU, so no per-pixel sorted scatter):
  1. XLA, differentiable: project all Gaussians (camera transform, J Σ Jᵀ 2D
     covariance + eps2d·I dilation, conic, 3σ radius), evaluate spherical
     harmonics → RGB.
  2. XLA, non-differentiable (discrete): build (gaussian, tile) pairs with a
     static pair budget via cumsum/marker indexing, one `lax.sort` by
     (tile, depth), then re-scatter each tile's segment to chunk-padded
     positions so every pair-chunk lies in exactly one tile.
  3. Pallas, custom VJP: ragged grouped composite. Grid iterates pair-chunks;
     a scalar-prefetched `chunk→tile` map selects the (revisited) output
     block, so fp32 accumulators persist in VMEM across all chunks of one
     tile.  Within a chunk the front-to-back alpha-compositing is fully
     vectorized: α for (256 px × C pairs) on the VPU, transmittance via a
     log-space cumulative sum, and the accumulation `Σ αT·[r,g,b,z,1]` as a
     single MXU matmul.  The backward kernel re-walks chunks in FORWARD
     order using a prefix-sum identity (suffix_i = total − prefix_i), so it
     needs neither reverse traversal nor the numerically delicate T-division
     of the CUDA backward.

Semantics matched to gsplat "classic" (tolerances aside): pixel centers at
+0.5, α = min(0.999, o·exp(−σ)) with σ<0 and α<1/255 skips, per-pixel stop
*before* the Gaussian that would push T below 1e-4, accumulated (not
normalized) depth for the +D channel.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vist3a_tpu.kernels.partitioning import cached_partitioned

TILE = 16            # pixels per tile side (16×16 = 256 px, gsplat's tile)
PIX = TILE * TILE
CHUNK = 128          # pairs per grid step (lane width)
ATTR_ROWS = 16       # attrs row-padded to a sublane multiple
ALPHA_CLAMP = 0.999
ALPHA_MIN = 1.0 / 255.0
T_EPS = 1e-4


def _cdiv(a, b):
    return -(-a // b)


# --------------------------------------------------------------------------- #
# 1. projection + SH (XLA, differentiable)                                    #
# --------------------------------------------------------------------------- #
class Visits(NamedTuple):
    """Composite-kernel schedule over the sorted pair stream (build_pairs).

    One grid step per (tile, chunk) intersection, BIT-PACKED into two
    int32 words per visit: the whole schedule rides scalar-prefetch SMEM
    (1 MB/core on v5e) and seven unpacked int32 arrays overflow it at the
    4×G pair budget (81,920 chunks → 2.22 MB, a measured compile failure;
    packed it is 0.65 MB).

    `tilechunk` = tile << 18 | chunk: `tile` picks the output block
    (n_tiles = padding/junk row), `chunk` the input block (n_chunks =
    junk chunk past the stream).  `meta` = lo | hi << 8 | first << 16 |
    last << 17 | chunk_first << 18: [`lo`, `hi`) masks the chunk lanes
    belonging to the tile, `first`/`last` bracket a tile's accumulator
    lifetime, and `chunk_first` marks the first visit of each chunk (the
    backward's cotangent block is zero-initialized there and accumulated
    on shared-boundary revisits).  Limits: n_tiles < 8192 (≤1448² images),
    n_chunks < 2¹⁸ (≤33.5M pairs) — asserted statically in build_pairs."""
    tilechunk: jnp.ndarray     # (V,) int32: tile << 18 | chunk
    meta: jnp.ndarray          # (V,) int32: lo | hi<<8 | f<<16 | l<<17 | cf<<18


_VC_BITS = 18
_VC_MASK = (1 << _VC_BITS) - 1


class Projected(NamedTuple):
    mean2d: jnp.ndarray   # (G, 2) pixel coords
    conic: jnp.ndarray    # (G, 3) upper-tri inverse 2D covariance (a, b, c)
    depth: jnp.ndarray    # (G,) camera-space z
    radius: jnp.ndarray   # (G,) screen-space 3σ radius, px
    valid: jnp.ndarray    # (G,) bool


def project_gaussians(
    means, covars, viewmat, K, width, height,
    *, eps2d=0.3, near_plane=1e-10, far_plane=1e10, radius_clip=0.1,
):
    """Perspective-project 3D Gaussians (parity: gsplat fully_fused_projection,
    classic mode; reference call `decoder_splatting_cuda.py:92-111`)."""
    f32 = jnp.float32
    means, covars = means.astype(f32), covars.astype(f32)
    R, t = viewmat[:3, :3].astype(f32), viewmat[:3, 3].astype(f32)
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]

    p_cam = means @ R.T + t                                   # (G, 3)
    tz = p_cam[:, 2]
    tz_safe = jnp.where(jnp.abs(tz) < 1e-6, 1e-6, tz)
    rz = 1.0 / tz_safe

    # fov-clamped x/z, y/z for the Jacobian (INRIA/gsplat 1.3·tan_fov guard)
    lim_x = 1.3 * (0.5 * width / fx)
    lim_y = 1.3 * (0.5 * height / fy)
    txz = jnp.clip(p_cam[:, 0] * rz, -lim_x, lim_x)
    tyz = jnp.clip(p_cam[:, 1] * rz, -lim_y, lim_y)

    cov_cam = jnp.einsum("ij,gjk,lk->gil", R, covars, R,
                         precision="highest")                 # (G, 3, 3)
    # J = [[fx/z, 0, -fx·x/z²], [0, fy/z, -fy·y/z²]] folded analytically:
    j00 = fx * rz
    j11 = fy * rz
    j02 = -fx * txz * rz
    j12 = -fy * tyz * rz
    c00, c01, c02 = cov_cam[:, 0, 0], cov_cam[:, 0, 1], cov_cam[:, 0, 2]
    c11, c12, c22 = cov_cam[:, 1, 1], cov_cam[:, 1, 2], cov_cam[:, 2, 2]
    sxx = j00 * (j00 * c00 + j02 * c02) + j02 * (j00 * c02 + j02 * c22)
    syy = j11 * (j11 * c11 + j12 * c12) + j12 * (j11 * c12 + j12 * c22)
    sxy = j00 * (j11 * c01 + j12 * c02) + j02 * (j11 * c12 + j12 * c22)
    sxx = sxx + eps2d
    syy = syy + eps2d

    det = sxx * syy - sxy * sxy
    det_safe = jnp.where(det <= 0, 1.0, det)
    conic = jnp.stack([syy / det_safe, -sxy / det_safe, sxx / det_safe], -1)

    mean2d = jnp.stack([fx * p_cam[:, 0] * rz + cx,
                        fy * p_cam[:, 1] * rz + cy], -1)

    mid = 0.5 * (sxx + syy)
    v1 = mid + jnp.sqrt(jnp.maximum(mid * mid - det, 0.01))
    radius = jnp.ceil(3.0 * jnp.sqrt(v1))

    inside = (
        (mean2d[:, 0] + radius > 0) & (mean2d[:, 0] - radius < width)
        & (mean2d[:, 1] + radius > 0) & (mean2d[:, 1] - radius < height)
    )
    valid = (tz > near_plane) & (tz < far_plane) & (det > 0) \
        & (radius > radius_clip) & inside
    return Projected(mean2d, conic, tz, radius, valid)


# gsplat sh.cuh real SH basis constants, degrees 0..4.
_SH_C0 = 0.28209479177387814
_SH_C1 = 0.4886025119029199
_SH_C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
          -1.0925484305920792, 0.5462742152960396)
_SH_C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
          0.3731763325901154, -0.4570457994644658, 1.445305721320277,
          -0.5900435899266435)
_SH_C4 = (2.5033429417967046, -1.7701307697799304, 0.9461746957575601,
          -0.6690465435572892, 0.10578554691520431, -0.6690465435572892,
          0.47308734787878004, -1.7701307697799304, 0.6258357354491761)


def eval_sh(harmonics, dirs, sh_degree):
    """harmonics (..., 3, d_sh), dirs (..., 3) → RGB (+0.5 offset, clamp ≥0)."""
    d = dirs / (jnp.linalg.norm(dirs, axis=-1, keepdims=True) + 1e-12)
    x, y, z = d[..., 0:1], d[..., 1:2], d[..., 2:3]
    sh = harmonics.astype(jnp.float32)

    c = _SH_C0 * sh[..., 0]
    if sh_degree >= 1:
        c = c - _SH_C1 * y * sh[..., 1] + _SH_C1 * z * sh[..., 2] \
            - _SH_C1 * x * sh[..., 3]
    if sh_degree >= 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        c = (c + _SH_C2[0] * xy * sh[..., 4] + _SH_C2[1] * yz * sh[..., 5]
             + _SH_C2[2] * (2 * zz - xx - yy) * sh[..., 6]
             + _SH_C2[3] * xz * sh[..., 7] + _SH_C2[4] * (xx - yy) * sh[..., 8])
    if sh_degree >= 3:
        c = (c + _SH_C3[0] * y * (3 * xx - yy) * sh[..., 9]
             + _SH_C3[1] * xy * z * sh[..., 10]
             + _SH_C3[2] * y * (4 * zz - xx - yy) * sh[..., 11]
             + _SH_C3[3] * z * (2 * zz - 3 * xx - 3 * yy) * sh[..., 12]
             + _SH_C3[4] * x * (4 * zz - xx - yy) * sh[..., 13]
             + _SH_C3[5] * z * (xx - yy) * sh[..., 14]
             + _SH_C3[6] * x * (xx - 3 * yy) * sh[..., 15])
    if sh_degree >= 4:
        c = (c + _SH_C4[0] * xy * (xx - yy) * sh[..., 16]
             + _SH_C4[1] * yz * (3 * xx - yy) * sh[..., 17]
             + _SH_C4[2] * xy * (7 * zz - 1) * sh[..., 18]
             + _SH_C4[3] * yz * (7 * zz - 3) * sh[..., 19]
             + _SH_C4[4] * (zz * (35 * zz - 30) + 3) * sh[..., 20]
             + _SH_C4[5] * xz * (7 * zz - 3) * sh[..., 21]
             + _SH_C4[6] * (xx - yy) * (7 * zz - 1) * sh[..., 22]
             + _SH_C4[7] * xz * (xx - 3 * yy) * sh[..., 23]
             + _SH_C4[8] * (xx * (xx - 3 * yy) - yy * (3 * xx - yy)) * sh[..., 24])
    return jnp.maximum(c + 0.5, 0.0)


# --------------------------------------------------------------------------- #
# 2. tile-pair construction (XLA, discrete/non-diff)                          #
# --------------------------------------------------------------------------- #
def _prefix_sum_f32(x):
    """Inclusive prefix sum of an fp32 vector via hierarchical 256-wide
    triangular matmuls — `jnp.cumsum` over multi-million-element vectors
    measured ~8 ms at 2.6M on v5e (r5 `tools/pairs_probe.py`); the MXU form
    is a handful of (rows,256)×(256,256) products."""
    n = x.shape[0]
    c = 256
    if n <= c:
        return jnp.cumsum(x)
    rows = _cdiv(n, c)
    xf = jnp.pad(x, (0, rows * c - n)).reshape(rows, c)
    row = jax.lax.broadcasted_iota(jnp.int32, (c, c), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (c, c), 1)
    tri = (row <= col).astype(jnp.float32)
    pref = jax.lax.dot_general(xf, tri, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    sums = pref[:, -1]
    base = _prefix_sum_f32(sums) - sums          # exclusive row bases
    return (pref + base[:, None]).reshape(-1)[:n]


def _run_lookup(offsets, size):
    """offsets (N+1,) exclusive-cumsum run starts → (size,) run-id per slot.

    Slot i belongs to run g iff offsets[g] ≤ i < offsets[g+1]; zero-length
    runs are skipped by the repeated-marker cumsum.  The size-long prefix
    sum runs as MXU triangular matmuls in fp32 — exact while the run count
    stays < 2²⁴ (the 33.5M-pair Visits limit is far below it).
    """
    n = offsets.shape[0] - 1
    marker = jnp.zeros((size,), jnp.int32)
    # offsets are an inclusive-prefix (non-decreasing) — tell the scatter
    marker = marker.at[offsets[:n]].add(1, mode="drop",
                                        indices_are_sorted=True)
    return _prefix_sum_f32(marker.astype(jnp.float32)).astype(jnp.int32) - 1


def build_pairs(proj: Projected, ntx, nty, pair_budget, extra_valid=None):
    """(gaussian, tile) pair list, sorted by (tile, depth).

    Returns (gid_final (P1 + CHUNK,) int32 [-1 = truncated/junk], a
    `Visits` schedule for the composite kernel, bounds_bwd).  gid values
    index gaussians in their ORIGINAL order: the packed path sorts by a
    (tile, depth-rank) key but carries the original id through the sort as
    payload, so the caller's attribute table needs NO depth permutation
    (r3's `_permute_rows` — a G-sized 40-byte row gather forward +
    argsort-gather backward — measured ~70/~90 ms at 2.6M gaussians on
    v5e; carrying 4 more payload bytes through the sort and 3 more through
    the meta gather is ~free by the gather_probe numbers).

    Every P-sized gather/scatter here costs ~100 ms at 10M pairs on v5e, so
    the pipeline is arranged to touch the slot space as few times as
    possible: one packed-meta gather, one offsets gather, one single-key
    sort, one output scatter; tile segment boundaries come from binary
    searches on the sorted keys instead of a segment-sum.
    """
    n_tiles = ntx * nty
    g = proj.depth.shape[0]
    valid = proj.valid if extra_valid is None else proj.valid & extra_valid

    mx, my = proj.mean2d[:, 0], proj.mean2d[:, 1]
    r = proj.radius
    x0 = jnp.clip(jnp.floor((mx - r) / TILE), 0, ntx).astype(jnp.int32)
    x1 = jnp.clip(jnp.ceil((mx + r) / TILE), 0, ntx).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((my - r) / TILE), 0, nty).astype(jnp.int32)
    y1 = jnp.clip(jnp.ceil((my + r) / TILE), 0, nty).astype(jnp.int32)
    w = jnp.where(valid, x1 - x0, 0)
    h = jnp.where(valid, y1 - y0, 0)
    n_per_g = w * h

    p1 = pair_budget
    slot = jnp.arange(p1, dtype=jnp.int32)

    # (tile, depth) ordering.  When tile and a per-gaussian depth *rank* fit
    # in one 32-bit key, pre-sort the gaussians by depth (their index THEN
    # IS the depth rank) and sort pairs by the single packed key; ties
    # become deterministic, which gsplat leaves implementation-defined
    # anyway.
    rank_bits = max((g - 1).bit_length(), 1)
    tile_bits = n_tiles.bit_length()
    w_bits = (ntx + 1).bit_length()
    np_bits = ((ntx + 1) * (nty + 1)).bit_length()
    packed = (rank_bits + tile_bits <= 32
              and tile_bits + w_bits + np_bits <= 31)
    if packed:
        # Pack the per-gaussian fields the expansion needs — base tile, bbox
        # width, pair count — into ONE int32 (G-sized elementwise), permute
        # into depth order, and expand with 2 gathers; integer div/mod (no
        # TPU hardware) becomes an fp32 divide (+0.5 nudge keeps floor
        # exact for rank < n_per_g ≤ ~2¹¹ ≪ 2²³).
        base = y0 * ntx + x0
        meta = ((base << (w_bits + np_bits)) | (w << np_bits) | n_per_g)
        # ONE multi-payload sort replaces argsort + a G-sized permutation
        # gather of meta (~12 ms at 2.6M): payload columns through lax.sort
        # are nearly free (tools/gather_probe.py), random-index gathers are
        # not
        _, meta_o, order = jax.lax.sort(
            (jnp.where(valid, proj.depth, jnp.inf).astype(jnp.float32),
             meta, jnp.arange(g, dtype=jnp.int32)), num_keys=1)
        # n_per_g rides inside meta — recover the permuted counts by masking
        # meta_o instead of a second G-sized permutation gather (~12 ms at
        # 2.6M, tools/gather_probe.py)
        offsets = jnp.concatenate([
            jnp.zeros((1,), jnp.int32),
            jnp.cumsum(meta_o & ((1 << np_bits) - 1))]).astype(jnp.int32)
        total = offsets[g]
        gid = _run_lookup(offsets, p1)
        gid_c = jnp.clip(gid, 0, g - 1)

        # one row gather for all three per-gaussian words — packed meta, run
        # offset, original gaussian id — bit-split to uint16 halves (6×2B
        # rows): measured 10.2 ms vs 13.9 ms for the 3×int32 form at 2.6M
        # pairs (tools/gather_probe.py; row bytes dominate gather cost)
        tab32 = jnp.stack([meta_o, offsets[:g], order.astype(jnp.int32)],
                          axis=1)
        tab = jnp.concatenate([
            (tab32 >> 16).astype(jnp.uint16),
            (tab32 & 0xFFFF).astype(jnp.uint16)], axis=1)
        # gid is non-decreasing over the gaussian-major slot space
        tab_s16 = jnp.take(tab, gid_c, axis=0, indices_are_sorted=True)
        tab_s = ((tab_s16[:, :3].astype(jnp.int32) << 16)
                 | tab_s16[:, 3:].astype(jnp.int32))
        meta_s = tab_s[:, 0]
        off_s = tab_s[:, 1]
        orig_s = tab_s[:, 2]
        np_p = meta_s & ((1 << np_bits) - 1)
        w_p = (meta_s >> np_bits) & ((1 << w_bits) - 1)
        base_p = meta_s >> (w_bits + np_bits)

        rank = slot - off_s
        wg = jnp.maximum(w_p, 1)
        dy = jnp.floor((rank.astype(jnp.float32) + 0.5)
                       / wg.astype(jnp.float32)).astype(jnp.int32)
        dx = rank - dy * wg
        tile = base_p + dy * ntx + dx
        pair_ok = (slot < total) & (gid >= 0) & (rank < np_p)
        tile = jnp.where(pair_ok, tile, n_tiles)      # sentinel sorts last
        key = ((tile.astype(jnp.uint32) << rank_bits)
               | gid_c.astype(jnp.uint32))
        key_s, gid_s = jax.lax.sort((key, orig_s), num_keys=1)
        # tile segment starts via 786 binary searches on the sorted keys
        # (replaces a P-sized segment-sum scatter)
        bounds = jnp.searchsorted(
            key_s, (jnp.arange(n_tiles + 1, dtype=jnp.uint32)
                    << rank_bits)).astype(jnp.int32)
    else:
        order = None
        offsets = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                   jnp.cumsum(n_per_g)]).astype(jnp.int32)
        total = offsets[g]
        gid = _run_lookup(offsets, p1)
        gid_c = jnp.clip(gid, 0, g - 1)
        rank = slot - offsets[gid_c]
        wg = jnp.maximum(w[gid_c], 1)
        dy, dx = rank // wg, rank % wg
        tile = (y0[gid_c] + dy) * ntx + (x0[gid_c] + dx)
        pair_ok = (slot < total) & (gid >= 0) & (rank < n_per_g[gid_c])
        tile = jnp.where(pair_ok, tile, n_tiles)
        depth_key = jnp.where(pair_ok, proj.depth[gid_c], jnp.inf)
        tile_s, _, gid_s = jax.lax.sort(
            (tile, depth_key.astype(jnp.float32), gid_c), num_keys=2)
        bounds = jnp.searchsorted(
            tile_s, jnp.arange(n_tiles + 1, dtype=jnp.int32)
        ).astype(jnp.int32)

    # ---------------------------------------------------------------- #
    # visit list: the composite kernel consumes the RAW sorted stream   #
    # ---------------------------------------------------------------- #
    # (r4) The former chunk-padded re-layout materialized a P2-sized slot
    # space through one more P-sized gather + masks (~22 ms at 2.6M pairs
    # per tools/pairs probe).  Instead the kernel walks (tile, chunk)
    # VISITS of the sorted stream: tile t's segment [bounds[t],
    # bounds[t+1]) spans chunks c0..c1 and each visit carries its in-chunk
    # lane range [lo, hi), so a chunk shared by adjacent tiles is visited
    # once per tile with disjoint lane masks.  Visit count is statically
    # ≤ n_chunks + n_tiles (each tile adds at most one shared-boundary
    # revisit; empty tiles get one masked visit so they still emit
    # background).  Padding visits target the junk tile row (n_tiles) and
    # a junk chunk appended past the stream (index n_chunks), so they can
    # never clobber live state.  Output-chunk indices are monotone across
    # visits (bounds are non-decreasing), so every chunk's visits form one
    # consecutive run — the revisit-VMEM contract the kernels rely on.
    n_chunks = p1 // CHUNK
    n_visits = n_chunks + n_tiles
    c0 = bounds[:n_tiles] // CHUNK
    c1 = jnp.maximum(-(-bounds[1:] // CHUNK) - 1, c0)
    nv = c1 - c0 + 1
    vstart = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                              jnp.cumsum(nv)]).astype(jnp.int32)
    vt = _run_lookup(vstart, n_visits)
    vidx = jnp.arange(n_visits, dtype=jnp.int32)
    in_use = vidx < vstart[n_tiles]
    vt_c = jnp.clip(vt, 0, n_tiles - 1)
    r = vidx - vstart[vt_c]
    vc = c0[vt_c] + r
    lo = jnp.clip(bounds[vt_c] - vc * CHUNK, 0, CHUNK)
    hi = jnp.clip(bounds[vt_c + 1] - vc * CHUNK, 0, CHUNK)
    vfirst = ((r == 0) & in_use).astype(jnp.int32)
    vlast = ((r == nv[vt_c] - 1) & in_use).astype(jnp.int32)
    vtile = jnp.where(in_use, vt_c, n_tiles).astype(jnp.int32)
    vc = jnp.where(in_use, vc, n_chunks).astype(jnp.int32)
    lo = jnp.where(in_use, lo, 0).astype(jnp.int32)
    hi = jnp.where(in_use, hi, 0).astype(jnp.int32)
    prev_vc = jnp.concatenate([jnp.full((1,), -1, jnp.int32), vc[:-1]])
    vchunk_first = (vc != prev_vc).astype(jnp.int32)
    assert n_tiles < (1 << (31 - _VC_BITS)) and n_chunks + 1 <= (1 << _VC_BITS), (
        f"visit packing overflow: n_tiles={n_tiles} n_chunks={n_chunks}")
    visits = Visits(
        (vtile << _VC_BITS) | vc,
        lo | (hi << 8) | (vfirst << 16) | (vlast << 17) | (vchunk_first << 18))

    # the kernel-facing pair stream: sorted gids, truncated slots marked
    # -1 (their gathered rows zero out, their backward cotangents sort
    # past every real segment), plus one junk chunk for padding visits
    gid_final = jnp.concatenate([
        jnp.where(slot < jnp.minimum(total, p1), gid_s, -1),
        jnp.full((CHUNK,), -1, jnp.int32)])
    # Per-gid segment bounds of the backward's gid-sorted pair stream, free
    # from the forward's structure: gaussian i (in gid-value space) emits
    # slots [offsets[i], offsets[i+1]) and the budget truncates the slot
    # space at p1, so its SURVIVING pair count is
    # min(offsets[i+1],p1) − min(offsets[i],p1) and the prefix telescopes to
    # min(offsets, p1).  Replaces a searchsorted over G+1 queries in the
    # gather transpose (measured 424 ms at 10.4M pairs on v5e — XLA lowers
    # it to a 24-deep gather loop) with G-sized arithmetic.  On the packed
    # path gid values are ORIGINAL ids while offsets index depth-rank space,
    # so the rank-space counts are scattered to original order first (one
    # G-sized 4-byte permutation scatter — `order` is a full permutation)
    # and re-prefixed.
    surv = jnp.minimum(offsets, p1)
    if order is not None:
        # rank-space counts → original order: `order` is a permutation, so
        # sorting (order, counts) by key IS the inverse permutation — a
        # payload sort (~6 ms) instead of a G-sized scatter (~11 ms)
        _, counts_orig = jax.lax.sort((order, surv[1:] - surv[:g]),
                                      num_keys=1)
        bounds_bwd = jnp.concatenate([
            jnp.zeros((1,), jnp.int32),
            jnp.cumsum(counts_orig)]).astype(jnp.int32)
    else:
        bounds_bwd = surv
    # named for the multi-view remat policy: the pair build is integer-only
    # (non-differentiable) and ~45 ms at 2.6M/1×G — saving its ~21 MB of
    # outputs instead of recomputing them per view in the backward cuts the
    # 13-view reward grad by ~0.6 s (see `rasterize(remat_views=True)`)
    from jax.ad_checkpoint import checkpoint_name

    gid_final = checkpoint_name(gid_final, "raster_pairs")
    visits = Visits(checkpoint_name(visits.tilechunk, "raster_pairs"),
                    checkpoint_name(visits.meta, "raster_pairs"))
    bounds_bwd = checkpoint_name(bounds_bwd, "raster_pairs")
    return gid_final, visits, bounds_bwd


# --------------------------------------------------------------------------- #
# 3. Pallas composite (custom VJP)                                            #
# --------------------------------------------------------------------------- #
# attrs row layout (16, P1 + CHUNK):
#   0 mean_x | 1 mean_y | 2 conic_a | 3 conic_b | 4 conic_c | 5 opacity
#   6 r | 7 g | 8 b | 9 depth | 10 one | 11..15 zero  (rows 6..13 = payload)
# out channel layout (n_tiles+1, 256, 8): 0-2 rgb | 3 depth | 4 alpha
#   | 5 T_final | 6,7 unused


def _pixel_grid(tile_id, ntx):
    ty = tile_id // ntx
    tx = tile_id - ty * ntx
    p = jax.lax.broadcasted_iota(jnp.int32, (PIX, 1), 0)
    px = (tx * TILE + p % TILE).astype(jnp.float32) + 0.5
    py = (ty * TILE + p // TILE).astype(jnp.float32) + 0.5
    return px, py


def _chunk_alpha(attrs, px, py):
    """α (PIX, C) with σ<0 / α<1/255 skips and 0.999 clamp, plus raw pieces."""
    dx = px - attrs[0, :][None, :]
    dy = py - attrs[1, :][None, :]
    sigma = (0.5 * (attrs[2, :] * dx * dx + attrs[4, :] * dy * dy)
             + attrs[3, :] * dx * dy)
    a_raw = attrs[5, :] * jnp.exp(-sigma)
    ok = (sigma >= 0.0) & (a_raw >= ALPHA_MIN)
    alpha = jnp.where(ok, jnp.minimum(a_raw, ALPHA_CLAMP), 0.0)
    return alpha, sigma, a_raw, ok, dx, dy


def _prefix_sum(x):
    """Inclusive prefix sum along axis 1 as a triangular matmul.

    `jnp.cumsum` has no Pallas-TPU lowering (mosaic KernelType.TC); an
    (N,C)·(C,C) upper-triangular-ones dot is the MXU-native equivalent and
    runs at matmul speed for the chunk sizes used here."""
    c = x.shape[1]
    row = jax.lax.broadcasted_iota(jnp.int32, (c, c), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (c, c), 1)
    tri = (row <= col).astype(x.dtype)
    return jax.lax.dot_general(x, tri, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _transmittance(alpha, t_carry, done):
    """Within-chunk transmittance via log-space cumsum.

    Matches the CUDA per-pixel rule: composite Gaussian i only while
    T·(1−α_i) ≥ 1e-4; the first violation freezes the pixel permanently
    (`done`).  Within a chunk `t_incl` is monotone non-increasing, so the
    live mask is a prefix; across chunks the carried `done` flag prevents
    resurrection by a later low-α Gaussian.
    """
    lg = jnp.log1p(-alpha)
    cs = _prefix_sum(lg)
    t_incl = jnp.exp(cs) * t_carry
    t_excl = jnp.exp(cs - lg) * t_carry
    live = (t_incl >= T_EPS) & (done < 0.5)
    w = alpha * t_excl * live
    t_new = jnp.min(jnp.where(live, t_incl, t_carry), axis=1, keepdims=True)
    done_new = jnp.maximum(
        done, (t_incl[:, -1:] < T_EPS).astype(jnp.float32))
    return w, t_excl, live, t_new, done_new


def _lane_mask(lo, hi):
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
    return (lane >= lo) & (lane < hi)


def _fwd_kernel(tc_ref, meta_ref, attrs_ref, out_ref, acc, t_s,
                *, ntx, n_tiles):
    v = pl.program_id(0)
    tile_id = tc_ref[v] >> _VC_BITS
    meta = meta_ref[v]

    @pl.when(((meta >> 16) & 1) == 1)
    def _():
        acc[:] = jnp.zeros_like(acc)
        t_s[:, 0:1] = jnp.ones((PIX, 1), jnp.float32)
        t_s[:, 1:2] = jnp.zeros((PIX, 1), jnp.float32)

    @pl.when(tile_id < n_tiles)
    def _():
        attrs = attrs_ref[:]                              # (16, C)
        px, py = _pixel_grid(tile_id, ntx)
        alpha, _, _, _, _, _ = _chunk_alpha(attrs, px, py)
        # only the visit's lane range belongs to this tile (a chunk shared
        # across a tile boundary is visited once per tile)
        alpha = jnp.where(_lane_mask(meta & 0xFF, (meta >> 8) & 0xFF),
                          alpha, 0.0)
        w, _, _, t_new, done = _transmittance(
            alpha, t_s[:, 0:1], t_s[:, 1:2])
        payload = attrs[6:14, :]                          # (8, C)
        acc[:] += jax.lax.dot_general(
            w, payload, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)           # (PIX, 8)
        t_s[:, 0:1] = t_new
        t_s[:, 1:2] = done

    @pl.when(((meta >> 17) & 1) == 1)
    def _():
        # write T_N into channel 5 (no in-kernel scatter on TPU: iota mask)
        col = jax.lax.broadcasted_iota(jnp.int32, acc.shape, 1)
        out_ref[0] = jnp.where(col == 5, t_s[:, 0:1], acc[:])


def _bwd_kernel(tc_ref, meta_ref, attrs_ref, out_tile_ref, g_tile_ref,
                dattrs_ref, t_s, q_s, *, ntx, n_tiles):
    v = pl.program_id(0)
    tile_id = tc_ref[v] >> _VC_BITS
    meta = meta_ref[v]

    @pl.when(((meta >> 16) & 1) == 1)
    def _():
        t_s[:, 0:1] = jnp.ones((PIX, 1), jnp.float32)
        t_s[:, 1:2] = jnp.zeros((PIX, 1), jnp.float32)
        q_s[:] = jnp.zeros_like(q_s)

    # zero the chunk's cotangent block exactly once; a chunk shared across
    # a tile boundary is revisited CONSECUTIVELY (visit chunks are
    # monotone), so its VMEM block persists and the second visit
    # accumulates its disjoint lanes
    @pl.when(((meta >> 18) & 1) == 1)
    def _():
        dattrs_ref[:] = jnp.zeros((ATTR_ROWS, CHUNK), jnp.float32)

    @pl.when(tile_id < n_tiles)
    def _():
        attrs = attrs_ref[:]
        g_out = g_tile_ref[0]                              # (PIX, 8) cotangent
        out = out_tile_ref[0]                              # (PIX, 8) saved fwd

        px, py = _pixel_grid(tile_id, ntx)
        alpha, _, a_raw, ok, dx, dy = _chunk_alpha(attrs, px, py)
        vmask = _lane_mask(meta & 0xFF, (meta >> 8) & 0xFF)
        alpha = jnp.where(vmask, alpha, 0.0)
        w, t_excl, live, t_new, done = _transmittance(
            alpha, t_s[:, 0:1], t_s[:, 1:2])

        payload = attrs[6:14, :]
        # gp[px, i] = Σ_ch g_ch[px]·payload[ch, i] (data rides channels 0..4)
        gp = jax.lax.dot_general(
            g_out, payload, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # (PIX, C)
        q = w * gp
        q_incl = _prefix_sum(q) + q_s[:, 0:1]
        # Σ_{j>i} w_j·gp_j = (tile total from saved output) − prefix_incl_i
        o_total = jnp.sum(g_out[:, :5] * out[:, :5], axis=1, keepdims=True)
        g5_tn = g_out[:, 5:6] * out[:, 5:6]                # cotangent via T_N

        mask = live & ok & (a_raw < ALPHA_CLAMP) & vmask
        dalpha = jnp.where(
            mask,
            gp * t_excl - (o_total - q_incl + g5_tn) / (1.0 - alpha),
            0.0)
        # α = o·e^{−σ} ⇒ ∂α/∂o = α/o, ∂α/∂σ = −α
        inv_o = 1.0 / jnp.maximum(attrs[5, :][None, :], 1e-12)
        dop = jnp.sum(alpha * inv_o * dalpha, axis=0)      # (C,)
        dsigma = -alpha * dalpha                           # (PIX, C)
        da = 0.5 * jnp.sum(dsigma * dx * dx, axis=0)
        db = jnp.sum(dsigma * dx * dy, axis=0)
        dc = 0.5 * jnp.sum(dsigma * dy * dy, axis=0)
        ca = attrs[2, :][None, :]
        cb = attrs[3, :][None, :]
        cc = attrs[4, :][None, :]
        # σ depends on d = px − mean ⇒ ∂σ/∂mean = −∂σ/∂d
        dmx = -jnp.sum(dsigma * (ca * dx + cb * dy), axis=0)
        dmy = -jnp.sum(dsigma * (cc * dy + cb * dx), axis=0)
        dpayload = jax.lax.dot_general(
            g_out, w, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # (8, C)

        # assemble (ATTR_ROWS, C) without scatter: stack + concat on
        # sublanes.  ACCUMULATE: every term above is zero outside the
        # visit's lane mask, so a shared-boundary chunk's two visits add
        # their disjoint contributions into the persisting VMEM block.
        top = jnp.stack([dmx, dmy, da, db, dc, dop], axis=0)   # (6, C)
        tail = jnp.zeros((ATTR_ROWS - 14, CHUNK), jnp.float32)
        dattrs_ref[:] = dattrs_ref[:] + jnp.concatenate(
            [top, dpayload, tail], axis=0)

        t_s[:, 0:1] = t_new
        t_s[:, 1:2] = done
        q_s[:, 0:1] = q_incl[:, -1:]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _composite(attrs, visits, ntx, n_tiles, interpret):
    """attrs (16, P1 + CHUNK) over the sorted stream (last chunk junk) →
    per-tile images (n_tiles+1, 256, 8); last row junk."""
    return _composite_fwd(attrs, visits, ntx, n_tiles, interpret)[0]


@cached_partitioned
def _composite_fwd_part(ntx, n_tiles, interpret):
    """GSPMD rule for the composite: replicate everything (the kernel owns
    the whole tile space; its operands are replicated at the call sites —
    B=1 rollout renders in the RL step).  Without the wrapper, ANY
    multi-device program containing the raw Mosaic call fails to lower
    (see `kernels/partitioning`)."""
    def fun(tc, meta, attrs):
        n_visits = tc.shape[0]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_visits,),
            in_specs=[
                pl.BlockSpec((ATTR_ROWS, CHUNK),
                             lambda v, tc, meta: (0, tc[v] & _VC_MASK)),
            ],
            out_specs=pl.BlockSpec(
                (1, PIX, 8), lambda v, tc, meta: (tc[v] >> _VC_BITS, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((PIX, 8), jnp.float32),
                pltpu.VMEM((PIX, 128), jnp.float32),
            ],
        )
        return pl.pallas_call(
            functools.partial(_fwd_kernel, ntx=ntx, n_tiles=n_tiles),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_tiles + 1, PIX, 8),
                                           jnp.float32),
            interpret=interpret,
        )(tc, meta, attrs)

    return fun, 1, False


def _composite_fwd(attrs, visits, ntx, n_tiles, interpret):
    out = _composite_fwd_part(ntx, n_tiles, interpret)(*visits, attrs)
    return out, (attrs, visits, out)


@cached_partitioned
def _composite_bwd_part(ntx, n_tiles, interpret):
    def fun(tc, meta, attrs, out, g):
        n_visits = tc.shape[0]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_visits,),
            in_specs=[
                pl.BlockSpec((ATTR_ROWS, CHUNK),
                             lambda v, tc, meta: (0, tc[v] & _VC_MASK)),
                pl.BlockSpec((1, PIX, 8),
                             lambda v, tc, meta: (tc[v] >> _VC_BITS, 0, 0)),
                pl.BlockSpec((1, PIX, 8),
                             lambda v, tc, meta: (tc[v] >> _VC_BITS, 0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (ATTR_ROWS, CHUNK), lambda v, tc, meta: (0, tc[v] & _VC_MASK)),
            scratch_shapes=[
                pltpu.VMEM((PIX, 128), jnp.float32),
                pltpu.VMEM((PIX, 128), jnp.float32),
            ],
        )
        return pl.pallas_call(
            functools.partial(_bwd_kernel, ntx=ntx, n_tiles=n_tiles),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(attrs.shape, jnp.float32),
            interpret=interpret,
        )(tc, meta, attrs, out, g)

    return fun, 1, False


def _composite_bwd(ntx, n_tiles, interpret, res, g):
    attrs, visits, out = res
    dattrs = _composite_bwd_part(ntx, n_tiles, interpret)(
        *visits, attrs, out, g)
    return (dattrs, None)


_composite.defvjp(_composite_fwd, _composite_bwd)


# --------------------------------------------------------------------------- #
# 3b. attrs gather with a sort/segment-sum transpose                          #
# --------------------------------------------------------------------------- #
@jax.custom_vjp
def _gather_pair_rows(table, gid, bounds):
    """rows[p] = table[gid[p]] (0 where gid < 0) — the P-sized attribute
    gather feeding the composite kernel.

    `bounds` (G+1, int32, nondiff) is build_pairs' per-gid surviving-pair
    prefix: exactly the segment bounds of the pair stream re-sorted by gid.

    The autodiff transpose of this gather is a P→G scatter-add, which
    serializes on TPU (measured 1066 ms at 10.4M pairs × 40B rows on v5e).
    The custom backward reduces per-gid segments instead, carrying the 10
    gradient columns THROUGH the sort as payload operands — P-sized row
    gathers cost ~423 ms on v5e regardless of index locality, while the
    10-payload sort is ~136 ms — then one (P,10) prefix sum (15 ms) and
    ONE (G+1)-row gather at `bounds` with an adjacent diff.  Computing
    bounds in here via searchsorted would cost 424 ms (a 24-deep gather
    loop); build_pairs provides them as G-sized arithmetic instead.
    Padding slots carry key G and sort past `bounds[G]`, so they never
    contribute.
    Precision: the prefix-sum/diff form trades the scatter's exact
    per-element adds for fp32 prefix cancellation — measured 1.8e-4 max
    abs error vs an fp64 reference at 400k random pairs (scatter: 2.2e-6),
    i.e. ~1e-4 relative to the global gradient scale; well under training
    noise (the bf16 trunk injects ~1e-3), and the small-scale
    gradient-parity test vs the naive rasterizer is unaffected.
    """
    g = table.shape[0]
    ok = (gid >= 0).astype(table.dtype)
    idx = jnp.clip(gid, 0, g - 1)
    # TPU row-gather cost scales with ROW BYTES, with a flat ~12 ms floor at
    # 2.6M rows (tools/gather_probe.py: 40B rows 58 ms, 20B rows 17.6 ms,
    # 12B 13.9 ms — and a u16 bit-split of the same 40B stays at 55 ms, so
    # it is bytes, not lanes).  Splitting the (G, 10) table into two (G, 5)
    # halves turns one 58 ms gather into two ~18 ms ones.
    c = table.shape[1]
    h = c // 2
    rows = jnp.concatenate([table[:, :h][idx], table[:, h:][idx]], axis=1)
    return rows * ok[:, None]


def _gather_pair_rows_fwd(table, gid, bounds):
    return _gather_pair_rows(table, gid, bounds), (gid, bounds,
                                                   table.shape[0])


def _gather_pair_rows_bwd(res, drows):
    gid, bounds, g = res
    ncol = drows.shape[1]
    key = jnp.where(gid >= 0, gid, g)
    sorted_ops = jax.lax.sort(
        (key,) + tuple(drows[:, i] for i in range(ncol)), num_keys=1)
    d_s = jnp.stack(sorted_ops[1:], axis=1)              # (P, ncol)
    cs0 = jnp.concatenate(
        [jnp.zeros((1, ncol), d_s.dtype), jnp.cumsum(d_s, axis=0)], axis=0)
    seg = cs0[bounds]                                    # (G+1, ncol)
    return seg[1:] - seg[:-1], None, None


_gather_pair_rows.defvjp(_gather_pair_rows_fwd, _gather_pair_rows_bwd)


# --------------------------------------------------------------------------- #
# 4. public entry                                                             #
# --------------------------------------------------------------------------- #
def _rasterize_view(means, covars, colors, opacities, viewmat, K,
                    width, height, background, pair_budget, interpret,
                    near_plane, far_plane, radius_clip, eps2d):
    ntx, nty = _cdiv(width, TILE), _cdiv(height, TILE)
    n_tiles = ntx * nty
    g = means.shape[0]

    proj = project_gaussians(
        means, covars, viewmat, K, width, height, eps2d=eps2d,
        near_plane=near_plane, far_plane=far_plane, radius_clip=radius_clip)

    op = jnp.where(proj.valid, opacities.astype(jnp.float32), 0.0)
    # per-gaussian attribute table in ROW-major (G, 10): only the REAL
    # columns ride the P-sized gather (40B-contiguous rows; gather cost on
    # v5e grows with row bytes — 10 vs 16 columns measured ~55 ms cheaper
    # at 10.4M pairs); the constant ones/zeros rows of the kernel's (16, P)
    # layout are rebuilt AFTER the gather, and the layout is restored by
    # one bandwidth-bound transpose.
    attrs_rows = jnp.stack(
        [proj.mean2d[:, 0], proj.mean2d[:, 1],
         proj.conic[:, 0], proj.conic[:, 1], proj.conic[:, 2], op,
         colors[:, 0], colors[:, 1], colors[:, 2], proj.depth],
        axis=1)                                          # (G, 10)

    # opacity cull: α = op·e^{−σ} < ALPHA_MIN is skipped inside the kernel
    # for ANY σ when op < ALPHA_MIN, and such gaussians receive exactly zero
    # gradients there — dropping their pairs is a pure win (the encoder's
    # conf-mask zeros ~10% of opacities; post-opt scenes far more).
    gid, visits, bounds_bwd = build_pairs(
        proj, ntx, nty, pair_budget, extra_valid=op >= ALPHA_MIN)
    pair_ok = (gid >= 0).astype(jnp.float32)
    p1c = gid.shape[0]
    rows = _gather_pair_rows(attrs_rows, gid,
                             jax.lax.stop_gradient(bounds_bwd)).T  # (10, P1c)
    attrs_s = jnp.concatenate(
        [rows, pair_ok[None],
         jnp.zeros((ATTR_ROWS - 11, p1c), jnp.float32)], axis=0)  # (16, P1c)

    out = _composite(attrs_s, visits, ntx, n_tiles, interpret)[:n_tiles]
    img = out.reshape(nty, ntx, TILE, TILE, 8).transpose(0, 2, 1, 3, 4)
    img = img.reshape(nty * TILE, ntx * TILE, 8)[:height, :width]

    t_final = img[..., 5]
    rgb = img[..., 0:3] + t_final[..., None] * background[None, None, :]
    return rgb, img[..., 3], img[..., 4]


def rasterize(
    means: jnp.ndarray,       # (G, 3) world-space centers
    covars: jnp.ndarray,      # (G, 3, 3) world-space covariances
    harmonics: jnp.ndarray,   # (G, 3, d_sh) SH coefficients
    opacities: jnp.ndarray,   # (G,)
    viewmats: jnp.ndarray,    # (V, 4, 4) world→camera
    Ks: jnp.ndarray,          # (V, 3, 3) pixel-unit intrinsics
    width: int,
    height: int,
    *,
    sh_degree: int | None = None,
    background: jnp.ndarray | None = None,   # (3,)
    near_plane: float = 1e-10,
    far_plane: float = 1e10,
    radius_clip: float = 0.1,
    eps2d: float = 0.3,
    pair_budget: int | None = None,
    interpret: bool | None = None,
    remat_views: bool = False,
):
    """Differentiable multi-view 3DGS rasterization (gsplat-call parity).

    Returns (rgb (V, H, W, 3), depth (V, H, W), alpha (V, H, W)); rgb is
    background-composited but NOT clamped (the decoder wrapper clamps, as the
    reference does at `decoder_splatting_cuda.py:111`).

    Views run serially under `lax.map` — vmap-batching them was measured
    SLOWER at the deployed scale (245 → 319 ms/view at 2.6M Gaussians):
    the pair pipeline is bandwidth-bound and batching just inflates the
    working set.

    remat_views=True checkpoints each view: under `jax.grad` the per-view
    residuals (the (16, P) attrs table + saved tile images, ~350 MB/view
    at 2.6M gaussians) otherwise accumulate across the whole view loop —
    13 reward views measured 20.3 GB (> v5e HBM).  Remat holds ONE view's
    residuals at a time for one extra forward per view; the reward path
    (`train/reward.calculate_reward`) turns it on.
    """
    if interpret is None:
        import os

        interpret = (jax.default_backend() != "tpu"
                     and os.environ.get("VIST3A_FORCE_MOSAIC") != "1")
    g = means.shape[0]
    d_sh = harmonics.shape[-1]
    if sh_degree is None:
        sh_degree = int(round(d_sh ** 0.5)) - 1
    if background is None:
        background = jnp.zeros((3,), jnp.float32)
    background = background.astype(jnp.float32)
    if pair_budget is None:
        # default: per-pixel Gaussians are mostly sub-tile; small scenes with
        # large splats need headroom.  Overflow drops the DEEPEST pairs
        # (depth-ordered expansion), so degradation is graceful — the culled
        # splats are the mostly-occluded far tail.
        pair_budget = max(4 * g, 1024)
    pair_budget = _cdiv(pair_budget, CHUNK) * CHUNK

    def one_view(cam):
        viewmat, K = cam
        R, t = viewmat[:3, :3], viewmat[:3, 3]
        campos = -R.T @ t
        colors = eval_sh(harmonics, means - campos[None, :], sh_degree)
        return _rasterize_view(
            means, covars, colors, opacities, viewmat, K, width, height,
            background, pair_budget, interpret,
            near_plane, far_plane, radius_clip, eps2d)

    if remat_views:
        one_view = jax.checkpoint(
            one_view,
            policy=jax.checkpoint_policies.save_only_these_names(
                "raster_pairs"))
    return jax.lax.map(one_view, (viewmats.astype(jnp.float32),
                                  Ks.astype(jnp.float32)))
