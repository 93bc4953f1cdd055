"""Attribute `build_pairs`' internal cost (VERDICT r4 #3).

raster_probe's "pairs" stage (~77 ms at 1×G in r4, including projection)
exceeds its measured primitives (argsort 6 + marker scatter ~11 + meta
gather ~10 + sort ~6) by ~35 ms.  This probe times CUMULATIVE PREFIXES of
the packed `build_pairs` path (`kernels/rasterizer.py:218-413`) so each
stage's marginal cost is a subtraction of adjacent rows — fusion inside a
prefix stays intact, unlike isolated-op timing.

Stages (cumulative):
  proj          projection only (baseline to subtract)
  meta_argsort  + bbox/valid/meta pack + depth argsort + meta permute
  offsets       + pair-count cumsum
  runlookup     + slot→gaussian run lookup (marker scatter + P cumsum)
  expand        + packed tab build + slot gather + tile/key arithmetic
  sort          + (key, orig-gid) lax.sort
  full          build_pairs end to end (visits + bwd bounds included)

Run: env -u XLA_FLAGS JAX_PLATFORMS=axon \\
     PYTHONPATH=/root/repo:/root/.axon_site python tools/pairs_probe.py
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp

from vist3a_tpu.kernels import rasterizer as R
from tools.raster_probe import make_scene, _rtt, _time


def _prefix(stage, proj, ntx, nty, p1, extra_valid):
    """Re-derive build_pairs' packed path up to `stage` (kept in sync with
    `kernels/rasterizer.py` — probe-only code)."""
    n_tiles = ntx * nty
    g = proj.depth.shape[0]
    valid = proj.valid & extra_valid
    mx, my = proj.mean2d[:, 0], proj.mean2d[:, 1]
    r = proj.radius
    x0 = jnp.clip(jnp.floor((mx - r) / R.TILE), 0, ntx).astype(jnp.int32)
    x1 = jnp.clip(jnp.ceil((mx + r) / R.TILE), 0, ntx).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((my - r) / R.TILE), 0, nty).astype(jnp.int32)
    y1 = jnp.clip(jnp.ceil((my + r) / R.TILE), 0, nty).astype(jnp.int32)
    w = jnp.where(valid, x1 - x0, 0)
    h = jnp.where(valid, y1 - y0, 0)
    n_per_g = w * h
    slot = jnp.arange(p1, dtype=jnp.int32)
    rank_bits = max((g - 1).bit_length(), 1)
    w_bits = (ntx + 1).bit_length()
    np_bits = ((ntx + 1) * (nty + 1)).bit_length()

    base = y0 * ntx + x0
    meta = ((base << (w_bits + np_bits)) | (w << np_bits) | n_per_g)
    _, meta_o, order = jax.lax.sort(
        (jnp.where(valid, proj.depth, jnp.inf).astype(jnp.float32),
         meta, jnp.arange(g, dtype=jnp.int32)), num_keys=1)
    if stage == "meta_argsort":
        return jnp.sum(meta_o) + jnp.sum(order)
    offsets = jnp.concatenate([
        jnp.zeros((1,), jnp.int32),
        jnp.cumsum(meta_o & ((1 << np_bits) - 1))]).astype(jnp.int32)
    total = offsets[g]
    if stage == "offsets":
        return jnp.sum(offsets)
    if stage == "marker":
        marker = jnp.zeros((p1,), jnp.int32)
        marker = marker.at[offsets[:g]].add(1, mode="drop",
                                            indices_are_sorted=True)
        return jnp.sum(marker)
    if stage == "marker_prefix_mxu":
        marker = jnp.zeros((p1,), jnp.int32)
        marker = marker.at[offsets[:g]].add(1, mode="drop",
                                            indices_are_sorted=True)
        return jnp.sum(R._prefix_sum_f32(marker.astype(jnp.float32)))
    if stage == "marker_prefix_cumsum":
        marker = jnp.zeros((p1,), jnp.int32)
        marker = marker.at[offsets[:g]].add(1, mode="drop",
                                            indices_are_sorted=True)
        return jnp.sum(jnp.cumsum(marker))
    gid = R._run_lookup(offsets, p1)
    gid_c = jnp.clip(gid, 0, g - 1)
    if stage == "runlookup":
        return jnp.sum(gid_c)
    tab32 = jnp.stack([meta_o, offsets[:g], order.astype(jnp.int32)], axis=1)
    tab = jnp.concatenate([
        (tab32 >> 16).astype(jnp.uint16),
        (tab32 & 0xFFFF).astype(jnp.uint16)], axis=1)
    tab_s16 = jnp.take(tab, gid_c, axis=0, indices_are_sorted=True)
    tab_s = ((tab_s16[:, :3].astype(jnp.int32) << 16)
             | tab_s16[:, 3:].astype(jnp.int32))
    meta_s, off_s, orig_s = tab_s[:, 0], tab_s[:, 1], tab_s[:, 2]
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
    tile = jnp.where(pair_ok, tile, n_tiles)
    key = ((tile.astype(jnp.uint32) << rank_bits)
           | gid_c.astype(jnp.uint32))
    if stage == "expand":
        return jnp.sum(key.astype(jnp.float32)) + jnp.sum(orig_s)
    key_s, gid_s = jax.lax.sort((key, orig_s), num_keys=1)
    if stage == "sort":
        return jnp.sum(key_s.astype(jnp.float32)) + jnp.sum(gid_s)
    raise ValueError(stage)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--g", type=int, default=2_621_440)
    ap.add_argument("--budget", type=int, default=1)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    means, covars, harm, opac, viewmat, K, W, H = make_scene(args.g)
    rtt = _rtt()
    print(f"backend={jax.default_backend()} G={args.g} rtt={rtt*1e3:.1f}",
          flush=True)
    ntx, nty = R._cdiv(W, R.TILE), R._cdiv(H, R.TILE)
    p1 = R._cdiv(args.budget * args.g, R.CHUNK) * R.CHUNK

    @jax.jit
    def proj_fn(means, covars, opac, viewmat, K):
        p = R.project_gaussians(means, covars, viewmat, K, W, H)
        return jnp.sum(p.mean2d) + jnp.sum(p.depth) + jnp.sum(p.radius)

    dt0 = _time(proj_fn, means, covars, opac, viewmat, K,
                iters=args.iters, rtt=rtt)
    print(f"proj:         {dt0*1e3:8.1f} ms", flush=True)

    prev = dt0
    for stage in ("meta_argsort", "offsets", "marker", "marker_prefix_mxu",
                  "marker_prefix_cumsum", "runlookup", "expand", "sort"):
        @jax.jit
        def stage_fn(means, covars, opac, viewmat, K, stage=stage):
            p = R.project_gaussians(means, covars, viewmat, K, W, H)
            op = jnp.where(p.valid, opac, 0.0)
            return _prefix(stage, p, ntx, nty, p1, op >= R.ALPHA_MIN)

        dt = _time(stage_fn, means, covars, opac, viewmat, K,
                   iters=args.iters, rtt=rtt)
        print(f"{stage:12s} {dt*1e3:8.1f} ms  (+{(dt-prev)*1e3:6.1f})",
              flush=True)
        prev = dt

    @jax.jit
    def full_fn(means, covars, opac, viewmat, K):
        p = R.project_gaussians(means, covars, viewmat, K, W, H)
        op = jnp.where(p.valid, opac, 0.0)
        gid, visits, bb = R.build_pairs(p, ntx, nty, p1,
                                        extra_valid=op >= R.ALPHA_MIN)
        return (jnp.sum(gid) + jnp.sum(visits.tilechunk)
                + jnp.sum(visits.meta) + jnp.sum(bb))

    dt = _time(full_fn, means, covars, opac, viewmat, K,
               iters=args.iters, rtt=rtt)
    print(f"{'full':12s} {dt*1e3:8.1f} ms  (+{(dt-prev)*1e3:6.1f})",
          flush=True)


if __name__ == "__main__":
    main()
