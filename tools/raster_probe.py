"""Full-scale rasterizer stage probe (real TPU via the axon tunnel).

Times the deployed-scale single-view render (2.6M Gaussians = 13 views of
448^2 decoder output, 448p target, deg-4 SH) and its pipeline stages, each
RTT-corrected per CLAUDE.md (the tunnel adds ~34 ms per host fetch).

Usage:
  env -u XLA_FLAGS JAX_PLATFORMS=axon PYTHONPATH=/root/repo:/root/.axon_site \
      python tools/raster_probe.py [--budget 1 4] [--stages fwd fwdbwd ...]

Stages: proj_sh, pairs, gather, fwd, fwdbwd.
Reference semantics being matched: gsplat call at
/root/reference/third_party_model/anysplat/src/model/decoder/decoder_splatting_cuda.py:92-111
"""
from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp

from vist3a_tpu.kernels import rasterizer as R


def _rtt() -> float:
    cheap = jax.jit(lambda x: x + 1.0)
    x = jnp.float32(0.0)
    float(cheap(x))
    t0 = time.perf_counter()
    n = 20
    for _ in range(n):
        float(cheap(x))
    return (time.perf_counter() - t0) / n


def _time(fn, *args, iters=5, rtt=0.0):
    out = fn(*args)
    _fetch(out)                    # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        _fetch(fn(*args))
    return (time.perf_counter() - t0) / iters - rtt


def _fetch(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.sum(leaf) if leaf.ndim else leaf)


def make_scene(g=2_621_440, seed=0, width=448, height=448):
    ks = jax.random.split(jax.random.key(seed), 6)
    means = jax.random.uniform(ks[0], (g, 3), minval=-2.0, maxval=2.0)
    means = means.at[:, 2].add(4.0)
    scale = jnp.exp(jax.random.uniform(ks[1], (g, 3), minval=-6.0,
                                       maxval=-3.5))
    q = jax.random.normal(ks[2], (g, 4))
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    rot = jnp.stack([
        1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
        2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
        2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
    ], axis=-1).reshape(g, 3, 3)
    m = rot * scale[:, None, :]
    covars = m @ m.transpose(0, 2, 1)
    harmonics = 0.3 * jax.random.normal(ks[3], (g, 3, 25))
    opac = jax.nn.sigmoid(jax.random.normal(ks[4], (g,)))
    viewmat = jnp.eye(4, dtype=jnp.float32)
    fx = 0.8 * width
    K = jnp.array([[fx, 0, width / 2], [0, fx, height / 2], [0, 0, 1]],
                  jnp.float32)
    return means, covars, harmonics, opac, viewmat, K, width, height


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--g", type=int, default=2_621_440)
    ap.add_argument("--budgets", type=int, nargs="+", default=[1])
    ap.add_argument("--stages", nargs="+",
                    default=["proj_sh", "pairs", "gather", "fwd", "fwdbwd"])
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    means, covars, harm, opac, viewmat, K, W, H = make_scene(args.g)
    rtt = _rtt()
    print(f"backend={jax.default_backend()}  G={args.g}  rtt={rtt*1e3:.1f} ms",
          flush=True)
    ntx, nty = R._cdiv(W, R.TILE), R._cdiv(H, R.TILE)

    for bmul in args.budgets:
        budget = R._cdiv(bmul * args.g, R.CHUNK) * R.CHUNK
        print(f"--- pair budget {bmul}xG = {budget}", flush=True)

        if "proj_sh" in args.stages:
            @jax.jit
            def proj_sh(means, covars, harm, viewmat, K):
                p = R.project_gaussians(means, covars, viewmat, K, W, H)
                Rm, t = viewmat[:3, :3], viewmat[:3, 3]
                campos = -Rm.T @ t
                c = R.eval_sh(harm, means - campos[None, :], 4)
                return (jnp.sum(p.mean2d) + jnp.sum(p.conic) + jnp.sum(c)
                        + jnp.sum(p.depth) + jnp.sum(p.radius))
            dt = _time(proj_sh, means, covars, harm, viewmat, K,
                       iters=args.iters, rtt=rtt)
            print(f"proj_sh: {dt*1e3:8.1f} ms", flush=True)

        if "pairs" in args.stages:
            @jax.jit
            def pairs(means, covars, opac, viewmat, K):
                p = R.project_gaussians(means, covars, viewmat, K, W, H)
                op = jnp.where(p.valid, opac, 0.0)
                gid, visits, bb = R.build_pairs(
                    p, ntx, nty, budget, extra_valid=op >= R.ALPHA_MIN)
                return (jnp.sum(gid) + jnp.sum(visits.tilechunk)
                        + jnp.sum(visits.meta) + jnp.sum(bb))
            dt = _time(pairs, means, covars, opac, viewmat, K,
                       iters=args.iters, rtt=rtt)
            print(f"pairs:   {dt*1e3:8.1f} ms", flush=True)

        if "gather" in args.stages:
            @jax.jit
            def gath(means, covars, harm, opac, viewmat, K):
                p = R.project_gaussians(means, covars, viewmat, K, W, H)
                Rm, t = viewmat[:3, :3], viewmat[:3, 3]
                campos = -Rm.T @ t
                colors = R.eval_sh(harm, means - campos[None, :], 4)
                op = jnp.where(p.valid, opac, 0.0)
                rows = jnp.stack(
                    [p.mean2d[:, 0], p.mean2d[:, 1], p.conic[:, 0],
                     p.conic[:, 1], p.conic[:, 2], op,
                     colors[:, 0], colors[:, 1], colors[:, 2], p.depth], 1)
                gid, visits, bb = R.build_pairs(
                    p, ntx, nty, budget, extra_valid=op >= R.ALPHA_MIN)
                out = R._gather_pair_rows(rows, gid,
                                          jax.lax.stop_gradient(bb))
                return jnp.sum(out)
            dt = _time(gath, means, covars, harm, opac, viewmat, K,
                       iters=args.iters, rtt=rtt)
            print(f"gather:  {dt*1e3:8.1f} ms", flush=True)

        if "fwd" in args.stages:
            @jax.jit
            def fwd(means, covars, harm, opac, viewmat, K):
                rgb, d, a = R.rasterize(
                    means, covars, harm, opac, viewmat[None], K[None], W, H,
                    sh_degree=4, pair_budget=budget)
                return jnp.sum(rgb) + jnp.sum(d) + jnp.sum(a)
            dt = _time(fwd, means, covars, harm, opac, viewmat, K,
                       iters=args.iters, rtt=rtt)
            print(f"fwd:     {dt*1e3:8.1f} ms", flush=True)

        if "fwdbwd" in args.stages:
            @jax.jit
            def fwdbwd(means, covars, harm, opac, viewmat, K):
                def loss(m, c, h, o):
                    rgb, d, a = R.rasterize(
                        m, c, h, o, viewmat[None], K[None], W, H,
                        sh_degree=4, pair_budget=budget)
                    return jnp.sum(rgb) + 0.1 * jnp.sum(d) + 0.1 * jnp.sum(a)
                g = jax.grad(loss, argnums=(0, 1, 2, 3))(
                    means, covars, harm, opac)
                return sum(jnp.sum(x) for x in g)
            dt = _time(fwdbwd, means, covars, harm, opac, viewmat, K,
                       iters=args.iters, rtt=rtt)
            print(f"fwdbwd:  {dt*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
