"""Isolate the decode's stage-vs-blocks gaps (r4 MFU push).

CLAUDE.md perf notes: the aggregator stage measures ~42 ms more than the
sum of its 24 timed blocks, and heads_pipeline (~130 ms) exceeds its
camera+depth+gs+adapter parts (~95 ms).  This probe times controlled
variants to attribute those gaps:

  agg/taps4      run_trunk, taps {4,11,17,23} (deployed)
  agg/taps0      run_trunk, no taps (one unbroken scan over 24 pairs)
  agg/taps4_remat  deployed taps + remat=True (the training default —
                   remat inside a forward-only program should be free;
                   if not, the inference caller must pass remat=False)
  heads/pipeline  full heads_pipeline at the decode head_dtype
  heads/quantile  the 2.6M-value global quantile alone
  heads/no_quantile  pipeline with render_conf/opacity_conf off

All timings RTT-corrected as in bench.py (the axon tunnel adds ~34 ms per
host fetch).
"""
from __future__ import annotations

import dataclasses
import json
import time

import jax
import jax.numpy as jnp


def _rtt() -> float:
    cheap = jax.jit(lambda x: x + 1.0)
    x = jnp.float32(0.0)
    float(cheap(x))
    t0 = time.perf_counter()
    for _ in range(8):
        float(cheap(x))
    return (time.perf_counter() - t0) / 8


def _scalarize(out):
    leaves = [x for x in jax.tree_util.tree_leaves(out)
              if isinstance(x, jax.Array) and jnp.issubdtype(
                  x.dtype, jnp.inexact)]
    return sum(jnp.sum(x.astype(jnp.float32)) for x in leaves)


def probe(name, fn, args, rtt, iters=4, scalarize=None):
    sc = scalarize or _scalarize
    f = jax.jit(lambda *a: sc(fn(*a)))
    float(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        float(f(*args))
    dt = (time.perf_counter() - t0) / iters - rtt
    print(json.dumps({"probe": name, "ms": round(dt * 1e3, 2)}), flush=True)
    return dt


def main():
    from vist3a_tpu.nn import aggregator as agg_mod
    from vist3a_tpu.nn import encoder as enc_mod
    from vist3a_tpu.stitch import chopped_anysplat as ca

    base = ca.StitchedConfig()
    impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    ecfg = dataclasses.replace(
        base.encoder,
        vit=dataclasses.replace(base.encoder.vit, attn_impl=impl),
        agg=dataclasses.replace(base.encoder.agg, attn_impl=impl),
        head_dtype="bfloat16",
    )
    acfg = ecfg.agg

    rtt = _rtt() if jax.default_backend() == "tpu" else 0.0
    print(json.dumps({"rtt_ms": round(rtt * 1e3, 2)}), flush=True)

    b, s, gh, gw = 1, 13, 32, 32
    p = acfg.patch_start_idx + gh * gw
    c = acfg.embed_dim
    enc = enc_mod.cast_trunk_bf16(enc_mod.init(jax.random.key(0), ecfg))
    ap = enc["aggregator"]
    tokens = jax.random.normal(jax.random.key(1), (b, s, p, c), jnp.bfloat16)

    def trunk(taps, remat):
        cfg2 = dataclasses.replace(acfg, taps=taps)

        def fn(ap, tok):
            out, tp = agg_mod.run_trunk(ap, tok, cfg2, (gh, gw), remat=remat)
            return (out, tp)

        return fn

    def trunk_mode(taps, mode):
        cfg2 = dataclasses.replace(acfg, taps=taps)

        def fn(ap, tok):
            return agg_mod.run_trunk(ap, tok, cfg2, (gh, gw), remat=False,
                                     tap_mode=mode)

        return fn

    probe("agg/taps4_ys", trunk_mode((4, 11, 17, 23), "ys"), (ap, tokens),
          rtt)
    probe("agg/taps4_carry", trunk_mode((4, 11, 17, 23), "carry"),
          (ap, tokens), rtt)
    probe("agg/taps4_split", trunk_mode((4, 11, 17, 23), "split"),
          (ap, tokens), rtt)
    probe("agg/taps0", trunk((), False), (ap, tokens), rtt)
    probe("agg/taps4_remat", trunk((4, 11, 17, 23), True), (ap, tokens), rtt)

    # ---- heads ----
    from vist3a_tpu.nn import heads as heads_mod

    taps = [jax.random.normal(jax.random.key(2 + i), (b, s, p, 2 * c),
                              jnp.float32) * 0.05 for i in range(4)]
    images01 = jax.random.uniform(jax.random.key(9), (b, s, 3, 448, 448))

    probe("heads/pipeline",
          lambda pr, t, im: enc_mod.heads_pipeline(pr, ecfg, t, im,
                                                   remat=False),
          (enc, taps, images01), rtt)

    ecfg_nq = dataclasses.replace(ecfg, render_conf=False,
                                  opacity_conf=False)
    probe("heads/no_quantile",
          lambda pr, t, im: enc_mod.heads_pipeline(pr, ecfg_nq, t, im,
                                                   remat=False),
          (enc, taps, images01), rtt)

    dconf = jnp.exp(jax.random.normal(jax.random.key(10),
                                      (b, s, 448, 448), jnp.float32))
    probe("heads/quantile",
          lambda d: jnp.quantile(d, ecfg.conf_threshold), (dconf,), rtt)

    # camera head alone (fp32, 4 refinement iterations over S=13 tokens)
    probe("heads/camera",
          lambda pr, t: heads_mod.camera_head_apply(pr["camera_head"], t,
                                                    ecfg.camera),
          (enc, taps[-1]), rtt)

    # ---- heads bisection: attribute the pipeline-vs-parts gap ----
    from vist3a_tpu.nn.gaussians import (map_pdf_to_opacity,
                                         unified_gaussian_adapter)
    from vist3a_tpu.nn.geometry import (pose_encoding_to_extri_intri,
                                        unproject_depth)

    hdt = jnp.dtype(ecfg.head_dtype)
    taps_h = [t.astype(hdt) for t in taps]
    psi_ = ecfg.agg.patch_start_idx
    hw = (448, 448)

    # bench-realistic pipeline: only the outputs the decode consumes
    # (anchor_feats/gs_conf DCE'd, as in bench.py's program)
    def bench_outputs(out):
        g = out.gaussians
        return (jnp.sum(g.means) + jnp.sum(g.harmonics)
                + jnp.sum(g.opacities) + jnp.sum(g.covariances)
                + jnp.sum(out.depth)
                + jnp.sum(out.extrinsic_c2w)).astype(jnp.float32)

    probe("heads/pipeline_bench",
          lambda pr, t, im: enc_mod.heads_pipeline(pr, ecfg, t, im,
                                                   remat=False),
          (enc, taps, images01), rtt, scalarize=bench_outputs)

    # depth-side chain: DPT depth head + unproject + quantile + scale
    probe("heads/dpt_depth",
          lambda pr, t: heads_mod.dpt_apply(pr["depth_head"], t, hw, psi_,
                                            ecfg.depth, (b, s)),
          (enc, taps_h), rtt)

    pose_enc = jax.random.normal(jax.random.key(20), (b, s, 9),
                                 jnp.float32) * 0.1

    def depth_chain(pr, t, pe):
        extr, intr = pose_encoding_to_extri_intri(pe, hw)
        depth, conf = heads_mod.dpt_apply(pr["depth_head"], t, hw, psi_,
                                          ecfg.depth, (b, s))
        pts = unproject_depth(depth, extr, intr)
        thresh = jnp.quantile(conf, ecfg.conf_threshold)
        scale = jnp.clip(
            jnp.mean(jnp.linalg.norm(pts.reshape(b, -1, 3), axis=-1)), 1e-8)
        return pts, conf > thresh, scale

    probe("heads/depth_chain", depth_chain, (enc, taps_h, pose_enc), rtt)

    # GS side: head alone, then raw→Gaussians assembly alone
    probe("heads/gs_head",
          lambda pr, t, im: heads_mod.gs_head_apply(pr["gs_head"], t, im,
                                                    psi_, ecfg.gs),
          (enc, taps_h, images01), rtt)

    raw = jax.random.normal(jax.random.key(21), (b, s, 448, 448, 84),
                            hdt) * 0.1
    means_in = jax.random.normal(jax.random.key(22), (b, s, 448, 448, 3),
                                 jnp.float32)

    def assembly(raw, means):
        feats = raw[..., : ecfg.raw_gs_dim].astype(jnp.float32)
        feats = feats.reshape(b, -1, ecfg.raw_gs_dim)
        opac = map_pdf_to_opacity(jax.nn.sigmoid(feats[..., 0]))
        return unified_gaussian_adapter(means.reshape(b, -1, 3), opac,
                                        feats[..., 1:], ecfg.sh_degree)

    probe("heads/assembly", assembly, (raw, means_in), rtt)


if __name__ == "__main__":
    main()
