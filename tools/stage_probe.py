"""Per-stage latency + MFU breakdown of the latent→3DGS decode path.

Runs each stage of `forward_with_latent` as its own jitted program on the
current backend (the real chip under axon), RTT-corrected like bench.py,
and reports XLA cost-analysis flops per stage so waste is attributable:

    stitch  : trilinear pre-upsample + 3D stitch conv
    vit     : chopped DINOv2 blocks (frame-local attention)
    agg     : VGGT alternating global/frame aggregator
    camera  : camera head (4 refinement iters)
    depth   : depth DPT head
    gs      : Gaussian DPT head (+RGB skip)
    adapter : quantile mask + gaussian assembly + pose algebra

Stage timings are *isolated* programs — inter-stage fusion in the full
program can make their sum ≠ the end-to-end time; the deltas are the point
(a stage whose isolated time ≫ its flop floor is where to dig).
"""
from __future__ import annotations

import dataclasses
import json
import time

import jax
import jax.numpy as jnp

V5E_PEAK_FLOPS = 197e12


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
              if isinstance(x, jax.Array) and jnp.issubdtype(x.dtype,
                                                             jnp.inexact)]
    return sum(jnp.sum(x.astype(jnp.float32)) for x in leaves)


def probe(name, fn, args, rtt, iters=4, scanned=False):
    """Time one isolated stage.  `scanned=True` marks stages whose program
    contains a `lax.scan` stack: XLA `cost_analysis` counts the scan body
    ONCE (not x trip-count), so `gflop`/`mfu` under-report by ~the trip
    count for those stages (bench._flops documents the same; its analytic
    formulas are the honest MFU anchor).  The JSON carries an explicit
    `flops_scan_undercounted` flag so nobody reads the scanned stages' MFU
    as real."""
    f = jax.jit(fn)
    out = f(*args)
    float(_scalarize(out) if not isinstance(out, jax.Array) else
          jnp.sum(out.astype(jnp.float32)))
    flops = 0.0
    try:
        ca = f.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
    except Exception:
        pass
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
        float(_scalarize(out) if not isinstance(out, jax.Array) else
              jnp.sum(out.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / iters - rtt
    mfu = flops / dt / V5E_PEAK_FLOPS if dt > 0 else 0.0
    rec = {"stage": name, "ms": round(dt * 1e3, 2),
           "gflop": round(flops / 1e9, 1), "mfu": round(mfu, 3)}
    if scanned:
        rec["flops_scan_undercounted"] = True
    print(json.dumps(rec), flush=True)
    return jax.device_put(out) if isinstance(out, jax.Array) else out


def main():
    from vist3a_tpu.nn import encoder as enc_mod
    from vist3a_tpu.nn import aggregator as agg_mod
    from vist3a_tpu.nn import heads as heads_mod
    from vist3a_tpu.stitch import chopped_anysplat as ca

    base = ca.StitchedConfig()
    cfg = dataclasses.replace(
        base,
        encoder=dataclasses.replace(
            base.encoder,
            vit=dataclasses.replace(base.encoder.vit, attn_impl="pallas"),
            agg=dataclasses.replace(base.encoder.agg, attn_impl="pallas"),
        )) if jax.default_backend() == "tpu" else base
    ecfg = cfg.encoder

    params = {
        "encoder": enc_mod.cast_trunk_bf16(
            enc_mod.init(jax.random.key(0), ecfg)),
        "stitch_conv": ca.init_stitch_conv(jax.random.key(1), cfg),
    }
    latent = jax.random.normal(jax.random.key(2), (1, 16, 4, 64, 64),
                               jnp.bfloat16)
    images = jax.random.uniform(jax.random.key(3), (1, 3, 13, 448, 448),
                                jnp.bfloat16, -1.0, 1.0)
    rtt = _rtt() if jax.default_backend() == "tpu" else 0.0
    print(json.dumps({"rtt_ms": round(rtt * 1e3, 2)}), flush=True)

    # stage 1: stitch
    def stitch(p, lat):
        return cfg.conv.apply(p["stitch_conv"], ca.pre_upsample(lat, cfg))

    stitched = probe("stitch", stitch, (params, latent), rtt)

    b, d, s, gh, gw = stitched.shape
    tok = jnp.reshape(jnp.transpose(stitched, (0, 2, 3, 4, 1)),
                      (b * s, gh * gw, d))

    # stage 2: chopped ViT
    def vit(p, t):
        return ca.chopped_vit_forward(p["encoder"]["vit"], t, (gh, gw), cfg,
                                      remat=False)

    patch_tokens = probe("vit", vit, (params, tok), rtt,
                         scanned=True)

    # stage 3: aggregator trunk
    def agg(p, pt):
        ap = p["encoder"]["aggregator"]
        cam = agg_mod.expand_special_tokens(
            ap["camera_token"].astype(pt.dtype), b, s)
        reg = agg_mod.expand_special_tokens(
            ap["register_token"].astype(pt.dtype), b, s)
        tokens = jnp.concatenate([cam, reg, pt], axis=1)
        tokens = tokens.reshape(b, s, tokens.shape[1], -1)
        _, taps = agg_mod.run_trunk(ap, tokens, ecfg.agg, (gh, gw),
                                    remat=False)
        return taps

    taps = probe("agg", agg, (params, patch_tokens), rtt,
                 scanned=True)
    taps = [t.astype(jnp.float32) for t in taps]
    images01 = (jnp.swapaxes(images, 1, 2).astype(jnp.float32) + 1.0) / 2.0
    hw = images01.shape[-2:]
    psi = ecfg.agg.patch_start_idx

    # stage 4: camera head
    probe("camera", lambda p, t: heads_mod.camera_head_apply(
        p["encoder"]["camera_head"], t, ecfg.camera), (params, taps[-1]),
        rtt)

    # stage 5/6: DPT heads
    probe("depth", lambda p, t: heads_mod.dpt_apply(
        p["encoder"]["depth_head"], t, hw, psi, ecfg.depth, (1, s),
        remat=False), (params, taps), rtt)
    probe("gs", lambda p, t, im: heads_mod.gs_head_apply(
        p["encoder"]["gs_head"], t, im, psi, ecfg.gs, remat=False),
        (params, taps, images01), rtt)

    # stage 7: everything-after-taps (heads_pipeline) for the fused total
    probe("heads_pipeline", lambda p, t, im: enc_mod.heads_pipeline(
        p["encoder"], ecfg, t, im, remat=False), (params, taps, images01),
        rtt)

    # --- heads_pipeline sub-stages (where the zero-flop ~58 ms lives) ---
    from vist3a_tpu.nn import gaussians as gs_mod
    from vist3a_tpu.nn import geometry as geo_mod

    b2, s2 = 1, s
    h2, w2 = hw
    rawdim = ecfg.raw_gs_dim + 1
    raw = jax.random.normal(jax.random.key(7), (b2, s2, h2, w2, rawdim),
                            jnp.float32) * 0.1
    depth = jnp.exp(jax.random.normal(jax.random.key(8), (b2, s2, h2, w2, 1),
                                      jnp.float32))
    dconf = jnp.exp(jax.random.normal(jax.random.key(9), (b2, s2, h2, w2),
                                      jnp.float32))
    extrinsic = jnp.tile(jnp.eye(3, 4)[None, None], (b2, s2, 1, 1))
    fx = 0.8 * w2
    intr = jnp.tile(jnp.asarray([[fx, 0, w2 / 2], [0, fx, h2 / 2],
                                 [0, 0, 1]])[None, None], (b2, s2, 1, 1))

    def adapter(raw, depth, dconf, extrinsic, intr):
        pts = geo_mod.unproject_depth(depth, extrinsic, intr)
        thresh = jnp.quantile(dconf, ecfg.conf_threshold)
        conf_valid = dconf > thresh
        feats = raw[..., : ecfg.raw_gs_dim].reshape(b2, -1, ecfg.raw_gs_dim)
        means = pts.reshape(b2, -1, 3)
        mask = conf_valid.reshape(b2, -1)
        dens = jax.nn.sigmoid(feats[..., 0])
        opac = gs_mod.map_pdf_to_opacity(dens) * mask
        g = gs_mod.unified_gaussian_adapter(means, opac, feats[..., 1:],
                                            ecfg.sh_degree)
        scene = jnp.clip(jnp.mean(jnp.linalg.norm(means, axis=-1)), 1e-8)
        return (jnp.sum(g.covariances) + jnp.sum(g.harmonics)
                + jnp.sum(g.means) + jnp.sum(g.opacities) + scene)

    probe("adapter", adapter, (raw, depth, dconf, extrinsic, intr), rtt)

    # GS-head sub-stages at the deployed 448² scale
    imgs_flat = jnp.swapaxes(images01, 1, 2).reshape(s, 3, h2, w2) \
        .transpose(0, 2, 3, 1).astype(jnp.float32)
    probe("gs_merger7x7", lambda p, im: heads_mod.conv2d(
        p["encoder"]["gs_head"]["input_merger"], im, padding=3,
        channels_last=True), (params, imgs_flat), rtt)

    f2 = ecfg.gs.features // 2
    fused = jax.random.normal(jax.random.key(10), (s, h2 // 2, w2 // 2, f2),
                              jnp.float32) * 0.1
    def gs_tail(p, fused, im):
        out = heads_mod.resize_bilinear_align_corners(
            fused, (h2, w2), channels_last=True)
        direct = jax.nn.relu(heads_mod.conv2d(
            p["encoder"]["gs_head"]["input_merger"], im, padding=3,
            channels_last=True))
        out = out + direct
        out = heads_mod.apply_uv_pos_embed(out, w2, h2, channels_last=True)
        out = heads_mod.conv2d(p["encoder"]["gs_head"]["output_conv2"][0],
                               out, padding=1, channels_last=True)
        return heads_mod.conv2d(p["encoder"]["gs_head"]["output_conv2"][1],
                                jax.nn.relu(out), channels_last=True)

    probe("gs_tail448", gs_tail, (params, fused, imgs_flat), rtt)


if __name__ == "__main__":
    main()
