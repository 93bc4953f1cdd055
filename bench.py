"""Headline benchmark: latent→3DGS stitched-decoder forward at deployed shape.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The measured path is the `inference_t23d.py` decode hot loop — Wan latent
(1,16,4,64,64) → trilinear pre-upsample → conv3d stitch → chopped AnySplat
(DINOv2 blocks + VGGT alternating attention + camera/DPT/GS heads) → padded
Gaussians — on whatever backend JAX selects (TPU chip under the driver).

The reference publishes no latency numbers (SURVEY.md §6), so `vs_baseline`
reports the speedup of this path over the same program with the plain XLA
attention instead of our Pallas flash kernel (impl toggled via the config),
i.e. the measured benefit of the custom kernels on identical hardware.
"""

from __future__ import annotations

import dataclasses
import json
import time

import jax
import jax.numpy as jnp


def _inputs():
    """Params + inputs, shared by both attention variants (same shapes)."""
    from vist3a_tpu.nn import encoder as enc_mod
    from vist3a_tpu.stitch import chopped_anysplat as ca

    cfg = ca.StitchedConfig()
    params = {
        "encoder": enc_mod.cast_trunk_bf16(
            enc_mod.init(jax.random.key(0), cfg.encoder)),
        "stitch_conv": ca.init_stitch_conv(jax.random.key(1), cfg),
    }
    latent = jax.random.normal(jax.random.key(2), (1, 16, 4, 64, 64),
                               jnp.bfloat16)
    images = jax.random.uniform(jax.random.key(3), (1, 3, 13, 448, 448),
                                jnp.bfloat16, -1.0, 1.0)
    return params, latent, images


def _config(attn_impl: str):
    from vist3a_tpu.stitch import chopped_anysplat as ca

    base = ca.StitchedConfig()
    ecfg = dataclasses.replace(
        base.encoder,
        vit=dataclasses.replace(base.encoder.vit, attn_impl=attn_impl),
        agg=dataclasses.replace(base.encoder.agg, attn_impl=attn_impl),
        head_dtype="bfloat16",   # the t23d inference decode setting
    )
    return dataclasses.replace(base, encoder=ecfg)


def _build(attn_impl: str):
    from vist3a_tpu.stitch import chopped_anysplat as ca

    cfg = _config(attn_impl)

    @jax.jit
    def fn(params, latent, images):
        # remat off for inference: no backward, keep all fusion freedom
        out = ca.forward_with_latent(params, latent, images, cfg,
                                     remat=False)
        # reduce to one scalar INSIDE the jit: every head still computes
        # (nothing is dead), but no multi-GB output buffers survive the call,
        # and fetching the scalar forces completion even on async backends
        # where block_until_ready returns early (axon tunnel).
        g = out.gaussians
        return (jnp.sum(g.means) + jnp.sum(g.harmonics) + jnp.sum(g.opacities)
                + jnp.sum(g.covariances) + jnp.sum(out.depth)
                + jnp.sum(out.extrinsic_c2w)).astype(jnp.float32)

    return fn


def _rtt() -> float:
    """Dispatch+fetch round-trip of a trivial program — the per-iteration
    tunnel overhead that a host fetch adds on top of device latency.
    (Deep dispatch pipelining is NOT an option for amortizing it here: the
    decode program sizes its workspace near the chip's full HBM, and queuing
    N executions oversubscribes HBM and thrashes.)"""
    cheap = jax.jit(lambda x: x + 1.0)
    x = jnp.float32(0.0)
    float(cheap(x))                              # compile + warm
    t0 = time.perf_counter()
    for _ in range(8):
        float(cheap(x))
    return (time.perf_counter() - t0) / 8


def _time(fn, params, latent, images, iters: int = 5) -> float:
    float(fn(params, latent, images))            # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        float(fn(params, latent, images))        # host fetch = hard barrier
    return (time.perf_counter() - t0) / iters


def _flops(cfg) -> float:
    """Analytic model FLOPs of the decode (matmuls, attention cores, convs,
    resize contractions — the MFU convention).  XLA's `cost_analysis` is NOT
    usable here: it counts a `lax.scan` body ONCE, not ×trip-count (measured:
    a 24-step scanned matmul reports 1 body), and the 56-block trunk lives
    inside scans — it under-reported this program's flops ~3×.
    Validated against XLA's count on scan-free subprograms
    (`tests/test_bench_flops.py`)."""
    e = cfg.encoder
    h = w = 448
    s = 13
    ph, pw = h // e.agg.patch_size, w // e.agg.patch_size
    p = e.agg.patch_start_idx + ph * pw          # tokens per frame (1029)
    c = e.agg.embed_dim

    def block_matmul(n, dim, ratio):
        # QKV 6ndim² + proj 2ndim² + MLP 2·2·ratio·ndim²
        return (8.0 + 4.0 * ratio) * n * dim * dim

    def attn_core(n, dim):
        return 4.0 * n * n * dim                  # QK + AV, H·D = dim

    vit_blocks = e.vit.depth - cfg.stitch_layer_index
    pairs = e.agg.depth
    trunk = (
        (vit_blocks + 2 * pairs) * block_matmul(s * p, c, e.agg.mlp_ratio)
        + (vit_blocks + pairs) * s * attn_core(p, c)   # frame-level attention
        + pairs * attn_core(s * p, c)                  # global attention
    )

    spec = cfg.conv                              # stitch conv3d 16→1024
    import numpy as _np
    stitch = 2.0 * float(_np.prod(spec.kernel_shape(cfg.latent_channels))) \
        * s * ph * pw

    cam = e.camera.num_iterations * e.camera.trunk_depth * block_matmul(
        s, e.camera.dim_in, e.camera.mlp_ratio)

    heads = s * (_dpt_flops(e.depth, h, w) + _dpt_flops(e.gs, h, w,
                                                        rgb_skip=True))
    return trunk + stitch + cam + heads


def _dpt_flops(cfg, h: int, w: int, *, rgb_skip: bool = False) -> float:
    """Per-frame conv/resize FLOPs of one DPT head (`nn/heads.py` cascade)."""
    ph, pw = h // cfg.patch_size, w // cfg.patch_size
    g = ph * pw
    f, oc, c2 = cfg.features, cfg.out_channels, cfg.features // 2
    fl = sum(2.0 * cfg.dim_in * o * g for o in oc)              # projects 1×1
    fl += 2.0 * 16 * oc[0] ** 2 * g                             # resize0 (T4×4)
    fl += 2.0 * 4 * oc[1] ** 2 * g                              # resize1 (T2×2)
    fl += 2.0 * 9 * oc[3] ** 2 * (g // 4)                       # resize3 (3×3 s2)
    scales = (16 * g, 4 * g, g, g // 4)                         # layer_rn 3×3
    fl += sum(2.0 * 9 * oc[i] * f * scales[i] for i in range(4))
    # refinenet cascade: (res-unit convs at in-scale, out_conv at out-scale)
    for n_res, s_in, s_out in ((2, g // 4, g), (4, g, 4 * g),
                               (4, 4 * g, 16 * g), (4, 16 * g, 64 * g)):
        fl += n_res * 2.0 * 9 * f * f * s_in + 2.0 * f * f * s_out
    fl += 2.0 * 9 * f * c2 * 64 * g                             # output_conv1
    # final resize (8ph,8pw)→(h,w): two interp-matrix contractions
    fl += 2.0 * h * (8 * ph) * (8 * pw) * c2 + 2.0 * w * h * (8 * pw) * c2
    if rgb_skip:
        fl += 2.0 * 49 * 3 * c2 * h * w                         # input_merger
    fl += 2.0 * 9 * c2 * cfg.head2_features * h * w             # output_conv2[0]
    fl += 2.0 * cfg.head2_features * cfg.output_dim * h * w     # output_conv2[1]
    return fl


# v5e peak: 197 bf16 TFLOP/s per chip (394 int8 TOPS / 2)
V5E_PEAK_FLOPS = 197e12


def main():
    on_tpu = jax.default_backend() == "tpu"
    fast_impl = "pallas" if on_tpu else "xla"

    rtt = _rtt() if on_tpu else 0.0
    params, latent, images = _inputs()
    fn = _build(fast_impl)
    fast = max(_time(fn, params, latent, images) - rtt, 1e-9)
    # MFU anchor: analytic model FLOPs (see `_flops`) over v5e bf16 peak —
    # keeps the perf claim anchored to hardware, not only to the
    # self-referential vs_baseline.
    mfu = _flops(_config(fast_impl)) / fast / V5E_PEAK_FLOPS if on_tpu else 0.0

    if on_tpu:
        del fn
        jax.clear_caches()  # drop the first executable before the second
        fn_x = _build("xla")
        slow = max(_time(fn_x, params, latent, images) - rtt, 1e-9)
    else:
        slow = fast
    print(json.dumps({
        "metric": "latent_to_3dgs_decode_latency",
        "value": round(fast * 1000.0, 2),
        "unit": "ms (1x16x4x64x64 latent -> 13-view 448p Gaussians, "
                "vs_baseline = xla-attention speedup on same chip)",
        "vs_baseline": round(slow / fast, 3),
        "mfu": round(mfu, 4),
    }))


if __name__ == "__main__":
    main()
