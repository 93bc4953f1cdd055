"""Per-op breakdown of the DPT-head tail at the deployed 448p decode shape.

The GS head is the most expensive head stage (bf16 ~45 ms of the ~130 ms
heads pipeline) and its tail — fused-feature resize to 448² + output convs —
measured 0.18 MFU in fp32 (tools/stage_probe.py gs_tail448).  This tool
times each tail op in the decode dtype (bf16) and A/B-tests resize
formulations, so the layout story is measured rather than guessed.

Shapes: 13 frames, fused features (13, 224, 224, 128), images 448², GS
output_dim 84 — `nn/heads.py:_gs_frames` at the 448p/13-view deployment.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from vist3a_tpu.nn import heads as H


def _rtt() -> float:
    cheap = jax.jit(lambda x: x + 1.0)
    x = jnp.float32(0.0)
    float(cheap(x))
    t0 = time.perf_counter()
    for _ in range(8):
        float(cheap(x))
    return (time.perf_counter() - t0) / 8


def _time(fn, *args, iters=4):
    f = jax.jit(fn)
    out = f(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        float(jnp.sum(f(*args).astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def main():
    print("backend", jax.default_backend(), flush=True)
    rtt = _rtt()
    print(f"rtt_ms {rtt * 1e3:.2f}", flush=True)

    S, Hf, Wf, C = 13, 224, 224, 128
    H2, W2 = 448, 448
    dt = jnp.bfloat16
    key = jax.random.key(0)
    fused = jax.random.normal(key, (S, Hf, Wf, C), dt)
    imgs = jax.random.uniform(jax.random.key(1), (S, H2, W2, 3), dt)
    cfg = H.GSHeadConfig(dim_in=2048)
    params = H.gs_head_init(jax.random.key(2), cfg)

    def run(name, fn, *args):
        dtms = (_time(fn, *args) - rtt) * 1e3
        print(json.dumps({"op": name, "ms": round(dtms, 2)}), flush=True)

    # current resize form (einsum over non-minor axes)
    run("resize_einsum", lambda x: H.resize_bilinear_align_corners(
        x, (H2, W2), channels_last=True), fused)

    # A/B: both passes as canonical (O,K)x(K,M) matmuls; the W pass runs
    # after a major-axis transpose that keeps C minor
    mh = jnp.asarray(H._interp_matrix(Hf, H2)).astype(dt)
    mw = jnp.asarray(H._interp_matrix(Wf, W2)).astype(dt)

    def resize_mm(x):
        s, h, w, c = x.shape
        y = jnp.einsum("oh,shm->som", mh, x.reshape(s, h, w * c))
        y = y.reshape(s, H2, w, c).transpose(0, 2, 1, 3)   # (s, w, H2, c)
        z = jnp.einsum("pw,swm->spm", mw, y.reshape(s, w, H2 * c))
        return z.reshape(s, W2, H2, c).transpose(0, 2, 1, 3)

    run("resize_mm_transpose", resize_mm, fused)
    err = float(jnp.max(jnp.abs(
        resize_mm(fused).astype(jnp.float32)
        - H.resize_bilinear_align_corners(
            fused, (H2, W2), channels_last=True).astype(jnp.float32))))
    print(json.dumps({"op": "resize_mm_maxerr", "err": err}), flush=True)

    # tail convs
    run("merger7x7", lambda im: H.conv2d(
        params["input_merger"], im, padding=3, channels_last=True), imgs) \
        if "input_merger" in params else None
    big = jax.random.normal(jax.random.key(3), (S, H2, W2, C), dt)
    run("conv3x3_448_128to128", lambda x: H.conv2d(
        params["output_conv2"][0], x, padding=1, channels_last=True), big)
    run("conv1x1_448_128to84", lambda x: H.conv2d(
        params["output_conv2"][1], x, channels_last=True), big)
    run("uv_pos_embed", lambda x: H.apply_uv_pos_embed(
        x, W2, H2, channels_last=True), big)

    # whole tail, current vs matmul-resize
    def tail(fused, im, resize):
        out = resize(fused)
        if "input_merger" in params:
            direct = jax.nn.relu(H.conv2d(params["input_merger"],
                                          im, padding=3, channels_last=True))
            out = out + direct
        out = H.apply_uv_pos_embed(out, W2, H2, channels_last=True)
        out = H.conv2d(params["output_conv2"][0], out, padding=1,
                       channels_last=True)
        return H.conv2d(params["output_conv2"][1], jax.nn.relu(out),
                        channels_last=True)

    run("tail_current", lambda f, im: tail(
        f, im, lambda x: H.resize_bilinear_align_corners(
            x, (H2, W2), channels_last=True)), fused, imgs)
    run("tail_mm_resize", lambda f, im: tail(f, im, resize_mm), fused, imgs)

    # fusion-cascade resizes happen at small sizes too: 28->56, 56->112,
    # 112->224 inside _fusion; time the largest one both ways
    small = jax.random.normal(jax.random.key(4), (S, 112, 112, 256), dt)
    run("fusion_resize_112_einsum", lambda x: H.resize_bilinear_align_corners(
        x, (224, 224), channels_last=True), small)
    m2h = jnp.asarray(H._interp_matrix(112, 224)).astype(dt)

    def resize_mm2(x):
        s, h, w, c = x.shape
        y = jnp.einsum("oh,shm->som", m2h, x.reshape(s, h, w * c))
        y = y.reshape(s, 224, w, c).transpose(0, 2, 1, 3)
        z = jnp.einsum("pw,swm->spm", m2h, y.reshape(s, w, 224 * c))
        return z.reshape(s, 224, 224, c).transpose(0, 2, 1, 3)

    run("fusion_resize_112_mm", resize_mm2, small)


if __name__ == "__main__":
    main()
