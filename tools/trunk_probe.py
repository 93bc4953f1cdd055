"""Per-op latency breakdown of one aggregator block at the decode shape.

The stage probe (tools/stage_probe.py) shows the VGGT aggregator at ~359 ms
of the ~495 ms decode, of which the attention cores are ~202 ms — this tool
attributes the remaining ~157 ms to individual non-attention ops so the
optimization target is measured, not guessed.

Each op runs as its own jitted program containing a 24-iteration `lax.scan`
(one trip per aggregator layer) so per-dispatch overhead amortizes; times
reported are per-layer (total/24), RTT-corrected like bench.py.

Shapes: global attention path (1, S*P, C) and frame path (S, P, C) with
S=13 frames, P=1029 tokens (32x32 patches + 5 special), C=1024 — the
448p/13-view decode deployment (`stitch/chopped_anysplat.py`).
"""
from __future__ import annotations

import functools
import json
import time

import jax
import jax.numpy as jnp

from vist3a_tpu.nn import layers as L
from vist3a_tpu.nn.aggregator import AggregatorConfig, rope_tables
from vist3a_tpu.ops.attention import dot_product_attention
from vist3a_tpu.ops.rope import apply_rope2d


def _rtt() -> float:
    cheap = jax.jit(lambda x: x + 1.0)
    x = jnp.float32(0.0)
    float(cheap(x))
    t0 = time.perf_counter()
    for _ in range(8):
        float(cheap(x))
    return (time.perf_counter() - t0) / 8


def _time(fn, *args, iters=3):
    f = jax.jit(fn)
    out = f(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        float(jnp.sum(f(*args).astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def scan24(op):
    """Wrap a shape-preserving op into a 24-trip scan over the carry."""
    def fn(x, *rest):
        def body(c, _):
            return op(c, *rest), None
        out, _ = jax.lax.scan(body, x, None, length=24)
        return out
    return fn


def main():
    print("backend", jax.default_backend(), flush=True)
    rtt = _rtt()
    print(f"rtt_ms {rtt * 1e3:.2f}", flush=True)

    cfg = AggregatorConfig()
    blk = cfg.block_config()
    S, P, C = 13, 1029, cfg.embed_dim
    N = S * P
    key = jax.random.key(0)
    xg = jax.random.normal(key, (1, N, C), jnp.bfloat16)
    xf = jax.random.normal(key, (S, P, C), jnp.bfloat16)
    params = L.block_init(jax.random.key(1), blk)
    rope_f, rope_g = rope_tables(cfg, 32, 32, n_frames=S)

    h, dh = blk.num_heads, blk.head_dim
    qg = jax.random.normal(key, (1, N, h, dh), jnp.bfloat16)

    def report(name, per_layer_ms):
        print(json.dumps({"op": name, "ms_per_layer": round(per_layer_ms, 3),
                          "ms_24layers": round(per_layer_ms * 24, 1)}),
              flush=True)

    def run(name, op, x, *rest):
        dt = _time(scan24(op), x, *rest) - rtt
        report(name, dt * 1e3 / 24)

    # full block and block-minus-attention (attention replaced by identity on
    # the reshaped heads — keeps qkv/proj/reshape costs in)
    run("block_full_global",
        lambda c: L.block_apply(params, c, blk, *rope_g), xg)
    run("block_full_frame",
        lambda c: L.block_apply(params, c, blk, *rope_f), xf)

    def attn_identity(q, k, v, **kw):
        return v

    def block_noattn(c, rope):
        import vist3a_tpu.nn.layers as LL
        real = LL.dot_product_attention
        LL.dot_product_attention = attn_identity
        try:
            return L.block_apply(params, c, blk, *rope)
        finally:
            LL.dot_product_attention = real

    run("block_noattn_global", lambda c: block_noattn(c, rope_g), xg)
    run("block_noattn_frame", lambda c: block_noattn(c, rope_f), xf)

    # individual pieces at the global shape
    run("layer_norm", lambda c: L.layer_norm(params["norm1"], c), xg)
    run("qkv_matmul",
        lambda c: L.linear(params["attn"]["qkv"], c)[..., :C], xg)
    run("proj_matmul", lambda c: L.linear(params["attn"]["proj"], c), xg)
    run("mlp", lambda c: L.mlp(params["mlp"], c), xg)

    def qknorm(q):
        return L.layer_norm(params["attn"]["q_norm"], q, 1e-5)

    run("qk_norm_one", qknorm, qg)

    def rope_swap(q):
        cs, sn = rope_g[0].astype(q.dtype), rope_g[1].astype(q.dtype)
        return apply_rope2d(q.swapaxes(1, 2), cs, sn).swapaxes(1, 2)

    run("rope_one_swapaxes", rope_swap, qg)

    def attn_core(q):
        return dot_product_attention(q, q, q, impl="pallas")

    run("attn_core_global", attn_core, qg)


if __name__ == "__main__":
    main()
