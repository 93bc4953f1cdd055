"""Bisect the aggregator stage-vs-blocks gap IN SITU (VERDICT r4 #2).

r4's `trunk_probe.py` timed ops via scan24 of ONE block with params closed
over as constants; the real `run_trunk` scans over STACKED params.  The
~42 ms unowned gap must live in whatever differs between those two forms:
param streaming/layout, the frame↔global relayouts, the per-layer tap
concat, or scan bookkeeping.  Each probe here is a scan over 24 layer
pairs at the decode shape (B=1, S=13, P=1029, C=1024, bf16), differing in
exactly one structural aspect:

  pair_stacked      run_trunk's exact body, stacked params, no taps
  pair_closed       same body, ONE pair's params closed over (trunk_probe
                    form) — Δ vs pair_stacked = param-streaming/layout cost
  pair_glob_only    two global blocks per pair (no frame reshape) — Δ =
                    frame-shape relayout + frame-attention difference
  run_trunk_taps0   the library call itself (sanity anchor)

RTT-corrected; run on the real chip:
  env -u XLA_FLAGS JAX_PLATFORMS=axon \\
  PYTHONPATH=/root/repo:/root/.axon_site python tools/trunk_bisect.py
"""
from __future__ import annotations

import dataclasses
import json
import time

import jax
import jax.numpy as jnp

from vist3a_tpu.nn import aggregator as agg_mod
from vist3a_tpu.nn import layers as L
from vist3a_tpu.nn.aggregator import AggregatorConfig, rope_tables


def _rtt() -> float:
    cheap = jax.jit(lambda x: x + 1.0)
    x = jnp.float32(0.0)
    float(cheap(x))
    t0 = time.perf_counter()
    for _ in range(8):
        float(cheap(x))
    return (time.perf_counter() - t0) / 8


def probe(name, fn, args, rtt, iters=4):
    f = jax.jit(lambda *a: sum(jnp.sum(x.astype(jnp.float32))
                               for x in jax.tree_util.tree_leaves(fn(*a))))
    float(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        float(f(*args))
    dt = (time.perf_counter() - t0) / iters - rtt
    print(json.dumps({"probe": name, "ms": round(dt * 1e3, 2)}), flush=True)
    return dt


def main():
    impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    cfg = dataclasses.replace(AggregatorConfig(), attn_impl=impl)
    blk = cfg.block_config()
    rtt = _rtt() if jax.default_backend() == "tpu" else 0.0
    print(json.dumps({"rtt_ms": round(rtt * 1e3, 2)}), flush=True)

    b, s, gh, gw = 1, 13, 32, 32
    p = cfg.patch_start_idx + gh * gw
    c = cfg.embed_dim
    params = agg_mod.init(jax.random.key(0), cfg, jnp.bfloat16)
    tokens = jax.random.normal(jax.random.key(1), (b, s, p, c), jnp.bfloat16)
    rope_f, rope_g = rope_tables(cfg, gh, gw, n_frames=s)

    def pair(fp, gp, tok):
        return agg_mod._layer_pair(fp, gp, tok, blk, rope_f, rope_g)

    fb, gb = params["frame_blocks"], params["global_blocks"]

    def pair_stacked(fb, gb, tok):
        def body(carry, xs):
            fp, gp = xs
            out, _ = pair(fp, gp, carry)
            return out, None
        out, _ = jax.lax.scan(body, tok, (fb, gb))
        return out

    one = jax.tree_util.tree_map(lambda x: x[0], {"f": fb, "g": gb})

    def pair_closed(tok):
        def body(carry, _):
            out, _fo = pair(one["f"], one["g"], carry)
            return out, None
        out, _ = jax.lax.scan(body, tok, None, length=cfg.depth)
        return out

    def pair_glob_only(fb, gb, tok):
        def body(carry, xs):
            fp, gp = xs
            x = carry.reshape(b, s * p, c)
            x = L.block_apply(fp, x, blk, *rope_g)
            x = L.block_apply(gp, x, blk, *rope_g)
            return x.reshape(b, s, p, c), None
        out, _ = jax.lax.scan(body, tok, (fb, gb))
        return out

    def frame_only(fb, tok):
        """24× frame block with the pair's (B,S,P,C)↔(B·S,P,C) reshapes —
        Δ vs the isolated frame scan (trunk_probe block_full_frame ×24)
        isolates the carry-reshape/layout cost."""
        def body(carry, fp):
            x = carry.reshape(b * s, p, c)
            x = L.block_apply(fp, x, blk, *rope_f)
            return x.reshape(b, s, p, c), None
        out, _ = jax.lax.scan(body, tok, fb)
        return out

    def global_only(gb, tok):
        def body(carry, gp):
            x = carry.reshape(b, s * p, c)
            x = L.block_apply(gp, x, blk, *rope_g)
            return x.reshape(b, s, p, c), None
        out, _ = jax.lax.scan(body, tok, gb)
        return out

    probe("run_trunk_taps0",
          lambda ap, t: agg_mod.run_trunk(
              ap, t, dataclasses.replace(cfg, taps=()), (gh, gw),
              remat=False)[0],
          (params, tokens), rtt)
    probe("pair_stacked", pair_stacked, (fb, gb, tokens), rtt)
    probe("pair_closed", pair_closed, (tokens,), rtt)
    probe("pair_glob_only", pair_glob_only, (fb, gb, tokens), rtt)
    probe("frame_only", frame_only, (fb, tokens), rtt)
    probe("global_only", global_only, (gb, tokens), rtt)


if __name__ == "__main__":
    main()
