"""Ground the 14B DiT numbers in silicon (VERDICT r4 #7).

One real v5e chip can't hold the full 14B model (27 GB bf16), but it CAN
run individual WanTransformerBlocks (dim 5120, ffn 13824, 40 heads —
`nn/wan_dit.WAN_14B`) at the deployed sequence (1×16×4×64×64 latent,
patch (1,2,2) → 4096 tokens; 226 text tokens).  This probe measures

  * block fwd, CFG batch B=2 (the denoise-step body);
  * block fwd+bwd under per-block remat with the in-body LoRA r8 merge
    (the SFT-step body, B=1);

as an 8-trip `lax.scan` over 8 stacked copies of the block (amortizes
dispatch; params stream from HBM exactly as the real 40-deep scan does),
then extrapolates full-model step times for the TP=2/TP=4 deployments whose
HBM fit is proven by `tools/aot_check.py`.  Extrapolation assumes perfect
TP compute scaling and adds nothing for ICI collectives (two all-reduces of
the (B,4096,5120) activations per block ride 45 GB/s+ ICI ≈ 0.4 ms/block at
B=2 bf16) — both stated in the output so the PARITY table can quote the
assumption.

Run:  env -u XLA_FLAGS JAX_PLATFORMS=axon \\
      PYTHONPATH=/root/repo:/root/.axon_site python tools/dit14b_probe.py
"""
from __future__ import annotations

import functools
import json
import time

import jax
import jax.numpy as jnp

from vist3a_tpu.nn import wan_dit
from vist3a_tpu.stitch import lora as lora_mod

TRIPS = 8


def _rtt() -> float:
    cheap = jax.jit(lambda x: x + 1.0)
    x = jnp.float32(0.0)
    float(cheap(x))
    t0 = time.perf_counter()
    for _ in range(8):
        float(cheap(x))
    return (time.perf_counter() - t0) / 8


def _time(f, *args, iters=3, rtt=0.0):
    float(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        float(f(*args))
    return (time.perf_counter() - t0) / iters - rtt


def main():
    cfg = wan_dit.WAN_14B
    rtt = _rtt() if jax.default_backend() == "tpu" else 0.0
    print(json.dumps({"rtt_ms": round(rtt * 1e3, 2),
                      "backend": jax.default_backend()}), flush=True)

    gt, gh, gw = 4, 32, 32
    n = gt * gh * gw
    ltxt = 226
    rope = wan_dit.rope_tables(cfg, gt, gh, gw)

    block = wan_dit.block_init(jax.random.key(0), cfg, jnp.bfloat16)
    stacked = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (TRIPS,) + x.shape), block)

    def run_fwd(b):
        x = jax.random.normal(jax.random.key(1), (b, n, cfg.dim),
                              jnp.bfloat16)
        text = jax.random.normal(jax.random.key(2), (b, ltxt, cfg.dim),
                                 jnp.bfloat16)
        temb6 = jax.random.normal(jax.random.key(3), (b, 6, cfg.dim),
                                  jnp.float32)

        def fwd(params, x):
            def body(c, p):
                return wan_dit.block_apply(p, c, text, temb6, cfg, rope), None
            out, _ = jax.lax.scan(body, x, params)
            return jnp.sum(out.astype(jnp.float32))

        f = jax.jit(fwd)
        dt = _time(f, stacked, x, rtt=rtt)
        per = dt / TRIPS * 1e3
        print(json.dumps({"probe": f"block_fwd_b{b}",
                          "ms_per_block": round(per, 3)}), flush=True)
        return per

    fwd_b2 = run_fwd(2)
    fwd_b1 = run_fwd(1)

    # SFT body: fwd+bwd wrt LoRA r8 factors, merge in-body, remat per block
    lcfg = lora_mod.parse_lora_mode(
        "r8,a16,d0.0,f0,t" + "|".join(
            ("attn1/q", "attn1/k", "attn1/v", "attn1/o",
             "attn2/q", "attn2/k", "attn2/v", "attn2/o")))
    lora1 = lora_mod.init_lora(jax.random.key(4), stacked, lcfg)
    merge_fn = functools.partial(lora_mod.merge_lora, cfg=lcfg)

    x1 = jax.random.normal(jax.random.key(5), (1, n, cfg.dim), jnp.bfloat16)
    text1 = jax.random.normal(jax.random.key(6), (1, ltxt, cfg.dim),
                              jnp.bfloat16)
    temb61 = jax.random.normal(jax.random.key(7), (1, 6, cfg.dim),
                               jnp.float32)

    def loss(lora, params, x):
        # params ride as an ARGUMENT: a closure constant would bake the
        # 5.6 GB broadcast stack into the program and ship it through the
        # remote compiler
        @jax.checkpoint
        def body(c, xs):
            p, lp = xs
            return wan_dit.block_apply(merge_fn(p, lp), c, text1, temb61,
                                       cfg, rope), None
        out, _ = jax.lax.scan(body, x, (params, lora))
        return jnp.sum(out.astype(jnp.float32))

    g = jax.jit(lambda lora, params, x: sum(
        jnp.sum(v.astype(jnp.float32) ** 2)
        for v in jax.tree_util.tree_leaves(jax.grad(loss)(lora, params, x))))
    dt = _time(g, lora1, stacked, x1, rtt=rtt)
    bwd_b1 = dt / TRIPS * 1e3
    print(json.dumps({"probe": "block_fwdbwd_lora_b1",
                      "ms_per_block": round(bwd_b1, 3)}), flush=True)

    # full-model extrapolations (40 blocks; head/patchify/text-embed ≈ one
    # extra block; ICI: 2 all-reduces/block of the (B,N,5120) activation)
    layers = cfg.num_layers
    for tp in (2, 4):
        act_gb = 2 * 2 * n * cfg.dim * 2 / 1e9        # B=2 bf16, 2 ars
        ici_ms = act_gb / 45.0 * 1e3                  # per block, 45 GB/s
        denoise = layers * (fwd_b2 / tp + ici_ms) + fwd_b2
        sft = layers * (bwd_b1 / tp + 3 * ici_ms / 2) + bwd_b1
        print(json.dumps({
            "extrapolation": f"TP={tp}",
            "denoise_cfg_step_ms": round(denoise, 1),
            "sft_fwdbwd_step_ms": round(sft, 1),
            "assumes": "perfect TP compute scaling; ICI 45GB/s; "
                       "+1 block for head/patchify"}), flush=True)


if __name__ == "__main__":
    main()
