"""Functional transformer building blocks (pre-norm ViT style).

Behavioral parity targets in the reference:
  * `vggt/layers/block.py:27-108` — pre-norm Block with LayerScale,
  * `vggt/layers/attention.py:20-80` — fused attention with optional
    per-head-dim QK-LayerNorm and RoPE on q/k,
  * `vggt/layers/mlp.py` — Linear/GELU(exact)/Linear.

Design: modules are (init, apply) pairs over plain dict pytrees.  Parameter
stacks (one leading layer axis) are run with `lax.scan` so a 24-layer trunk
compiles as ONE block body; taps (intermediate outputs) are taken by
splitting the scan into segments at the tap layers — zero extra HBM traffic.
Per-block rematerialisation mirrors the reference's
`torch.utils.checkpoint` on every block (`aggregator.py:333-339`).

Weights: linear kernels are stored (in, out) — JAX convention; the torch
importer transposes.  LayerNorm runs in fp32 regardless of activation dtype
(same as torch autocast).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp

from vist3a_tpu.ops.attention import dot_product_attention
from vist3a_tpu.ops.rope import apply_rope2d


# --------------------------------------------------------------------------- #
# primitives                                                                  #
# --------------------------------------------------------------------------- #
def linear_init(key, d_in, d_out, *, bias=True, std=0.02, dtype=jnp.float32):
    w = jax.random.truncated_normal(key, -2.0, 2.0, (d_in, d_out), dtype) * std
    p = {"w": w}
    if bias:
        p["b"] = jnp.zeros((d_out,), dtype)
    return p


def linear(params, x, *, precision=None):
    out = jnp.dot(
        x,
        params["w"].astype(x.dtype),
        precision=precision,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if "b" in params:
        out = out + params["b"].astype(x.dtype)
    return out


def layer_norm_init(dim, dtype=jnp.float32):
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def layer_norm(params, x, eps=1e-5):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * params["scale"].astype(jnp.float32) + params["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


# GELU policy.  torch nn.GELU (the reference default, `vggt/layers/mlp.py`)
# is the exact erf form; erf is the single largest non-matmul cost in the
# trunk on TPU (measured at the decode shape N=13377, d=1024: 2.24 ms/block
# with erf vs 1.79 ms/block with the tanh approximation — the four matmuls
# alone are 1.61 ms).  For BF16 activations the tanh form is used: its
# deviation from erf (≤1.1e-3 absolute, in the saturating tails where
# |gelu(x)| ≥ 1) is below the 2⁻⁸ rounding the bf16 activations already
# carry — measured end to end (`tests/test_gelu_policy.py`): the bf16
# trunk's final depth moves 5.2e-6 mean / 3.1e-5 max relative under
# tanh-vs-erf, vs the 1.9e-5 / 8.9e-5 the bf16 cast itself already moved it
# from fp32 (3.7× below the quantization noise).  fp32 activations
# (heads, camera trunk, all parity tests) always take the exact erf path.
_GELU_BF16 = "tanh"


def set_bf16_gelu(mode: str) -> None:
    """'tanh' (default, fast) or 'exact' — GELU form for bf16 activations.

    The mode is read at TRACE time and is NOT part of any jit cache key:
    executables compiled before a mode change keep the old GELU form.  Set
    it before the first trace; to make a change take effect on already-
    compiled functions, the caches are dropped here when the mode actually
    changes (cheap at setup time, wrong-answer-preventing after)."""
    global _GELU_BF16
    assert mode in ("tanh", "exact"), mode
    if mode != _GELU_BF16:
        _GELU_BF16 = mode
        jax.clear_caches()


def gelu(x):
    if _GELU_BF16 == "tanh" and x.dtype == jnp.bfloat16:
        return jax.nn.gelu(x, approximate=True)
    # exact (erf) GELU — torch nn.GELU default used throughout the reference
    return jax.nn.gelu(x, approximate=False)


def mlp_init(key, dim, hidden, *, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {
        "fc1": linear_init(k1, dim, hidden, dtype=dtype),
        "fc2": linear_init(k2, hidden, dim, dtype=dtype),
    }


def mlp(params, x):
    return linear(params["fc2"], gelu(linear(params["fc1"], x)))


# --------------------------------------------------------------------------- #
# transformer block                                                           #
# --------------------------------------------------------------------------- #
@dataclasses.dataclass(frozen=True)
class BlockConfig:
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qk_norm: bool = False
    ln_eps: float = 1e-5          # aggregator blocks use torch default 1e-5
    layerscale: float | None = None  # None → no LayerScale
    use_rope: bool = False
    attn_impl: str = "auto"

    @property
    def head_dim(self):
        return self.dim // self.num_heads

    @property
    def hidden(self):
        return int(self.dim * self.mlp_ratio)


def block_init(key, cfg: BlockConfig, dtype=jnp.float32):
    keys = jax.random.split(key, 4)
    p = {
        "norm1": layer_norm_init(cfg.dim, dtype),
        "attn": {
            "qkv": linear_init(keys[0], cfg.dim, 3 * cfg.dim, dtype=dtype),
            "proj": linear_init(keys[1], cfg.dim, cfg.dim, dtype=dtype),
        },
        "norm2": layer_norm_init(cfg.dim, dtype),
        "mlp": mlp_init(keys[2], cfg.dim, cfg.hidden, dtype=dtype),
    }
    if cfg.qk_norm:
        p["attn"]["q_norm"] = layer_norm_init(cfg.head_dim, dtype)
        p["attn"]["k_norm"] = layer_norm_init(cfg.head_dim, dtype)
    if cfg.layerscale is not None:
        p["ls1"] = {"gamma": jnp.full((cfg.dim,), cfg.layerscale, dtype)}
        p["ls2"] = {"gamma": jnp.full((cfg.dim,), cfg.layerscale, dtype)}
    return p


def attention_sublayer(params, x, cfg: BlockConfig, rope_cos=None,
                       rope_sin=None, key_valid=None):
    b, n, _ = x.shape
    h, dh = cfg.num_heads, cfg.head_dim
    qkv = linear(params["qkv"], x).reshape(b, n, 3, h, dh)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    if "q_norm" in params:
        # per-head-dim LayerNorm, torch default eps (attention.py:42-43)
        q = layer_norm(params["q_norm"], q, 1e-5)
        k = layer_norm(params["k_norm"], k, 1e-5)
    if cfg.use_rope and rope_cos is not None:
        cs, sn = rope_cos.astype(q.dtype), rope_sin.astype(q.dtype)
        # (B,N,H,D): rotate over N — move head axis in the cos/sin broadcast
        q = apply_rope2d(q.swapaxes(1, 2), cs, sn).swapaxes(1, 2)
        k = apply_rope2d(k.swapaxes(1, 2), cs, sn).swapaxes(1, 2)
    o = dot_product_attention(q, k, v, impl=cfg.attn_impl,
                              key_valid=key_valid)
    return linear(params["proj"], o.reshape(b, n, cfg.dim))


def block_apply(params, x, cfg: BlockConfig, rope_cos=None, rope_sin=None,
                key_valid=None):
    h = layer_norm(params["norm1"], x, cfg.ln_eps)
    h = attention_sublayer(params["attn"], h, cfg, rope_cos, rope_sin,
                           key_valid)
    if "ls1" in params:
        h = h * params["ls1"]["gamma"].astype(h.dtype)
    x = x + h
    h = layer_norm(params["norm2"], x, cfg.ln_eps)
    h = mlp(params["mlp"], h)
    if "ls2" in params:
        h = h * params["ls2"]["gamma"].astype(h.dtype)
    return x + h


# --------------------------------------------------------------------------- #
# stacked blocks + segmented scan                                             #
# --------------------------------------------------------------------------- #
def stack_init(key, cfg: BlockConfig, depth: int, dtype=jnp.float32):
    """Init `depth` blocks with a leading layer axis on every leaf."""
    keys = jax.random.split(key, depth)
    blocks = [block_init(k, cfg, dtype) for k in keys]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)


def slice_stack(stacked, start: int, stop: int):
    return jax.tree_util.tree_map(lambda p: p[start:stop], stacked)


def take_layer(stacked, i: int):
    return jax.tree_util.tree_map(lambda p: p[i], stacked)


def scan_blocks(
    stacked,
    x,
    cfg: BlockConfig,
    *,
    rope_cos=None,
    rope_sin=None,
    remat: bool = True,
):
    """Run a stack of blocks with lax.scan (one compiled body)."""
    depth = jax.tree_util.tree_leaves(stacked)[0].shape[0]
    if depth == 0:
        return x

    def body(carry, layer_params):
        fn = lambda p, c: block_apply(p, c, cfg, rope_cos, rope_sin)
        if remat:
            fn = jax.checkpoint(fn)
        return fn(layer_params, carry), None

    out, _ = jax.lax.scan(body, x, stacked)
    return out


def scan_blocks_with_taps(
    stacked,
    x,
    cfg: BlockConfig,
    taps: Sequence[int],
    *,
    rope_cos=None,
    rope_sin=None,
    remat: bool = True,
):
    """Run the stack, returning (final, [output after layer t for t in taps]).

    Implemented by splitting the scan at the tap layers, so tapping is free.
    """
    taps = sorted(taps)
    outs = []
    start = 0
    for t in taps:
        x = scan_blocks(slice_stack(stacked, start, t + 1), x, cfg,
                        rope_cos=rope_cos, rope_sin=rope_sin, remat=remat)
        outs.append(x)
        start = t + 1
    depth = jax.tree_util.tree_leaves(stacked)[0].shape[0]
    x = scan_blocks(slice_stack(stacked, start, depth), x, cfg,
                    rope_cos=rope_cos, rope_sin=rope_sin, remat=remat)
    return x, outs
