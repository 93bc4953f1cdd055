"""Wan 2.1 text-to-video diffusion transformer (DiT), TPU-native.

Parity target: diffusers `WanTransformer3DModel` as consumed by the
reference (`WanPipeline.from_pretrained`, `inference_t23d.py:73`,
`train_vdm.py:323-343`; FSDP-wrapped `WanTransformerBlock`s,
`train_vdm.py:296-310`; PEFT LoRA on attn q/k/v/out of attn1+attn2,
`train_vdm.py:370-388`).  Architecture (Wan 2.1 release):

  * patchify: conv3d k=s=(1,2,2), 16 → dim channels;
  * condition embedder: sinusoidal timestep (freq_dim=256, flip_sin_to_cos,
    shift 0) → MLP(dim) → SiLU → Linear(dim, 6·dim) giving the per-step adaLN
    vector; text: Linear(4096, dim) → GELU(tanh) → Linear(dim, dim);
  * N blocks: adaLN(6 chunks, per-block `scale_shift_table` + time proj) over
    {self-attn with 3D RoPE, text cross-attn (fp32 affine LN), gated MLP
    (GELU-tanh)}; q/k RMSNorm across the full inner dim;
  * 3D RoPE: head_dim split (t, h, w) = (d−4⌊d/6⌋, 2⌊d/6⌋, 2⌊d/6⌋), θ=10000,
    complex rotation over consecutive (even, odd) pairs;
  * head: fp32 LN (no affine) modulated by a final 2-chunk scale_shift_table
    + linear to 16·1·2·2, unpatchify.

Configs: 1.3B (dim 1536, 30 layers, 12 heads) and 14B (dim 5120, 40 layers,
40 heads).  LayerNorms run in fp32 regardless of activation dtype (diffusers
`FP32LayerNorm`).  RoPE tables are host-precomputed in float64 then cast —
the reference rotates in complex128; fp32 tables are within 1e-7 of that.

Tensor-parallel ready: `param_shardings` returns a PartitionSpec tree that
shards attention heads and MLP hidden over the mesh "model" axis (Megatron
layout — one all-reduce per attn/MLP pair, inserted by GSPMD).  Blocks are
stacked for `lax.scan` (layer axis is never sharded).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from vist3a_tpu.core import mesh as mesh_mod
from vist3a_tpu.ops.attention import dot_product_attention


@dataclasses.dataclass(frozen=True)
class WanDiTConfig:
    dim: int = 1536
    ffn_dim: int = 8960
    num_layers: int = 30
    num_heads: int = 12
    in_channels: int = 16
    out_channels: int = 16
    text_dim: int = 4096
    freq_dim: int = 256
    patch_size: tuple = (1, 2, 2)
    eps: float = 1e-6
    rope_max_seq_len: int = 1024
    rope_theta: float = 10000.0
    # self-attention kernel selection ("auto" resolves by the trace-time
    # backend — AOT topology compiles pin "pallas" explicitly since their
    # trace-time backend is cpu while the TARGET is TPU)
    attn_impl: str = "auto"

    @property
    def head_dim(self) -> int:
        return self.dim // self.num_heads


WAN_1_3B = WanDiTConfig()
WAN_14B = WanDiTConfig(dim=5120, ffn_dim=13824, num_layers=40, num_heads=40)


def config_from_model_id(model_id: str) -> WanDiTConfig:
    """`--model_id` → DiT scale, shared by the inference AND training CLIs
    (the reference selects the Diffusers pipeline by the same flag,
    `utils/argument.py:400`, `inference_t23d.py:55`, `train_vdm.py:323`)."""
    return WAN_14B if "14B" in str(model_id) else WAN_1_3B


# --------------------------------------------------------------------------- #
# init                                                                        #
# --------------------------------------------------------------------------- #
def _linear_init(key, d_in, d_out, dtype):
    bound = 1.0 / np.sqrt(d_in)
    wk, bk = jax.random.split(key)
    return {"w": jax.random.uniform(wk, (d_in, d_out), dtype, -bound, bound),
            "b": jax.random.uniform(bk, (d_out,), dtype, -bound, bound)}


def block_init(key, cfg: WanDiTConfig, dtype=jnp.float32) -> dict:
    keys = jax.random.split(key, 10)
    d, f = cfg.dim, cfg.ffn_dim
    return {
        "scale_shift_table":
            jax.random.normal(keys[0], (6, d), dtype) / d ** 0.5,
        "attn1": {
            "q": _linear_init(keys[1], d, d, dtype),
            "k": _linear_init(keys[2], d, d, dtype),
            "v": _linear_init(keys[3], d, d, dtype),
            "o": _linear_init(keys[4], d, d, dtype),
            "norm_q": jnp.ones((d,), dtype),
            "norm_k": jnp.ones((d,), dtype),
        },
        "attn2": {
            "q": _linear_init(keys[5], d, d, dtype),
            "k": _linear_init(keys[6], d, d, dtype),
            "v": _linear_init(keys[7], d, d, dtype),
            "o": _linear_init(keys[8], d, d, dtype),
            "norm_q": jnp.ones((d,), dtype),
            "norm_k": jnp.ones((d,), dtype),
        },
        # cross_attn_norm=True → affine fp32 LN before attn2
        "norm2": {"scale": jnp.ones((d,), dtype),
                  "bias": jnp.zeros((d,), dtype)},
        "ffn": {"fc1": _linear_init(keys[9], d, f, dtype),
                "fc2": _linear_init(jax.random.fold_in(key, 99), f, d,
                                    dtype)},
    }


def init(key, cfg: WanDiTConfig = WAN_1_3B, dtype=jnp.float32) -> dict:
    keys = jax.random.split(key, 8)
    d = cfg.dim
    pt, ph, pw = cfg.patch_size
    blocks = [block_init(k, cfg, dtype)
              for k in jax.random.split(keys[0], cfg.num_layers)]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)
    patch_k = jax.random.uniform(
        keys[1], (pt, ph, pw, cfg.in_channels, d), dtype,
        -1.0 / np.sqrt(cfg.in_channels * pt * ph * pw),
        1.0 / np.sqrt(cfg.in_channels * pt * ph * pw))
    return {
        "patch_embedding": {"kernel": patch_k,
                            "bias": jnp.zeros((d,), dtype)},
        "time_embedder": {
            "fc1": _linear_init(keys[2], cfg.freq_dim, d, dtype),
            "fc2": _linear_init(keys[3], d, d, dtype),
        },
        "time_proj": _linear_init(keys[4], d, 6 * d, dtype),
        "text_embedder": {
            "fc1": _linear_init(keys[5], cfg.text_dim, d, dtype),
            "fc2": _linear_init(keys[6], d, d, dtype),
        },
        "blocks": stacked,
        "scale_shift_table":
            jax.random.normal(keys[7], (2, d), dtype) / d ** 0.5,
        "proj_out": _linear_init(jax.random.fold_in(key, 7), d,
                                 cfg.out_channels * pt * ph * pw, dtype),
    }


# --------------------------------------------------------------------------- #
# pieces                                                                      #
# --------------------------------------------------------------------------- #
def _linear(p, x):
    out = jnp.dot(x, p["w"].astype(x.dtype),
                  preferred_element_type=jnp.float32).astype(x.dtype)
    return out + p["b"].astype(x.dtype)


def _fp32_ln(x, eps, scale=None, bias=None):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    if scale is not None:
        y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y


def _rms_across_heads(scale, x, eps):
    """diffusers qk_norm="rms_norm_across_heads": RMSNorm over the FULL
    inner dim (before the head split)."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps)
            * scale.astype(jnp.float32)).astype(x.dtype)


def timestep_embedding(t, freq_dim: int):
    """diffusers `Timesteps(freq_dim, flip_sin_to_cos=True, shift=0)`:
    returns [cos | sin] of t · exp(−ln 1e4 · i/half)."""
    half = freq_dim // 2
    freqs = jnp.exp(-math.log(10000.0)
                    * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def rope_tables(cfg: WanDiTConfig, grid_t: int, grid_h: int, grid_w: int):
    """(cos, sin) tables (N, head_dim/2), N = t·h·w row-major (t, h, w).

    Axis split h=w=2⌊d/6⌋ pairs… in PAIR units: t gets d/2 − 2·(d/6-ish).
    Host-side float64 angles (the reference uses complex128)."""
    d = cfg.head_dim
    h_pairs = d // 6          # pairs per spatial axis (2·(d//6) dims)
    w_pairs = d // 6
    t_pairs = d // 2 - h_pairs - w_pairs

    def axis_freqs(n_pos, pairs):
        inv = 1.0 / (cfg.rope_theta
                     ** (np.arange(0, pairs, dtype=np.float64) / pairs))
        return np.outer(np.arange(n_pos, dtype=np.float64), inv)  # (n, pairs)

    ft = axis_freqs(grid_t, t_pairs)
    fh = axis_freqs(grid_h, h_pairs)
    fw = axis_freqs(grid_w, w_pairs)
    ang = np.concatenate([
        np.broadcast_to(ft[:, None, None, :],
                        (grid_t, grid_h, grid_w, t_pairs)),
        np.broadcast_to(fh[None, :, None, :],
                        (grid_t, grid_h, grid_w, h_pairs)),
        np.broadcast_to(fw[None, None, :, :],
                        (grid_t, grid_h, grid_w, w_pairs)),
    ], axis=-1).reshape(grid_t * grid_h * grid_w, d // 2)
    return (jnp.asarray(np.cos(ang), jnp.float32),
            jnp.asarray(np.sin(ang), jnp.float32))


def apply_rope(x, cos, sin):
    """x: (B, N, H, D); consecutive-pair complex rotation.

    Pairs are split by reshape, not [0::2] lane-strided slices — strided
    lane access is slow on TPU (measured 0.3 ms/block at the 1.3B denoise
    shape vs the reshape form)."""
    xf = x.astype(jnp.float32)
    b, n, h, d = xf.shape
    pair = xf.reshape(b, n, h, d // 2, 2)
    xr, xi = pair[..., 0], pair[..., 1]
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    out = jnp.stack([xr * c - xi * s, xr * s + xi * c], axis=-1)
    return out.reshape(x.shape).astype(x.dtype)


def _attention(p, x, context, cfg: WanDiTConfig, rope=None):
    b, n, d = x.shape
    h, dh = cfg.num_heads, cfg.head_dim
    if context is x:
        # self-attention: one fused qkv matmul (the per-call weight concat
        # is a few MB and XLA schedules it off the critical path)
        wqkv = jnp.concatenate([p[k]["w"] for k in ("q", "k", "v")], axis=1)
        bqkv = jnp.concatenate([p[k]["b"] for k in ("q", "k", "v")], axis=0)
        qkv = jnp.dot(x, wqkv.astype(x.dtype),
                      preferred_element_type=jnp.float32).astype(x.dtype) \
            + bqkv.astype(x.dtype)
        q, k, v = jnp.split(qkv, 3, axis=-1)
    else:
        q = _linear(p["q"], x)
        k = _linear(p["k"], context)
        v = _linear(p["v"], context)
    q = _rms_across_heads(p["norm_q"], q, cfg.eps).reshape(b, n, h, dh)
    k = _rms_across_heads(p["norm_k"], k, cfg.eps).reshape(
        b, context.shape[1], h, dh)
    v = v.reshape(b, context.shape[1], h, dh)
    if rope is not None:
        q = apply_rope(q, *rope)
        k = apply_rope(k, *rope)
    # short-kv cross-attention is faster on the fused-XLA path than the
    # flash kernel (226-token text: 1.50 vs 1.87 ms/block measured)
    impl = cfg.attn_impl if context is x else "xla"
    out = dot_product_attention(q, k, v, impl=impl)
    return _linear(p["o"], out.reshape(b, n, d))


def block_apply(p, x, text, temb6, cfg: WanDiTConfig, rope):
    """x (B,N,D), text (B,L,D), temb6 (B,6,D) fp32 — diffusers
    WanTransformerBlock.forward order, fp32 residual accumulation."""
    mods = mesh_mod.pin(p["scale_shift_table"].astype(jnp.float32)[None]
                        + temb6)                       # (B,6,D) fp32
    sh_msa, sc_msa, g_msa, sh_mlp, sc_mlp, g_mlp = [
        mods[:, i][:, None] for i in range(6)]

    y = (_fp32_ln(x, cfg.eps) * (1 + sc_msa) + sh_msa).astype(x.dtype)
    attn = _attention(p["attn1"], y, y, cfg, rope=rope)
    x = (x.astype(jnp.float32)
         + attn.astype(jnp.float32) * g_msa).astype(x.dtype)

    y = _fp32_ln(x, cfg.eps, p["norm2"]["scale"],
                 p["norm2"]["bias"]).astype(x.dtype)
    x = x + _attention(p["attn2"], y, text, cfg)

    y = (_fp32_ln(x, cfg.eps) * (1 + sc_mlp) + sh_mlp).astype(x.dtype)
    ff = _linear(p["ffn"]["fc2"],
                 jax.nn.gelu(_linear(p["ffn"]["fc1"], y), approximate=True))
    x = (x.astype(jnp.float32)
         + ff.astype(jnp.float32) * g_mlp).astype(x.dtype)
    return x


# --------------------------------------------------------------------------- #
# forward                                                                     #
# --------------------------------------------------------------------------- #
def forward(params, latent, timestep, text_embeds,
            cfg: WanDiTConfig = WAN_1_3B, *, remat: bool = True,
            lora_blocks=None, merge_fn=None):
    """latent: (B, C=16, T, H, W) — model-input (normalized) latent;
    timestep: (B,) float (sigma·1000 under flow matching);
    text_embeds: (B, L, 4096) from UMT5.  Returns predicted velocity,
    (B, C, T, H, W).

    lora_blocks/merge_fn: optional stacked LoRA factors for
    `params["blocks"]` and the merge callable (e.g.
    `functools.partial(stitch.lora.merge_lora, cfg=...)`).  When given, the
    merge runs INSIDE the per-block remat, so merged q/k/v/o weights exist
    only transiently per layer instead of as a full stacked copy — at 14B
    that copy is 8.4 GB global (~1 GB/chip on a 2×4 mesh) of temp the
    eager-merge form keeps live through fwd+bwd; it pushed the tp_fsdp SFT
    program past v5e HBM in the r4 AOT gate.  Backward recomputes the merge
    per block (rank-8 matmuls, negligible)."""
    b, c, t, hh, ww = latent.shape
    pt, ph, pw = cfg.patch_size
    gt, gh, gw = t // pt, hh // ph, ww // pw

    x = jnp.moveaxis(latent, 1, -1)                    # (B,T,H,W,C)
    kern = params["patch_embedding"]["kernel"].astype(x.dtype)
    x = jax.lax.conv_general_dilated(
        x, kern, cfg.patch_size, "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)
    x = x + params["patch_embedding"]["bias"].astype(x.dtype)
    x = x.reshape(b, gt * gh * gw, cfg.dim)

    # condition embedder (fp32 end to end, like diffusers)
    te = timestep_embedding(timestep, cfg.freq_dim)
    temb = _linear(params["time_embedder"]["fc2"],
                   jax.nn.silu(_linear(params["time_embedder"]["fc1"],
                                       te.astype(jnp.float32))))
    temb6 = _linear(params["time_proj"],
                    jax.nn.silu(temb)).reshape(b, 6, cfg.dim)
    # pin the tiny fp32 adaLN tensor to a fixed (replicated) layout: without
    # it GSPMD flips it between layouts across the remat'd scan fwd/bwd and
    # falls back to "Involuntary full rematerialization" per layer
    temb6 = mesh_mod.pin(temb6.astype(jnp.float32))
    temb = mesh_mod.pin(temb)
    text = _linear(params["text_embedder"]["fc2"],
                   jax.nn.gelu(_linear(params["text_embedder"]["fc1"],
                                       text_embeds.astype(x.dtype)),
                               approximate=True))

    rope = rope_tables(cfg, gt, gh, gw)

    if lora_blocks is None:
        def apply_one(layer_params, carry):
            return block_apply(layer_params, carry, text, temb6, cfg, rope)
        xs = params["blocks"]
    else:
        def apply_one(layer_xs, carry):
            layer_params, layer_lora = layer_xs
            return block_apply(merge_fn(layer_params, layer_lora), carry,
                               text, temb6, cfg, rope)
        xs = (params["blocks"], lora_blocks)

    if remat:
        apply_one = jax.checkpoint(apply_one)

    def body(carry, layer_xs):
        return apply_one(layer_xs, carry), None

    x, _ = jax.lax.scan(body, x, xs)

    # head: 2-chunk modulation by the UNPROJECTED time embedding
    mods = mesh_mod.pin(params["scale_shift_table"].astype(jnp.float32)[None]
                        + temb.astype(jnp.float32)[:, None])
    shift, scale = mods[:, 0][:, None], mods[:, 1][:, None]
    x = (_fp32_ln(x, cfg.eps) * (1 + scale) + shift).astype(x.dtype)
    x = _linear(params["proj_out"], x)

    x = x.reshape(b, gt, gh, gw, pt, ph, pw, cfg.out_channels)
    x = x.transpose(0, 7, 1, 4, 2, 5, 3, 6)            # B,C,gt,pt,gh,ph,gw,pw
    return x.reshape(b, cfg.out_channels, t, hh, ww)


# --------------------------------------------------------------------------- #
# tensor-parallel shardings                                                   #
# --------------------------------------------------------------------------- #
def param_shardings(cfg: WanDiTConfig = WAN_1_3B):
    """PartitionSpec tree for TP over the mesh "model" axis (Megatron
    layout): q/k/v and ffn.fc1 shard their OUTPUT dim, o and ffn.fc2 their
    INPUT dim; everything else replicated.  The stacked layer axis (leading)
    is never sharded.  Apply with
    `jax.tree.map(lambda s: NamedSharding(mesh, s), param_shardings(cfg),
    is_leaf=lambda x: isinstance(x, P))`."""
    from jax.sharding import PartitionSpec as P

    col = {"w": P(None, None, "model"), "b": P(None, "model")}  # stacked
    row = {"w": P(None, "model", None), "b": P(None)}
    attn = {"q": col, "k": col, "v": col, "o": row,
            "norm_q": P(None), "norm_k": P(None)}
    blocks = {
        "scale_shift_table": P(None),
        "attn1": attn, "attn2": attn,
        "norm2": {"scale": P(None), "bias": P(None)},
        "ffn": {"fc1": col, "fc2": row},
    }
    rep2 = {"w": P(), "b": P()}
    return {
        "patch_embedding": {"kernel": P(), "bias": P()},
        "time_embedder": {"fc1": rep2, "fc2": rep2},
        "time_proj": rep2,
        "text_embedder": {"fc1": rep2, "fc2": rep2},
        "blocks": blocks,
        "scale_shift_table": P(),
        "proj_out": rep2,
    }
