"""Numeric parity of `nn/wan_dit.py` vs a torch re-statement of diffusers'
`WanTransformer3DModel` (Wan 2.1 release semantics, the model the reference
consumes via `WanPipeline.from_pretrained`, `train_vdm.py:323-343`).

diffusers is not in the image, so the re-statement below follows the
published architecture exactly: FP32LayerNorm boundaries, per-block 6-chunk
adaLN from `scale_shift_table + temb`, RMSNorm-across-heads qk-norm, 3-D
RoPE with (t,h,w) head-dim split and complex128 consecutive-pair rotation,
GELU-tanh FFN, and the 2-chunk modulated head.  State-dict names follow
diffusers so the test ALSO pins the production importer
(`io/weight_import.import_wan_dit`).
"""

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax.numpy as jnp

from vist3a_tpu.io import weight_import as wi
from vist3a_tpu.nn import wan_dit

CFG = wan_dit.WanDiTConfig(dim=48, ffn_dim=96, num_layers=2, num_heads=4,
                           freq_dim=32, text_dim=24)


# --------------------------------------------------------------------------- #
# torch re-statement (diffusers transformer_wan.py semantics)                 #
# --------------------------------------------------------------------------- #
def _rope_freqs(head_dim, gt, gh, gw, theta=10000.0):
    h_dim = w_dim = 2 * (head_dim // 6)
    t_dim = head_dim - h_dim - w_dim

    def f1d(dim, n):
        inv = 1.0 / theta ** (
            torch.arange(0, dim, 2, dtype=torch.float64) / dim)
        ang = torch.outer(torch.arange(n, dtype=torch.float64), inv)
        return torch.polar(torch.ones_like(ang), ang)

    ft, fh, fw = f1d(t_dim, gt), f1d(h_dim, gh), f1d(w_dim, gw)
    freqs = torch.cat([
        ft.view(gt, 1, 1, -1).expand(gt, gh, gw, -1),
        fh.view(1, gh, 1, -1).expand(gt, gh, gw, -1),
        fw.view(1, 1, gw, -1).expand(gt, gh, gw, -1),
    ], dim=-1).reshape(1, 1, gt * gh * gw, -1)
    return freqs


def _apply_rotary(x, freqs):
    """x: (B, H, N, dh); complex consecutive-pair rotation in float64."""
    xc = torch.view_as_complex(
        x.to(torch.float64).unflatten(3, (-1, 2)).contiguous())
    return torch.view_as_real(xc * freqs).flatten(3, 4).type_as(x)


class FP32LayerNorm(nn.LayerNorm):
    def forward(self, x):
        dt = x.dtype
        return F.layer_norm(
            x.float(), self.normalized_shape,
            self.weight.float() if self.weight is not None else None,
            self.bias.float() if self.bias is not None else None,
            self.eps).to(dt)


class WanAttention(nn.Module):
    def __init__(self, dim, heads, eps):
        super().__init__()
        self.h, self.dh = heads, dim // heads
        self.to_q = nn.Linear(dim, dim)
        self.to_k = nn.Linear(dim, dim)
        self.to_v = nn.Linear(dim, dim)
        self.norm_q = nn.RMSNorm(dim, eps=eps)
        self.norm_k = nn.RMSNorm(dim, eps=eps)
        self.to_out = nn.ModuleList([nn.Linear(dim, dim)])

    def forward(self, x, ctx, rotary=None):
        q = self.norm_q(self.to_q(x))
        k = self.norm_k(self.to_k(ctx))
        v = self.to_v(ctx)
        q = q.unflatten(2, (self.h, self.dh)).transpose(1, 2)
        k = k.unflatten(2, (self.h, self.dh)).transpose(1, 2)
        v = v.unflatten(2, (self.h, self.dh)).transpose(1, 2)
        if rotary is not None:
            q = _apply_rotary(q, rotary)
            k = _apply_rotary(k, rotary)
        out = F.scaled_dot_product_attention(q, k, v)
        return self.to_out[0](out.transpose(1, 2).flatten(2))


class GELUProj(nn.Module):
    def __init__(self, dim, ffn):
        super().__init__()
        self.proj = nn.Linear(dim, ffn)

    def forward(self, x):
        return F.gelu(self.proj(x), approximate="tanh")


class WanBlock(nn.Module):
    def __init__(self, dim, ffn_dim, heads, eps):
        super().__init__()
        self.scale_shift_table = nn.Parameter(
            torch.randn(1, 6, dim) / dim ** 0.5)
        self.norm1 = FP32LayerNorm(dim, eps=eps, elementwise_affine=False)
        self.attn1 = WanAttention(dim, heads, eps)
        self.norm2 = FP32LayerNorm(dim, eps=eps, elementwise_affine=True)
        self.attn2 = WanAttention(dim, heads, eps)
        self.norm3 = FP32LayerNorm(dim, eps=eps, elementwise_affine=False)
        self.ffn = nn.Module()
        self.ffn.net = nn.ModuleList(
            [GELUProj(dim, ffn_dim), nn.Identity(), nn.Linear(ffn_dim, dim)])

    def forward(self, x, text, temb6, rotary):
        sh, sc, g, c_sh, c_sc, c_g = (
            self.scale_shift_table + temb6.float()).chunk(6, dim=1)
        y = (self.norm1(x.float()) * (1 + sc) + sh).type_as(x)
        attn = self.attn1(y, y, rotary)
        x = (x.float() + attn * g).type_as(x)
        y = self.norm2(x.float()).type_as(x)
        x = x + self.attn2(y, text)
        y = (self.norm3(x.float()) * (1 + c_sc) + c_sh).type_as(x)
        ff = self.ffn.net[2](self.ffn.net[0](y))
        return (x.float() + ff.float() * c_g).type_as(x)


class WanModel(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        d, eps = cfg.dim, cfg.eps
        self.cfg = cfg
        self.patch_embedding = nn.Conv3d(cfg.in_channels, d,
                                         cfg.patch_size,
                                         stride=cfg.patch_size)
        ce = self.condition_embedder = nn.Module()
        ce.time_embedder = nn.Module()
        ce.time_embedder.linear_1 = nn.Linear(cfg.freq_dim, d)
        ce.time_embedder.linear_2 = nn.Linear(d, d)
        ce.time_proj = nn.Linear(d, 6 * d)
        ce.text_embedder = nn.Module()
        ce.text_embedder.linear_1 = nn.Linear(cfg.text_dim, d)
        ce.text_embedder.linear_2 = nn.Linear(d, d)
        self.blocks = nn.ModuleList(
            [WanBlock(d, cfg.ffn_dim, cfg.num_heads, eps)
             for _ in range(cfg.num_layers)])
        self.norm_out = FP32LayerNorm(d, eps=eps, elementwise_affine=False)
        self.scale_shift_table = nn.Parameter(torch.randn(1, 2, d) / d ** 0.5)
        self.proj_out = nn.Linear(
            d, cfg.out_channels * math.prod(cfg.patch_size))

    def _timestep_embedding(self, t):
        half = self.cfg.freq_dim // 2
        freqs = torch.exp(-math.log(10000.0)
                          * torch.arange(half, dtype=torch.float32) / half)
        args = t.float()[:, None] * freqs[None]
        return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)

    def forward(self, latent, timestep, text):
        cfg = self.cfg
        b, c, t, h, w = latent.shape
        pt, ph, pw = cfg.patch_size
        gt, gh, gw = t // pt, h // ph, w // pw
        rotary = _rope_freqs(cfg.head_dim, gt, gh, gw, cfg.rope_theta)

        x = self.patch_embedding(latent).flatten(2).transpose(1, 2)
        ce = self.condition_embedder
        temb = ce.time_embedder.linear_2(
            F.silu(ce.time_embedder.linear_1(
                self._timestep_embedding(timestep))))
        temb6 = ce.time_proj(F.silu(temb)).unflatten(1, (6, cfg.dim))
        text = ce.text_embedder.linear_2(
            F.gelu(ce.text_embedder.linear_1(text), approximate="tanh"))
        for blk in self.blocks:
            x = blk(x, text, temb6, rotary)
        shift, scale = (self.scale_shift_table
                        + temb.float().unsqueeze(1)).chunk(2, dim=1)
        x = (self.norm_out(x.float()) * (1 + scale) + shift).type_as(x)
        x = self.proj_out(x)
        x = x.reshape(b, gt, gh, gw, pt, ph, pw, cfg.out_channels)
        x = x.permute(0, 7, 1, 4, 2, 5, 3, 6)
        return x.reshape(b, cfg.out_channels, t, h, w)


def _randomize(module, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
    return module


# --------------------------------------------------------------------------- #
# tests                                                                       #
# --------------------------------------------------------------------------- #
def test_wan_dit_forward_matches_torch_restatement():
    """Full model end to end through the production importer: pins adaLN
    chunk order, qk-norm placement, RoPE axis split, FFN activation,
    condition-embedder and head-modulation semantics."""
    ref = _randomize(WanModel(CFG)).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = wi.import_wan_dit(sd, CFG.num_layers)

    rng = np.random.default_rng(1)
    latent = rng.standard_normal((2, 16, 2, 8, 8)).astype(np.float32)
    ts = np.array([250.0, 800.0], np.float32)
    text = rng.standard_normal((2, 5, CFG.text_dim)).astype(np.float32)

    with torch.no_grad():
        ref_out = ref(torch.from_numpy(latent), torch.from_numpy(ts),
                      torch.from_numpy(text)).numpy()
    out = np.asarray(wan_dit.forward(params, jnp.asarray(latent),
                                     jnp.asarray(ts), jnp.asarray(text),
                                     CFG, remat=False))
    np.testing.assert_allclose(out, ref_out, rtol=3e-4, atol=3e-4)


def test_wan_dit_block_matches_torch_restatement():
    """Single block at a non-trivial dtype boundary (bf16 activations,
    fp32 modulation) — the deployed mixed-precision path."""
    ref = _randomize(WanModel(CFG), seed=3).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = wi.import_wan_dit(sd, CFG.num_layers)
    blk0 = __import__("jax").tree_util.tree_map(
        lambda x: x[0], params["blocks"])

    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 32, CFG.dim)).astype(np.float32)
    text = rng.standard_normal((1, 5, CFG.dim)).astype(np.float32)
    temb6 = rng.standard_normal((1, 6, CFG.dim)).astype(np.float32)
    rotary = _rope_freqs(CFG.head_dim, 2, 4, 4, CFG.rope_theta)

    with torch.no_grad():
        ref_out = ref.blocks[0](torch.from_numpy(x),
                                torch.from_numpy(text),
                                torch.from_numpy(temb6), rotary).numpy()
    rope = wan_dit.rope_tables(CFG, 2, 4, 4)
    out = np.asarray(wan_dit.block_apply(
        blk0, jnp.asarray(x), jnp.asarray(text),
        jnp.asarray(temb6), CFG, rope))
    np.testing.assert_allclose(out, ref_out, rtol=3e-4, atol=3e-4)


def test_rope_tables_match_diffusers_complex_form():
    cos, sin = wan_dit.rope_tables(CFG, 3, 4, 4)
    freqs = _rope_freqs(CFG.head_dim, 3, 4, 4, CFG.rope_theta)[0, 0]
    np.testing.assert_allclose(np.asarray(cos), freqs.real.numpy(),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sin), freqs.imag.numpy(),
                               rtol=1e-6, atol=1e-6)
