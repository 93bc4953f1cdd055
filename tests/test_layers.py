"""Parity tests: functional blocks vs a torch re-statement of the reference
(`vggt/layers/block.py`, `vggt/layers/attention.py`)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from vist3a_tpu.nn.layers import (
    BlockConfig,
    block_apply,
    block_init,
    scan_blocks,
    scan_blocks_with_taps,
    stack_init,
)


class TorchRefBlock(torch.nn.Module):
    """Reference block semantics (pre-norm, LayerScale, per-head QK-norm)."""

    def __init__(self, dim, heads, qk_norm, ls_init):
        super().__init__()
        self.h = heads
        self.dh = dim // heads
        self.norm1 = torch.nn.LayerNorm(dim)  # torch default eps 1e-5
        self.qkv = torch.nn.Linear(dim, 3 * dim)
        self.q_norm = torch.nn.LayerNorm(self.dh) if qk_norm else torch.nn.Identity()
        self.k_norm = torch.nn.LayerNorm(self.dh) if qk_norm else torch.nn.Identity()
        self.proj = torch.nn.Linear(dim, dim)
        self.ls1 = torch.nn.Parameter(torch.full((dim,), ls_init)) if ls_init else None
        self.norm2 = torch.nn.LayerNorm(dim)
        self.fc1 = torch.nn.Linear(dim, dim * 4)
        self.fc2 = torch.nn.Linear(dim * 4, dim)
        self.ls2 = torch.nn.Parameter(torch.full((dim,), ls_init)) if ls_init else None

    def forward(self, x):
        B, N, C = x.shape
        h = self.norm1(x)
        qkv = self.qkv(h).reshape(B, N, 3, self.h, self.dh).permute(2, 0, 3, 1, 4)
        q, k, v = qkv.unbind(0)
        q, k = self.q_norm(q), self.k_norm(k)
        a = torch.nn.functional.scaled_dot_product_attention(q, k, v)
        a = self.proj(a.transpose(1, 2).reshape(B, N, C))
        if self.ls1 is not None:
            a = a * self.ls1
        x = x + a
        m = self.fc2(torch.nn.functional.gelu(self.fc1(self.norm2(x))))
        if self.ls2 is not None:
            m = m * self.ls2
        return x + m


def _copy_params_to_torch(p, tb):
    def t(a):
        return torch.from_numpy(np.asarray(a, dtype=np.float32))

    with torch.no_grad():
        tb.norm1.weight.copy_(t(p["norm1"]["scale"]))
        tb.norm1.bias.copy_(t(p["norm1"]["bias"]))
        tb.qkv.weight.copy_(t(p["attn"]["qkv"]["w"]).T)
        tb.qkv.bias.copy_(t(p["attn"]["qkv"]["b"]))
        tb.proj.weight.copy_(t(p["attn"]["proj"]["w"]).T)
        tb.proj.bias.copy_(t(p["attn"]["proj"]["b"]))
        if "q_norm" in p["attn"]:
            tb.q_norm.weight.copy_(t(p["attn"]["q_norm"]["scale"]))
            tb.q_norm.bias.copy_(t(p["attn"]["q_norm"]["bias"]))
            tb.k_norm.weight.copy_(t(p["attn"]["k_norm"]["scale"]))
            tb.k_norm.bias.copy_(t(p["attn"]["k_norm"]["bias"]))
        if "ls1" in p:
            tb.ls1.copy_(t(p["ls1"]["gamma"]))
            tb.ls2.copy_(t(p["ls2"]["gamma"]))
        tb.norm2.weight.copy_(t(p["norm2"]["scale"]))
        tb.norm2.bias.copy_(t(p["norm2"]["bias"]))
        tb.fc1.weight.copy_(t(p["mlp"]["fc1"]["w"]).T)
        tb.fc1.bias.copy_(t(p["mlp"]["fc1"]["b"]))
        tb.fc2.weight.copy_(t(p["mlp"]["fc2"]["w"]).T)
        tb.fc2.bias.copy_(t(p["mlp"]["fc2"]["b"]))


def test_block_matches_torch_reference():
    dim, heads = 64, 4
    cfg = BlockConfig(dim=dim, num_heads=heads, qk_norm=True, layerscale=0.01,
                      attn_impl="xla")
    # random (non-degenerate) weights
    params = block_init(jax.random.key(1), cfg)
    params = jax.tree_util.tree_map(
        lambda x: x + 0.02 * jax.random.normal(jax.random.key(2), x.shape), params
    )
    tb = TorchRefBlock(dim, heads, qk_norm=True, ls_init=0.01)
    _copy_params_to_torch(params, tb)

    x = np.random.default_rng(3).standard_normal((2, 10, dim)).astype(np.float32)
    out = block_apply(params, jnp.asarray(x), cfg)
    with torch.no_grad():
        ref = tb(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_scan_matches_python_loop():
    cfg = BlockConfig(dim=32, num_heads=4, layerscale=1.0, attn_impl="xla")
    stacked = stack_init(jax.random.key(0), cfg, depth=6)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 8, 32)), jnp.float32)

    seq = x
    for i in range(6):
        p = jax.tree_util.tree_map(lambda a: a[i], stacked)
        seq = block_apply(p, seq, cfg)

    out = scan_blocks(stacked, x, cfg, remat=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(seq), rtol=1e-5, atol=1e-5)

    final, taps = scan_blocks_with_taps(stacked, x, cfg, taps=[1, 3, 5], remat=True)
    np.testing.assert_allclose(np.asarray(final), np.asarray(seq), rtol=1e-5, atol=1e-5)
    assert len(taps) == 3
    np.testing.assert_allclose(np.asarray(taps[2]), np.asarray(seq), rtol=1e-5, atol=1e-5)


def test_scan_grad_with_remat():
    cfg = BlockConfig(dim=32, num_heads=4, attn_impl="xla")
    stacked = stack_init(jax.random.key(0), cfg, depth=3)
    x = jnp.ones((1, 8, 32))
    g = jax.grad(lambda p: scan_blocks(p, x, cfg, remat=True).sum())(stacked)
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in jax.tree_util.tree_leaves(g))
