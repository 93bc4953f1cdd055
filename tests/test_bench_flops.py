"""Ground `bench._flops`'s analytic formulas against XLA's cost analysis.

XLA's `cost_analysis` counts a `lax.scan` body once (not ×trip-count), so the
bench can't use it directly for the scanned trunk — but on SCAN-FREE
subprograms it is an exact matmul/conv flop counter, which pins the analytic
formulas here: one transformer block and one full DPT head, at shapes where
matmul/conv work dominates the uncounted elementwise extras.
"""

import jax
import jax.numpy as jnp
import numpy as np

import bench
from vist3a_tpu.nn import heads as H
from vist3a_tpu.nn.layers import BlockConfig, block_apply, block_init


def _xla_flops(fn, *args):
    ca = jax.jit(fn).lower(*args).compile().cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca["flops"])


def test_block_flops_match_xla():
    cfg = BlockConfig(dim=256, num_heads=4, attn_impl="xla")
    params = block_init(jax.random.key(0), cfg)
    x = jnp.zeros((2, 128, 256))
    xla = _xla_flops(lambda p, v: block_apply(p, v, cfg), params, x)
    n = 2 * 128
    analytic = (8.0 + 4.0 * cfg.mlp_ratio) * n * 256**2 \
        + 4.0 * 2 * 128**2 * 256
    # XLA adds LN / softmax / GELU elementwise flops on top of the matmuls
    assert 0.95 <= xla / analytic <= 1.25, (xla, analytic)


def test_dpt_head_flops_match_xla():
    cfg = H.DPTConfig(dim_in=256, output_dim=2, features=64,
                      out_channels=(32, 64, 128, 128), head2_features=32)
    params = H.dpt_init(jax.random.key(0), cfg)
    b, s, hw = 1, 1, 56
    ph = hw // 14
    p_tok = 5 + ph * ph
    taps = [jnp.asarray(np.zeros((b, s, p_tok, 256), np.float32))
            for _ in range(4)]
    xla = _xla_flops(
        lambda pr, ts: H.dpt_apply(pr, ts, (hw, hw), 5, cfg, (b, s)),
        params, taps)
    analytic = bench._dpt_flops(cfg, hw, hw)
    assert 0.85 <= xla / analytic <= 1.3, (xla, analytic)
