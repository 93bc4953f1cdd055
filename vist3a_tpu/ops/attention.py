"""Attention dispatch: XLA fused path (default) or the Pallas flash kernel.

Replaces every native attention in the reference — torch SDPA
(`vggt/layers/attention.py:64`, `utils/wan_utils.py:460`), xformers
memory-efficient attention (`heads/head_modules.py:220`), and the curope CUDA
extension (RoPE is applied outside / fused by XLA here).

Layout: q, k, v are (B, N, H, D) — the natural layout for the surrounding
projections; transposition into (B, H, N, D) is done here once so XLA/Mosaic
see a canonical flash-attention problem.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    impl: str = "auto",
    scale: float | None = None,
    key_valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Softmax attention over (B, N, H, D) tensors, fp32 softmax.

    impl: 'auto' → Pallas flash kernel on TPU when shapes allow, else XLA.
    key_valid: optional (N_k,) bool — masked keys get −inf logits (the
    inference trunk's padded-token layout; FORWARD-ONLY on the Pallas path).
    """
    if impl == "auto":
        import os

        on_tpu = (jax.default_backend() == "tpu"
                  or os.environ.get("VIST3A_FORCE_MOSAIC") == "1")
        # the Pallas kernel pads head_dim to the 128-lane width internally;
        # it wins whenever the sequence is long enough to tile (measured
        # 3.7× over XLA at the VGGT global-attention shape)
        use_pallas = on_tpu and q.shape[1] >= 1024
        impl = "pallas" if use_pallas else "xla"
    if impl == "pallas":
        from vist3a_tpu.kernels.flash_attention import (flash_attention,
                                                        flash_attention_masked)

        if key_valid is not None:
            d = q.shape[-1]
            if d % 8 == 0 and d % 128 != 0:
                return flash_attention_masked(q, k, v, key_valid,
                                              scale=scale)
        else:
            return flash_attention(q, k, v, scale=scale)
    return _xla_attention(q, k, v, scale=scale, key_valid=key_valid)


def _xla_attention(q, k, v, *, scale=None, key_valid=None):
    d = q.shape[-1]
    scale = d ** -0.5 if scale is None else scale
    dtype = q.dtype
    # (B,N,H,D) -> (B,H,N,D)
    logits = jnp.einsum(
        "bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32
    ).astype(jnp.float32)
    if key_valid is not None:
        logits = jnp.where(key_valid[None, None, None, :], logits,
                           jnp.float32(-1e30))
    probs = jax.nn.softmax(logits.astype(jnp.float32) * scale, axis=-1)
    out = jnp.einsum(
        "bhnm,bmhd->bnhd",
        probs.astype(dtype),
        v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(dtype)
