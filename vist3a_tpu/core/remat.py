"""Rematerialisation (activation checkpointing) policies.

The reference grad-checkpoints every aggregator block
(`aggregator.py:333-339`), the stitched forward, the Wan VAE, and the DiT.
On TPU the equivalent is `jax.checkpoint` with a dots-saveable policy: keep
MXU outputs (matmul results) resident, recompute the cheap VPU elementwise
chains — the standard HBM-for-FLOPs trade.
"""

from __future__ import annotations

import functools

import jax

# Save matmul/conv outputs, recompute elementwise ops.
dots_saveable = jax.checkpoint_policies.dots_with_no_batch_dims_saveable
nothing_saveable = jax.checkpoint_policies.nothing_saveable


def remat_block(fn, policy=None, prevent_cse: bool = True):
    """Checkpoint one transformer block (per-block remat like the reference)."""
    return jax.checkpoint(fn, policy=policy or nothing_saveable,
                          prevent_cse=prevent_cse)


def remat_dots(fn):
    """Checkpoint keeping matmul outputs (cheaper recompute, more HBM)."""
    return jax.checkpoint(fn, policy=dots_saveable)
