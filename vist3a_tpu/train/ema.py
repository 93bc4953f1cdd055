"""Exponential moving average over trainable params (functional).

Parity target: `utils/ema.py` (`FSDPEMAWrapper`) — fp32 shadow of the
trainable params, warm-up decay `min((1+step)/(10+step), decay)` (:47-48),
update `ema ← d·ema + (1−d)·p` every `update_step_interval` steps, and
swap-in/swap-out for EMA checkpointing (:70-89).

In JAX the shadow is just another pytree; "swap" is returning the EMA tree
to use as params (no in-place mutation to undo).  Under pjit the shadow
inherits the params' sharding — the FSDP-compatibility machinery of the
reference is free here.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class EMAConfig:
    decay: float = 0.99
    update_step_interval: int = 1


def init_ema(params):
    """fp32 shadow of a (trainable) params pytree."""
    return jax.tree_util.tree_map(
        lambda p: p.astype(jnp.float32)
        if jnp.issubdtype(p.dtype, jnp.floating) else p, params)


def current_decay(step, decay: float = 0.99):
    """Warm-up decay `min((1+s)/(10+s), decay)` (`utils/ema.py:47-48`)."""
    return jnp.minimum((1.0 + step) / (10.0 + step), decay)


def update_ema(ema, params, step, cfg: EMAConfig = EMAConfig()):
    """One EMA step.  `step` is the 0-based optimizer step (the reference
    updates when `(step+1) % interval == 0`)."""
    d = current_decay(jnp.asarray(step, jnp.float32), cfg.decay)

    def upd(e, p):
        if jnp.issubdtype(e.dtype, jnp.floating):
            return d * e + (1.0 - d) * p.astype(e.dtype)
        return p

    new = jax.tree_util.tree_map(upd, ema, params)
    if cfg.update_step_interval > 1:
        do = ((jnp.asarray(step) + 1) % cfg.update_step_interval) == 0
        new = jax.tree_util.tree_map(
            lambda n, e: jnp.where(do, n, e), new, ema)
    return new


def ema_params_like(ema, params):
    """EMA tree cast back to the params' dtypes (the reference's
    `copy_ema_to` for saving/eval)."""
    return jax.tree_util.tree_map(
        lambda e, p: e.astype(p.dtype), ema, params)
