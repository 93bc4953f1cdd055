"""Deterministic multi-host randomness.

The reference synchronises per-step random choices by NCCL-broadcasting from
rank 0 (view count: `model_stitching_training.py:101-109`; rollout length and
backprop timesteps: `train_vdm.py:100-137`).  On TPU no communication is
needed: every host folds the same (seed, step) into the same key and draws the
same values.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def fold_in_step(key: jax.Array, step: int) -> jax.Array:
    return jax.random.fold_in(key, step)


def fold_in_host(key: jax.Array, process_index: int | None = None) -> jax.Array:
    """Per-host-distinct key (e.g. for data augmentation on local shards)."""
    idx = jax.process_index() if process_index is None else process_index
    return jax.random.fold_in(key, idx)


def synced_randint(key: jax.Array, step: int, low: int, high: int) -> int:
    """Same integer on every host for a given (key, step)."""
    k = fold_in_step(key, step)
    return int(jax.random.randint(k, (), low, high))


def synced_choice(key: jax.Array, step: int, options) -> object:
    """Same element of ``options`` on every host — replaces the reference's
    rank-0 choice + broadcast of the per-step view count {9,13,17,21}."""
    idx = synced_randint(key, step, 0, len(options))
    return options[idx]


def synced_perm_take(key: jax.Array, step: int, n: int, k: int) -> jnp.ndarray:
    """First ``k`` items of a synced permutation of ``range(n)`` (the
    reference's `choose_and_sync_two_indices`, `train_vdm.py:100-114`)."""
    kk = fold_in_step(key, step)
    return jax.random.permutation(kk, n)[:k]
