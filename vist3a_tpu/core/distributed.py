"""Multi-host runtime setup (the NCCL/dist_util layer, TPU-native).

Parity target: `utils/dist_util.py` — `setup_dist` (NCCL init with a
single-process fallback, :25-43), `is_main_process` (:52), `cleanup` (:46),
rank→device pinning — and the launchers (`torch.distributed.run` /
`accelerate launch`, Readme.md:137-177).

On TPU, `jax.distributed.initialize()` wires all hosts of a slice; every
collective then rides ICI/DCN through XLA — there is no NCCL analogue to
manage, no process group to tear down, and no rank→GPU pinning (each host
owns its local chips).  Rank-0-randomness broadcasts are replaced framework-
wide by shared folded PRNG keys (see train/stitching.py, train/vdm.py)."""

from __future__ import annotations

import os

import jax


def setup_dist(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Initialize the multi-host runtime; single-process no-op fallback
    (`dist_util.py:29-37`).  On TPU pods the arguments come from the
    environment automatically."""
    already_multiprocess = any(k in os.environ for k in (
        "COORDINATOR_ADDRESS", "MEGASCALE_COORDINATOR_ADDRESS"))
    if coordinator_address or already_multiprocess:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)


def get_rank() -> int:
    return jax.process_index()


def get_world_size() -> int:
    return jax.process_count()


def is_main_process() -> bool:
    """`dist_util.py:52`."""
    return jax.process_index() == 0


def barrier() -> None:
    """`dist_util.py:64` — a cross-host sync point: an all-reduce of a
    scalar forces every host to arrive before any leaves."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("vist3a_barrier")


def cleanup() -> None:
    """`dist_util.py:46` — jax.distributed shutdown."""
    try:
        jax.distributed.shutdown()
    except Exception:
        pass
