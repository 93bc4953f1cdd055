"""Multi-device partitioning for the Mosaic (Pallas) kernels.

A raw Mosaic custom call cannot be partitioned by GSPMD: lowering ANY
multi-device program that contains one fails with "Mosaic kernels cannot be
automatically partitioned. Please wrap the call in a shard_map."
(jax `tpu_custom_call.py` — raised for `ShardingContext.num_devices != 1`,
i.e. even when every operand is replicated).  The CPU test mesh never sees
this because interpret-mode Pallas lowers to plain partitionable HLO — so
multi-chip TPU deployments (14B TP denoise, FSDP training, the RL reward
step) would fail at compile time while every CPU-mesh test stays green.

Mechanism: `jax.shard_map` over the ambient mesh, applied INSIDE the
kernels' `custom_vjp` boundaries (forward and backward are each an explicit
shard_map, so autodiff never transposes through one — no replication/psum
double-count trap, and `check_vma=False` is safe).  shard_map lowers to
manual-sharding HLO with no Python callback at XLA-compile time, unlike
`jax.experimental.custom_partitioning`, whose CustomSPMDPartitioning
emitter is unavailable under AOT topology compilation (the only multi-chip
validation possible with one physical chip).

Policy per kernel:
  * attention (batch_dim=True): dim 0 of every operand/result is the fused
    B·H dim — shard it over the largest mesh-axis combination that divides
    it (max parallelism even when the caller's activations were
    replicated); all other dims stay per-shard whole (the kernel tiles the
    sequence internally).
  * rasterizer (batch_dim=False): replicate everything — the kernel owns
    the whole tile space and its operands are replicated at the call sites
    (B=1 rollout renders in the RL step, NVS eval, orbit export).

Regression gate: `tools/aot_check.py` AOT-compiles the deployment programs
against a virtual `v5e:2x4` TPU topology (`jax.experimental.topologies`).
No ambient mesh (single-chip bench, unit tests) → the wrapper is a no-op.
"""

from __future__ import annotations

import functools

import jax
from jax.sharding import PartitionSpec as P


def _ambient_mesh():
    """The mesh in context at trace time (`with mesh:` around the step /
    denoise call), or None."""
    try:
        from jax._src import mesh as _mesh_lib

        pm = _mesh_lib.thread_resources.env.physical_mesh
        if not pm.empty and pm.size > 1:
            return pm
        am = jax.sharding.get_abstract_mesh()
        if am is not None and not am.empty and am.size > 1:
            return am
    except Exception:
        pass
    return None


def _dividing_axes(mesh, args, results):
    """Largest mesh-axis combination whose size divides every tensor's
    dim 0 (operands and results share the fused B·H dim)."""
    dim0s = [t.shape[0] for t in (*args, *results) if t.ndim]
    names = tuple(mesh.axis_names)
    candidates = [names] + [(n,) for n in names]
    for cand in candidates:
        size = 1
        for n in cand:
            size *= mesh.shape[n]
        if size > 1 and all(d % size == 0 for d in dim0s):
            return cand
    return None


def batch_partitioned(fun, n_results: int, *, batch_dim: bool = True):
    """Wrap `fun(*arrays) -> array | tuple` in a shard_map over the ambient
    mesh (no-op without one).  See the module docstring for the policy."""
    del n_results   # structure comes from eval_shape

    def wrapper(*args):
        mesh = _ambient_mesh()
        if mesh is None:
            return fun(*args)
        results = jax.eval_shape(fun, *args)
        res_list = (list(results) if isinstance(results, (list, tuple))
                    else [results])
        axes = (_dividing_axes(mesh, args, res_list) if batch_dim else None)

        def spec(t):
            if t.ndim == 0 or axes is None:
                return P(*([None] * t.ndim))
            return P(axes, *([None] * (t.ndim - 1)))

        in_specs = tuple(spec(a) for a in args)
        out_specs = jax.tree_util.tree_map(spec, results)
        return jax.shard_map(fun, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=False)(*args)

    return wrapper


def cached_partitioned(impl_factory):
    """Decorator: `impl_factory(*statics) -> (fun, n_results, batch_dim)`
    → an lru-cached builder of the shard_map wrapper (statics ride as
    closure constants)."""
    @functools.lru_cache(maxsize=None)
    def build(*statics):
        fun, n_results, batch_dim = impl_factory(*statics)
        return batch_partitioned(fun, n_results, batch_dim=batch_dim)

    return build
