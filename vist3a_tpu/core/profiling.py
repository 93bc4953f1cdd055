"""Tracing / profiling / numeric-safety utilities (SURVEY.md §5).

Parity target: AnySplat's `Benchmarker` (`src/misc/benchmarker.py:11-37`) —
context-manager wall-clock timers with JSON dump and peak device-memory
report — extended the TPU way: `jax.profiler` trace annotations for XLA
timeline capture and a finite-check helper (the reference's only "race
detection" is immutability conventions; JAX purity gives that for free, so
we add NaN/Inf surfacing instead).
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from pathlib import Path

import jax
import jax.numpy as jnp


class Benchmarker:
    """Wall-clock phase timers (`benchmarker.py:11-37`) + device memory."""

    def __init__(self):
        self.execution_times = defaultdict(list)

    @contextlib.contextmanager
    def time(self, tag: str, num_calls: int = 1):
        start = time.perf_counter()
        try:
            with jax.profiler.TraceAnnotation(tag):
                yield
        finally:
            elapsed = time.perf_counter() - start
            for _ in range(num_calls):
                self.execution_times[tag].append(elapsed / num_calls)

    def dump(self, path) -> None:
        path = Path(path)
        path.parent.mkdir(exist_ok=True, parents=True)
        path.write_text(json.dumps(dict(self.execution_times)))

    def dump_memory(self, path) -> None:
        """Per-device live/peak bytes (the CUDA max-memory analogue)."""
        stats = {}
        for d in jax.devices():
            try:
                s = d.memory_stats()
            except Exception:
                s = None
            if s:
                stats[str(d)] = {k: s[k] for k in
                                 ("bytes_in_use", "peak_bytes_in_use")
                                 if k in s}
        Path(path).parent.mkdir(exist_ok=True, parents=True)
        Path(path).write_text(json.dumps(stats))

    def summarize(self) -> dict:
        return {tag: sum(ts) / len(ts)
                for tag, ts in self.execution_times.items()}


@contextlib.contextmanager
def trace_to(logdir: str):
    """Capture an XLA profiler trace (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def assert_all_finite(tree, name: str = "tree") -> None:
    """Host-side NaN/Inf surfacing for checkpoints/batches (the functional
    stand-in for torch anomaly detection)."""
    bad = []

    def check(path, x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            if not bool(jnp.isfinite(x).all()):
                bad.append("/".join(str(p) for p in path))

    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        check([getattr(p, "key", getattr(p, "idx", p)) for p in path], leaf)
    if bad:
        raise FloatingPointError(f"non-finite values in {name}: {bad[:10]}")


def debug_nan_mode(enable: bool = True) -> None:
    """Flip jax_debug_nans (traps the op producing the first NaN)."""
    jax.config.update("jax_debug_nans", enable)
