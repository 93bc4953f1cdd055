"""Microbenchmark: P-sized gather/scatter forms on the real chip.

Settles which layout the rasterizer's pair-attribute plumbing should use
(`kernels/rasterizer.py`): row gathers vs per-column gathers, fp32 vs bf16
rows, scatter vs argsort-gather for the G-sized inverse permutation.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def _rtt():
    cheap = jax.jit(lambda x: x + 1.0)
    x = jnp.float32(0.0)
    float(cheap(x))
    t0 = time.perf_counter()
    for _ in range(20):
        float(cheap(x))
    return (time.perf_counter() - t0) / 20


def timeit(name, fn, *args, iters=5, rtt=0.0):
    f = jax.jit(fn)
    float(jnp.sum(f(*args)))
    t0 = time.perf_counter()
    for _ in range(iters):
        float(jnp.sum(f(*args)))
    dt = (time.perf_counter() - t0) / iters - rtt
    print(f"{name:42s} {dt*1e3:8.2f} ms", flush=True)


def main():
    rtt = _rtt()
    print(f"backend={jax.default_backend()} rtt={rtt*1e3:.1f} ms", flush=True)
    for P in (2_621_440, 10_485_760):
        G = 2_621_440
        k = jax.random.split(jax.random.key(0), 4)
        tab = jax.random.normal(k[0], (G, 10), jnp.float32)
        idx_rand = jax.random.randint(k[1], (P,), 0, G)
        idx_sorted = jnp.sort(idx_rand)
        vals = jax.random.normal(k[2], (G,), jnp.float32)
        order = jax.random.permutation(k[3], G)
        print(f"--- P={P} G={G}", flush=True)

        timeit("row gather (P,10) rand idx",
               lambda t, i: t[i], tab, idx_rand, rtt=rtt)
        timeit("row gather (P,10) sorted idx",
               lambda t, i: t[i], tab, idx_sorted, rtt=rtt)
        timeit("col gather x10 (P,) each",
               lambda t, i: sum(t[:, c][i] for c in range(10)),
               tab, idx_rand, rtt=rtt)
        timeit("col gather x1 (P,)",
               lambda t, i: t[:, 0][i], tab, idx_rand, rtt=rtt)
        timeit("row gather bf16 (P,10)",
               lambda t, i: t[i], tab.astype(jnp.bfloat16), idx_rand, rtt=rtt)
        timeit("flat 1d gather (P*10,)",
               lambda t, i: jnp.take(
                   t.reshape(-1),
                   (i[:, None] * 10
                    + jnp.arange(10, dtype=jnp.int32)[None, :]).reshape(-1)),
               tab, idx_rand, rtt=rtt)
        timeit("row gather via one transposed (10,P)",
               lambda t, i: t.T[:, i], tab, idx_rand, rtt=rtt)
        if P == G:
            timeit("G scatter set (4B)",
                   lambda o, v: jnp.zeros((G,), jnp.float32).at[o].set(v),
                   order, vals, rtt=rtt)
            timeit("argsort(order) (G int sort)",
                   lambda o: jnp.argsort(o), order, rtt=rtt)
            timeit("row gather (G,12) rand idx",
                   lambda t, i: t[i],
                   jnp.concatenate([tab, tab[:, :2]], 1), idx_rand, rtt=rtt)
        # the sort forms
        key = idx_rand.astype(jnp.uint32)
        timeit("sort (key, 1xi32)",
               lambda kk: jax.lax.sort((kk, jnp.arange(P, dtype=jnp.int32)),
                                       num_keys=1)[1], key, rtt=rtt)
        timeit("sort (key, 2xi32)",
               lambda kk: jax.lax.sort(
                   (kk, jnp.arange(P, dtype=jnp.int32),
                    jnp.arange(P, dtype=jnp.int32)), num_keys=1)[1],
               key, rtt=rtt)


if __name__ == "__main__":
    main()
