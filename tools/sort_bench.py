#!/usr/bin/env python
"""Microbenchmark XLA's TPU sort at the pipeline's actual sort shapes.

Sorts are load-bearing across the pipeline: the voxelizer's key sort
(262k keys in gridplan), the radius-cell table build (131k keys,
~50 ms measured in ONCHIP_SUITE_r4.log knn_parts), and the geodesic
contraction's edge sort (131k*k_sub keys). XLA lowers jnp.sort to a
bitonic network of many small ops — this tool measures how far that is
from the data's HBM roofline to size a possible Pallas radix/bitonic
kernel. Every timing is D2H-observed (tunnel block_until_ready is a
no-op); the sorted arrays are reduced to a scalar checksum on device.

Usage: python tools/sort_bench.py [--reps 5]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def _timed(fn, *args, reps=5):
    """Median wall ms of one jitted call (includes the ~30-50 ms tunnel
    dispatch floor — see the amortized column for the real op cost)."""
    t0 = time.perf_counter()
    out = float(fn(*args))
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        times.append(time.perf_counter() - t0)
    assert np.isfinite(out)
    return float(np.median(times)) * 1e3, compile_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()
    print(f"device={jax.devices()[0]}")
    rng = np.random.default_rng(0)

    for n in (131072, 262144, 2097152):
        keys = jnp.asarray(rng.integers(0, 1 << 30, size=n), jnp.int32)
        vals = jnp.asarray(rng.integers(0, n, size=n), jnp.int32)

        @jax.jit
        def sort_keys(k):
            return jnp.sum(jnp.sort(k).astype(jnp.int64) % 1013)

        @jax.jit
        def argsort_keys(k):
            return jnp.sum(jnp.argsort(k).astype(jnp.int64) % 1013)

        @jax.jit
        def sort_kv(k, v):
            sk, sv = jax.lax.sort((k, v), num_keys=1)
            return jnp.sum(sv.astype(jnp.int64) % 1013) + jnp.sum(
                sk.astype(jnp.int64) % 1013
            )

        # scan-amortized: R dependent sorts inside ONE jit (the r4g run
        # measured ~28-32 ms at EVERY size 131k-2M — pure dispatch floor).
        # The reversal keeps each iteration a full sort without letting
        # XLA fold the chain (bitonic is data-independent anyway).
        R = 16

        @jax.jit
        def sort_amortized(k):
            def body(c, _):
                return jnp.sort(c)[::-1], ()
            c, _ = jax.lax.scan(body, k, None, length=R)
            return jnp.sum(c.astype(jnp.int64) % 1013)

        @jax.jit
        def argsort_amortized(k):
            def body(c, _):
                p = jnp.argsort(c)
                return c[p][::-1] ^ p, ()
            c, _ = jax.lax.scan(body, k, None, length=R)
            return jnp.sum(c.astype(jnp.int64) % 1013)

        for name, fn, a, amort in (
            ("sort", sort_keys, (keys,), 1),
            ("argsort", argsort_keys, (keys,), 1),
            ("sort_kv", sort_kv, (keys, vals), 1),
            ("sortx16", sort_amortized, (keys,), R),
            ("argsortx16", argsort_amortized, (keys,), R),
        ):
            ms, cs = _timed(fn, *a, reps=args.reps)
            mb = n * 4 / 1e6
            per = ms / amort
            print(
                f"n={n:8d} {name:10s}: {per:8.2f} ms/op "
                f"(data {mb:.1f} MB, radix-4-pass roofline ~"
                f"{8 * mb / 800:.3f} ms, compile {cs:.1f}s)",
                flush=True,
            )


if __name__ == "__main__":
    main()
