#!/usr/bin/env python
"""Validate + time the Pallas FPS kernel against the XLA fori_loop path on
the current backend (intended for the axon TPU tunnel, where the kernel
never dispatched through round 3 — ops/fps.py gated on backend == "tpu"
while the tunnel registers as "axon").

Checks exact index equality (both implement the CUDA FPS contract:
seed 0, ties to lowest index) at aggregator-like shapes, then times both
amortized under one jit.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from geoformer_tpu.ops.fps import _fps_scene
    from geoformer_tpu.ops.fps_pallas import fps_pallas_scene

    print(f"device={jax.devices()[0]} backend={jax.default_backend()}")
    rng = np.random.default_rng(0)
    for p, n_samples in [(2048, 256), (50000, 2048), (131072, 2048)]:
        pts = jnp.asarray(rng.normal(size=(p, 3)).astype(np.float32))
        mask = jnp.asarray(rng.random(p) > 0.1)

        xla = jax.jit(lambda pt, m: _fps_scene(pt, m, n_samples)[0])
        pal = jax.jit(lambda pt, m: fps_pallas_scene(pt, m, n_samples))

        t0 = time.perf_counter()
        ix = np.asarray(xla(pts, mask))
        t_xc = time.perf_counter() - t0
        t0 = time.perf_counter()
        ip = np.asarray(pal(pts, mask))
        t_pc = time.perf_counter() - t0
        match = bool((ix == ip).all())

        times_x, times_p = [], []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(xla(pts, mask))
            times_x.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            np.asarray(pal(pts, mask))
            times_p.append(time.perf_counter() - t0)
        print(
            f"P={p:6d} n={n_samples:4d} match={match} "
            f"xla={np.median(times_x)*1e3:7.1f}ms pallas={np.median(times_p)*1e3:7.1f}ms "
            f"(compile {t_xc:.1f}/{t_pc:.1f}s)",
            flush=True,
        )
        assert match, "Pallas FPS diverged from the XLA contract"


if __name__ == "__main__":
    main()
