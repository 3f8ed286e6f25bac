"""Furthest point sampling as a masked sequential argmax loop.

Replaces the reference CUDA FPS (lib/pointnet2/_ext_src/src/sampling_gpu.cu:
72-232). Ordering matters downstream: the decoder's queries are the *first*
n_query_points FPS picks (geoformer.py:450-451), so this is a faithful
sequential FPS seeded at index 0, not a grid approximation. We intentionally
do not replicate the reference's `mag <= 1e-3` skip quirk
(sampling_gpu.cu:104).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _fps_scene(points: jax.Array, mask: jax.Array, n_samples: int):
    p = points.shape[0]
    neg = jnp.float32(-1.0)
    dist = jnp.where(mask, jnp.float32(1e10), neg)  # min sq-dist to picked set

    idxs0 = jnp.zeros((n_samples,), jnp.int32)

    def body(i, state):
        dist, idxs, last = state
        delta = points - points[last]
        d = jnp.sum(delta * delta, axis=-1)
        dist = jnp.where(mask, jnp.minimum(dist, d), neg)
        nxt = jnp.argmax(dist).astype(jnp.int32)
        idxs = idxs.at[i].set(nxt)
        return dist, idxs, nxt

    # pick 0 = first point (CUDA FPS seeds idxs[0] = 0)
    _, idxs, _ = jax.lax.fori_loop(1, n_samples, body, (dist, idxs0, jnp.int32(0)))
    n_valid = jnp.sum(mask.astype(jnp.int32))
    sample_mask = jnp.arange(n_samples) < jnp.minimum(n_valid, n_samples)
    return idxs, sample_mask


def furthest_point_sample(points: jax.Array, mask: jax.Array, n_samples: int):
    """points [B,P,3], mask [B,P] -> (idx [B,n_samples] int32, valid [B,n_samples]).

    If a scene has fewer than n_samples valid points the tail indices repeat
    already-picked points; `valid` marks the genuine prefix.

    On TPU this dispatches to the single-kernel Pallas implementation
    (ops/fps_pallas.py — VMEM-resident loop, no per-pick HBM traffic); the
    XLA fori_loop below is the portable reference path.
    """
    # (the axon tunnel plugin registers platform "axon" but
    # jax.default_backend() still reports "tpu" — verified on-chip,
    # tools/fps_onchip_check.py — so this gate is live through the tunnel)
    if jax.default_backend() == "tpu":
        from geoformer_tpu.ops.fps_pallas import fps_pallas

        return fps_pallas(points, mask, n_samples)
    return jax.vmap(lambda pts, m: _fps_scene(pts, m, n_samples))(points, mask)
