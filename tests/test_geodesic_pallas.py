"""Blocked Pallas geodesic (interpret mode) vs the XLA implementation."""

import numpy as np
import jax.numpy as jnp

from geoformer_tpu.ops.geodesic import geodesic_distance
from geoformer_tpu.ops.geodesic_pallas import geodesic_distance_blocked
from geoformer_tpu.ops.knn import knn


def _graph(rng, p=250, valid=230, k=8):
    pts = rng.uniform(0, 1, size=(p, 3)).astype(np.float32)
    mask = np.zeros(p, bool)
    mask[:valid] = True
    d2, idx = knn(jnp.asarray(pts[None]), jnp.asarray(pts[None]), jnp.asarray(mask[None]), k + 1)
    nbr_d = np.sqrt(np.asarray(d2[0])[:, 1:])
    nbr_i = np.asarray(idx[0])[:, 1:]
    return pts, mask, nbr_i, nbr_d


def test_blocked_matches_xla_geodesic():
    rng = np.random.default_rng(0)
    pts, mask, nbr_i, nbr_d = _graph(rng)
    seeds = np.array([0, 7, 20, 400], np.int32)
    seed_mask = np.array([True, True, True, False])
    args = (
        jnp.asarray(nbr_i[None]), jnp.asarray(nbr_d[None]),
        jnp.asarray(seeds[None]), jnp.asarray(seed_mask[None]),
        jnp.asarray(mask[None]), 0.35, 64,
    )
    want = np.asarray(geodesic_distance(*args)[0])
    got = np.asarray(
        geodesic_distance_blocked(*args, block_size=64, inner_rounds=4, interpret=True)[0]
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_blocked_single_block_fast_path():
    """block_size >= P: everything local, still identical."""
    rng = np.random.default_rng(1)
    pts, mask, nbr_i, nbr_d = _graph(rng, p=120, valid=120)
    seeds = np.array([3, 50], np.int32)
    seed_mask = np.array([True, True])
    args = (
        jnp.asarray(nbr_i[None]), jnp.asarray(nbr_d[None]),
        jnp.asarray(seeds[None]), jnp.asarray(seed_mask[None]),
        jnp.asarray(mask[None]), 0.4, 64,
    )
    want = np.asarray(geodesic_distance(*args)[0])
    got = np.asarray(
        geodesic_distance_blocked(*args, block_size=128, inner_rounds=8, interpret=True)[0]
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
