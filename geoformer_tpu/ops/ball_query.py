"""Fixed-radius ball query + grouping on dense distance tiles.

Replaces the reference CUDA ball_query/group_points
(lib/pointnet2/_ext_src/src/ball_query_gpu.cu:12-57, group_points_gpu.cu).
CUDA semantics: for each center, take the FIRST `nsample` points (in index
order) within `radius`, padding unfilled slots with the first hit. We get
identical semantics with a top-k over `where(inside, idx, idx + P)` keys.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _ball_query_scene(centers, points, point_mask, radius, nsample, center_chunk=512):
    k_pts = points.shape[0]
    center_chunk = min(center_chunk, centers.shape[0])
    iota = jnp.arange(k_pts, dtype=jnp.int32)
    r2 = jnp.float32(radius * radius)

    def chunk_fn(c):
        d2 = jnp.sum((c[:, None, :] - points[None, :, :]) ** 2, axis=-1)
        inside = (d2 <= r2) & point_mask[None, :]
        key = jnp.where(inside, iota[None, :], iota[None, :] + k_pts)
        _, idx = jax.lax.top_k(-key, nsample)  # smallest keys = first hits
        idx = jnp.sort(idx, axis=-1)  # index order, like the CUDA scan
        hit = jnp.take_along_axis(inside, idx, axis=-1)
        first = idx[:, :1]
        idx = jnp.where(hit, idx, first)
        return idx.astype(jnp.int32), hit

    n_c = centers.shape[0]
    pad = (-n_c) % center_chunk
    centers_p = jnp.pad(centers, ((0, pad), (0, 0)))
    chunks = centers_p.reshape(-1, center_chunk, 3)
    idx, hit = jax.lax.map(chunk_fn, chunks)
    idx = idx.reshape(-1, nsample)[:n_c]
    hit = hit.reshape(-1, nsample)[:n_c]
    return idx, hit


def ball_query(centers, points, point_mask, radius, nsample):
    """centers [B,K,3], points [B,P,3], point_mask [B,P]
    -> (idx [B,K,nsample] int32, hit [B,K,nsample] bool)."""
    return jax.vmap(lambda c, p, m: _ball_query_scene(c, p, m, radius, nsample))(
        centers, points, point_mask
    )


def query_and_group(centers, points, feats, point_mask, radius, nsample, normalize_xyz=True):
    """QueryAndGroup (pointnet2_utils.py:271-356): returns grouped
    [B,K,nsample,3] relative xyz (optionally /radius) and [B,K,nsample,C]
    features, plus the hit mask."""
    idx, hit = ball_query(centers, points, point_mask, radius, nsample)

    def scene(pts, f, i, c):
        gx = pts[i] - c[:, None, :]  # [K,ns,3]
        gf = f[i]  # [K,ns,C]
        return gx, gf

    gx, gf = jax.vmap(scene)(points, feats, idx, centers)
    if normalize_xyz:
        gx = gx / radius
    return gx, gf, idx, hit
