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


def _ball_query_hash_scene(centers, points, point_mask, radius, nsample,
                           cell_cap, spatial=1024):
    """Voxel-hash ball query: bucket points into `radius`-sized cells, so
    each center's candidates are the 3^3 cell window (27*cell_cap) instead
    of all P points — the brute-force [K,P] distance + top_k over P lanes
    dominates the aggregator at production scale. Same first-`nsample`-in-
    index-order semantics as the CUDA kernel (ball_query_gpu.cu:12-57),
    exact up to `cell_cap` points per cell (overflow drops candidates —
    the standard capacity contract). The cell table and 3^3 window lookup
    are shared with the radius-kNN graph builder (ops/radius_graph.py);
    only the query side differs (per CENTER here — K is small, so the
    per-cell indirection the graph builder uses would not pay)."""
    from geoformer_tpu.ops.radius_graph import build_cell_table, window_lookup

    p = points.shape[0]
    q = centers.shape[0]
    cc = p  # exact: occupied cells <= points
    grid, origin, cell_pts, cell_xyz, _ = build_cell_table(
        points, point_mask, radius, cc, cell_cap, spatial
    )
    cell_keys = grid.voxel_keys[0]
    n_cells = grid.n_voxels[0]

    ccell = jnp.clip(
        jnp.floor((centers - origin) / radius).astype(jnp.int32), 0, spatial - 1
    )
    cwin = window_lookup(cell_keys, n_cells, cc, ccell,
                         jnp.ones((q,), bool), spatial)  # [K,27]
    cell_pts_pad = jnp.concatenate(
        [cell_pts, jnp.full((1, cell_cap), p, jnp.int32)], axis=0
    )
    cand = cell_pts_pad[cwin].reshape(q, 27 * cell_cap)

    # flat-packed candidate positions (see build_cell_table: xyz interleaved
    # on lanes, never materializing a 3-minor tensor)
    cell_xyz_pad = jnp.concatenate(
        [cell_xyz, jnp.zeros((1, cell_cap * 3), points.dtype)], axis=0
    )
    cpos = cell_xyz_pad[cwin].reshape(q, 27 * cell_cap * 3)
    tq = jnp.tile(centers, (1, 27 * cell_cap))
    diff2 = (cpos - tq) ** 2
    d2 = diff2[:, 0::3] + diff2[:, 1::3] + diff2[:, 2::3]
    inside = (d2 <= radius * radius) & (cand < p)

    # first `nsample` in index order = the nsample smallest point indices
    # among in-radius candidates (each point occurs in exactly one cell)
    key = jnp.where(inside, cand, 2 * p)
    _, pos = jax.lax.top_k(-key, nsample)
    idx = jnp.take_along_axis(cand, pos, axis=1)
    hit = jnp.take_along_axis(inside, pos, axis=1)
    # ascending keys = hits first in index order (CUDA scan order); pad
    # unfilled slots with the first hit (0 if the window is empty — hit
    # is all-false there and consumers mask on it)
    first = jnp.where(hit[:, :1], idx[:, :1], 0)
    idx = jnp.where(hit, idx, first)
    return idx.astype(jnp.int32), hit


def ball_query(centers, points, point_mask, radius, nsample, cell_cap=0):
    """centers [B,K,3], points [B,P,3], point_mask [B,P]
    -> (idx [B,K,nsample] int32, hit [B,K,nsample] bool).

    cell_cap > 0 switches to the voxel-hash path (exact up to cell_cap
    points per radius-cell); 0 = brute-force distance tiles."""
    if cell_cap:
        return jax.vmap(
            lambda c, p, m: _ball_query_hash_scene(c, p, m, radius, nsample, cell_cap)
        )(centers, points, point_mask)
    return jax.vmap(lambda c, p, m: _ball_query_scene(c, p, m, radius, nsample))(
        centers, points, point_mask
    )


def query_and_group(centers, points, feats, point_mask, radius, nsample,
                    normalize_xyz=True, cell_cap=0):
    """QueryAndGroup (pointnet2_utils.py:271-356): returns grouped
    [B,K,nsample,3] relative xyz (optionally /radius) and [B,K,nsample,C]
    features, plus the hit mask."""
    idx, hit = ball_query(centers, points, point_mask, radius, nsample,
                          cell_cap=cell_cap)

    def scene(pts, f, i, c):
        gx = pts[i] - c[:, None, :]  # [K,ns,3]
        gf = f[i]  # [K,ns,C]
        return gx, gf

    gx, gf = jax.vmap(scene)(points, feats, idx, centers)
    if normalize_xyz:
        gx = gx / radius
    return gx, gf, idx, hit
