"""Radius-bounded kNN via a voxel hash — the geodesic graph builder.

The reference builds the geodesic graph as FAISS 64-NN + a 0.05m radius
gate (geodesic_utils.py:12-24, geoformer.py:454-463). Brute-force kNN costs
O(P^2) and its top-k dominates eval time on TPU (measured ~1.1s at P=32k).
But the radius gate means only neighbors within `radius` matter: bucketing
points into cells of size `radius` bounds candidates to the 3^3 cell window
— O(P * 27 * cell_cap) with a tiny top-k, exact K-nearest-within-radius
up to the per-cell capacity.

Cell occupancy at reference densities (2cm-voxelized scans, 5cm cells) is
~1-2 points; `cell_cap` of 8 makes overflow (dropped candidates) negligible.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from geoformer_tpu.ops.voxelize import pack_key, voxelize

_BIG = 1e30  # python float, NOT a jnp scalar (device-array constants re-stage per call)

# 27 cell offsets (dz, dy, dx)
_WINDOW = [(dz, dy, dx) for dz in (-1, 0, 1) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]


def build_cell_table(points, mask, radius, cc, cell_cap, spatial=1024):
    """Bucket a scene's points into `radius`-sized cells (the shared first
    stage of the voxel-hash kNN and the voxel-hash ball query).

    Returns (grid, origin, cell_pts [CC, cell_cap] point indices per cell
    (pad = P), cell_xyz [CC, cell_cap*3] member positions flat-packed with
    xyz interleaved on the LANE axis — consumers gather whole cells as 2D
    rows and run strided-lane d2, never materializing a 3-minor tensor (the
    naive [N, cap, 3] form tile-pads (8,128) on the trailing dims: 42.7x
    expansion, 13.5 GB at prod — OOMs the chip), and n_dropped: valid
    points not representable as candidates (cell slots beyond CC + per-cell
    overflow past cell_cap) — surfaced by callers, never silent."""
    p = points.shape[0]
    origin = jnp.min(jnp.where(mask[:, None], points, _BIG), axis=0)
    cells = jnp.clip(
        jnp.floor((points - origin) / radius).astype(jnp.int32), 0, spatial - 1
    )
    grid = voxelize(cells[None], mask[None], cc, spatial)
    p2c = grid.p2v[0]  # [P] point -> cell slot (cc = pad)

    # cell -> points rulebook [CC, cell_cap], pad = p; the grid's own
    # sort order already groups points by cell (no extra argsort)
    order = grid.order[0]
    starts = grid.starts[0]  # [CC+1] segment boundaries per cell slot
    sorted_cells = p2c[order]
    rank = jnp.arange(p, dtype=jnp.int32) - starts[jnp.minimum(sorted_cells, cc)]
    ok = (sorted_cells < cc) & (rank < cell_cap)
    slot = jnp.where(ok, sorted_cells * cell_cap + rank, cc * cell_cap)
    cell_pts = jnp.full((cc * cell_cap + 1,), p, jnp.int32).at[slot].set(
        jnp.where(ok, order, p), unique_indices=True, mode="promise_in_bounds"
    )[: cc * cell_cap].reshape(cc, cell_cap)

    valid_sorted = mask[order]
    n_dropped = grid.n_overflow[0] + jnp.sum(
        (valid_sorted & (sorted_cells < cc) & (rank >= cell_cap)).astype(jnp.int32)
    )

    pts_pad = jnp.concatenate([points, jnp.zeros((1, 3), points.dtype)], axis=0)
    cell_xyz = pts_pad[cell_pts.reshape(-1)].reshape(cc, cell_cap * 3)
    return grid, origin, cell_pts, cell_xyz, n_dropped


def window_lookup(cell_keys, n_cells, cc, query_cells, query_valid, spatial=1024):
    """3^3 cell-window lookup: query_cells [N,3] (x,y,z int) ->
    [N,27] cell slots into the sorted cell table (cc = not-found pad)."""
    offs = jnp.asarray([(dx, dy, dz) for (dz, dy, dx) in _WINDOW], jnp.int32)  # (x,y,z)
    nc = query_cells[:, None, :] + offs[None, :, :]  # [N,27,3]
    in_range = jnp.all((nc >= 0) & (nc < spatial), axis=-1) & query_valid[:, None]
    nkey = pack_key(jnp.clip(nc, 0, spatial - 1), spatial)
    # method="sort" beats XLA's binary-search lowering ~5x at this scale
    cwin = jnp.searchsorted(cell_keys, nkey, method="sort").astype(jnp.int32)
    cwin = jnp.minimum(cwin, cc - 1)
    found = in_range & (cell_keys[cwin] == nkey) & (cwin < n_cells)
    return jnp.where(found, cwin, cc)  # pad cell


def _radius_knn_scene(points, mask, radius, k, cell_cap, spatial=1024, sort=True,
                      cell_div=1, compact_width=0, with_stats=False):
    p = points.shape[0]
    # cell-slot capacity: p // cell_div. cell_div=1 is exact for any input
    # (occupied cells <= points, always). Dense scan surfaces (2-3 cm point
    # spacing, radius 5 cm -> ~3-8 points per cell) can pass cell_div=2 to
    # halve the window-lookup sort; a scene with more occupied cells than
    # slots (points isolated at > radius spacing — degenerate for a radius
    # graph) drops the overflow cells' points from the graph (no edges ->
    # geodesic unreached), the degraded-but-bounded contract used by every
    # capacity here — counted in n_dropped (with_stats) and surfaced as
    # voxel_stats["n_radius_cell_overflow"] by the model forward.
    cc = max(p // max(cell_div, 1), 1)
    grid, origin, cell_pts, cell_xyz, n_dropped = build_cell_table(
        points, mask, radius, cc, cell_cap, spatial
    )
    p2c = grid.p2v[0]  # [P] point -> cell slot (cc = pad)
    cell_keys = grid.voxel_keys[0]  # [CC] sorted packed keys
    n_cells = grid.n_voxels[0]

    # 27-window per CELL, not per point: every point of a cell shares the
    # same window, so the searchsorted runs on [CC, 27] keys (~cell_div*6x
    # fewer than the old per-point [P, 27] at scan occupancy) and points
    # pick their window up with one [P]-row gather.
    ccoords = grid.voxel_coords[0]  # [CC, 3] (x,y,z); -1 at pad slots
    cmask = grid.voxel_mask[0]
    cwin = window_lookup(cell_keys, n_cells, cc, ccoords, cmask, spatial)

    # per-point candidate cells [P, 27] (one row-gather), then candidate
    # points [P, 27*cap]
    cwin_pad = jnp.concatenate([cwin, jnp.full((1, 27), cc, jnp.int32)], axis=0)
    cidx = cwin_pad[jnp.minimum(p2c, cc)]  # [P, 27]
    cidx = jnp.where((p2c < cc)[:, None] & mask[:, None], cidx, cc)
    cell_pts_pad = jnp.concatenate(
        [cell_pts, jnp.full((1, cell_cap), p, jnp.int32)], axis=0
    )
    cand = cell_pts_pad[cidx].reshape(p, 27 * cell_cap)  # [P, C]

    # candidate positions: flat-packed two-hop gather (build_cell_table
    # packed each cell's member positions as [CC, cap*3] 2D rows — 524k
    # point-rows total); hop 2 gathers whole cells per window slot as
    # [P, 27] rows of cap*12 B. Measured 49 ms vs 114 ms for the
    # per-candidate pointwise gather at fg=131072 (the pointwise form pays
    # 27*cap point-row gathers per point); bit-identical output
    # (tools/geo_bisect.py knn_parts: max |Δd2| 4.7e-10).
    cell_xyz_pad = jnp.concatenate(
        [cell_xyz, jnp.zeros((1, cell_cap * 3), points.dtype)], axis=0
    )
    cpos = cell_xyz_pad[cidx].reshape(p, 27 * cell_cap * 3)  # [P, C*3]
    tq = jnp.tile(points, (1, 27 * cell_cap))  # [P, C*3] (xyzxyz...)
    diff2 = (cpos - tq) ** 2
    d2 = diff2[:, 0::3] + diff2[:, 1::3] + diff2[:, 2::3]
    bad = (cand >= p) | (cand == jnp.arange(p, dtype=jnp.int32)[:, None]) | (
        d2 > radius * radius
    ) | ~mask[:, None]
    d2 = jnp.where(bad, _BIG, d2)

    if sort:
        if compact_width and compact_width < d2.shape[1]:
            # two-stage nearest-k: compact the in-radius candidates (at
            # scan density ~10-30 of the 27*cap slots) to `compact_width`
            # lanes first, then top_k on the narrow window — the bitonic
            # top_k cost scales with lane width. Exact while the in-radius
            # count <= compact_width; beyond that the k nearest of the
            # first compact_width (candidate order) are kept.
            ok = d2 < _BIG
            rank = jnp.cumsum(ok.astype(jnp.int32), axis=1)
            targets = jnp.arange(1, compact_width + 1, dtype=jnp.int32)
            pos = jax.vmap(lambda r: jnp.searchsorted(r, targets, side="left"))(rank)
            inb = targets[None, :] <= rank[:, -1:]
            pos = jnp.minimum(pos, d2.shape[1] - 1)
            d2 = jnp.where(inb, jnp.take_along_axis(d2, pos, axis=1), _BIG)
            cand = jnp.take_along_axis(cand, pos, axis=1)
        neg_d, pos = jax.lax.top_k(-d2, k)  # k nearest within radius
        idx = jnp.take_along_axis(cand, pos, axis=1)
        d2k = -neg_d
        valid = d2k < _BIG
        idx = jnp.where(valid, idx, p)
        out = jnp.where(valid, d2k, _BIG), idx.astype(jnp.int32)
        return (*out, n_dropped) if with_stats else out

    # sort-free compaction: cumsum ranks + batched searchsorted pick the
    # first k in-radius candidates in candidate order — top_k over the
    # candidate window costs ~200ms at production scale and the consumers
    # (graph relaxation) treat edges as a set. When >k candidates are in
    # radius this keeps an arbitrary k (the sorted path keeps the nearest).
    ok = d2 < _BIG
    rank = jnp.cumsum(ok.astype(jnp.int32), axis=1)  # [P, C]
    count = rank[:, -1]
    targets = jnp.arange(1, k + 1, dtype=jnp.int32)
    pos = jax.vmap(lambda r: jnp.searchsorted(r, targets, side="left"))(rank)
    valid = targets[None, :] <= jnp.minimum(count, k)[:, None]
    pos = jnp.minimum(pos, d2.shape[1] - 1)
    idx = jnp.where(valid, jnp.take_along_axis(cand, pos, axis=1), p)
    d2k = jnp.where(valid, jnp.take_along_axis(d2, pos, axis=1), _BIG)
    out = d2k, idx.astype(jnp.int32)
    return (*out, n_dropped) if with_stats else out


def radius_knn(points, mask, radius, k, cell_cap: int = 8, sort: bool = True,
               cell_div: int = 1, compact_width: int = 0,
               with_stats: bool = False):
    """points [B,P,3], mask [B,P] -> (sq-dists [B,P,k] (1e30 pad), idx
    [B,P,k] int32 (P = pad)): K neighbors within `radius` of every point
    (self excluded), exact up to `cell_cap` points per radius-cell and
    P // cell_div occupied cells (see _radius_knn_scene).

    sort=True returns the K nearest ascending; sort=False compacts the
    first K in-radius candidates without the (expensive) top-k — identical
    edge set whenever the in-radius count <= K. with_stats appends a [B]
    int32 count of valid points dropped from the candidate table (cell-slot
    or per-cell capacity overflow) — those points get no incoming edges.
    """
    return jax.vmap(
        lambda pt, m: _radius_knn_scene(pt, m, radius, k, cell_cap, sort=sort,
                                        cell_div=cell_div,
                                        compact_width=compact_width,
                                        with_stats=with_stats)
    )(points, mask)
