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


def ranked_lookup(table, queries, seg: int = 128):
    """searchsorted(table, queries, side='left') for a SORTED 1-D table via
    a two-level compare-count — no sort, no binary-search scalar gathers.

    rank(q) = #\\{i: table[i] < q\\} decomposes over `seg`-sized segments:
    the segment maxes tell how many segments sit ENTIRELY below q (each
    contributes `seg`), and only the one boundary segment needs an exact
    in-segment count — one [N, seg] row-gather + compare-sum. The old
    method="sort" lowering sorts the len(table)+len(queries) concatenation
    (~1.8M keys at prod: 65.6 ms); this runs the [N, T/seg] compare-count
    on the VPU + one row-gather (measured ~3x faster at prod shapes,
    tools/geo_bisect.py knn_parts)."""
    t = table.shape[0]
    ns = (t + seg - 1) // seg
    pad = ns * seg - t
    # pad with +inf-like sentinel (table is int32 keys below int32 max)
    tp = jnp.pad(table, (0, pad), constant_values=jnp.iinfo(table.dtype).max)
    rows = tp.reshape(ns, seg)
    seg_max = rows[:, -1]  # [ns]
    qshape = queries.shape
    q = queries.reshape(-1)
    # full segments strictly below q (their max < q => every entry < q)
    nfull = jnp.sum(
        (seg_max[None, :] < q[:, None]).astype(jnp.int32), axis=1
    )  # [N] in [0, ns]
    bseg = jnp.minimum(nfull, ns - 1)
    seg_rows = rows[bseg]  # [N, seg] row-gather
    inseg = jnp.sum((seg_rows < q[:, None]).astype(jnp.int32), axis=1)
    # when nfull == ns every entry is below q: rank = t exactly
    rank = jnp.where(nfull >= ns, t, bseg * seg + inseg)
    return rank.reshape(qshape)


def _window_lookup_per_slot(cell_keys, n_cells, cc, query_cells, query_valid,
                            spatial=1024):
    """3^3 cell-window lookup, one ranked_lookup per window slot: [N,3]
    (x,y,z int) -> [N,27] cell slots into the sorted table (cc = pad).
    The exactness oracle for `window_lookup` (tests/test_radius_graph.py)."""
    offs = jnp.asarray([(dx, dy, dz) for (dz, dy, dx) in _WINDOW], jnp.int32)  # (x,y,z)
    nc = query_cells[:, None, :] + offs[None, :, :]  # [N,27,3]
    in_range = jnp.all((nc >= 0) & (nc < spatial), axis=-1) & query_valid[:, None]
    nkey = pack_key(jnp.clip(nc, 0, spatial - 1), spatial)
    cwin = ranked_lookup(cell_keys, nkey).astype(jnp.int32)
    cwin = jnp.minimum(cwin, cc - 1)
    found = in_range & (cell_keys[cwin] == nkey) & (cwin < n_cells)
    return jnp.where(found, cwin, cc)  # pad cell


def window_lookup(cell_keys, n_cells, cc, query_cells, query_valid, spatial=1024):
    """3^3 cell-window lookup: query_cells [N,3] (x,y,z int) ->
    [N,27] cell slots into the sorted cell table (cc = not-found pad).

    Run-compressed: pack_key is x-least-significant, so each of the 9
    (dz,dy) window rows wants THREE CONSECUTIVE integer keys {k-1, k, k+1}.
    Keys are unique and the table sorted, so those can only sit at ranks
    r, r+1, r+2 where r = rank(k-1) — ONE ranked_lookup per row (9 instead
    of 27: the lookup's [N, T/seg] compare-count is its bandwidth cost)
    plus a 3-slot gather + 3x3 equality match. x-edge cells (x±1 outside
    the grid) produce keys that alias the neighboring row; the x_ok mask
    rejects them exactly as the per-slot form's in_range did."""
    t = cell_keys.shape[0]
    x, y, z = query_cells[:, 0], query_cells[:, 1], query_cells[:, 2]
    # 9 (dz,dy) rows in _WINDOW's outer order (dz outer, dy inner)
    dyz = jnp.asarray(
        [(dy, dz) for dz in (-1, 0, 1) for dy in (-1, 0, 1)], jnp.int32
    )  # [9,2]
    ny = y[:, None] + dyz[None, :, 0]  # [N,9]
    nz = z[:, None] + dyz[None, :, 1]
    row_ok = (
        (ny >= 0) & (ny < spatial) & (nz >= 0) & (nz < spatial)
        & query_valid[:, None]
    )
    kc = (
        jnp.clip(nz, 0, spatial - 1) * spatial + jnp.clip(ny, 0, spatial - 1)
    ) * spatial + x[:, None]  # [N,9] row-center key (dx=0)
    r = ranked_lookup(cell_keys, kc - 1).astype(jnp.int32)  # [N,9]
    dx3 = jnp.arange(-1, 2, dtype=jnp.int32)  # [-1, 0, 1]
    slots = jnp.minimum(r[..., None] + (dx3 + 1), t - 1)  # [N,9,3] candidate ranks
    g = cell_keys[slots]  # [N,9,3] gathered keys
    wanted = kc[..., None] + dx3  # [N,9,3] in _WINDOW dx order
    x_ok = ((x[:, None] + dx3[None, :]) >= 0) & (
        (x[:, None] + dx3[None, :]) < spatial
    )  # [N,3]
    ok = row_ok[..., None] & x_ok[:, None, :]
    eq = g[:, :, None, :] == wanted[..., None]  # [N,9,3 wanted,3 slots]
    found = ok & jnp.any(eq, axis=-1)
    slot_of = jnp.take_along_axis(
        slots, jnp.argmax(eq, axis=-1), axis=-1
    )  # [N,9,3]
    cwin = jnp.where(found & (slot_of < n_cells), jnp.minimum(slot_of, cc - 1), cc)
    return cwin.reshape(query_cells.shape[0], 27)  # rows x dx = _WINDOW order


def window_lookup_dense(table_coords, table_mask, n_cells, cc,
                        query_cells, query_valid, grid_cap=256):
    """3^3 cell-window lookup via a dense scatter grid — the PRODUCTION
    lookup (`tpu_knn_dense_grid`, default 256; measured on-chip 39.7 ms vs
    the run-compressed form's 76.6 at prod fg with 0 mismatches,
    ONCHIP_SUITE_r4 r4n knn_parts; tests/test_radius_graph.py pins
    exactness vs `window_lookup`).

    The run-compressed lookup pays an O(T/seg) compare-count scan per query
    row (`ranked_lookup`: its [N, T/seg] bandwidth is the 65.6 ms in the r4
    knn attribution). This form scatters each occupied cell's slot id into
    a dense [grid_cap^3] int32 grid (64 MB at 256 — the fill and the ~65k
    scatters are HBM-trivial) and turns the whole 27-window into O(1)
    random gathers, with no key table at all. Exact while every occupied
    cell coord is < grid_cap (12.8 m scene extent at the 5 cm graph cells);
    occupied cells at coords >= grid_cap lose their window edges — counted
    in the returned n_oob so a caller can surface it as a degradation
    counter like every other capacity.

    Precondition: valid table slots (table_mask & slot < n_cells) must
    carry UNIQUE coords — the scatter has no tie rule, so duplicate coords
    would get an unspecified winning slot with no warning. Holds for
    voxelize output (its voxel table is deduped by construction), which is
    the only producer.

    Returns ([N, 27] cell slots in _WINDOW order, pad = cc; n_oob int32).
    """
    t = table_coords.shape[0]
    g3 = grid_cap * grid_cap * grid_cap
    slots = jnp.arange(t, dtype=jnp.int32)
    ok_w = (
        table_mask
        & jnp.all((table_coords >= 0) & (table_coords < grid_cap), axis=-1)
        & (slots < n_cells)
    )
    n_oob = jnp.sum(table_mask & (slots < n_cells) & ~ok_w).astype(jnp.int32)
    wflat = (
        table_coords[:, 2] * grid_cap + table_coords[:, 1]
    ) * grid_cap + table_coords[:, 0]
    wflat = jnp.where(ok_w, wflat, g3)  # pad/oob cells write the scratch slot
    dense = jnp.full((g3 + 1,), cc, jnp.int32)
    dense = dense.at[wflat].set(
        jnp.where(ok_w, slots, cc), mode="promise_in_bounds"
    )
    offs = jnp.asarray([(dx, dy, dz) for (dz, dy, dx) in _WINDOW], jnp.int32)
    nc = query_cells[:, None, :] + offs[None, :, :]  # [N,27,3] (x,y,z)
    inr = jnp.all((nc >= 0) & (nc < grid_cap), axis=-1) & query_valid[:, None]
    nflat = (nc[..., 2] * grid_cap + nc[..., 1]) * grid_cap + nc[..., 0]
    nflat = jnp.where(inr, nflat, g3)
    got = dense[nflat]  # [N,27]; empty cells already read cc
    return jnp.where(inr, got, cc), n_oob


def select_min_k(d2, k):
    """Exact k-smallest per row of d2 [N, W] -> (vals [N, k] ascending,
    pos [N, k] int32 lane indices) via k sequential argmin+mask passes.

    lax.top_k lowers to a per-row SORT of all W lanes (measured 91.9 ms at
    [131072, 648] k=16 on v5e — the single biggest kNN build stage, r4n
    knn_parts; approx_max_k only bought 16%). k argmin passes read the
    [N, W] buffer k times (~5.4 GB at those shapes — bandwidth-bound
    estimate ~10 ms) with a one-element-per-row scatter masking each pick;
    the scatter stays in-place because the buffer is the fori_loop carry.
    Tie order matches lax.top_k (lowest lane index first among equals), so
    radius_knn's final output is bit-identical (pinned in
    tests/test_radius_graph.py). One sanctioned divergence: on a row with
    fewer than k finite lanes the exhausted picks re-select the same _BIG
    lane (masking a _BIG lane with _BIG is a no-op) where top_k would list
    distinct lanes — both carry value _BIG and die at the caller's
    `d2k < _BIG` validity gate."""
    n, w = d2.shape
    rows = jnp.arange(n, dtype=jnp.int32)

    def body(i, carry):
        vals, poss, cur = carry
        j = jnp.argmin(cur, axis=1).astype(jnp.int32)  # ties -> lowest lane
        v = cur[rows, j]
        vals = jax.lax.dynamic_update_slice(vals, v[:, None], (0, i))
        poss = jax.lax.dynamic_update_slice(poss, j[:, None], (0, i))
        cur = cur.at[rows, j].set(jnp.asarray(_BIG, d2.dtype),
                                  mode="promise_in_bounds",
                                  unique_indices=True)
        return vals, poss, cur

    vals0 = jnp.zeros((n, k), d2.dtype)
    poss0 = jnp.zeros((n, k), jnp.int32)
    vals, poss, _ = jax.lax.fori_loop(0, k, body, (vals0, poss0, d2))
    return vals, poss


# 27 window slots ordered center-first (by squared cell-offset norm): the
# per-cell compaction keeps the first `window` candidates in this order, so
# an overflowing window drops the farthest cells' members first
_WINDOW_ORDER = sorted(range(27), key=lambda i: sum(c * c for c in _WINDOW[i]))


def _compact_cell_candidates(cell_pts, cell_xyz, cwin, cmask, p, window):
    """Per-CELL candidate compaction: every point of a cell shares the same
    27-cell window, so compacting the window's member lists to `window`
    dense lanes once per cell — before any per-point work — shrinks the
    per-point d2/top_k from 27*cell_cap lanes to `window` lanes. The
    per-point stage then pays two row-gathers ([P, window] indices +
    [P, window*3] flat-packed xyz) instead of 27 cell-row gathers per point.

    Exact (identical candidate set) while a window holds <= `window` valid
    members; beyond that candidates are kept ROUND-ROBIN across the 27
    cells (member 0 of every cell center-first, then member 1, ...), so a
    truncated window keeps edges in every direction — cell-sequential
    truncation left only the center + one face cell's members, and the
    resulting anisotropic graph broke geodesic propagation outright (AP 0
    on the walled scene). n_window_pts counts the points whose candidate
    window overflowed."""
    cc, cap = cell_pts.shape
    cwin = cwin[:, jnp.asarray(_WINDOW_ORDER, jnp.int32)]
    cell_pts_pad = jnp.concatenate(
        [cell_pts, jnp.full((1, cap), p, jnp.int32)], axis=0
    )
    cell_xyz_pad = jnp.concatenate(
        [cell_xyz, jnp.zeros((1, cap * 3), cell_xyz.dtype)], axis=0
    )
    # [CC, 27, cap] -> r-major [CC, cap, 27]: flat slot q = r*27 + j
    ncand = cell_pts_pad[cwin].transpose(0, 2, 1).reshape(cc, 27 * cap)
    nxyz = (
        cell_xyz_pad[cwin]
        .reshape(cc, 27, cap, 3)
        .transpose(0, 2, 1, 3)
        .reshape(cc, 27 * cap * 3)
    )
    vm = ncand < p
    rank = jnp.cumsum(vm.astype(jnp.int32), axis=1)
    total = rank[:, -1]
    targets = jnp.arange(1, window + 1, dtype=jnp.int32)
    pos = jax.vmap(lambda r: jnp.searchsorted(r, targets, side="left"))(rank)
    inb = targets[None, :] <= total[:, None]
    pos = jnp.minimum(pos, 27 * cap - 1)
    ccand = jnp.where(inb, jnp.take_along_axis(ncand, pos, axis=1), p)
    pos3 = (pos[:, :, None] * 3 + jnp.arange(3, dtype=jnp.int32)).reshape(
        cc, window * 3
    )
    cxyz = jnp.take_along_axis(nxyz, pos3, axis=1)
    # points living in cells whose window lost candidates: their edge set
    # may be non-nearest (degraded-but-bounded; callers surface the count)
    cell_n = jnp.sum((cell_pts < p).astype(jnp.int32), axis=1)
    n_window_pts = jnp.sum(jnp.where((total > window) & cmask, cell_n, 0))
    return ccand, cxyz, n_window_pts


def _radius_knn_scene(points, mask, radius, k, cell_cap, spatial=1024, sort=True,
                      cell_div=1, window=0, with_stats=False, cellwin=False,
                      dense_grid=0, select="topk"):
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
    if dense_grid:
        # dense scatter-grid lookup (measured 39.7 vs 76.6 ms at prod fg,
        # 0 mismatches — r4n knn_parts). Cells at coords >= dense_grid
        # (scene extent > dense_grid*radius) lose ALL window edges — their
        # own window queries go out of range AND no neighbor's window can
        # find them — so their member points are graph drops, the same
        # degraded-but-bounded contract as cell overflow: counted.
        cwin, _ = window_lookup_dense(
            ccoords, cmask, n_cells, cc, ccoords, cmask, grid_cap=dense_grid
        )
        oob_cell = cmask & jnp.any(ccoords >= dense_grid, axis=-1)
        cell_n = jnp.sum((cell_pts < p).astype(jnp.int32), axis=1)
        n_dropped = n_dropped + jnp.sum(jnp.where(oob_cell, cell_n, 0))
    else:
        cwin = window_lookup(cell_keys, n_cells, cc, ccoords, cmask, spatial)

    n_window_pts = jnp.zeros((), jnp.int32)
    if cellwin and not (window and window < 27 * cell_cap):
        # per-CELL window materialization (NO compaction — the cumsum/
        # searchsorted compaction machinery measured 5.5x slower than the
        # wide top_k, DESIGN.md): build each cell's full [27*cap] candidate
        # list and [27*cap*3] flat-packed xyz ONCE per cell, then every
        # point picks its whole window up with a single wide row-gather.
        # Identical candidate set to the per-point two-hop path (pinned in
        # tests/test_radius_graph.py); the difference is gather granularity
        # — [CC,27] cell-row gathers + [P] wide-row gathers instead of
        # 27 narrow row-gathers per POINT (each padded to a full tile).
        cell_pts_pad = jnp.concatenate(
            [cell_pts, jnp.full((1, cell_cap), p, jnp.int32)], axis=0
        )
        cell_xyz_pad = jnp.concatenate(
            [cell_xyz, jnp.zeros((1, cell_cap * 3), points.dtype)], axis=0
        )
        win_cand = cell_pts_pad[cwin].reshape(cc, 27 * cell_cap)  # [CC, W]
        win_xyz = cell_xyz_pad[cwin].reshape(cc, 27 * cell_cap * 3)
        wc_pad = jnp.concatenate(
            [win_cand, jnp.full((1, 27 * cell_cap), p, jnp.int32)], axis=0
        )
        wx_pad = jnp.concatenate(
            [win_xyz, jnp.zeros((1, 27 * cell_cap * 3), points.dtype)], axis=0
        )
        pc = jnp.minimum(p2c, cc)
        live = (p2c < cc) & mask
        cand = jnp.where(live[:, None], wc_pad[pc], p)  # [P, 27*cap]
        cpos = wx_pad[pc]  # [P, 27*cap*3]
        width = 27 * cell_cap
    elif window and window < 27 * cell_cap:
        w_ = max(window, k)
        ccand, cxyz, n_window_pts = _compact_cell_candidates(
            cell_pts, cell_xyz, cwin, cmask, p, w_
        )
        ccand_pad = jnp.concatenate(
            [ccand, jnp.full((1, w_), p, jnp.int32)], axis=0
        )
        cxyz_pad = jnp.concatenate(
            [cxyz, jnp.zeros((1, w_ * 3), points.dtype)], axis=0
        )
        pc = jnp.minimum(p2c, cc)
        cand = jnp.where(
            (p2c < cc)[:, None] & mask[:, None], ccand_pad[pc], p
        )  # [P, W]
        cpos = cxyz_pad[pc]  # [P, W*3]
        width = w_
    else:
        # full-width path (the shipped default): per-point candidate cells
        # [P, 27] (one row-gather), then ONE merged row-gather per window
        # slot from a packed [CC, cap*4] table — each cell's flat xyz
        # (cap*3 lanes, build_cell_table layout) concatenated with its
        # member indices ENCODED as exact f32 VALUES (indices < 2^24
        # roundtrip exactly; recovered with a cast after the gather). The
        # previous two separate gathers (indices [P,27] rows of cap*4 B +
        # positions [P,27] rows of cap*12 B) paid the ~7 ns
        # row-granularity cost TWICE per (point, window slot) — 38.7 +
        # ~25 ms at prod (r4n knn_parts); merging halves the row count for
        # the same bytes. Bit-identical output (the tests pin vs brute
        # force and the per-slot oracle; geo_bisect knn_parts pins merged
        # vs split ON CHIP).
        #
        # NOT a bitcast: int32 indices bitcast into f32 lanes are DENORMAL
        # bit patterns (any index < 2^23), and the TPU flushes denormals —
        # the r5b on-chip knn_parts run measured the bitcast form
        # corrupting 84.9M of 84.9M candidate lanes while every CPU test
        # passed. Value encoding keeps the lanes normal floats.
        assert p < (1 << 24), "f32 value-encoded indices need P < 2^24"
        cwin_pad = jnp.concatenate([cwin, jnp.full((1, 27), cc, jnp.int32)], axis=0)
        cidx = cwin_pad[jnp.minimum(p2c, cc)]  # [P, 27]
        cidx = jnp.where((p2c < cc)[:, None] & mask[:, None], cidx, cc)
        pack = jnp.concatenate(
            [cell_xyz, cell_pts.astype(jnp.float32)], axis=1
        )  # [CC, cap*4]
        pad_row = jnp.concatenate(
            [jnp.zeros((1, cell_cap * 3), points.dtype),
             jnp.full((1, cell_cap), float(p), jnp.float32)],
            axis=1,
        )
        pack_pad = jnp.concatenate([pack, pad_row], axis=0)
        g = pack_pad[cidx]  # [P, 27, cap*4] — one row-gather per slot
        cpos = g[:, :, : cell_cap * 3].reshape(p, 27 * cell_cap * 3)
        cand = g[:, :, cell_cap * 3:].astype(jnp.int32).reshape(
            p, 27 * cell_cap
        )
        width = 27 * cell_cap

    tq = jnp.tile(points, (1, width))  # [P, W*3] (xyzxyz...)
    diff2 = (cpos - tq) ** 2
    d2 = diff2[:, 0::3] + diff2[:, 1::3] + diff2[:, 2::3]
    bad = (cand >= p) | (cand == jnp.arange(p, dtype=jnp.int32)[:, None]) | (
        d2 > radius * radius
    ) | ~mask[:, None]
    d2 = jnp.where(bad, _BIG, d2)
    if width < k:  # tiny cell_cap: pad the window so top_k(k) is legal
        d2 = jnp.pad(d2, ((0, 0), (0, k - width)), constant_values=_BIG)
        cand = jnp.pad(cand, ((0, 0), (0, k - width)), constant_values=p)

    if sort:
        if select == "pallas":
            # VMEM-resident k-extraction kernel: one HBM read of the
            # candidate table instead of top_k's full per-row sort, and
            # the candidate-id pick happens in-kernel (no [P, k]
            # take_along_axis). Bit-identical output (same tie order).
            from geoformer_tpu.ops.knn_select_pallas import select_min_k_cand

            d2k, idx = select_min_k_cand(
                d2, cand, k, interpret=jax.default_backend() != "tpu"
            )
            valid = d2k < _BIG
            idx = jnp.where(valid, idx, p)
            out = jnp.where(valid, d2k, _BIG), idx.astype(jnp.int32)
            return (*out, n_dropped, n_window_pts) if with_stats else out
        if select == "passes":
            d2k, pos = select_min_k(d2, k)  # k nearest within radius
        elif select == "approx":
            # recall_target 0.95: NOT exact — a dropped true-nearest edge
            # is replaced by a farther in-window candidate. Only for A/B
            # measurement (tools/geo_bisect.py); shipping it would need
            # the AP-delta gate extended to its miss pattern.
            neg_d, pos = jax.lax.approx_max_k(-d2, k, recall_target=0.95)
            pos = pos.astype(jnp.int32)
            d2k = -neg_d
        else:
            neg_d, pos = jax.lax.top_k(-d2, k)  # k nearest within radius
            d2k = -neg_d
        idx = jnp.take_along_axis(cand, pos, axis=1)
        valid = d2k < _BIG
        idx = jnp.where(valid, idx, p)
        out = jnp.where(valid, d2k, _BIG), idx.astype(jnp.int32)
        return (*out, n_dropped, n_window_pts) if with_stats else out

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
    return (*out, n_dropped, n_window_pts) if with_stats else out


def radius_knn(points, mask, radius, k, cell_cap: int = 8, sort: bool = True,
               cell_div: int = 1, window: int = 0,
               with_stats: bool = False, cellwin: bool = False,
               dense_grid: int = 0, select: str = "topk"):
    """points [B,P,3], mask [B,P] -> (sq-dists [B,P,k] (1e30 pad), idx
    [B,P,k] int32 (P = pad)): K neighbors within `radius` of every point
    (self excluded), exact up to `cell_cap` points per radius-cell and
    P // cell_div occupied cells (see _radius_knn_scene).

    sort=True returns the K nearest ascending; sort=False compacts the
    first K in-radius candidates without the (expensive) top-k — identical
    edge set whenever the in-radius count <= K. window>0 compacts each
    cell's 27-neighbor member lists to max(window, k) candidate lanes once
    per CELL before the per-point d2/top_k (see _compact_cell_candidates);
    exact while every window holds <= that many members. cellwin=True
    materializes each cell's FULL [27*cell_cap] window once per cell
    (exact — identical candidate set; only the gather granularity
    changes). dense_grid>0 replaces the compare-count window lookup with a
    dense [dense_grid^3] scatter grid (exact while the scene's occupied
    cell coords are < dense_grid; beyond that the cell's points drop from
    the graph — counted). select picks the k-selection: "topk" (lax.top_k
    per-row sort), "pallas" (VMEM-resident k-extraction kernel,
    ops/knn_select_pallas.py — exact, bit-identical output), "passes"
    (select_min_k argmin passes — exact, bit-identical), "approx"
    (approx_max_k, recall 0.95 — measurement only). with_stats appends
    two [B] int32 counters: points dropped from the candidate table
    (cell-slot or per-cell capacity overflow, or dense_grid out-of-extent
    cells — those points get no edges) and points whose candidate window
    overflowed `window` (their edges may be non-nearest).
    """
    return jax.vmap(
        lambda pt, m: _radius_knn_scene(pt, m, radius, k, cell_cap, sort=sort,
                                        cell_div=cell_div,
                                        window=window,
                                        with_stats=with_stats,
                                        cellwin=cellwin,
                                        dense_grid=dense_grid,
                                        select=select)
    )(points, mask)
