"""Voxel-hash radius kNN vs brute force (the geodesic graph builder)."""

import numpy as np
import jax.numpy as jnp

from geoformer_tpu.ops.radius_graph import radius_knn


def _brute(points, mask, radius, k):
    p = len(points)
    d2 = ((points[:, None, :] - points[None, :, :]) ** 2).sum(-1)
    d2[~mask] = 1e30
    d2[:, ~mask] = 1e30
    np.fill_diagonal(d2, 1e30)
    d2[d2 > radius * radius] = 1e30
    idx = np.argsort(d2, axis=1)[:, :k]
    dk = np.take_along_axis(d2, idx, axis=1)
    idx[dk >= 1e30] = p
    return dk, idx


def test_radius_knn_matches_brute_force():
    rng = np.random.default_rng(0)
    p, k, r = 300, 8, 0.12
    pts = rng.uniform(0, 1, size=(p, 3)).astype(np.float32)
    mask = np.ones(p, bool)
    mask[280:] = False
    want_d, want_i = _brute(pts, mask, r, k)
    got_d, got_i = radius_knn(jnp.asarray(pts[None]), jnp.asarray(mask[None]), r, k,
                              cell_cap=16)
    got_d, got_i = np.asarray(got_d[0]), np.asarray(got_i[0])

    for q in range(280):
        wd = want_d[q][want_d[q] < 1e30]
        gd = got_d[q][got_d[q] < 1e30]
        assert len(wd) == len(gd), f"point {q}: {len(wd)} vs {len(gd)} neighbors"
        np.testing.assert_allclose(np.sort(gd), np.sort(wd), rtol=1e-4)
        # neighbor sets equal (distances may tie)
        ws = set(want_i[q][want_d[q] < 1e30].tolist())
        gs = set(got_i[q][got_d[q] < 1e30].tolist())
        assert ws == gs, f"point {q}"
    # invalid points have no neighbors
    assert (got_i[280:] == p).all()


def test_radius_knn_window_exact():
    """Per-cell window compaction (window>0) == the full-width path
    (ascending nearest-k, same ids/distances) when every 27-cell window
    holds <= window members — and the overflow counter reports 0."""
    rng = np.random.default_rng(3)
    p, k, r = 500, 8, 0.1
    pts = rng.uniform(0, 1, size=(p, 3)).astype(np.float32)
    pts[:, 2] *= 0.1  # dense sheet -> busy windows
    mask = np.ones(p, bool)
    mask[480:] = False
    ref_d, ref_i = radius_knn(jnp.asarray(pts[None]), jnp.asarray(mask[None]),
                              r, k, cell_cap=32)
    got_d, got_i, ovf, wovf = radius_knn(
        jnp.asarray(pts[None]), jnp.asarray(mask[None]),
        r, k, cell_cap=32, window=256, with_stats=True)
    assert int(ovf[0]) == 0 and int(wovf[0]) == 0
    np.testing.assert_allclose(np.asarray(got_d), np.asarray(ref_d), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(ref_i))


def test_radius_knn_window_overflow_counted_and_bounded():
    """A window too small for the local density: the counter reports the
    points whose candidate window overflowed, and every returned edge is
    still a real in-radius neighbor (degraded = fewer/non-nearest edges,
    never wrong ones)."""
    rng = np.random.default_rng(7)
    p, k, r = 300, 8, 0.2
    pts = rng.uniform(0, 0.3, size=(p, 3)).astype(np.float32)  # dense blob
    mask = np.ones(p, bool)
    got_d, got_i, ovf, wovf = radius_knn(
        jnp.asarray(pts[None]), jnp.asarray(mask[None]),
        r, k, cell_cap=64, window=16, with_stats=True)
    assert int(wovf[0]) > 0  # the blob's windows exceed 16 members
    got_d, got_i = np.asarray(got_d[0]), np.asarray(got_i[0])
    live = got_d < 1e30
    assert live.any()
    qi = np.broadcast_to(np.arange(p)[:, None], got_i.shape)
    d_true = ((pts[np.minimum(got_i, p - 1)] - pts[qi]) ** 2).sum(-1)
    assert (got_i[live] < p).all()
    assert (got_i[live] != qi[live]).all()
    np.testing.assert_allclose(got_d[live], d_true[live], rtol=1e-4)
    assert (got_d[live] <= r * r + 1e-6).all()


def test_radius_knn_dense_cluster_cap():
    """More in-radius neighbors than k: keeps the k nearest."""
    rng = np.random.default_rng(1)
    pts = rng.normal(0, 0.02, size=(64, 3)).astype(np.float32)
    mask = np.ones(64, bool)
    got_d, got_i = radius_knn(jnp.asarray(pts[None]), jnp.asarray(mask[None]), 0.5, 4,
                              cell_cap=64)
    got_d = np.asarray(got_d[0])
    want_d, _ = _brute(pts, mask, 0.5, 4)
    np.testing.assert_allclose(got_d, want_d, rtol=1e-4, atol=1e-7)


def test_radius_knn_unsorted_same_edge_set():
    rng = np.random.default_rng(2)
    p, k, r = 300, 16, 0.12
    pts = rng.uniform(0, 1, size=(p, 3)).astype(np.float32)
    mask = np.ones(p, bool)
    d_s, i_s = radius_knn(jnp.asarray(pts[None]), jnp.asarray(mask[None]), r, k,
                          cell_cap=16, sort=True)
    d_u, i_u = radius_knn(jnp.asarray(pts[None]), jnp.asarray(mask[None]), r, k,
                          cell_cap=16, sort=False)
    for q in range(p):
        s = set(np.asarray(i_s[0][q])[np.asarray(d_s[0][q]) < 1e30].tolist())
        u = set(np.asarray(i_u[0][q])[np.asarray(d_u[0][q]) < 1e30].tolist())
        assert s == u, q


def test_radius_knn_with_stats_counts_drops():
    """with_stats: 0 on healthy scenes; counts the valid points a binding
    cell-slot or per-cell capacity excludes from the candidate table."""
    rng = np.random.default_rng(4)
    p, k, r = 256, 4, 0.1
    pts = rng.uniform(0, 1, size=(p, 3)).astype(np.float32)
    mask = np.ones(p, bool)
    mask[250:] = False
    _, _, ovf, _ = radius_knn(jnp.asarray(pts[None]), jnp.asarray(mask[None]), r, k,
                              cell_cap=16, with_stats=True)
    assert int(ovf[0]) == 0

    # per-cell capacity binds: 40 coincident points, cap 8 -> 32 dropped
    pts2 = np.full((40, 3), 0.5, np.float32) + rng.normal(
        0, 1e-4, size=(40, 3)).astype(np.float32)
    mask2 = np.ones(40, bool)
    _, _, ovf2, _ = radius_knn(jnp.asarray(pts2[None]), jnp.asarray(mask2[None]), r, k,
                               cell_cap=8, with_stats=True)
    assert int(ovf2[0]) == 32

    # cell-slot capacity binds: 64 points isolated beyond the radius
    # (64 occupied cells) with cell_div=4 -> only 16 cell slots
    pts3 = (np.arange(64, dtype=np.float32)[:, None] * np.asarray(
        [[3 * r, 0, 0]], np.float32))
    mask3 = np.ones(64, bool)
    _, _, ovf3, _ = radius_knn(jnp.asarray(pts3[None]), jnp.asarray(mask3[None]), r, k,
                               cell_cap=8, cell_div=4, with_stats=True)
    assert int(ovf3[0]) == 64 - 16


def test_radius_knn_cell_div_dense_surface():
    """cell_div=2 (the model's setting for dense scan surfaces) matches the
    exact cell_div=1 result when cell occupancy >= 2 — here a 2.8 cm-spaced
    plane patch with 5 cm cells (~3 points/cell), the fg density regime."""
    rng = np.random.default_rng(3)
    n = 1024
    side = int(np.sqrt(n))
    g = np.stack(np.meshgrid(np.arange(side), np.arange(side)), -1).reshape(-1, 2)
    pts = np.zeros((n, 3), np.float32)
    pts[:, :2] = g[:n] * 0.028
    pts += rng.normal(0, 0.003, size=pts.shape).astype(np.float32)
    mask = np.ones(n, bool)
    r, k = 0.05, 8
    d1, i1 = radius_knn(jnp.asarray(pts[None]), jnp.asarray(mask[None]), r, k,
                        cell_cap=8, cell_div=1)
    d2, i2 = radius_knn(jnp.asarray(pts[None]), jnp.asarray(mask[None]), r, k,
                        cell_cap=8, cell_div=2)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-6)


def test_radius_knn_cellwin_exact():
    """The per-cell window-materialization path returns the IDENTICAL graph
    (indices and d2) to the per-point two-hop path — it only changes gather
    granularity, never the candidate set."""
    rng = np.random.default_rng(23)
    pts = jnp.asarray(rng.normal(size=(1, 700, 3)).astype(np.float32) * 0.35)
    mask = jnp.asarray(rng.random((1, 700)) > 0.08)
    for cap, div in [(8, 1), (16, 2), (4, 2)]:
        d1, i1 = radius_knn(pts, mask, 0.12, 12, cell_cap=cap, cell_div=div)
        d2_, i2 = radius_knn(pts, mask, 0.12, 12, cell_cap=cap, cell_div=div,
                             cellwin=True)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        np.testing.assert_allclose(np.asarray(d1), np.asarray(d2_), rtol=1e-6)


def test_window_lookup_run_compressed_matches_per_slot():
    """The run-compressed window lookup (one ranked_lookup per (dz,dy) row
    + 3-consecutive-slot match) must equal the per-slot oracle exactly —
    including grid-edge cells where x±1 keys alias the neighboring row,
    empty neighbor cells, and pad query slots."""
    from geoformer_tpu.ops.radius_graph import (
        _window_lookup_per_slot, build_cell_table, window_lookup)

    rng = np.random.default_rng(5)
    spatial = 16  # small grid => many edge cells exercise the alias masks
    for seed in range(3):
        rng = np.random.default_rng(seed)
        p = 512
        pts = rng.uniform(0, spatial * 0.05, (p, 3)).astype(np.float32)
        mask = np.ones(p, bool)
        mask[-37:] = False
        cc = p // 2
        grid, origin, cell_pts, cell_xyz, nd = build_cell_table(
            jnp.asarray(pts), jnp.asarray(mask), 0.05, cc, 8, spatial)
        keys = grid.voxel_keys[0]
        ncells = grid.n_voxels[0]
        qcells = grid.voxel_coords[0]
        qvalid = grid.voxel_mask[0]
        want = np.asarray(_window_lookup_per_slot(
            keys, ncells, cc, qcells, qvalid, spatial))
        got = np.asarray(window_lookup(keys, ncells, cc, qcells, qvalid, spatial))
        np.testing.assert_array_equal(got, want)


def test_window_lookup_dense_matches_run_compressed():
    """The dense scatter-grid lookup (experimental A/B arm) must equal the
    shipped run-compressed lookup exactly while the scene fits grid_cap,
    and must count (not silently drop) occupied cells beyond grid_cap."""
    from geoformer_tpu.ops.radius_graph import (
        build_cell_table, window_lookup, window_lookup_dense)

    spatial = 16
    for seed in range(3):
        rng = np.random.default_rng(seed)
        p = 512
        pts = rng.uniform(0, spatial * 0.05, (p, 3)).astype(np.float32)
        mask = np.ones(p, bool)
        mask[-37:] = False
        cc = p // 2
        grid, origin, cell_pts, cell_xyz, nd = build_cell_table(
            jnp.asarray(pts), jnp.asarray(mask), 0.05, cc, 8, spatial)
        keys = grid.voxel_keys[0]
        ncells = grid.n_voxels[0]
        qcells = grid.voxel_coords[0]
        qvalid = grid.voxel_mask[0]
        want = np.asarray(window_lookup(keys, ncells, cc, qcells, qvalid, spatial))
        got, n_oob = window_lookup_dense(
            qcells, qvalid, ncells, cc, qcells, qvalid, grid_cap=spatial)
        np.testing.assert_array_equal(np.asarray(got), want)
        assert int(n_oob) == 0

    # grid_cap smaller than the occupied extent: the out-of-cap cells are
    # counted, and in-cap windows that reach past the cap miss only those
    # neighbors (pad = cc) — never a wrong slot
    grid, origin, cell_pts, cell_xyz, nd = build_cell_table(
        jnp.asarray(pts), jnp.asarray(mask), 0.05, cc, 8, spatial)
    qcells = grid.voxel_coords[0]
    qvalid = grid.voxel_mask[0]
    ncells = grid.n_voxels[0]
    cap = 8  # occupied coords run 0..15
    got, n_oob = window_lookup_dense(
        qcells, qvalid, ncells, cc, qcells, qvalid, grid_cap=cap)
    oob = np.asarray(qvalid) & ~np.all(
        (np.asarray(qcells) >= 0) & (np.asarray(qcells) < cap), axis=-1)
    assert int(n_oob) == int(oob.sum()) > 0
    want = np.asarray(window_lookup(
        grid.voxel_keys[0], ncells, cc, qcells, qvalid, spatial))
    got = np.asarray(got)
    in_cap_q = ~oob & np.asarray(qvalid)
    # wherever the dense form found a slot, it must be the exact slot
    found = got[in_cap_q] < cc
    np.testing.assert_array_equal(got[in_cap_q][found], want[in_cap_q][found])
    # and the only misses are windows reaching past the cap
    missed_wrong = (got[in_cap_q] == cc) & (want[in_cap_q] < cc)
    if missed_wrong.any():
        # every such miss must point at an out-of-cap neighbor slot
        slots = want[in_cap_q][missed_wrong]
        coords = np.asarray(qcells)[slots]
        assert (coords >= cap).any(axis=-1).all()


def test_ranked_lookup_matches_searchsorted():
    """ranked_lookup (two-level compare-count) == searchsorted side='left'
    on sorted int32 tables, incl. exact hits, duplicates, below-min /
    above-max queries, and non-multiple-of-segment table lengths."""
    from geoformer_tpu.ops.radius_graph import ranked_lookup

    rng = np.random.default_rng(11)
    for t_len in (1, 127, 128, 129, 4096):
        table = np.sort(rng.integers(0, 2**30, t_len).astype(np.int32))
        # force duplicate runs
        table[t_len // 2:t_len // 2 + min(5, t_len - t_len // 2)] = table[t_len // 2]
        table = np.sort(table)
        qs = np.concatenate([
            rng.integers(0, 2**30, 2048).astype(np.int32),
            table[: min(t_len, 64)],
            np.array([0, 2**30 - 1], np.int32),
        ])
        qs = qs[: qs.size - qs.size % 2].reshape(-1, 2)  # non-flat shape must round-trip
        want = np.searchsorted(table, qs, side="left")
        got = np.asarray(ranked_lookup(jnp.asarray(table), jnp.asarray(qs)))
        np.testing.assert_array_equal(got, want)

def test_radius_knn_dense_grid_exact_and_counts_oob():
    """dense_grid (the production window lookup) returns the IDENTICAL
    graph to the compare-count path while the scene fits, and counts the
    points of out-of-extent cells as graph drops when it doesn't."""
    rng = np.random.default_rng(29)
    pts = jnp.asarray(rng.uniform(0, 1, size=(1, 600, 3)).astype(np.float32))
    mask = jnp.asarray(rng.random((1, 600)) > 0.06)
    d1, i1, ovf1, _ = radius_knn(pts, mask, 0.1, 8, cell_cap=16, cell_div=1,
                                 with_stats=True)
    d2_, i2, ovf2, _ = radius_knn(pts, mask, 0.1, 8, cell_cap=16, cell_div=1,
                                  dense_grid=256, with_stats=True)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2_), rtol=1e-6)
    assert int(ovf2[0]) == int(ovf1[0]) == 0

    # scene spans ~10 cells at radius 0.1; grid_cap=4 puts the far cells
    # out of extent -> their points lose every edge and are counted
    d3, i3, ovf3, _ = radius_knn(pts, mask, 0.1, 8, cell_cap=16, cell_div=1,
                                 dense_grid=4, with_stats=True)
    assert int(ovf3[0]) > 0
    # in-extent edges that survive are still real in-radius neighbors
    live = np.asarray(d3[0]) < 1e30
    assert live.any()
    p = pts.shape[1]
    qi = np.broadcast_to(np.arange(p)[:, None], np.asarray(i3[0]).shape)
    pn = np.asarray(pts[0])
    d_true = ((pn[np.minimum(np.asarray(i3[0]), p - 1)] - pn[qi]) ** 2).sum(-1)
    np.testing.assert_allclose(np.asarray(d3[0])[live], d_true[live], rtol=1e-4)


def test_radius_knn_select_passes_bit_identical():
    """select="passes" (k argmin passes) == select="topk" exactly: same
    indices and d2, including tie-heavy dense clusters and rows with fewer
    than k in-radius neighbors (exhausted picks die at the validity gate)."""
    rng = np.random.default_rng(31)
    # uniform cloud (sparse rows) + a coincident blob (ties)
    pts = np.concatenate([
        rng.uniform(0, 1, size=(400, 3)),
        np.full((40, 3), 0.5) + rng.normal(0, 1e-4, size=(40, 3)),
    ]).astype(np.float32)
    mask = np.ones(len(pts), bool)
    mask[-7:] = False
    for cap, k in [(16, 8), (64, 16)]:
        a_d, a_i = radius_knn(jnp.asarray(pts[None]), jnp.asarray(mask[None]),
                              0.1, k, cell_cap=cap, select="topk")
        b_d, b_i = radius_knn(jnp.asarray(pts[None]), jnp.asarray(mask[None]),
                              0.1, k, cell_cap=cap, select="passes")
        np.testing.assert_array_equal(np.asarray(a_i), np.asarray(b_i))
        np.testing.assert_array_equal(np.asarray(a_d), np.asarray(b_d))


def test_select_min_k_matches_topk():
    """select_min_k == lax.top_k(-x) on finite lanes (values AND lanes),
    for ties and k > #finite lanes."""
    import jax
    from geoformer_tpu.ops.radius_graph import select_min_k

    rng = np.random.default_rng(13)
    x = rng.uniform(0, 1, size=(64, 37)).astype(np.float32)
    x[x > 0.7] = 1e30           # invalid lanes
    x[5] = 1e30                 # a fully-invalid row
    x[6, :3] = 0.25             # ties
    for k in (1, 5, 16):
        want_v, want_p = jax.lax.top_k(-jnp.asarray(x), k)
        got_v, got_p = select_min_k(jnp.asarray(x), k)
        finite = np.asarray(-want_v) < 1e30
        np.testing.assert_array_equal(np.asarray(got_v)[finite],
                                      np.asarray(-want_v)[finite])
        np.testing.assert_array_equal(np.asarray(got_p)[finite],
                                      np.asarray(want_p)[finite])
        # exhausted picks all carry the sentinel value
        assert (np.asarray(got_v)[~finite] >= 1e30).all()


def test_radius_knn_select_pallas_bit_identical():
    """select="pallas" (VMEM k-extraction kernel, interpret mode on CPU)
    == select="topk" exactly: indices and d2, under ties, sparse rows,
    and pad points (same cases as the "passes" pin)."""
    rng = np.random.default_rng(33)
    pts = np.concatenate([
        rng.uniform(0, 1, size=(400, 3)),
        np.full((40, 3), 0.5) + rng.normal(0, 1e-4, size=(40, 3)),
    ]).astype(np.float32)
    mask = np.ones(len(pts), bool)
    mask[-7:] = False
    for cap, k in [(16, 8), (64, 16)]:
        a_d, a_i = radius_knn(jnp.asarray(pts[None]), jnp.asarray(mask[None]),
                              0.1, k, cell_cap=cap, select="topk")
        b_d, b_i = radius_knn(jnp.asarray(pts[None]), jnp.asarray(mask[None]),
                              0.1, k, cell_cap=cap, select="pallas")
        np.testing.assert_array_equal(np.asarray(a_i), np.asarray(b_i))
        np.testing.assert_array_equal(np.asarray(a_d), np.asarray(b_d))


def test_select_min_k_cand_matches_topk():
    """select_min_k_cand == lax.top_k(-d2) + take_along_axis over the
    candidate table: values everywhere, candidate ids on valid lanes
    (exhausted rows diverge only on dead lanes, by the documented
    contract), across width padding and row-block remainders."""
    import jax
    from geoformer_tpu.ops.knn_select_pallas import select_min_k_cand

    rng = np.random.default_rng(17)
    n, w, k = 300, 70, 16
    d2 = rng.uniform(0, 1, size=(n, w)).astype(np.float32)
    d2[rng.random((n, w)) < 0.3] = 1e30
    d2[5] = 1e30                       # fully-dead row
    d2[7, :6] = 0.25                   # ties
    d2[12] = 1e30
    d2[12, :3] = [0.1, 0.2, 0.3]       # fewer than k finite lanes
    cand = rng.integers(0, 1000, size=(n, w)).astype(np.int32)
    neg, pos = jax.lax.top_k(-jnp.asarray(d2), k)
    ref_v = np.asarray(-neg)
    ref_i = np.asarray(jnp.take_along_axis(jnp.asarray(cand), pos, axis=1))
    got_v, got_i = select_min_k_cand(
        jnp.asarray(d2), jnp.asarray(cand), k, block_rows=64, interpret=True
    )
    valid = ref_v < 1e30
    np.testing.assert_array_equal(np.asarray(got_v), ref_v)
    np.testing.assert_array_equal(np.asarray(got_i)[valid], ref_i[valid])
