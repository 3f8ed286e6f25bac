"""FPS / ball query / kNN / geodesic vs numpy & scipy references."""

import numpy as np
import jax.numpy as jnp
import scipy.sparse
import scipy.sparse.csgraph

from geoformer_tpu.ops.fps import furthest_point_sample
from geoformer_tpu.ops.ball_query import ball_query
from geoformer_tpu.ops.knn import knn
from geoformer_tpu.ops.geodesic import geodesic_distance


def np_fps(points, mask, k):
    n = points.shape[0]
    dist = np.where(mask, 1e10, -1.0)
    idxs = np.zeros(k, np.int64)
    last = 0
    for i in range(1, k):
        d = np.sum((points - points[last]) ** 2, -1)
        dist = np.where(mask, np.minimum(dist, d), -1.0)
        last = int(np.argmax(dist))
        idxs[i] = last
    return idxs


def test_fps_matches_numpy():
    rng = np.random.default_rng(0)
    P, K = 100, 16
    pts = rng.normal(size=(P, 3)).astype(np.float32)
    mask = np.ones(P, bool)
    mask[80:] = False
    idx, valid = furthest_point_sample(jnp.asarray(pts[None]), jnp.asarray(mask[None]), K)
    ref = np_fps(pts, mask, K)
    np.testing.assert_array_equal(np.asarray(idx[0]), ref)
    assert bool(valid[0].all())


def test_fps_fewer_valid_than_samples():
    rng = np.random.default_rng(3)
    pts = rng.normal(size=(20, 3)).astype(np.float32)
    mask = np.zeros(20, bool)
    mask[:5] = True
    idx, valid = furthest_point_sample(jnp.asarray(pts[None]), jnp.asarray(mask[None]), 8)
    assert np.asarray(valid[0]).sum() == 5
    assert set(np.asarray(idx[0])[:5]) <= set(range(5))


def test_ball_query_first_in_index_order():
    rng = np.random.default_rng(1)
    P, K, NS, R = 200, 8, 4, 0.5
    pts = rng.uniform(-1, 1, size=(P, 3)).astype(np.float32)
    mask = np.ones(P, bool)
    mask[190:] = False
    centers = pts[:K]
    idx, hit = ball_query(
        jnp.asarray(centers[None]), jnp.asarray(pts[None]), jnp.asarray(mask[None]), R, NS
    )
    idx, hit = np.asarray(idx[0]), np.asarray(hit[0])
    for c in range(K):
        d2 = np.sum((pts - centers[c]) ** 2, -1)
        inside = np.nonzero((d2 <= R * R) & mask)[0]
        expect = inside[:NS]
        got = idx[c][hit[c]]
        np.testing.assert_array_equal(np.sort(got), np.sort(expect))
        if len(expect) < NS and len(expect) > 0:
            # padding repeats the first hit
            assert np.all(idx[c][~hit[c]] == got[0])


def test_ball_query_hash_matches_brute():
    """Voxel-hash ball query == brute-force path (idx, hit, padding) when
    cell capacity is generous; dense surface-ish cloud to exercise windows."""
    rng = np.random.default_rng(7)
    P, K, NS, R = 2048, 64, 16, 0.11
    pts = rng.uniform(0, 1, size=(P, 3)).astype(np.float32)
    pts[:, 2] *= 0.05  # squash -> locally dense sheet
    mask = np.ones(P, bool)
    mask[2000:] = False
    centers = pts[rng.choice(2000, K, replace=False)]
    args = (jnp.asarray(centers[None]), jnp.asarray(pts[None]),
            jnp.asarray(mask[None]), R, NS)
    idx_b, hit_b = ball_query(*args)
    idx_h, hit_h = ball_query(*args, cell_cap=256)
    np.testing.assert_array_equal(np.asarray(hit_h), np.asarray(hit_b))
    np.testing.assert_array_equal(np.asarray(idx_h), np.asarray(idx_b))


def test_ball_query_hash_empty_window():
    """A center with no in-radius points: all-false hit, in-bounds indices."""
    pts = np.array([[0.0, 0, 0], [0.01, 0, 0], [5, 5, 5]], np.float32)
    centers = np.array([[9.0, 9, 9]], np.float32)
    mask = np.ones(3, bool)
    idx, hit = ball_query(jnp.asarray(centers[None]), jnp.asarray(pts[None]),
                          jnp.asarray(mask[None]), 0.1, 4, cell_cap=8)
    assert not np.asarray(hit).any()
    assert (np.asarray(idx) >= 0).all() and (np.asarray(idx) < 3).all()


def test_knn_matches_numpy():
    rng = np.random.default_rng(2)
    P, K = 300, 8
    pts = rng.normal(size=(P, 3)).astype(np.float32)
    mask = np.ones(P, bool)
    mask[250:] = False
    d, i = knn(
        jnp.asarray(pts[None]), jnp.asarray(pts[None]), jnp.asarray(mask[None]),
        K, query_chunk=64, key_tile=128,
    )
    d, i = np.asarray(d[0]), np.asarray(i[0])
    d2_full = np.sum((pts[:, None] - pts[None]) ** 2, -1)
    d2_full[:, ~mask] = 1e30
    for q in range(250):
        ref = np.sort(d2_full[q])[:K]
        np.testing.assert_allclose(np.sort(d[q]), ref, rtol=1e-3, atol=1e-5)
        assert i[q, np.argmin(d[q])] == q  # self is the nearest


def test_geodesic_matches_dijkstra():
    rng = np.random.default_rng(4)
    P, NBR, Q, R = 120, 8, 4, 0.35
    pts = rng.uniform(0, 1, size=(P, 3)).astype(np.float32)
    mask = np.ones(P, bool)
    mask[110:] = False

    d2, idx = knn(jnp.asarray(pts[None]), jnp.asarray(pts[None]), jnp.asarray(mask[None]), NBR + 1)
    nbr_d = np.sqrt(np.asarray(d2[0])[:, 1:])
    nbr_i = np.asarray(idx[0])[:, 1:]

    seeds = np.array([0, 5, 9, 200], np.int32)  # last seed invalid
    seed_mask = np.array([True, True, True, False])

    geo = geodesic_distance(
        jnp.asarray(nbr_i[None]), jnp.asarray(nbr_d[None]),
        jnp.asarray(seeds[None]), jnp.asarray(seed_mask[None]),
        jnp.asarray(mask[None]), R, 64, rev_slots=P,  # exact symmetric closure
    )
    geo = np.asarray(geo[0])  # [P, Q]
    # spatially-ordered fast sweeping reaches the same fixpoint
    geo_sweep = np.asarray(geodesic_distance(
        jnp.asarray(nbr_i[None]), jnp.asarray(nbr_d[None]),
        jnp.asarray(seeds[None]), jnp.asarray(seed_mask[None]),
        jnp.asarray(mask[None]), R, 64, rev_slots=P,
        positions=jnp.asarray(pts[None]),
    )[0])
    np.testing.assert_allclose(geo_sweep, geo, rtol=1e-5, atol=1e-5)
    # default reverse-edge cap: distances can only grow (dropped shortcuts),
    # and only slightly on this graph
    geo_capped = np.asarray(geodesic_distance(
        jnp.asarray(nbr_i[None]), jnp.asarray(nbr_d[None]),
        jnp.asarray(seeds[None]), jnp.asarray(seed_mask[None]),
        jnp.asarray(mask[None]), R, 64,
    )[0])
    both = (geo >= 0) & (geo_capped >= 0)
    assert np.all(geo_capped[both] >= geo[both] - 1e-5)
    assert np.abs(geo_capped[both] - geo[both]).max() < 0.25

    # scipy reference on the symmetrized radius-gated kNN graph
    rows, cols, vals = [], [], []
    for p in range(P):
        if not mask[p]:
            continue
        for j in range(NBR):
            if nbr_d[p, j] <= R and mask[nbr_i[p, j]]:
                rows.append(p)
                cols.append(nbr_i[p, j])
                vals.append(nbr_d[p, j])
    g = scipy.sparse.csr_matrix((vals, (rows, cols)), shape=(P, P))
    ref = scipy.sparse.csgraph.dijkstra(g, directed=False, indices=seeds[:3])

    for qi in range(3):
        r = ref[qi]
        got = geo[:, qi]
        reached = np.isfinite(r) & mask
        np.testing.assert_allclose(got[reached], r[reached], rtol=1e-4, atol=1e-5)
        assert np.all(got[~reached & mask] == -1)
    np.testing.assert_array_equal(geo[:, 3][mask], -1)  # invalid seed: all unreached
    assert np.all(geo[~mask] == -1)


def test_geodesic_no_symmetrize_on_radius_graph():
    """With a radius-kNN graph (symmetric when the cap doesn't bind),
    symmetrize=False reproduces the symmetrized result."""
    from geoformer_tpu.ops.radius_graph import radius_knn

    rng = np.random.default_rng(11)
    # K comfortably above the in-radius neighbor count (production regime:
    # K=64 vs ~23 neighbors at 5cm) — the cap never binds, graph symmetric
    P, K, R = 150, 48, 0.3
    pts = rng.uniform(0, 1, size=(P, 3)).astype(np.float32)
    mask = np.ones(P, bool)
    d2, idx = radius_knn(jnp.asarray(pts[None]), jnp.asarray(mask[None]), R, K, cell_cap=32)
    nbr_d = np.sqrt(np.minimum(np.asarray(d2[0]), 4.0))
    nbr_i = np.asarray(idx[0])
    seeds = np.array([0, 5], np.int32)
    sm = np.array([True, True])
    args = (jnp.asarray(nbr_i[None]), jnp.asarray(nbr_d[None]),
            jnp.asarray(seeds[None]), jnp.asarray(sm[None]),
            jnp.asarray(mask[None]), R, 64)
    a = np.asarray(geodesic_distance(*args, symmetrize=True)[0])
    b = np.asarray(geodesic_distance(*args, symmetrize=False)[0])
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_geodesic_int16_close_to_fp32():
    rng = np.random.default_rng(12)
    P, NBR, Q, R = 200, 10, 8, 0.3
    pts = rng.uniform(0, 1, size=(P, 3)).astype(np.float32)
    mask = np.ones(P, bool)
    d2, idx = knn(jnp.asarray(pts[None]), jnp.asarray(pts[None]), jnp.asarray(mask[None]), NBR + 1)
    nbr_d = np.sqrt(np.asarray(d2[0])[:, 1:])
    nbr_i = np.asarray(idx[0])[:, 1:]
    seeds = np.arange(Q, dtype=np.int32)
    sm = np.ones(Q, bool)
    args = (jnp.asarray(nbr_i[None]), jnp.asarray(nbr_d[None]),
            jnp.asarray(seeds[None]), jnp.asarray(sm[None]),
            jnp.asarray(mask[None]), R, 64)
    full = np.asarray(geodesic_distance(*args, positions=jnp.asarray(pts[None]))[0])
    q16 = np.asarray(geodesic_distance(*args, positions=jnp.asarray(pts[None]),
                                       relax_dtype=jnp.int16)[0])
    both = (full >= 0) & (q16 >= 0)
    assert (full >= 0).sum() == (q16 >= 0).sum()
    # mm-quantized path sums stay within a few mm of fp32
    np.testing.assert_allclose(q16[both], full[both], atol=0.01)


def test_geodesic_hier_close_to_exact():
    """Two-level solve (coarse cell graph + fine sweeps) tracks the exact
    field within O(cell) on a surface-like scan and preserves -1/reach."""
    from geoformer_tpu.ops.geodesic import geodesic_distance_hier
    from geoformer_tpu.ops.radius_graph import radius_knn

    rng = np.random.default_rng(13)
    # surface-like scan: floor + wall at ~2.5cm spacing (the hier solve's
    # locally-flat intra-cell assumption is about this regime)
    n = 1024
    floor = np.stack([rng.uniform(0, 0.8, n), rng.uniform(0, 0.8, n),
                      np.zeros(n)], axis=1)
    wall = np.stack([rng.uniform(0, 0.8, n), np.zeros(n),
                     rng.uniform(0, 0.5, n)], axis=1)
    pts = np.concatenate([floor, wall]).astype(np.float32)
    pts += rng.normal(0, 0.002, pts.shape).astype(np.float32)
    P = pts.shape[0]
    mask = np.ones(P, bool)
    K, R, Q = 32, 0.05, 16
    d2, idx = radius_knn(jnp.asarray(pts[None]), jnp.asarray(mask[None]), R, K, cell_cap=16)
    nbr_d = np.sqrt(np.minimum(np.asarray(d2[0]), 4.0))
    nbr_i = np.asarray(idx[0])
    seeds = rng.choice(P, Q, replace=False).astype(np.int32)
    sm = np.ones(Q, bool)
    args = (jnp.asarray(nbr_i[None]), jnp.asarray(nbr_d[None]),
            jnp.asarray(seeds[None]), jnp.asarray(sm[None]),
            jnp.asarray(mask[None]), R, 600)
    exact = np.asarray(geodesic_distance(
        *args, symmetrize=False, positions=jnp.asarray(pts[None]))[0])
    hier = np.asarray(geodesic_distance_hier(
        *args, jnp.asarray(pts[None]), fine_sweeps=6)[0])
    assert np.mean((exact >= 0) == (hier >= 0)) > 0.995
    both = (exact >= 0) & (hier >= 0)
    err = np.abs(hier[both] - exact[both])
    assert err.mean() < 0.08, err.mean()
    assert np.percentile(err, 95) < 0.2, np.percentile(err, 95)
    # seed rows are exact zeros
    assert np.allclose(hier[seeds, np.arange(Q)], 0.0, atol=1e-6)
