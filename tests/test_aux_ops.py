"""Segment ops, IoU, clustering, 3-NN interpolation vs numpy/scipy refs."""

import numpy as np
import jax.numpy as jnp

from geoformer_tpu.ops.segment_ops import sec_mean, sec_min, sec_max, roipool, get_iou
from geoformer_tpu.ops.cluster import bfs_cluster, connected_components, ballquery_dense
from geoformer_tpu.ops.interpolate import (
    three_nn,
    three_interpolate,
    three_interpolate_weights,
    gather_points,
    group_points,
)


def test_sec_reductions_match_numpy():
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(20, 4)).astype(np.float32)
    offsets = np.array([0, 5, 5, 12, 20], np.int32)  # one empty segment
    got_mean = np.asarray(sec_mean(jnp.asarray(feats), jnp.asarray(offsets)))
    got_min = np.asarray(sec_min(jnp.asarray(feats), jnp.asarray(offsets)))
    got_max = np.asarray(sec_max(jnp.asarray(feats), jnp.asarray(offsets)))
    for s in range(4):
        rows = feats[offsets[s]:offsets[s + 1]]
        if len(rows) == 0:
            assert np.all(got_mean[s] == 0) and np.all(got_min[s] == 0)
            continue
        np.testing.assert_allclose(got_mean[s], rows.mean(0), rtol=1e-5)
        np.testing.assert_allclose(got_min[s], rows.min(0), rtol=1e-6)
        np.testing.assert_allclose(got_max[s], rows.max(0), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(roipool(jnp.asarray(feats), jnp.asarray(offsets))), got_max
    )


def test_get_iou_matches_numpy():
    rng = np.random.default_rng(1)
    prop = rng.random((5, 30)) > 0.5
    gt = rng.random((3, 30)) > 0.6
    got = np.asarray(get_iou(jnp.asarray(prop), jnp.asarray(gt)))
    for i in range(5):
        for j in range(3):
            inter = np.sum(prop[i] & gt[j])
            union = np.sum(prop[i] | gt[j])
            want = inter / max(union, 1)
            np.testing.assert_allclose(got[i, j], want, rtol=1e-6)


def test_connected_components_two_blobs():
    # two spatial blobs, same semantic label -> two components
    pts = np.concatenate(
        [np.random.default_rng(2).normal(0, 0.01, (10, 3)),
         np.random.default_rng(3).normal(5, 0.01, (10, 3))]
    ).astype(np.float32)
    valid = np.ones(20, bool)
    idx, _, nbr_valid = ballquery_dense(jnp.asarray(pts), jnp.asarray(valid), 0.2, 8)
    roots = np.asarray(connected_components(idx, nbr_valid, jnp.asarray(valid)))
    assert len(np.unique(roots[:10])) == 1
    assert len(np.unique(roots[10:])) == 1
    assert roots[0] != roots[10]


def test_bfs_cluster_semantic_split_and_min_size():
    # one blob, two semantic labels -> split; tiny group dropped by threshold
    rng = np.random.default_rng(4)
    pts = rng.normal(0, 0.01, (24, 3)).astype(np.float32)
    sem = np.array([1] * 12 + [2] * 9 + [1] * 3, np.int32)
    pts[21:] += 10.0  # 3 distant label-1 points -> a component of size 3
    valid = np.ones(24, bool)
    roots, keep = bfs_cluster(
        jnp.asarray(sem), jnp.asarray(pts), jnp.asarray(valid),
        radius=0.2, nsample=16, min_cluster=5,
    )
    roots, keep = np.asarray(roots), np.asarray(keep)
    assert keep[:21].all()
    assert not keep[21:].any()  # below min_cluster
    assert roots[0] != roots[12]  # label split


def test_three_interpolate_matches_numpy():
    rng = np.random.default_rng(5)
    known = rng.normal(size=(1, 8, 3)).astype(np.float32)
    unknown = rng.normal(size=(1, 6, 3)).astype(np.float32)
    feats = rng.normal(size=(1, 4, 8)).astype(np.float32)
    mask = np.ones((1, 8), bool)
    d, i = three_nn(jnp.asarray(unknown), jnp.asarray(known), jnp.asarray(mask))
    w = three_interpolate_weights(d)
    out = np.asarray(three_interpolate(jnp.asarray(feats), i, w))
    # numpy reference
    for n in range(6):
        dist = np.linalg.norm(known[0] - unknown[0, n], axis=1)
        order = np.argsort(dist)[:3]
        rec = 1.0 / (dist[order] + 1e-8)
        wt = rec / rec.sum()
        want = (feats[0][:, order] * wt).sum(1)
        np.testing.assert_allclose(out[0, :, n], want, rtol=1e-4)


def test_gather_group_points():
    feats = jnp.arange(24, dtype=jnp.float32).reshape(1, 2, 12)
    idx = jnp.asarray([[3, 7]], jnp.int32)
    g = np.asarray(gather_points(feats, idx))
    np.testing.assert_array_equal(g[0, 0], [3, 7])
    gi = jnp.asarray([[[0, 1], [2, 3]]], jnp.int32)
    gp = np.asarray(group_points(feats, gi))
    assert gp.shape == (1, 2, 2, 2)
    np.testing.assert_array_equal(gp[0, 0, 1], [2, 3])
