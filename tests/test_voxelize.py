"""Voxelization vs a numpy reference (semantics of voxelize.cpp mode=mean)."""

import numpy as np
import jax.numpy as jnp

from geoformer_tpu.ops.voxelize import voxelize, voxel_mean_pool, devoxelize


def make_scene(rng, n, spatial=32):
    coords = rng.integers(0, spatial, size=(n, 3)).astype(np.int32)
    feats = rng.normal(size=(n, 4)).astype(np.float32)
    return coords, feats


def test_voxelize_roundtrip():
    rng = np.random.default_rng(0)
    P, V, S = 100, 128, 32
    coords, feats = make_scene(rng, P, S)
    mask = np.ones(P, bool)
    mask[90:] = False  # padding tail

    grid = voxelize(jnp.asarray(coords[None]), jnp.asarray(mask[None]), V, S)
    p2v = np.asarray(grid.p2v[0])
    n_vox = int(grid.n_voxels[0])

    # numpy reference: unique of valid coords
    keys = (coords[:, 2] * S + coords[:, 1]) * S + coords[:, 0]
    uniq = np.unique(keys[mask])
    assert n_vox == len(uniq)
    # every valid point maps to the voxel holding its key
    vkeys = np.asarray(grid.voxel_keys[0])
    for i in range(P):
        if mask[i]:
            assert vkeys[p2v[i]] == keys[i]
        else:
            assert p2v[i] == V
    # voxel keys ascending over valid slots
    assert np.all(np.diff(vkeys[:n_vox]) > 0)
    # counts
    counts = np.asarray(grid.counts[0])
    for s_ in range(n_vox):
        assert counts[s_] == np.sum(keys[mask] == vkeys[s_])

    # mean pooling matches per-voxel means
    vf = np.asarray(voxel_mean_pool(jnp.asarray(feats[None]), grid)[0])
    for s_ in range(n_vox):
        sel = mask & (keys == vkeys[s_])
        np.testing.assert_allclose(vf[s_], feats[sel].mean(0), rtol=1e-5, atol=1e-5)

    # devoxelize gathers the voxel value back to each point
    pf = np.asarray(devoxelize(jnp.asarray(vf[None]), grid)[0])
    for i in range(P):
        if mask[i]:
            np.testing.assert_allclose(pf[i], vf[p2v[i]], rtol=1e-6)
        else:
            np.testing.assert_allclose(pf[i], 0.0)


def test_voxelize_capacity_overflow():
    rng = np.random.default_rng(1)
    P, V, S = 200, 16, 32  # force overflow
    coords, _ = make_scene(rng, P, S)
    mask = np.ones(P, bool)
    grid = voxelize(jnp.asarray(coords[None]), jnp.asarray(mask[None]), V, S)
    assert int(grid.n_voxels[0]) <= V
    assert np.all(np.asarray(grid.p2v[0]) <= V)


def test_overflow_counter():
    rng = np.random.default_rng(2)
    P, V, S = 200, 16, 32
    coords, _ = make_scene(rng, P, S)
    mask = np.ones(P, bool)
    grid = voxelize(jnp.asarray(coords[None]), jnp.asarray(mask[None]), V, S)
    keys = (coords[:, 2] * S + coords[:, 1]) * S + coords[:, 0]
    uniq, inverse = np.unique(keys, return_inverse=True)
    # points whose voxel rank >= V are dropped to the pad slot — counted
    expect = int(np.sum(inverse >= V))
    assert int(grid.n_overflow[0]) == expect
    assert int(grid.n_oor[0]) == 0
    # no overflow when capacity covers all voxels
    grid2 = voxelize(jnp.asarray(coords[None]), jnp.asarray(mask[None]), len(uniq), S)
    assert int(grid2.n_overflow[0]) == 0


def test_out_of_range_coords_counted_not_aliased():
    S, V = 32, 64
    coords = np.array(
        [[1, 1, 1], [33, 0, 0], [-1, 2, 2], [2, 2, 2]], np.int32
    )  # [33,0,0] would alias key of [1,1,0]; [-1,..] negative
    mask = np.ones(4, bool)
    grid = voxelize(jnp.asarray(coords[None]), jnp.asarray(mask[None]), V, S)
    assert int(grid.n_oor[0]) == 2
    assert int(grid.n_voxels[0]) == 2  # only the two in-range points voxelize
    p2v = np.asarray(grid.p2v[0])
    assert p2v[1] == V and p2v[2] == V  # out-of-range -> pad slot
    vc = np.asarray(grid.voxel_coords[0][: int(grid.n_voxels[0])])
    assert {tuple(r) for r in vc} == {(1, 1, 1), (2, 2, 2)}
