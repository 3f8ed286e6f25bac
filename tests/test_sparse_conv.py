"""Sparse conv vs dense 3D convolution references (spconv semantics)."""

import numpy as np
import jax
import jax.numpy as jnp

from geoformer_tpu.ops.sparse_conv import (
    SUBM_OFFSETS,
    build_downsample,
    build_grid_plan,
    build_subm_neighbors,
    down_conv,
    subm_conv,
    up_conv,
    voxel_capacities,
)
from geoformer_tpu.ops.voxelize import voxelize


def sparse_scene(rng, n=40, s=16, c=4, v=64):
    coords = np.unique(rng.integers(0, s, size=(n, 3)).astype(np.int32), axis=0)
    n = coords.shape[0]
    feats = rng.normal(size=(n, c)).astype(np.float32)
    pad = v - n
    coords_p = np.concatenate([coords, np.zeros((pad, 3), np.int32)])
    feats_p = np.concatenate([feats, np.zeros((pad, c), np.float32)])
    mask = np.zeros(v, bool)
    mask[:n] = True
    return coords_p, feats_p, mask, n


def test_subm_conv_matches_dense():
    rng = np.random.default_rng(0)
    S, C, CO, V = 16, 4, 6, 64
    coords, feats, mask, n = sparse_scene(rng, 40, S, C, V)
    w = rng.normal(size=(27, C, CO)).astype(np.float32) * 0.1

    grid = voxelize(jnp.asarray(coords[None]), jnp.asarray(mask[None]), V, S)
    nbr = build_subm_neighbors(grid, S)
    # voxel features indexed by voxel slot = feats of the point in that voxel
    # (each coord unique => p2v is a bijection on valid entries)
    p2v = np.asarray(grid.p2v[0])
    vfeats = np.zeros((V, C), np.float32)
    vcoords = np.asarray(grid.voxel_coords[0])
    for i in range(n):
        vfeats[p2v[i]] = feats[i]

    out = np.asarray(subm_conv(jnp.asarray(vfeats[None]), nbr, jnp.asarray(w), precision=jax.lax.Precision.HIGHEST)[0])

    # dense reference: submanifold = output only at active sites
    dense = np.zeros((S, S, S, C), np.float32)
    active = np.zeros((S, S, S), bool)
    for i in range(n):
        x, y, z = coords[i]
        dense[x, y, z] = feats[i]
        active[x, y, z] = True
    n_vox = int(grid.n_voxels[0])
    for s_ in range(n_vox):
        x, y, z = vcoords[s_]
        acc = np.zeros(CO, np.float32)
        for k, (dz, dy, dx) in enumerate(SUBM_OFFSETS):
            xx, yy, zz = x + dx, y + dy, z + dz
            if 0 <= xx < S and 0 <= yy < S and 0 <= zz < S and active[xx, yy, zz]:
                acc += dense[xx, yy, zz] @ w[k]
        np.testing.assert_allclose(out[s_], acc, rtol=1e-4, atol=1e-5)


def test_down_up_conv_match_dense():
    rng = np.random.default_rng(1)
    S, C, CO, V, VP = 16, 4, 6, 64, 64
    coords, feats, mask, n = sparse_scene(rng, 40, S, C, V)
    wd = rng.normal(size=(8, C, CO)).astype(np.float32) * 0.1
    wu = rng.normal(size=(8, CO, C)).astype(np.float32) * 0.1

    grid = voxelize(jnp.asarray(coords[None]), jnp.asarray(mask[None]), V, S)
    link = build_downsample(grid, S, VP)
    p2v = np.asarray(grid.p2v[0])
    vfeats = np.zeros((V, C), np.float32)
    for i in range(n):
        vfeats[p2v[i]] = feats[i]

    down = np.asarray(down_conv(jnp.asarray(vfeats[None]), link, jnp.asarray(wd), precision=jax.lax.Precision.HIGHEST)[0])

    # dense reference for k2s2 down conv
    pcoords = np.asarray(link.parent_grid.voxel_coords[0])
    n_par = int(link.parent_grid.n_voxels[0])
    vcoords = np.asarray(grid.voxel_coords[0])
    n_vox = int(grid.n_voxels[0])
    for ps in range(n_par):
        px, py, pz = pcoords[ps]
        acc = np.zeros(CO, np.float32)
        for s_ in range(n_vox):
            x, y, z = vcoords[s_]
            if x // 2 == px and y // 2 == py and z // 2 == pz:
                k = (z % 2) * 4 + (y % 2) * 2 + (x % 2)
                acc += vfeats[s_] @ wd[k]
        np.testing.assert_allclose(down[ps], acc, rtol=1e-4, atol=1e-5)

    # up conv: each child gets parent feature through its offset weight
    up = np.asarray(up_conv(jnp.asarray(down[None]), link, jnp.asarray(wu), precision=jax.lax.Precision.HIGHEST)[0])
    parent = np.asarray(link.parent[0])
    for s_ in range(n_vox):
        x, y, z = vcoords[s_]
        k = (z % 2) * 4 + (y % 2) * 2 + (x % 2)
        np.testing.assert_allclose(up[s_], down[parent[s_]] @ wu[k], rtol=1e-4, atol=1e-5)


def test_grid_plan_shapes():
    rng = np.random.default_rng(2)
    S, V = 32, 128
    coords = rng.integers(0, S, size=(2, 300, 3)).astype(np.int32)
    mask = np.ones((2, 300), bool)
    caps = voxel_capacities(V, 3)
    plan = build_grid_plan(jnp.asarray(coords), jnp.asarray(mask), S, 3, caps)
    assert len(plan.grids) == 3 and len(plan.subm) == 3 and len(plan.links) == 2
    assert plan.subm[0].shape == (2, caps[0], 27)
    assert plan.links[0].parent.shape == (2, caps[0])
    # deeper level coords are within the halved grid
    c1 = np.asarray(plan.grids[1].voxel_coords)
    m1 = np.asarray(plan.grids[1].voxel_mask)
    assert c1[m1].max() < S // 2


def test_subm_compact_matches_full():
    """Live-packed slot tables reproduce the full 27-slot conv whenever the
    per-voxel live count fits the cap (the surface-scan regime)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from geoformer_tpu.ops.sparse_conv import (
        build_subm_neighbors, compact_subm_neighbors, subm_conv, subm_conv_compact,
    )
    from geoformer_tpu.ops.voxelize import voxelize

    rng = np.random.default_rng(9)
    # surface-like sheet: sparse in z -> live counts well under 27
    n, sp = 300, 32
    xy = rng.integers(0, sp, (n, 2))
    z = rng.integers(0, 3, (n, 1))
    coords = np.unique(np.concatenate([xy, z], axis=1), axis=0).astype(np.int32)
    v = coords.shape[0]
    mask = np.ones(v, bool)
    grid = voxelize(jnp.asarray(coords[None]), jnp.asarray(mask[None]), v, sp)
    nbr = build_subm_neighbors(grid, sp)
    live_max = int(jnp.max(jnp.sum(nbr[0] < v, axis=1)))
    k = live_max + 2
    idx, oid = compact_subm_neighbors(nbr, k)

    feats = jnp.asarray(rng.normal(size=(1, v, 8)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(27, 8, 8)).astype(np.float32) * 0.1)
    full = subm_conv(feats, nbr, w)
    comp = subm_conv_compact(feats, idx, oid, w)
    np.testing.assert_allclose(np.asarray(comp), np.asarray(full), rtol=1e-5, atol=1e-5)
