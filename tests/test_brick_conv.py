"""Dense-brick submanifold conv vs the gather-rulebook oracle.

subm_conv_bricks must be bit-compatible (up to fp reassociation) with
subm_conv on the same weights: empty cells contribute zero, outputs are
read only at occupied voxels (spconv 1.0 SubMConv3d semantics, reference
geoformer_modules.py:10-129)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from geoformer_tpu.ops.brick import BrickPlan, build_brick_plan, subm_conv_bricks
from geoformer_tpu.ops.sparse_conv import (
    build_grid_plan,
    build_subm_neighbors,
    subm_conv,
    voxel_capacities,
)
from geoformer_tpu.ops.voxelize import voxelize


def make_surface_coords(rng, n, spatial):
    """Surface-ish: points on a few planes (locally dense, like scans)."""
    pts = []
    for axis in range(3):
        m = (n + 2) // 3
        c = rng.integers(0, spatial, size=(m, 3))
        c[:, axis] = rng.integers(0, 4)  # squash one axis -> plane
        pts.append(c)
    return np.concatenate(pts).astype(np.int32)[:n]


@pytest.mark.parametrize("spatial,cin,cout", [(32, 5, 7), (64, 16, 16)])
def test_brick_conv_matches_rulebook(spatial, cin, cout):
    rng = np.random.default_rng(0)
    P, V = 600, 512
    coords = make_surface_coords(rng, P, spatial)
    mask = np.ones(P, bool)
    mask[550:] = False
    grid = voxelize(jnp.asarray(coords[None]), jnp.asarray(mask[None]), V, spatial)
    nbr = build_subm_neighbors(grid, spatial)
    plan = build_brick_plan(grid, spatial, num_bricks=256)
    assert int(plan.n_overflow[0]) == 0

    feats = jnp.asarray(rng.normal(size=(1, V, cin)).astype(np.float32))
    # zero features at invalid voxel slots (the model always does)
    feats = jnp.where(jnp.asarray(grid.voxel_mask)[..., None], feats, 0.0)
    w = jnp.asarray(rng.normal(size=(27, cin, cout)).astype(np.float32) * 0.1)

    ref = subm_conv(feats, nbr, w)
    got = subm_conv_bricks(feats, plan, w)
    vm = np.asarray(grid.voxel_mask[0])
    np.testing.assert_allclose(
        np.asarray(got[0])[vm], np.asarray(ref[0])[vm], rtol=1e-4, atol=1e-4
    )


def test_brick_conv_batched_and_identity_weight():
    """Identity kernel (center offset = I) must reproduce the input."""
    rng = np.random.default_rng(1)
    spatial, P, V, c = 32, 300, 256, 8
    coords = make_surface_coords(rng, P, spatial)
    mask = np.ones(P, bool)
    b = 2
    grid = voxelize(
        jnp.asarray(np.stack([coords, coords[::-1]])),
        jnp.asarray(np.stack([mask, mask])), V, spatial,
    )
    plan = build_brick_plan(grid, spatial, num_bricks=128)
    feats = jnp.asarray(rng.normal(size=(b, V, c)).astype(np.float32))
    feats = jnp.where(jnp.asarray(grid.voxel_mask)[..., None], feats, 0.0)
    w = np.zeros((27, c, c), np.float32)
    w[13] = np.eye(c)  # center offset (dz,dy,dx)=(0,0,0) -> index 13
    out = subm_conv_bricks(feats, plan, jnp.asarray(w))
    vm = np.asarray(grid.voxel_mask)
    np.testing.assert_allclose(
        np.asarray(out)[vm], np.asarray(feats)[vm], rtol=1e-5, atol=1e-6
    )


def test_brick_overflow_counted():
    """Uniform-random coords overflow a tiny brick budget — counted."""
    rng = np.random.default_rng(2)
    spatial, P, V = 64, 512, 512
    coords = rng.integers(0, spatial, size=(P, 3)).astype(np.int32)
    mask = np.ones(P, bool)
    grid = voxelize(jnp.asarray(coords[None]), jnp.asarray(mask[None]), V, spatial)
    plan = build_brick_plan(grid, spatial, num_bricks=16)
    # uniform random over 8^3 bricks of a 64^3 grid -> way more than 16
    # occupied bricks
    assert int(plan.n_overflow[0]) > 0


def test_grid_plan_brick_mode_skips_rulebooks():
    rng = np.random.default_rng(3)
    spatial, P = 32, 500
    coords = make_surface_coords(rng, P, spatial)
    caps = voxel_capacities(512, 3, 0.5)
    plan = build_grid_plan(
        jnp.asarray(coords[None]), jnp.asarray(np.ones((1, P), bool)),
        spatial, 3, caps, brick_occupancy=8,
    )
    assert plan.subm == ()
    assert len(plan.bricks) == 3
    for bp in plan.bricks:
        assert isinstance(bp, BrickPlan)
        assert int(bp.n_overflow[0]) == 0
