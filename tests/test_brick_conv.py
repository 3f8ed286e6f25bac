"""Dense-brick submanifold conv vs the gather-rulebook oracle.

subm_conv_bricks must be bit-compatible (up to fp reassociation) with
subm_conv on the same weights: empty cells contribute zero, outputs are
read only at occupied voxels (spconv 1.0 SubMConv3d semantics, reference
geoformer_modules.py:10-129)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from geoformer_tpu.ops.brick import (
    BS,
    BrickPlan,
    build_brick_down_link,
    build_brick_plan,
    down_conv_bricks,
    from_dense,
    subm_conv_bricks,
    to_dense,
    up_conv_bricks,
)
from geoformer_tpu.ops.sparse_conv import (
    build_downsample,
    build_grid_plan,
    build_subm_neighbors,
    down_conv,
    subm_conv,
    up_conv,
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


def test_dense_conv_grad_and_bf16():
    """Dense brick conv: grads flow to w; bf16 compute path runs and
    tracks fp32 (fp32 MXU accumulation keeps the gap small)."""
    from geoformer_tpu.ops.brick import dense_subm_conv

    rng = np.random.default_rng(9)
    spatial, P, V, c = 32, 400, 256, 8
    coords = make_surface_coords(rng, P, spatial)
    grid = voxelize(jnp.asarray(coords[None]),
                    jnp.asarray(np.ones((1, P), bool)), V, spatial)
    plan = build_brick_plan(grid, spatial, num_bricks=128)
    feats = jnp.asarray(rng.normal(size=(1, V, c)).astype(np.float32))
    feats = jnp.where(jnp.asarray(grid.voxel_mask)[..., None], feats, 0.0)
    w = jnp.asarray(rng.normal(size=(27, c, c)).astype(np.float32) * 0.1)
    dense = to_dense(feats, plan)

    def loss(w, dtype=None):
        out = dense_subm_conv(dense, plan, w, compute_dtype=dtype)
        return jnp.sum(jnp.where(plan.occ[..., None],
                                 out.astype(jnp.float32), 0.0) ** 2)

    g = jax.grad(loss)(w)
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).sum()) > 0
    f32 = float(loss(w))
    bf = float(loss(w, jnp.bfloat16))
    assert abs(f32 - bf) / max(abs(f32), 1e-6) < 0.05


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


def _two_level_fixture(rng, spatial=32, P=600, V=512, Vp=384):
    coords = make_surface_coords(rng, P, spatial)
    mask = np.ones(P, bool)
    mask[560:] = False
    grid = voxelize(jnp.asarray(coords[None]), jnp.asarray(mask[None]), V, spatial)
    link = build_downsample(grid, spatial, Vp)
    bp0 = build_brick_plan(grid, spatial, num_bricks=256)
    bp1 = build_brick_plan(link.parent_grid, spatial // 2, num_bricks=128)
    assert int(bp0.n_overflow[0]) == 0 and int(bp1.n_overflow[0]) == 0
    blink = build_brick_down_link(bp0.keys, bp0.mask, bp1.keys, bp1.mask,
                                  max(spatial // BS, 1))
    return grid, link, bp0, bp1, blink


def test_brick_down_conv_matches_sparse():
    """down_conv_bricks == down_conv (SparseConv3d k2s2) at parent voxels."""
    rng = np.random.default_rng(4)
    grid, link, bp0, bp1, blink = _two_level_fixture(rng)
    cin, cout = 6, 9
    feats = jnp.asarray(rng.normal(size=(1, grid.voxel_keys.shape[1], cin)))
    feats = jnp.where(jnp.asarray(grid.voxel_mask)[..., None],
                      feats.astype(jnp.float32), 0.0)
    w = jnp.asarray(rng.normal(size=(8, cin, cout)).astype(np.float32) * 0.3)

    ref = down_conv(feats, link, w)  # [1, Vp, cout]
    got = from_dense(down_conv_bricks(to_dense(feats, bp0), bp0, blink, w), bp1)
    pm = np.asarray(link.parent_grid.voxel_mask[0])
    np.testing.assert_allclose(np.asarray(got[0])[pm], np.asarray(ref[0])[pm],
                               rtol=1e-4, atol=1e-4)


def test_brick_up_conv_matches_sparse():
    """up_conv_bricks == up_conv (SparseInverseConv3d k2) at child voxels."""
    rng = np.random.default_rng(5)
    grid, link, bp0, bp1, blink = _two_level_fixture(rng)
    cin, cout = 7, 5
    vp = link.parent_grid.voxel_keys.shape[1]
    pf = jnp.asarray(rng.normal(size=(1, vp, cin)).astype(np.float32))
    pf = jnp.where(jnp.asarray(link.parent_grid.voxel_mask)[..., None], pf, 0.0)
    w = jnp.asarray(rng.normal(size=(8, cin, cout)).astype(np.float32) * 0.3)

    ref = up_conv(pf, link, w)  # [1, Vc, cout]
    got = from_dense(up_conv_bricks(to_dense(pf, bp1), blink, w), bp0)
    vm = np.asarray(grid.voxel_mask[0])
    np.testing.assert_allclose(np.asarray(got[0])[vm], np.asarray(ref[0])[vm],
                               rtol=1e-4, atol=1e-4)


def test_brick_down_up_grad_flows():
    """The brick transition ops are differentiable (training path)."""
    rng = np.random.default_rng(6)
    grid, link, bp0, bp1, blink = _two_level_fixture(rng)
    c = 4
    feats = jnp.asarray(rng.normal(size=(1, grid.voxel_keys.shape[1], c)).astype(np.float32))
    wd = jnp.asarray(rng.normal(size=(8, c, c)).astype(np.float32) * 0.3)
    wu = jnp.asarray(rng.normal(size=(8, c, c)).astype(np.float32) * 0.3)

    def loss(wd, wu):
        d = down_conv_bricks(to_dense(feats, bp0), bp0, blink, wd)
        d = jnp.where(bp1.occ[..., None], d, 0.0)
        u = up_conv_bricks(d, blink, wu)
        u = jnp.where(bp0.occ[..., None], u, 0.0)
        return jnp.sum(u ** 2)

    g = jax.grad(loss, argnums=(0, 1))(wd, wu)
    assert all(np.isfinite(np.asarray(gi)).all() for gi in g)
    assert float(jnp.abs(g[0]).sum()) > 0 and float(jnp.abs(g[1]).sum()) > 0


def test_backbone_brick_native_matches_rulebook():
    """Full SparseUNetBackbone: brick-native (dense end-to-end, brick-space
    down/up transitions) == canonical rulebook mode on the same params."""
    from geoformer_tpu.models.unet import SparseUNetBackbone

    rng = np.random.default_rng(7)
    spatial, P, depth = 32, 500, 3
    coords = make_surface_coords(rng, P, spatial)
    mask = np.ones(P, bool)
    caps = voxel_capacities(512, depth, 0.5)
    cj, mj = jnp.asarray(coords[None]), jnp.asarray(mask[None])
    plan_rb = build_grid_plan(cj, mj, spatial, depth, caps)
    plan_bk = build_grid_plan(cj, mj, spatial, depth, caps, brick_occupancy=8)
    assert plan_bk.brick_links and len(plan_bk.brick_links) == depth - 1

    v0 = caps[0]
    feats = jnp.asarray(rng.normal(size=(1, v0, 6)).astype(np.float32))
    feats = jnp.where(jnp.asarray(plan_rb.grids[0].voxel_mask)[..., None], feats, 0.0)
    model = SparseUNetBackbone(m=8, classes=4, depth=depth)
    params = model.init(jax.random.PRNGKey(0), feats, plan_rb, False)
    ref = model.apply(params, feats, plan_rb, False)
    got = model.apply(params, feats, plan_bk, False)
    vm = np.asarray(plan_rb.grids[0].voxel_mask[0])
    np.testing.assert_allclose(np.asarray(got[0])[vm], np.asarray(ref[0])[vm],
                               rtol=2e-3, atol=2e-4)


def test_backbone_bf16_tracks_f32():
    """SparseUNetBackbone in bf16-resident brick mode tracks the f32 result
    on the same params — the levels stay bf16 end-to-end (conv outputs are
    NOT round-tripped to f32 between blocks), so this gates the numeric
    drift of the production bf16 configuration."""
    from geoformer_tpu.models.unet import SparseUNetBackbone

    rng = np.random.default_rng(10)
    spatial, P, depth = 32, 500, 3
    coords = make_surface_coords(rng, P, spatial)
    mask = np.ones(P, bool)
    caps = voxel_capacities(512, depth, 0.5)
    cj, mj = jnp.asarray(coords[None]), jnp.asarray(mask[None])
    plan_bk = build_grid_plan(cj, mj, spatial, depth, caps, brick_occupancy=8)

    v0 = caps[0]
    feats = jnp.asarray(rng.normal(size=(1, v0, 6)).astype(np.float32))
    feats = jnp.where(jnp.asarray(plan_bk.grids[0].voxel_mask)[..., None], feats, 0.0)
    ref_model = SparseUNetBackbone(m=8, classes=4, depth=depth)
    params = ref_model.init(jax.random.PRNGKey(0), feats, plan_bk, False)
    ref = ref_model.apply(params, feats, plan_bk, False)
    got = SparseUNetBackbone(m=8, classes=4, depth=depth,
                             compute_dtype=jnp.bfloat16).apply(
        params, feats, plan_bk, False)
    assert got.dtype == jnp.float32  # the exit boundary restores f32
    vm = np.asarray(plan_bk.grids[0].voxel_mask[0])
    r, g = np.asarray(ref[0])[vm], np.asarray(got[0])[vm]
    # bf16 has ~3 decimal digits; post-BN features are O(1)
    np.testing.assert_allclose(g, r, rtol=0.1, atol=0.08)
    assert np.abs(g - r).mean() < 0.02


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


def test_diagonal_corner_adjacency():
    """Halo exactness when the only adjacency crosses a brick corner.

    Voxels (7,7,7) and (8,8,7) are submanifold neighbors whose bricks
    touch only diagonally; the face-neighbor bricks between them are
    empty. The former separable z/y/x halo exchange silently dropped the
    contribution (measured max-abs 8.8 on this scene); the row-map halo
    sources every halo row from its true diagonal brick."""
    from geoformer_tpu.ops.voxelize import voxelize
    from geoformer_tpu.ops.sparse_conv import apply_subm

    rng = np.random.default_rng(0)
    coords = np.zeros((6, 3), np.int32)
    coords[0] = (7, 7, 7)
    coords[1] = (8, 8, 7)
    mask = np.array([True, True] + [False] * 4)
    spatial = 32
    grid = voxelize(jnp.asarray(coords[None]), jnp.asarray(mask[None]), 6, spatial)
    nbr = build_subm_neighbors(grid, spatial)
    vm = np.asarray(grid.voxel_mask[0])
    feats = jnp.asarray(
        rng.normal(size=(1, 6, 4)).astype(np.float32)
    ) * jnp.asarray(vm[None, :, None])
    w = jnp.asarray(rng.normal(size=(27, 4, 4)).astype(np.float32))
    ref = apply_subm(feats, nbr, w)
    plan = build_brick_plan(grid, spatial, 16)
    got = subm_conv_bricks(feats, plan, w)
    np.testing.assert_allclose(
        np.asarray(got[0])[vm], np.asarray(ref[0])[vm], rtol=1e-5, atol=1e-5
    )
