"""x-folded brick level residency (ops/brick.py fold_x et al.).

XLA tiles buffer lanes to 128, so [*,8,8,8,C] level tensors at C=16 pad
8x; the folded layout [*,8,8,8C] tiles exactly and runs the 3^3 subm conv
as a banded 2D conv over (z,y). These tests pin the folded path — conv,
segmented concat, 1x1 identity, masked BN, and the full backbone — to the
standard-layout oracles on the same params (checkpoints interchange: all
params/stats stay [C]-shaped).
"""

import numpy as np
import jax
import jax.numpy as jnp

from geoformer_tpu.ops.brick import (
    BS,
    build_brick_plan,
    dense_1x1_folded,
    dense_subm_conv,
    dense_subm_conv_folded,
    fold_x,
    unfold_x,
)
from geoformer_tpu.ops.sparse_conv import build_grid_plan, voxel_capacities
from geoformer_tpu.ops.voxelize import voxelize
from tests.test_brick_conv import make_surface_coords


def _make_plan(rng, nb=24, occn=40, spatial=64):
    v = nb * occn
    bricks = rng.permutation(nb * 2)[:nb]
    bx = np.stack(np.unravel_index(bricks, (4, 4, 4)), -1)
    coords = []
    for b in range(nb):
        cells = rng.permutation(BS ** 3)[:occn]
        cx = np.stack(np.unravel_index(cells, (BS, BS, BS)), -1)
        coords.append(bx[b][None] * BS + cx)
    coords = jnp.asarray(np.concatenate(coords)[None], jnp.int32)
    mask = jnp.ones((1, v), bool)
    grid = voxelize(coords, mask, v, spatial)
    return build_brick_plan(grid, spatial, nb)


def test_folded_conv_matches_standard():
    rng = np.random.default_rng(0)
    plan = _make_plan(rng)
    nb, cin, cout = plan.num_bricks, 16, 16
    x = jnp.asarray(rng.normal(size=(1, nb, BS, BS, BS, cin)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(27, cin, cout)) * 0.1, jnp.float32)
    want = dense_subm_conv(x, plan, w)
    got = unfold_x(dense_subm_conv_folded(fold_x(x), plan, w, (cin,)), cout)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_folded_conv_segmented_concat():
    """Lane concat of two folded tensors == fold of the channel concat,
    consumed through the segmented banded kernel (the skip-concat path)."""
    rng = np.random.default_rng(1)
    plan = _make_plan(rng)
    nb, c0, cout = plan.num_bricks, 12, 10
    a = jnp.asarray(rng.normal(size=(1, nb, BS, BS, BS, c0)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(1, nb, BS, BS, BS, c0)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(27, 2 * c0, cout)) * 0.1, jnp.float32)
    want = dense_subm_conv(jnp.concatenate([a, b], -1), plan, w)
    fc = jnp.concatenate([fold_x(a), fold_x(b)], -1)
    got = unfold_x(dense_subm_conv_folded(fc, plan, w, (c0, c0)), cout)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    # segmented 1x1 (the tail block's identity branch)
    wi = jnp.asarray(rng.normal(size=(2 * c0, cout)), jnp.float32)
    want1 = jnp.einsum("...c,cd->...d", jnp.concatenate([a, b], -1), wi)
    got1 = unfold_x(dense_1x1_folded(fc, wi, (c0, c0)), cout)
    np.testing.assert_allclose(np.asarray(got1), np.asarray(want1),
                               rtol=1e-5, atol=1e-5)


def test_folded_conv_grads_match():
    rng = np.random.default_rng(2)
    plan = _make_plan(rng, nb=8, occn=30)
    nb, cin, cout = plan.num_bricks, 8, 8
    x = jnp.asarray(rng.normal(size=(1, nb, BS, BS, BS, cin)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(27, cin, cout)) * 0.1, jnp.float32)
    cot = jnp.asarray(rng.normal(size=(1, nb, BS, BS, BS, cout)), jnp.float32)

    def f_fold(x, w):
        y = unfold_x(dense_subm_conv_folded(fold_x(x), plan, w, (cin,)), cout)
        return jnp.sum(y * cot)

    def f_std(x, w):
        return jnp.sum(dense_subm_conv(x, plan, w) * cot)

    gx1, gw1 = jax.grad(f_fold, (0, 1))(x, w)
    gx2, gw2 = jax.grad(f_std, (0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw2), rtol=1e-4, atol=1e-4)


def test_folded_masked_bn_matches_standard():
    """Folded BN: same outputs AND same [C] running stats as the standard
    module on the same data (params interchange between layouts)."""
    from geoformer_tpu.models.blocks import MaskedBatchNorm

    rng = np.random.default_rng(3)
    plan = _make_plan(rng, nb=8, occn=30)
    nb, c = plan.num_bricks, 12
    x = jnp.asarray(rng.normal(size=(1, nb, BS, BS, BS, c)), jnp.float32)
    x = jnp.where(plan.occ[..., None], x, 0.0)
    occ = plan.occ

    std = MaskedBatchNorm(c)
    fld = MaskedBatchNorm(c, fold_segs=(c,))
    vs = std.init(jax.random.PRNGKey(0), x, occ, True)
    for train in (True, False):
        want, mut_s = std.apply(vs, x, occ, train, mutable=["batch_stats"])
        got, mut_f = fld.apply(vs, fold_x(x), occ, train,
                               mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(unfold_x(got, c)),
                                   np.asarray(want), rtol=1e-5, atol=1e-5)
        for k in ("mean", "var"):
            np.testing.assert_allclose(
                np.asarray(mut_f["batch_stats"][k]),
                np.asarray(mut_s["batch_stats"][k]), rtol=1e-5, atol=1e-6)

    # segmented variant vs standard on the concat
    x2 = jnp.asarray(rng.normal(size=(1, nb, BS, BS, BS, c)), jnp.float32)
    x2 = jnp.where(plan.occ[..., None], x2, 0.0)
    cat = jnp.concatenate([x, x2], -1)
    fc = jnp.concatenate([fold_x(x), fold_x(x2)], -1)
    std2 = MaskedBatchNorm(2 * c)
    fld2 = MaskedBatchNorm(2 * c, fold_segs=(c, c))
    vs2 = std2.init(jax.random.PRNGKey(0), cat, occ, True)
    want, _ = std2.apply(vs2, cat, occ, True, mutable=["batch_stats"])
    got, _ = fld2.apply(vs2, fc, occ, True, mutable=["batch_stats"])
    got_std = jnp.concatenate(
        [unfold_x(got[..., : 8 * c], c), unfold_x(got[..., 8 * c:], c)], -1)
    np.testing.assert_allclose(np.asarray(got_std), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_backbone_folded_matches_standard():
    """Full SparseUNetBackbone with x-folded levels == standard brick mode
    on the same params (fold_max_c covers every level width here)."""
    from geoformer_tpu.models.unet import SparseUNetBackbone

    rng = np.random.default_rng(7)
    spatial, P, depth = 32, 500, 3
    coords = make_surface_coords(rng, P, spatial)
    mask = np.ones(P, bool)
    caps = voxel_capacities(512, depth, 0.5)
    cj, mj = jnp.asarray(coords[None]), jnp.asarray(mask[None])
    plan = build_grid_plan(cj, mj, spatial, depth, caps, brick_occupancy=8)

    v0 = caps[0]
    feats = jnp.asarray(rng.normal(size=(1, v0, 6)).astype(np.float32))
    feats = jnp.where(jnp.asarray(plan.grids[0].voxel_mask)[..., None], feats, 0.0)
    ref_model = SparseUNetBackbone(m=8, classes=4, depth=depth)
    params = ref_model.init(jax.random.PRNGKey(0), feats, plan, False)
    ref = ref_model.apply(params, feats, plan, False)
    got = SparseUNetBackbone(m=8, classes=4, depth=depth,
                             fold_max_c=256).apply(params, feats, plan, False)
    vm = np.asarray(plan.grids[0].voxel_mask[0])
    np.testing.assert_allclose(np.asarray(got[0])[vm], np.asarray(ref[0])[vm],
                               rtol=2e-3, atol=2e-4)


def test_backbone_folded_train_step_grads():
    """Folded backbone under train=True (BN batch stats + grads): grads
    finite and matching the standard layout's."""
    from geoformer_tpu.models.unet import SparseUNetBackbone

    rng = np.random.default_rng(9)
    spatial, P, depth = 32, 400, 2
    coords = make_surface_coords(rng, P, spatial)
    mask = np.ones(P, bool)
    caps = voxel_capacities(512, depth, 0.5)
    plan = build_grid_plan(jnp.asarray(coords[None]), jnp.asarray(mask[None]),
                           spatial, depth, caps, brick_occupancy=8)
    v0 = caps[0]
    feats = jnp.asarray(rng.normal(size=(1, v0, 6)).astype(np.float32))
    feats = jnp.where(jnp.asarray(plan.grids[0].voxel_mask)[..., None], feats, 0.0)

    # fold_train=True: training folds only on request after the r5c
    # prod-scale fold32 OOM (tpu_brick_fold_train); this test pins that
    # the opted-in folded TRAIN step still matches the standard layout
    std = SparseUNetBackbone(m=8, classes=4, depth=depth)
    fld = SparseUNetBackbone(m=8, classes=4, depth=depth, fold_max_c=256,
                             fold_train=True)
    vs = std.init(jax.random.PRNGKey(0), feats, plan, True)

    def loss(model, params):
        out, _ = model.apply({"params": params, "batch_stats": vs["batch_stats"]},
                             feats, plan, True, mutable=["batch_stats"],
                             rngs={"dropout": jax.random.PRNGKey(1)})
        return jnp.sum(out ** 2)

    g_std = jax.grad(lambda p: loss(std, p))(vs["params"])
    g_fld = jax.grad(lambda p: loss(fld, p))(vs["params"])
    flat_s = jax.tree_util.tree_leaves(g_std)
    flat_f = jax.tree_util.tree_leaves(g_fld)
    for a, b in zip(flat_s, flat_f):
        assert np.isfinite(np.asarray(b)).all()
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-3, atol=5e-3)


def test_halo_custom_vjp_matches_autodiff():
    """The gather-form halo transposes (custom_vjp on _halo_pad_scene /
    _halo_pad_folded — autodiff's scatter-add form OOM'd the prod train
    step, r5c) must equal autodiff of the raw impls exactly, on a
    neighbor table with the real geometric symmetry (built from coords),
    for both layouts and a multi-segment fold."""
    from geoformer_tpu.ops import brick as B

    rng = np.random.default_rng(0)
    nb, c = 12, 4
    coords = rng.permutation(64)[:nb]
    cc = np.stack(np.unravel_index(coords, (4, 4, 4)), -1)
    nbr = np.full((nb, 27), nb, np.int32)
    pos = {tuple(p): i for i, p in enumerate(cc)}
    for i, p in enumerate(cc):
        for dz in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    q = (p[0] + dz, p[1] + dy, p[2] + dx)
                    if q in pos:
                        nbr[i, (dz + 1) * 9 + (dy + 1) * 3 + (dx + 1)] = pos[q]
    nbr = jnp.asarray(nbr)

    x3 = jnp.asarray(rng.normal(size=(nb, 8, 8, 8, c)).astype(np.float32))
    ct3 = jnp.asarray(rng.normal(size=(nb, 10, 10, 10, c)).astype(np.float32))
    ga = jax.grad(lambda x: jnp.sum(B._halo_pad_scene_impl(x, nbr, nb) * ct3))(x3)
    gc = jax.grad(lambda x: jnp.sum(B._halo_pad_scene(x, nbr, nb) * ct3))(x3)
    np.testing.assert_allclose(np.asarray(gc), np.asarray(ga), rtol=1e-6, atol=1e-6)

    for segs in [(4,), (4, 6)]:
        cs = sum(segs)
        xf = jnp.asarray(rng.normal(size=(nb, 8, 8, 8 * cs)).astype(np.float32))
        ctf = jnp.asarray(rng.normal(size=(nb, 10, 10, 10 * cs)).astype(np.float32))
        ga = jax.grad(
            lambda x: jnp.sum(B._halo_pad_folded_impl(x, nbr, segs) * ctf))(xf)
        gc = jax.grad(
            lambda x: jnp.sum(B._halo_pad_folded(x, nbr, segs) * ctf))(xf)
        np.testing.assert_allclose(np.asarray(gc), np.asarray(ga),
                                   rtol=1e-6, atol=1e-6)
