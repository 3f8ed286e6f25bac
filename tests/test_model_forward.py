"""End-to-end forward tests for GeoFormer / GeoFormerFS on tiny capacities."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from geoformer_tpu.models.geoformer import GeoFormer, ModelConfig
from geoformer_tpu.models.geoformer_fs import GeoFormerFS


def synthetic_batch(rng, B, P, spatial, classes=13, n_valid=None, scale=50.0):
    n_valid = n_valid or P
    pts = rng.uniform(0.2, (spatial - 1) / scale - 0.2, size=(B, P, 3)).astype(np.float32)
    coords = np.floor(pts * scale).astype(np.int32)
    mask = np.zeros((B, P), bool)
    mask[:, :n_valid] = True
    labels = rng.integers(0, classes, size=(B, P)).astype(np.int32)
    inst = rng.integers(-1, 5, size=(B, P)).astype(np.int32)
    inst[inst < 0] = -100
    return {
        "points": jnp.asarray(pts),
        "feats": jnp.asarray(rng.normal(size=(B, P, 3)).astype(np.float32)),
        "coords": jnp.asarray(coords),
        "point_mask": jnp.asarray(mask),
        "labels": jnp.asarray(np.where(mask, labels, -100)),
        "instance_labels": jnp.asarray(np.where(mask, inst, -100)),
        "pc_mins": jnp.asarray(pts.min(1)),
        "pc_maxs": jnp.asarray(pts.max(1)),
    }


def tiny_mc(tiny_cfg, **kw):
    mc = ModelConfig.from_cfg(tiny_cfg)
    return mc if not kw else ModelConfig(**{**mc.__dict__, **kw})


@pytest.fixture(scope="module")
def rngs():
    k = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(k, 3)
    return {"params": k1, "sample": k2, "dropout": k3}


def test_modelconfig_defaults_match_config_defaults():
    """ModelConfig() dataclass defaults must equal ModelConfig.from_cfg of
    the default flat config — the two default surfaces drifted once
    (geodesic_fine_sweeps, ADVICE r3) and the 'keep in sync' comments are
    not a gate. Any intentional divergence must be listed here."""
    import dataclasses

    from geoformer_tpu.utils.config import load_config

    got = ModelConfig.from_cfg(load_config())
    dflt = ModelConfig()
    diff = {
        f.name: (getattr(got, f.name), getattr(dflt, f.name))
        for f in dataclasses.fields(ModelConfig)
        if getattr(got, f.name) != getattr(dflt, f.name)
    }
    assert diff == {}, f"config-default vs dataclass-default drift: {diff}"


def test_geoformer_forward_shapes(tiny_cfg, rngs):
    rng = np.random.default_rng(0)
    mc = tiny_mc(tiny_cfg)
    B, P = 2, tiny_cfg.tpu_max_points
    batch = synthetic_batch(rng, B, P, mc.spatial, n_valid=400)
    model = GeoFormer(mc)

    variables = model.init(rngs, batch, train=True)
    out, mutated = model.apply(
        variables, batch, train=True,
        rngs={"sample": rngs["sample"], "dropout": rngs["dropout"]},
        mutable=["batch_stats"],
    )
    L, Q, F = mc.dec_nlayers, mc.n_query_points, mc.train_subsample
    assert out["semantic_scores"].shape == (B, P, mc.classes)
    assert out["mask_logits"].shape == (L, B, Q, F)
    assert out["cls_logits"].shape == (L, B, Q, mc.classes)
    assert out["fg_idx"].shape == (B, F)
    assert np.isfinite(np.asarray(out["semantic_scores"])[np.asarray(batch["point_mask"])]).all()
    assert "batch_stats" in mutated

    # semantic-only (prepare epochs) path
    out2 = model.apply(
        variables, batch, train=True, semantic_only=True,
        rngs={"sample": rngs["sample"], "dropout": rngs["dropout"]},
        mutable=["batch_stats"],
    )[0]
    assert set(out2.keys()) == {"semantic_scores", "voxel_stats"}

    # eval path with proposals
    out3 = model.apply(
        variables, batch, train=False,
        rngs={"sample": rngs["sample"]},
    )
    assert out3["mask_logits"].shape == (1, B, Q, mc.max_fg_points)
    props = out3["proposals"]
    assert props["masks"].shape == (B, Q, P)
    assert props["scores"].shape == (B, Q)


def test_geoformer_fs_forward(tiny_cfg, rngs):
    rng = np.random.default_rng(1)
    mc = tiny_mc(tiny_cfg)
    B, P = 2, tiny_cfg.tpu_max_points
    query = synthetic_batch(rng, B, P, mc.spatial, n_valid=400)
    support = synthetic_batch(rng, B, P, mc.spatial, n_valid=300)
    support["support_masks"] = (np.asarray(support["instance_labels"]) == 2).astype(np.int32)

    model = GeoFormerFS(mc)
    variables = model.init(rngs, support, query, train=True)
    out, _ = model.apply(
        variables, support, query, train=True,
        rngs={"sample": rngs["sample"], "dropout": rngs["dropout"]},
        mutable=["batch_stats"],
    )
    L, Q, F = mc.dec_nlayers, mc.n_query_points, mc.train_subsample
    assert out["mask_logits"].shape == (L, B, Q, F)
    assert out["similarity"].shape == (B, Q)

    # eval with cached scene encoding reused across supports (remember path)
    cache = model.apply(
        variables, query, train=False,
        rngs={"sample": rngs["sample"]}, method=GeoFormerFS.encode_scene,
    )
    emb = model.apply(
        variables, support, rngs={"sample": rngs["sample"]},
        method=GeoFormerFS.process_support,
    )
    assert emb.shape == (B, 2 * mc.m)
    dec = model.apply(
        variables, cache, emb, query["pc_mins"], query["pc_maxs"], False,
        rngs={"sample": rngs["sample"]}, method=GeoFormerFS.decode_with_support,
    )
    assert dec["mask_logits"].shape == (1, B, Q, mc.max_fg_points)


def test_strided_pack_by_mask():
    """Eval fg subsample: identity when the valid prefix fits capacity;
    a uniform monotone non-repeating stride over the prefix when not."""
    from geoformer_tpu.models.geoformer import strided_pack_by_mask

    # fits: identity prefix
    m = jnp.asarray([True] * 10 + [False] * 6)
    idx, valid = strided_pack_by_mask(m, 12)
    np.testing.assert_array_equal(np.asarray(idx[:10]), np.arange(10))
    np.testing.assert_array_equal(np.asarray(valid),
                                  [True] * 10 + [False] * 2)

    # binds: n=500 valid, cap=64 -> strictly increasing, spans the prefix
    m2 = jnp.asarray([True] * 500 + [False] * 12)
    idx2, valid2 = strided_pack_by_mask(m2, 64)
    i2 = np.asarray(idx2)
    assert np.asarray(valid2).all()
    assert (np.diff(i2) >= 1).all()          # no repeats
    assert i2[0] == 0 and i2[-1] >= 500 - 500 // 64 - 1  # covers the range
    assert (i2 < 500).all()                  # never a pad point

    # uniformity: bin the picks into 8 equal prefix bins -> 8 +- 1 per bin
    hist, _ = np.histogram(i2, bins=8, range=(0, 500))
    assert hist.min() >= 7 and hist.max() <= 9


def test_train_grads_finite_with_pad_voxels(tiny_cfg, rngs):
    """From-scratch step-1 gradients must be finite when the bottleneck
    level has PAD voxel rows (constant features at init: SimpleNorm's
    sqrt-at-zero-variance backward emitted NaN there — 0-upstream * inf).
    Capacities here leave every level underfull, reproducing the original
    NaN before the double-where fix in blocks.py:SimpleNorm."""
    import jax

    rng = np.random.default_rng(5)
    B, P, spatial = 1, 256, 64
    batch = synthetic_batch(rng, B, P, spatial, n_valid=200)
    mc = tiny_mc(tiny_cfg, max_voxels=2048, spatial=spatial)
    model = GeoFormer(mc)
    variables = model.init(rngs, batch, train=True)
    # sanity: the bottleneck level must actually have pad rows
    from geoformer_tpu.ops.sparse_conv import build_grid_plan, voxel_capacities

    caps = voxel_capacities(mc.max_voxels, mc.depth, mc.voxel_decay)
    plan = build_grid_plan(batch["coords"], batch["point_mask"], mc.spatial,
                           mc.depth, caps,
                           brick_occupancy=mc.brick_occupancy or None)
    deep_mask = np.asarray(plan.grids[-1].voxel_mask)
    assert (~deep_mask).sum() > 0, "test needs pad rows at the bottleneck"

    def loss_fn(params):
        out = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"],
             "constants": variables.get("constants", {})},
            batch, train=True,
            rngs={"sample": rngs["sample"], "dropout": rngs["dropout"]},
            mutable=["batch_stats"],
        )[0]
        # touch every head that feeds the train loss
        return (jnp.sum(out["semantic_scores"])
                + jnp.sum(out["mask_logits"]) + jnp.sum(out["cls_logits"]))

    grads = jax.grad(loss_fn)(variables["params"])
    bad = [jax.tree_util.keystr(k)
           for k, v in jax.tree_util.tree_flatten_with_path(grads)[0]
           if not bool(jnp.all(jnp.isfinite(v)))]
    assert not bad, f"non-finite grads: {bad[:8]}"
