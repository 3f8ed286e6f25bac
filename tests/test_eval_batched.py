"""Batched / mesh-sharded eval dispatch (test.py `test_batch_size` > 1).

The reference's test drivers are strictly bs=1 (test.py:33-134). Ours can
evaluate G scenes per jitted dispatch, sharded over the mesh's data axis
when G divides it (Engine.eval_batch). The eval forward consumes no rng
(deterministic strided fg subsample — models/geoformer.py
forward_aggregator), so per-scene outputs must not depend on which group a
scene rides in or on whether the group is sharded.
"""

import numpy as np
import jax
import pytest

from geoformer_tpu.engine import Engine
from geoformer_tpu.parallel.mesh import make_mesh
from tests.test_model_forward import synthetic_batch


def _eval_variables(cfg, example):
    engine = Engine(cfg, few_shot=False, mesh=make_mesh(1))
    state = engine.init_state(example, seed=0)
    return engine, {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "constants": state.constants,
    }


def _stack(*batches):
    return jax.tree.map(
        lambda *xs: np.concatenate([np.asarray(x) for x in xs], axis=0),
        *batches,
    )


@pytest.fixture(scope="module")
def eval_setup(tiny_cfg):
    cfg = tiny_cfg.replace(batch_size=1)
    rng = np.random.default_rng(3)
    b1 = synthetic_batch(rng, 1, cfg.tpu_max_points, cfg.tpu_spatial_shape)
    b2 = synthetic_batch(rng, 1, cfg.tpu_max_points, cfg.tpu_spatial_shape)
    engine, variables = _eval_variables(cfg, b1)
    r = jax.random.PRNGKey(0)
    out1 = jax.device_get(engine.eval_batch(variables, b1, r))
    out2 = jax.device_get(engine.eval_batch(variables, b2, r))
    return cfg, variables, b1, b2, out1, out2


def _assert_scene_matches(out_grouped, lane, out_serial):
    p_g, p_s = out_grouped["proposals"], out_serial["proposals"]
    np.testing.assert_array_equal(p_g["keep"][lane], p_s["keep"][0])
    np.testing.assert_array_equal(p_g["classes"][lane], p_s["classes"][0])
    np.testing.assert_allclose(
        p_g["scores"][lane], p_s["scores"][0], rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        p_g["masks"][lane], p_s["masks"][0], rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        out_grouped["semantic_scores"][lane],
        out_serial["semantic_scores"][0],
        rtol=1e-5, atol=1e-6,
    )


def test_grouped_eval_matches_serial(eval_setup):
    cfg, variables, b1, b2, out1, out2 = eval_setup
    engine = Engine(cfg, few_shot=False, mesh=make_mesh(1))
    outb = jax.device_get(
        engine.eval_batch(variables, _stack(b1, b2), jax.random.PRNGKey(0))
    )
    _assert_scene_matches(outb, 0, out1)
    _assert_scene_matches(outb, 1, out2)


def test_grouped_eval_sharded_over_data_mesh(eval_setup):
    cfg, variables, b1, b2, out1, out2 = eval_setup
    engine = Engine(cfg, few_shot=False, mesh=make_mesh(2))
    outb = jax.device_get(
        engine.eval_batch(variables, _stack(b1, b2), jax.random.PRNGKey(0))
    )
    # the output must actually ride the data axis (not be replicated)
    _assert_scene_matches(outb, 0, out1)
    _assert_scene_matches(outb, 1, out2)


def test_fs_encode_batched_matches_serial(tiny_cfg):
    """test_fs.py groups scenes into one encode dispatch; each scene's slice
    of the batched cache must equal its solo encode."""
    from geoformer_tpu.models.geoformer import ModelConfig
    from geoformer_tpu.models.geoformer_fs import GeoFormerFS

    cfg = tiny_cfg.replace(batch_size=1)
    mc = ModelConfig.from_cfg(cfg)
    model = GeoFormerFS(mc)
    rng = np.random.default_rng(5)
    b1 = synthetic_batch(rng, 1, cfg.tpu_max_points, cfg.tpu_spatial_shape)
    b2 = synthetic_batch(rng, 1, cfg.tpu_max_points, cfg.tpu_spatial_shape)
    k = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(k, 3)
    variables = model.init(
        {"params": k1, "sample": k2, "dropout": k3}, b1, False,
        method=GeoFormerFS.encode_scene,
    )

    enc = jax.jit(
        lambda v, b, r: model.apply(
            v, b, False, rngs={"sample": r}, method=GeoFormerFS.encode_scene
        )
    )
    r = jax.random.PRNGKey(1)
    c1 = jax.device_get(enc(variables, b1, r))
    c2 = jax.device_get(enc(variables, b2, r))
    cb = jax.device_get(enc(variables, _stack(b1, b2), r))
    for key in ("fg_idx", "fg_valid", "context_inds", "context_valid"):
        np.testing.assert_array_equal(cb[key][0], c1[key][0])
        np.testing.assert_array_equal(cb[key][1], c2[key][0])
    for key in ("context_feats", "geo_dist", "mask_feats"):
        np.testing.assert_allclose(cb[key][0], c1[key][0], rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(cb[key][1], c2[key][0], rtol=1e-5, atol=1e-6)


def test_indivisible_group_falls_back_unsharded(eval_setup):
    """B=3 on a 2-device mesh can't shard; eval_batch must still run."""
    cfg, variables, b1, b2, out1, out2 = eval_setup
    engine = Engine(cfg, few_shot=False, mesh=make_mesh(2))
    outb = jax.device_get(
        engine.eval_batch(variables, _stack(b1, b2, b1), jax.random.PRNGKey(0))
    )
    _assert_scene_matches(outb, 0, out1)
    _assert_scene_matches(outb, 1, out2)
    _assert_scene_matches(outb, 2, out1)
