"""bf16 sparse-conv path + remat: numerics close to fp32, grads flow."""

import numpy as np
import jax
import jax.numpy as jnp

from geoformer_tpu.ops.sparse_conv import (
    build_grid_plan,
    subm_conv,
    voxel_capacities,
)
from geoformer_tpu.ops.voxelize import voxel_mean_pool


def _plan(rng, b=1, p=256, spatial=32, depth=2, caps0=256):
    coords = rng.integers(0, spatial, size=(b, p, 3)).astype(np.int32)
    mask = np.ones((b, p), bool)
    caps = voxel_capacities(caps0, depth, 0.5)
    return build_grid_plan(jnp.asarray(coords), jnp.asarray(mask), spatial, depth, caps)


def test_subm_conv_bf16_close_to_fp32():
    rng = np.random.default_rng(0)
    plan = _plan(rng)
    v = plan.grids[0].voxel_keys.shape[1]
    feats = jnp.asarray(rng.normal(size=(1, v, 8)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(27, 8, 16)).astype(np.float32) * 0.1)
    full = subm_conv(feats, plan.subm[0], w)
    half = subm_conv(feats, plan.subm[0], w, compute_dtype=jnp.bfloat16)
    assert half.dtype == jnp.float32  # fp32 accumulate
    err = np.abs(np.asarray(full) - np.asarray(half))
    rel = err.max() / (np.abs(np.asarray(full)).max() + 1e-6)
    assert rel < 0.05, rel


def test_model_bf16_remat_forward_and_grad(tiny_cfg):
    from geoformer_tpu.models.geoformer import GeoFormer, ModelConfig
    from tests.test_model_forward import synthetic_batch

    cfg = tiny_cfg.replace(tpu_bf16=True, tpu_remat=True)
    mc = ModelConfig.from_cfg(cfg)
    assert mc.bf16 and mc.remat
    model = GeoFormer(mc)
    rng = np.random.default_rng(1)
    batch = synthetic_batch(rng, 1, cfg.tpu_max_points, cfg.tpu_spatial_shape)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    variables = model.init({"params": k1, "sample": k2, "dropout": k3}, batch, train=True)

    def loss_fn(params):
        out, _ = model.apply(
            {**variables, "params": params}, batch, train=True,
            rngs={"sample": k2, "dropout": k3}, mutable=["batch_stats"],
        )
        return jnp.sum(out["semantic_scores"] ** 2) * 1e-4

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    gnorm = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree.leaves(grads["backbone"]))
    assert gnorm > 0  # grads flow through the bf16 + remat backbone
