"""Model-axis sharding proof: the [B,F,Q] geodesic table is never
all-gathered before the loss on a dp x mp mesh.

The decoder-query ("model") axis shards the geodesic solve, rel-pos,
decoder, and dynamic-conv mask head (models/geoformer.py). The criterion's
dice/focal losses reduce per query, so the only collectives touching
query-sharded tensors should be scalar/small reductions — an all-gather of
the full geodesic table (or the mask logits) would mean the axis
parallelizes nothing. There is no reference analog (SURVEY.md §2.6: the
reference has no working multi-device path)."""

import re

import jax
import numpy as np
import pytest

from geoformer_tpu.engine import Engine
from geoformer_tpu.parallel.mesh import make_mesh, shard_batch


def _tiny_cfg(batch_size):
    from geoformer_tpu.utils.config import load_config

    return load_config(
        None,
        batch_size=batch_size,
        m=4,
        classes=13,
        dec_nlayers=2,
        dec_dim=16,
        dec_ffn_dim=16,
        dec_nhead=4,
        n_decode_point=64,
        n_query_points=16,
        n_downsampling=512,
        tpu_max_points=1024,
        tpu_max_voxels=1024,
        tpu_max_fg_points=512,
        tpu_train_subsample=256,
        tpu_max_instances=8,
        tpu_knn_neighbors=8,
        tpu_geodesic_steps_train=8,
        tpu_geodesic_steps_eval=8,
        tpu_spatial_shape=128,
        tpu_unet_depth=3,
        tpu_ball_nsample=8,
        prepare_epochs=0,
    )


def _synth_batch(cfg, b):
    import __graft_entry__ as ge

    return ge._synthetic_batch(cfg, b, seed=0)


ALLGATHER_RE = re.compile(r"all-gather[^=]*=?\s*\(?([a-z0-9]+)\[([0-9,]*)\]")


def _allgather_sizes(hlo_text):
    """Element counts of every all-gather result in optimized HLO."""
    sizes = []
    for line in hlo_text.splitlines():
        if "all-gather" not in line or "=" not in line:
            continue
        lhs, rhs = line.split("=", 1)
        if not rhs.strip().startswith(("f32", "f16", "bf16", "s32", "s16", "u32",
                                       "pred", "(")):
            continue
        if "all-gather" not in rhs.split("(")[0] and "all-gather(" not in rhs:
            continue
        for m in re.finditer(r"\[([0-9,]+)\]", rhs.split("all-gather")[0] + "]"):
            dims = [int(x) for x in m.group(1).split(",") if x]
            if dims:
                sizes.append(int(np.prod(dims)))
            break
    return sizes


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_no_geodesic_allgather_on_dp_mp_mesh():
    mp = 2
    dp = 4
    mesh = make_mesh(8, model_parallel=mp)
    cfg = _tiny_cfg(dp)
    engine = Engine(cfg, few_shot=False, mesh=mesh)
    batch = _synth_batch(cfg, dp)
    state = engine.init_state(batch, seed=0)
    rng = jax.random.PRNGKey(0)

    step = engine._make_train_step(False, cfg.prepare_epochs + 1)
    with jax.sharding.set_mesh(mesh):
        lowered = step.lower(state, shard_batch(batch, mesh), None, rng, 1e-3)
    txt = lowered.compile().as_text()

    f_cap = cfg.tpu_max_fg_points
    q = cfg.n_query_points
    geo_elems = f_cap * q  # per-scene geodesic table (and mask-logit) size
    sizes = _allgather_sizes(txt)
    big = [s for s in sizes if s >= geo_elems]
    assert not big, (
        f"optimized HLO all-gathers tensors of size(s) {big} "
        f">= geodesic table ({geo_elems} elems/scene): the model axis is "
        f"being replicated, not parallelized"
    )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_geodesic_solve_runs_sharded():
    """The solver output must already carry the (data, None, model) sharding
    (shard_map path taken), not be resharded afterwards."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from geoformer_tpu.models.geoformer import GeoFormer, ModelConfig

    mesh = make_mesh(8, model_parallel=2)
    cfg = _tiny_cfg(4)
    mc = ModelConfig.from_cfg(cfg)
    model = GeoFormer(mc)
    batch = _synth_batch(cfg, 4)
    k = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(k, 3)
    variables = model.init({"params": k1, "sample": k2, "dropout": k3}, batch,
                           train=False)

    def geo_only(variables, batch, rng):
        def run(mdl):
            pf, ss, sp, _ = mdl.forward_backbone(batch, train=False)
            fg_idx, fg_valid = mdl.foreground_pack(sp, batch["point_mask"])
            fg_locs = jax.vmap(lambda a, i: a[i])(batch["points"], fg_idx)
            fg_feats = jax.vmap(lambda a, i: a[i])(pf, fg_idx)
            cl, cf, ci, cv = mdl.forward_aggregator(fg_locs, fg_feats, fg_valid,
                                                    train=False)
            return mdl.forward_geodesic(fg_locs, fg_valid, ci, cv, train=False)
        return model.apply(variables, rngs={"sample": rng}, method=run)

    with jax.sharding.set_mesh(mesh):
        geo, graph_ovf, graph_wovf = jax.jit(geo_only)(
            variables, shard_batch(batch, mesh), k2)
    jax.block_until_ready(geo)
    assert int(np.sum(np.asarray(graph_ovf))) == 0  # tiny scenes: no drops
    assert int(np.sum(np.asarray(graph_wovf))) == 0
    expect = NamedSharding(mesh, P("data", None, "model"))
    assert geo.sharding.is_equivalent_to(expect, geo.ndim), (
        f"geodesic table sharding {geo.sharding} != {expect}"
    )
    # and it is finite/sane where reached
    g = np.asarray(geo)
    assert np.isfinite(g[g >= 0]).all()
