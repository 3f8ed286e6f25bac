"""FULL-MODEL golden parity for the FEW-SHOT pipeline: the complete
REFERENCE GeoFormerFS forward (/root/reference/model/geoformer/
geoformer_fs.py:424-560) on CPU torch — process_support (:377-422), the
[ctx*sup, ctx-sup, ctx] aggregation tensor (:532-538), the similarity net
on the first Q contexts (:572), FS proposal generation (:191-239), and the
`remember` cache (:439-527) — versus OUR GeoFormerFS with weights mapped by
tools/convert_reference_checkpoint.convert(few_shot=True).

Reuses the supervised harness's CUDA shims (tests/
test_full_model_golden_parity.py): spconv 1.0, pointnet2._ext FPS/ball
query, faiss flat-L2, pointgroup voxelization. Scene construction follows
the same <=4 cm blob determinism argument (every fg pair is one radius
edge; BFS first-visit == true shortest path).

What this pins beyond the supervised test:
  * support masking -> npoint=32 FPS -> avg-pool ball groups -> mean
    embedding (process_support)
  * the support/query fusion tensor feeding both the decoder projection
    and the similarity net
  * FS proposal gating (logit 0.2, score = mask_score * sqrt(sim),
    sim >= similarity_thresh)
  * the remember contract: our encode_scene + decode_with_support split
    == our one-shot __call__, and == the reference's cached second pass
"""

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from tests.test_full_model_golden_parity import (
    TINY,
    _FaissIndex,
    _functional_ext,
    _functional_pointgroup_ops,
    make_blob_scene,
    np_voxel_maps,
)

REF = "/root/reference"

FS_TINY = dict(TINY, similarity_thresh=0.2, k_shot=1)


@pytest.fixture(scope="module")
def ref_fs_model():
    if not os.path.isdir(REF):
        pytest.skip("reference tree not mounted")
    import tests.spconv_shim as shim

    stubs = {}

    def stub(name, **attrs):
        mod = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(mod, k, v)
        stubs[name] = mod

    spconv_mod = types.ModuleType("spconv")
    for n in ("SparseConvTensor", "SparseSequential", "SubMConv3d",
              "SparseConv3d", "SparseInverseConv3d"):
        setattr(spconv_mod, n, getattr(shim, n))
    spconv_modules = types.ModuleType("spconv.modules")
    spconv_modules.SparseModule = shim.SparseModule
    spconv_mod.modules = spconv_modules
    stubs["spconv"] = spconv_mod
    stubs["spconv.modules"] = spconv_modules
    stub("faiss", GpuIndexFlatConfig=lambda: types.SimpleNamespace(),
         GpuIndexFlatL2=_FaissIndex, StandardGpuResources=lambda: None)
    stub("faiss.contrib")
    stub("faiss.contrib.torch_utils")
    stub("PG_OP")
    stubs["pointnet2._ext"] = _functional_ext()
    stub("pointnet2")
    stubs["pointnet2"]._ext = stubs["pointnet2._ext"]
    stubs["lib.pointgroup_ops.functions.pointgroup_ops"] = _functional_pointgroup_ops()
    stub("trimesh")

    import yaml

    with open(os.path.join(REF, "config", "test_geoformer_fs_scannet.yaml")) as f:
        base = yaml.safe_load(f)
    for group in base.values():
        if isinstance(group, dict):
            for k in list(group):
                if k in FS_TINY:
                    group[k] = FS_TINY[k]
    cfg_path = "/tmp/ref_fs_parity.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(base, f)

    saved_mods = {k: sys.modules.get(k) for k in stubs}
    saved_argv = sys.argv
    sys.modules.update(stubs)
    sys.argv = ["fs_parity", "--config", cfg_path,
                "--output_path", "/tmp/ref_fs_parity"]
    sys.path.insert(0, REF)
    try:
        for k in list(sys.modules):
            if k in stubs:
                continue
            if k == "util" or k == "lib" or k.startswith(("util.", "model", "lib.")):
                del sys.modules[k]
        from util.config import cfg as ref_cfg
        import model.geoformer.geoformer_fs as rgfs

        for k, v in FS_TINY.items():
            setattr(ref_cfg, k, v)
        torch.manual_seed(7)
        net = rgfs.GeoFormerFS()
        g = torch.Generator().manual_seed(11)
        with torch.no_grad():
            for p in net.parameters():
                p.copy_(torch.randn(p.shape, generator=g) * 0.2)
            for mod in net.modules():
                if isinstance(mod, torch.nn.BatchNorm1d):
                    mod.running_mean.copy_(
                        torch.randn(mod.running_mean.shape, generator=g) * 0.1)
                    mod.running_var.copy_(
                        torch.rand(mod.running_var.shape, generator=g) * 0.5 + 0.75)
        net.eval()
        yield net, ref_cfg
    finally:
        sys.path.remove(REF)
        sys.argv = saved_argv
        for k, v in saved_mods.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


def _ref_batch(pts, coords, rgb, spatial, support_mask=None):
    n = pts.shape[0]
    vox_coords, p2v, v2p = np_voxel_maps(coords)
    voxel_locs = np.concatenate(
        [np.zeros((vox_coords.shape[0], 1), np.int32), vox_coords], axis=1
    )
    d = {
        "locs": torch.tensor(
            np.concatenate([np.zeros((n, 1), np.int32), coords], 1),
            dtype=torch.long),
        "locs_float": torch.tensor(pts),
        "feats": torch.tensor(rgb),
        "batch_offsets": torch.tensor([0, n], dtype=torch.int32),
        "voxel_locs": torch.tensor(voxel_locs, dtype=torch.long),
        "p2v_map": torch.tensor(p2v, dtype=torch.int32),
        "v2p_map": torch.tensor(v2p, dtype=torch.int32),
        "spatial_shape": [spatial] * 3,
        "pc_mins": torch.tensor(pts.min(0)[None]),
        "pc_maxs": torch.tensor(pts.max(0)[None]),
    }
    if support_mask is not None:
        d["support_masks"] = torch.tensor(support_mask.astype(np.int64))
    return d


def _our_batch(pts, coords, rgb, p, support_mask=None):
    n = pts.shape[0]
    d = {
        "points": jnp.asarray(np.pad(pts, ((0, p - n), (0, 0)))[None]),
        "feats": jnp.asarray(np.pad(rgb, ((0, p - n), (0, 0)))[None]),
        "coords": jnp.asarray(np.pad(coords, ((0, p - n), (0, 0)))[None]),
        "point_mask": jnp.asarray((np.arange(p) < n)[None]),
        "labels": jnp.zeros((1, p), jnp.int32),
        "instance_labels": jnp.zeros((1, p), jnp.int32),
        "pc_mins": jnp.asarray(pts.min(0)[None]),
        "pc_maxs": jnp.asarray(pts.max(0)[None]),
    }
    if support_mask is not None:
        d["support_masks"] = jnp.asarray(
            np.pad(support_mask, (0, p - n))[None] > 0)
    return d


def test_fs_full_model_golden_parity(ref_fs_model, monkeypatch):
    net, ref_cfg = ref_fs_model
    from geoformer_tpu.models.geoformer import ModelConfig
    from geoformer_tpu.models.geoformer_fs import GeoFormerFS
    from geoformer_tpu.utils.config import load_config
    from tools.convert_reference_checkpoint import convert

    scale = FS_TINY["point_scale"]
    spatial = 128
    q_pts, q_coords, q_rgb = make_blob_scene(seed=5, scale=scale)
    s_pts, s_coords, s_rgb = make_blob_scene(seed=9, scale=scale)
    n, ns = q_pts.shape[0], s_pts.shape[0]
    # mask most of the support blob (>=32 so the npoint_new=32 FPS is full)
    sup_mask = (np.arange(ns) % 4 != 3).astype(np.int32)
    assert sup_mask.sum() >= 32

    # util.utils.get_batch_offsets hard-codes .cuda() (util/utils.py:136)
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)

    # ---------------- reference ----------------
    ref_scene = _ref_batch(q_pts, q_coords, q_rgb, spatial)
    ref_support = _ref_batch(s_pts, s_coords, s_rgb, spatial,
                             support_mask=sup_mask)
    with torch.no_grad():
        ref_sup_emb = net.process_support(ref_support, training=False)
        # eval pass (writes the remember cache, emits FS proposals)
        ref_out = net(ref_support, ref_scene, training=False, remember=False,
                      support_embeddings=ref_sup_emb)
        # cached pass with training=True exposes simnet + mask logits
        # (module stays .eval(): BN running stats, no dropout; the
        # n_subsample=30000 downsample is the identity on a tiny scene)
        ref_train_out = net(ref_support, ref_scene, training=True,
                            remember=True, support_embeddings=ref_sup_emb)

    ref_sem = ref_out["semantic_scores"].detach().numpy()
    ref_sim = ref_train_out["simnet"].detach().numpy()  # [1, Q] logits
    ref_masks = (
        ref_train_out["mask_predictions"][-1]["mask_logits"][0]
        .detach().numpy()
    )  # [Q, n_fg]
    fg_ref = ref_train_out["fg_idxs"].detach().numpy()
    n_fg = len(fg_ref)
    assert n_fg >= FS_TINY["n_decode_point"], "scene too small for FPS"

    # ---------------- ours, converted weights ----------------
    cfg = load_config(
        None, batch_size=1,
        m=FS_TINY["m"], classes=FS_TINY["classes"],
        dec_nlayers=FS_TINY["dec_nlayers"], dec_dim=FS_TINY["dec_dim"],
        dec_ffn_dim=FS_TINY["dec_ffn_dim"], dec_nhead=FS_TINY["dec_nhead"],
        dec_dropout=0.0,
        n_decode_point=FS_TINY["n_decode_point"],
        n_query_points=FS_TINY["n_query_points"],
        n_downsampling=FS_TINY["n_downsampling"],
        train_fold=0, cvfold=0,
        similarity_thresh=FS_TINY["similarity_thresh"],
        tpu_max_points=256, tpu_max_voxels=256, tpu_voxel_decay=1.0,
        tpu_brick_occupancy=0,  # canonical rulebook convs
        tpu_max_fg_points=128, tpu_unet_depth=7, tpu_spatial_shape=spatial,
        tpu_knn_neighbors=64, tpu_radius_cell_cap=128,
        tpu_geodesic_hier=False, tpu_geodesic_steps_eval=64,
        tpu_ball_nsample=64, tpu_max_instances=8,
        TEST_SCORE_THRESH=FS_TINY["TEST_SCORE_THRESH"],
        TEST_NPOINT_THRESH=FS_TINY["TEST_NPOINT_THRESH"],
    )
    mc = ModelConfig.from_cfg(cfg)
    model = GeoFormerFS(mc)
    p = cfg.tpu_max_points
    scene = _our_batch(q_pts, q_coords, q_rgb, p)
    support = _our_batch(s_pts, s_coords, s_rgb, p, support_mask=sup_mask)

    k = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(k, 3)
    variables = jax.jit(lambda r, s_, c_: model.init(r, s_, c_, train=False))(
        {"params": k1, "sample": k2, "dropout": k3}, support, scene
    )
    sd = {k_: v.detach().numpy() for k_, v in net.state_dict().items()}
    params, stats, consts = convert(sd, cfg, few_shot=True)

    def _merge(dst, src):
        for k_, v in src.items():
            if isinstance(v, dict) and isinstance(dst.get(k_), dict):
                _merge(dst[k_], v)
            else:
                dst[k_] = v
        return dst

    variables = jax.tree_util.tree_map(np.asarray, jax.device_get(variables))
    variables = dict(variables)
    variables["params"] = _merge(dict(variables["params"]), params)
    variables["batch_stats"] = _merge(dict(variables.get("batch_stats", {})), stats)
    variables["constants"] = _merge(dict(variables.get("constants", {})), consts)

    # support embedding parity first — isolates process_support
    got_sup = np.asarray(model.apply(
        variables, support, train=False, rngs={"sample": k2},
        method=GeoFormerFS.process_support,
    ))
    np.testing.assert_allclose(
        got_sup, ref_sup_emb.detach().numpy(), rtol=2e-3, atol=2e-3)

    out = model.apply(variables, support, scene, train=False,
                      rngs={"sample": k2})

    got_sem = np.asarray(out["semantic_scores"][0, :n])
    np.testing.assert_allclose(got_sem, ref_sem, rtol=2e-3, atol=2e-3)

    fg_idx = np.asarray(out["fg_idx"][0])
    fg_valid = np.asarray(out["fg_valid"][0])
    np.testing.assert_array_equal(fg_idx[fg_valid], fg_ref)

    got_sim = np.asarray(out["similarity"])  # [1, Q] logits
    np.testing.assert_allclose(got_sim, ref_sim, rtol=5e-3, atol=5e-3)

    got_masks = np.asarray(out["mask_logits"][-1, 0])[:, :n_fg]
    assert got_masks.shape == ref_masks.shape
    np.testing.assert_allclose(got_masks, ref_masks, rtol=5e-3, atol=5e-3)

    # FS proposals (geoformer_fs.py:191-239): scores + full masks
    ref_scores, ref_props = ref_out["proposal_scores"]
    keep = np.asarray(out["proposals"]["keep"][0])
    got_scores = np.asarray(out["proposals"]["scores"][0])[keep]
    got_full = np.asarray(out["proposals"]["masks"][0])[keep][:, :n]
    if len(ref_scores) == 0:
        assert got_scores.size == 0
    else:
        assert got_full.shape[0] == len(ref_scores)
        np.testing.assert_allclose(
            np.sort(got_scores), np.sort(ref_scores.detach().numpy()),
            rtol=5e-3, atol=5e-3)
        np.testing.assert_array_equal(
            np.sort(got_full.astype(np.int32), axis=0),
            np.sort(ref_props.detach().numpy(), axis=0))

    # ---------------- remember contract ----------------
    # our split (encode once, decode per support) == the one-shot __call__
    cache = model.apply(variables, scene, train=False, rngs={"sample": k2},
                        method=GeoFormerFS.encode_scene)
    dec = model.apply(variables, cache, jnp.asarray(got_sup),
                      scene["pc_mins"], scene["pc_maxs"], False,
                      rngs={"sample": k2},
                      method=GeoFormerFS.decode_with_support)
    np.testing.assert_allclose(
        np.asarray(dec["mask_logits"]), np.asarray(out["mask_logits"]),
        rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(dec["similarity"]), np.asarray(out["similarity"]),
        rtol=1e-5, atol=1e-5)
    # and the reference's cached pass equals its fresh pass (sanity that
    # the remember contract we mirrored is what the reference computes)
    with torch.no_grad():
        ref_out2 = net(ref_support, ref_scene, training=False, remember=True,
                       support_embeddings=ref_sup_emb)
    s1, m1 = ref_out["proposal_scores"]
    s2, m2 = ref_out2["proposal_scores"]
    if len(s1) > 0 or len(s2) > 0:
        np.testing.assert_allclose(
            s1.detach().numpy(), s2.detach().numpy(), rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(
            m1.detach().numpy(), m2.detach().numpy())
