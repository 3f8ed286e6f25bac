"""FULL-MODEL golden parity: the complete REFERENCE GeoFormer eval forward
(/root/reference/model/geoformer/geoformer.py:402-527 — backbone ->
aggregator -> FPS-prefix queries -> geodesic -> DETR decoder -> dynamic-conv
mask head -> proposals) on CPU torch, with every CUDA dependency replaced by
a pure-torch functional shim, versus OUR eval forward with weights mapped by
tools/convert_reference_checkpoint.convert. Anything mis-wired in ANY stage
— not just the backbone — shows up as a mask/cls-logit mismatch.

Shims (exact CUDA semantics):
  * spconv 1.0           -> tests/spconv_shim.py (existing)
  * pointnet2._ext       -> FPS (sampling_gpu.cu:72-135 incl. the
                            mag<=1e-3 skip), ball_query
                            (ball_query_gpu.cu:12-57 first-k-in-index-order
                            + first-hit padding), gather/group_points
  * faiss GpuIndexFlatL2 -> brute-force squared-L2 search (self included,
                            ascending — geodesic_utils.py:12-24 find_knn)
  * pointgroup_ops       -> mean voxelization over a [M, 1+maxActive] map

Determinism bridge: the reference permutes the foreground with an unseeded
np.random.choice even at eval (geoformer.py:575-580); the test patches it to
the identity, matching our deterministic-eval packing (geoformer.py
forward_aggregator). The scene is a <=4 cm blob so every foreground pair is
one radius-gated kNN edge apart: the reference's first-visit BFS and our
true-shortest-path solver agree exactly (both = the direct edge).
"""

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

REF = "/root/reference"


# ---------------------------------------------------------------- shims


def _functional_ext():
    ext = types.ModuleType("pointnet2._ext")

    def furthest_point_sampling(xyz, npoint):
        b, n, _ = xyz.shape
        out = torch.zeros(b, npoint, dtype=torch.int32)
        for bi in range(b):
            pts = xyz[bi]
            mag = (pts ** 2).sum(1)
            valid = mag > 1e-3  # sampling_gpu.cu:104 skip quirk
            temp = torch.full((n,), 1e10)
            old = 0
            for j in range(1, npoint):
                d = ((pts - pts[old]) ** 2).sum(1)
                temp = torch.minimum(temp, d)
                cand = torch.where(valid, temp, torch.full_like(temp, -1.0))
                old = int(torch.argmax(cand))
                out[bi, j] = old
        return out

    def gather_points(features, idx):
        b, c, _ = features.shape
        return torch.gather(
            features, 2, idx.long()[:, None, :].expand(b, c, idx.shape[1])
        ).contiguous()

    def ball_query(new_xyz, xyz, radius, nsample):
        b, m, _ = new_xyz.shape
        out = torch.zeros(b, m, nsample, dtype=torch.int32)
        r2 = radius * radius
        for bi in range(b):
            d2 = ((new_xyz[bi][:, None, :] - xyz[bi][None, :, :]) ** 2).sum(-1)
            for j in range(m):
                hits = torch.nonzero(d2[j] < r2).flatten()
                if len(hits) == 0:
                    continue
                row = torch.full((nsample,), int(hits[0]), dtype=torch.int32)
                sel = hits[:nsample]
                row[: len(sel)] = sel.to(torch.int32)
                out[bi, j] = row
        return out

    def group_points(features, idx):
        b, c, _ = features.shape
        m, ns = idx.shape[1], idx.shape[2]
        flat = idx.reshape(b, -1).long()
        g = torch.gather(features, 2, flat[:, None, :].expand(b, c, m * ns))
        return g.reshape(b, c, m, ns).contiguous()

    def _nope(*a, **k):
        raise NotImplementedError("not used by GeoFormer eval forward")

    ext.furthest_point_sampling = furthest_point_sampling
    ext.gather_points = gather_points
    ext.gather_points_grad = _nope
    ext.ball_query = ball_query
    ext.group_points = group_points
    ext.group_points_grad = _nope
    ext.three_nn = _nope
    ext.three_interpolate = _nope
    ext.three_interpolate_grad = _nope
    return ext


class _FaissIndex:
    """Brute-force GpuIndexFlatL2: squared distances, ascending, self first."""

    def __init__(self, *a, **k):
        self._data = None

    def add(self, x):
        self._data = x

    def search(self, q, k, dist_out, idx_out):
        d2 = ((q[:, None, :] - self._data[None, :, :]) ** 2).sum(-1)
        vals, idx = torch.topk(d2, min(k, d2.shape[1]), dim=1, largest=False)
        dist_out[:, : vals.shape[1]] = vals
        idx_out[:, : vals.shape[1]] = idx
        if vals.shape[1] < k:
            dist_out[:, vals.shape[1]:] = float("inf")
            idx_out[:, vals.shape[1]:] = -1

    def reset(self):
        self._data = None


def _functional_pointgroup_ops():
    mod = types.ModuleType("lib.pointgroup_ops.functions.pointgroup_ops")

    def voxelization(feats, v2p_map, mode=4):
        assert mode == 4  # mean
        m = v2p_map.shape[0]
        out = torch.zeros(m, feats.shape[1], dtype=feats.dtype)
        counts = v2p_map[:, 0].long()
        for i in range(m):
            ids = v2p_map[i, 1 : 1 + counts[i]].long()
            out[i] = feats[ids].mean(0)
        return out

    mod.voxelization = voxelization
    return mod


TINY = dict(
    m=8, classes=13, input_channel=3, use_coords=True, mode=4,
    prepare_epochs=-1, fix_module=[],
    dec_nlayers=2, dec_dim=32, dec_ffn_dim=32, dec_nhead=4, dec_dropout=0.0,
    n_decode_point=16, n_query_points=8, n_downsampling=50000,
    train_fold=0, cvfold=0,
    TEST_SCORE_THRESH=0.5, TEST_NPOINT_THRESH=5, TEST_NMS_THRESH=0.3,
    point_scale=50,
)


@pytest.fixture(scope="module")
def ref_model():
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

    with open(os.path.join(REF, "config", "test_geoformer_scannet.yaml")) as f:
        base = yaml.safe_load(f)
    for group in base.values():
        if isinstance(group, dict):
            for k in list(group):
                if k in TINY:
                    group[k] = TINY[k]
    base["TINYEXTRA"] = {k: v for k, v in TINY.items()
                         if not any(k in g for g in base.values() if isinstance(g, dict))}
    cfg_path = "/tmp/ref_full_parity.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(base, f)

    saved_mods = {k: sys.modules.get(k) for k in stubs}
    saved_argv = sys.argv
    sys.modules.update(stubs)
    sys.argv = ["full_parity", "--config", cfg_path,
                "--output_path", "/tmp/ref_full_parity"]
    sys.path.insert(0, REF)
    try:
        # purge reference modules cached by other tests (e.g. the converter
        # completeness test imports the REAL lib.pointgroup_ops chain with
        # an inert PG_OP stub; its `functions` package would shadow our
        # functional pointgroup_ops stub via attribute resolution)
        for k in list(sys.modules):
            if k in stubs:
                continue
            if k == "util" or k == "lib" or k.startswith(("util.", "model", "lib.")):
                del sys.modules[k]
        from util.config import cfg as ref_cfg
        import model.geoformer.geoformer as rg

        for k, v in TINY.items():
            setattr(ref_cfg, k, v)
        torch.manual_seed(7)
        net = rg.GeoFormer()
        # randomize BN stats so mean/var mapping bugs can't hide
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


# ---------------------------------------------------------------- scene


def make_blob_scene(seed=5, n=60, scale=50.0):
    """<=4 cm blob of <=60 points away from the origin: every fg pair is a
    direct radius-0.05 kNN edge AND inside the 64-NN fan-out (the graphs
    would otherwise be K-incomplete and BFS first-visit != shortest path —
    n > 64 reproduces exactly that divergence), so the reference's BFS and
    our true-shortest-path solver agree to fp precision."""
    rng = np.random.default_rng(seed)
    center = np.array([1.02, 1.10, 0.98], np.float32)
    d = rng.normal(size=(n, 3))
    d = d / np.linalg.norm(d, axis=1, keepdims=True)
    pts = center + d * (rng.random((n, 1)) ** (1 / 3)) * 0.019
    pts = np.unique(pts.astype(np.float32), axis=0)
    coords = np.floor(pts * scale).astype(np.int32)
    feats = rng.normal(size=(pts.shape[0], 3)).astype(np.float32)
    return pts, coords, feats


def np_voxel_maps(coords):
    """first-occurrence-order voxel maps: (voxel_coords [M,3], p2v [N],
    v2p [M, 1+maxActive]) — the contract preprocess_input consumes."""
    keys = [tuple(c) for c in coords]
    order = {}
    for k in keys:
        if k not in order:
            order[k] = len(order)
    p2v = np.array([order[k] for k in keys], np.int32)
    m = len(order)
    groups = [[] for _ in range(m)]
    for i, v in enumerate(p2v):
        groups[v].append(i)
    max_active = max(len(g) for g in groups)
    v2p = np.zeros((m, 1 + max_active), np.int32)
    for v, g in enumerate(groups):
        v2p[v, 0] = len(g)
        v2p[v, 1 : 1 + len(g)] = g
    vox_coords = np.zeros((m, 3), np.int32)
    for k, v in order.items():
        vox_coords[v] = k
    return vox_coords, p2v, v2p


def test_full_model_golden_parity(ref_model, monkeypatch):
    net, ref_cfg = ref_model
    from geoformer_tpu.models.geoformer import GeoFormer, ModelConfig
    from geoformer_tpu.utils.config import load_config
    from tools.convert_reference_checkpoint import convert

    scale = TINY["point_scale"]
    pts, coords, rgb = make_blob_scene(scale=scale)
    n = pts.shape[0]
    spatial = 128

    # ---------------- reference forward ----------------
    vox_coords, p2v, v2p = np_voxel_maps(coords)
    voxel_locs = np.concatenate(
        [np.zeros((vox_coords.shape[0], 1), np.int32), vox_coords], axis=1
    )
    batch_input = {
        "locs": torch.tensor(
            np.concatenate([np.zeros((n, 1), np.int32), coords], 1), dtype=torch.long
        ),
        "locs_float": torch.tensor(pts),
        "feats": torch.tensor(rgb),
        "offsets": torch.tensor([0, n], dtype=torch.int32),
        "voxel_locs": torch.tensor(voxel_locs, dtype=torch.long),
        "p2v_map": torch.tensor(p2v, dtype=torch.int32),
        "v2p_map": torch.tensor(v2p, dtype=torch.int32),
        "spatial_shape": [spatial] * 3,
        "pc_mins": torch.tensor(pts.min(0)[None]),
        "pc_maxs": torch.tensor(pts.max(0)[None]),
    }
    # identity fg "permutation": our eval packs the fg prefix in order
    monkeypatch.setattr(
        np.random, "choice",
        lambda count, size, replace=True: np.arange(size),
    )
    # util.utils.get_batch_offsets hard-codes .cuda() (util/utils.py:136)
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)
    with torch.no_grad():
        ref_out = net(batch_input, epoch=1000, training=False)

    ref_sem = ref_out["semantic_scores"].detach().numpy()  # [N, classes]
    fg_ref = ref_out["fg_idxs"].detach().numpy()
    n_fg = len(fg_ref)
    assert n_fg >= TINY["n_decode_point"], "scene too small for FPS — reseed"
    ref_masks = ref_out["mask_predictions"][-1]["mask_logits"][0].detach().numpy()  # [Q, n_fg]
    ref_cls = ref_out["mask_predictions"][-1]["cls_logits"]
    ref_cls = ref_cls.detach().reshape(-1, ref_cls.shape[-1]).numpy()[: TINY["n_query_points"]]

    # ---------------- ours, converted weights ----------------
    cfg = load_config(
        None, batch_size=1,
        m=TINY["m"], classes=TINY["classes"],
        dec_nlayers=TINY["dec_nlayers"], dec_dim=TINY["dec_dim"],
        dec_ffn_dim=TINY["dec_ffn_dim"], dec_nhead=TINY["dec_nhead"],
        dec_dropout=0.0,
        n_decode_point=TINY["n_decode_point"],
        n_query_points=TINY["n_query_points"],
        n_downsampling=TINY["n_downsampling"],
        train_fold=0, cvfold=0,
        tpu_max_points=256, tpu_max_voxels=256, tpu_voxel_decay=1.0,
        tpu_brick_occupancy=0,  # canonical rulebook convs for the tightest drift
        tpu_max_fg_points=128, tpu_unet_depth=7, tpu_spatial_shape=spatial,
        tpu_knn_neighbors=64, tpu_radius_cell_cap=128,
        tpu_geodesic_hier=False, tpu_geodesic_steps_eval=64,
        tpu_ball_nsample=64, tpu_max_instances=8,
        TEST_SCORE_THRESH=TINY["TEST_SCORE_THRESH"],
        TEST_NPOINT_THRESH=TINY["TEST_NPOINT_THRESH"],
    )
    mc = ModelConfig.from_cfg(cfg)
    model = GeoFormer(mc)
    p = cfg.tpu_max_points
    batch = {
        "points": jnp.asarray(np.pad(pts, ((0, p - n), (0, 0)))[None]),
        "feats": jnp.asarray(np.pad(rgb, ((0, p - n), (0, 0)))[None]),
        "coords": jnp.asarray(np.pad(coords, ((0, p - n), (0, 0)))[None]),
        "point_mask": jnp.asarray((np.arange(p) < n)[None]),
        "labels": jnp.zeros((1, p), jnp.int32),
        "instance_labels": jnp.zeros((1, p), jnp.int32),
        "pc_mins": jnp.asarray(pts.min(0)[None]),
        "pc_maxs": jnp.asarray(pts.max(0)[None]),
    }
    k = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(k, 3)
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
        {"params": k1, "sample": k2, "dropout": k3}, batch
    )
    sd = {k_: v.detach().numpy() for k_, v in net.state_dict().items()}
    params, stats, consts = convert(sd, cfg, few_shot=False)

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

    out = model.apply(variables, batch, train=False, rngs={"sample": k2})

    got_sem = np.asarray(out["semantic_scores"][0, :n])
    np.testing.assert_allclose(got_sem, ref_sem, rtol=2e-3, atol=2e-3)

    fg_idx = np.asarray(out["fg_idx"][0])
    fg_valid = np.asarray(out["fg_valid"][0])
    got_fg = fg_idx[fg_valid]
    np.testing.assert_array_equal(got_fg, fg_ref)

    got_cls = np.asarray(out["cls_logits"][-1, 0])  # [Q, classes]
    got_masks = np.asarray(out["mask_logits"][-1, 0])[:, :n_fg]  # [Q, n_fg]
    assert ref_masks.shape == got_masks.shape
    np.testing.assert_allclose(got_cls, ref_cls, rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(got_masks, ref_masks, rtol=5e-3, atol=5e-3)

    # proposals, when any survive the thresholds on these random weights
    props = ref_out.get("proposal_scores")
    if props and len(props[0]) > 0:
        ref_cls_f, ref_scores_f, ref_masks_f = props
        keep = np.asarray(out["proposals"]["keep"][0])
        got_scores = np.asarray(out["proposals"]["scores"][0])[keep]
        got_full = np.asarray(out["proposals"]["masks"][0])[keep][:, :n]
        assert got_full.shape[0] == len(ref_cls_f)
        np.testing.assert_allclose(
            np.sort(got_scores), np.sort(ref_scores_f.detach().numpy()), rtol=5e-3, atol=5e-3
        )
        np.testing.assert_array_equal(
            np.sort(got_full.astype(np.int32), axis=0),
            np.sort(ref_masks_f.detach().numpy(), axis=0),
        )
