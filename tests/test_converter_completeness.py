"""Checkpoint-converter completeness: the REAL reference models' state_dicts
convert fully and land on our parameter tree.

Builds the actual reference GeoFormer / GeoFormerFS modules on CPU torch
(spconv/faiss/CUDA-extension deps stubbed — only __init__'s parameter
construction runs), then asserts:
  * convert() consumes every reference parameter/buffer (nothing silently
    dropped, so a released checkpoint cannot partially load),
  * every converted leaf exists in our model's init tree with the same
    shape (nothing lands outside the model).
"""

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax

REF = "/root/reference"

# BN bookkeeping the converter intentionally ignores
_IRRELEVANT_SUFFIXES = ("num_batches_tracked",)


class _RecordingDict(dict):
    def __init__(self, base):
        super().__init__(base)
        self.accessed = set()

    def __getitem__(self, k):
        self.accessed.add(k)
        return super().__getitem__(k)


@pytest.fixture(scope="module")
def ref_models():
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

    class _FaissIndex:  # constructed in GeoFormer.init_knn
        def __init__(self, *a, **k):
            pass

    stub("faiss", GpuIndexFlatConfig=lambda: types.SimpleNamespace(),
         GpuIndexFlatL2=_FaissIndex, StandardGpuResources=lambda: None)
    stub("faiss.contrib")
    stub("faiss.contrib.torch_utils")
    stub("PG_OP")
    stub("pointnet2._ext")  # CUDA ext behind lib/pointnet2
    stub("pointnet2")
    stubs["pointnet2"]._ext = stubs["pointnet2._ext"]
    stub("trimesh")  # viz-only dep of util/utils_pc.py

    saved_mods = {k: sys.modules.get(k) for k in stubs}
    saved_argv = sys.argv
    sys.modules.update(stubs)
    sys.argv = [
        "completeness", "--config",
        os.path.join(REF, "config", "test_geoformer_scannet.yaml"),
        "--output_path", "/tmp/ref_completeness",
    ]
    sys.path.insert(0, REF)
    try:
        from util.config import cfg as ref_cfg  # noqa: F401  (argv-driven singleton)
        import model.geoformer.geoformer as rg
        import model.geoformer.geoformer_fs as rgfs

        torch.manual_seed(0)
        sup = rg.GeoFormer()
        ref_cfg.fix_module = []
        fs = rgfs.GeoFormerFS()
    finally:
        sys.path.remove(REF)
        sys.argv = saved_argv
        for k, v in saved_mods.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    return sup, fs


def _leaf_paths(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_leaf_paths(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = np.asarray(v).shape
    return out


def _check(model, few_shot):
    from geoformer_tpu.utils.config import load_config
    from tools.convert_reference_checkpoint import convert

    cfg = load_config(None)  # reference-scale defaults (m=16, dec 64, depth 7)
    sd = _RecordingDict(
        {k: v.detach().numpy() for k, v in model.state_dict().items()}
    )
    params, stats, consts = convert(sd, cfg, few_shot=few_shot)

    unused = {
        k for k in sd
        if k not in sd.accessed and not k.endswith(_IRRELEVANT_SUFFIXES)
    }
    assert not unused, f"reference params not consumed by converter: {sorted(unused)[:10]}"
    return params, stats, consts


def test_supervised_state_dict_fully_converts(ref_models):
    sup, _ = ref_models
    params, stats, consts = _check(sup, few_shot=False)

    # every converted leaf must exist in OUR init tree with the same shape
    from geoformer_tpu.models.geoformer import GeoFormer, ModelConfig
    from geoformer_tpu.utils.config import load_config
    from tests.test_model_forward import synthetic_batch

    cfg = load_config(
        None, batch_size=1, tpu_max_points=2048, tpu_max_voxels=2048,
        tpu_max_fg_points=1024, tpu_train_subsample=512, n_decode_point=128,
        n_query_points=32, n_downsampling=1024, tpu_unet_depth=7,
        tpu_spatial_shape=256, tpu_knn_neighbors=8,
        tpu_geodesic_steps_eval=8, tpu_ball_nsample=8, tpu_max_instances=8,
    )
    mc = ModelConfig.from_cfg(cfg)
    model = GeoFormer(mc)
    rng = np.random.default_rng(0)
    batch = synthetic_batch(rng, 1, cfg.tpu_max_points, mc.spatial)
    k = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(k, 3)
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
        {"params": k1, "sample": k2, "dropout": k3}, batch
    )
    ours = _leaf_paths(jax.device_get(variables["params"]))
    ours_stats = _leaf_paths(jax.device_get(variables.get("batch_stats", {})))
    for path, shape in _leaf_paths(params).items():
        assert path in ours, f"converted param lands outside our tree: {path}"
        assert ours[path] == shape, f"shape mismatch at {path}: {ours[path]} vs {shape}"
    for path, shape in _leaf_paths(stats).items():
        assert path in ours_stats, f"converted stat lands outside our tree: {path}"
        assert ours_stats[path] == shape, f"stat shape mismatch at {path}"


def test_fewshot_state_dict_fully_converts(ref_models):
    _, fs = ref_models
    _check(fs, few_shot=True)
