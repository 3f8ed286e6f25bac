"""Full-backbone golden parity: the REFERENCE backbone module graph
(model/geoformer/geoformer_modules.py UBlock/ResidualBlock + the input
conv / output layer / semantic head assembly of geoformer.py:42-59) run on
CPU torch through a pure-torch spconv-1.0 shim (tests/spconv_shim.py),
versus OUR backbone with weights mapped by tools/convert_reference_checkpoint.

This pins, end to end on one scene:
  * the spconv weight layout hypothesis ([k0,k1,k2,in,out], kernel dims
    aligned with the (x,y,z) coordinate columns — the converter's
    `--kernel_order xyz` default),
  * our rulebook's offset enumeration + strided/inverse site semantics,
  * BN eps/momentum/eval semantics and the skip-concat channel order,
  * the bottleneck transformer wiring at the coarsest level,
through converted weights, so a wrong converter flag fails loudly.
"""

import functools
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

REF = "/root/reference"


@pytest.fixture(scope="module")
def ref_backbone_modules():
    if not os.path.isdir(REF):
        pytest.skip("reference tree not mounted")
    import tests.spconv_shim as shim

    spconv_mod = types.ModuleType("spconv")
    for name in ("SparseConvTensor", "SparseSequential", "SubMConv3d",
                 "SparseConv3d", "SparseInverseConv3d"):
        setattr(spconv_mod, name, getattr(shim, name))
    spconv_modules = types.ModuleType("spconv.modules")
    spconv_modules.SparseModule = shim.SparseModule
    spconv_mod.modules = spconv_modules
    saved = {k: sys.modules.get(k) for k in ("spconv", "spconv.modules")}
    sys.modules["spconv"] = spconv_mod
    sys.modules["spconv.modules"] = spconv_modules
    sys.path.insert(0, REF)
    try:
        import model.geoformer.geoformer_modules as gm
    finally:
        sys.path.remove(REF)
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    return gm, spconv_mod


def _build_ref_backbone(gm, spconv, m, depth, input_c, classes, seed=0):
    """Assemble the reference backbone exactly as geoformer.py:42-59."""
    import torch.nn as nn

    torch.manual_seed(seed)
    norm_fn = functools.partial(nn.BatchNorm1d, eps=1e-4, momentum=0.1)
    net = nn.Module()
    net.input_conv = spconv.SparseSequential(
        spconv.SubMConv3d(input_c, m, kernel_size=3, padding=1, bias=False,
                          indice_key="subm1")
    )
    net.unet = gm.UBlock(
        [m * (i + 1) for i in range(depth)], norm_fn, 2, gm.ResidualBlock,
        use_backbone_transformer=True, indice_key_id=1,
    )
    net.output_layer = spconv.SparseSequential(norm_fn(m), nn.ReLU())
    net.semantic = nn.Sequential(
        nn.Linear(m, m, bias=True), norm_fn(m), nn.ReLU(),
        nn.Linear(m, m, bias=True), norm_fn(m), nn.ReLU(),
    )
    net.semantic_linear = nn.Linear(m, classes, bias=True)
    # randomize every parameter and BN stat (default conv inits are fine but
    # identical-zero BN stats would mask mean/var mapping bugs)
    g = torch.Generator().manual_seed(seed + 1)
    with torch.no_grad():
        for p in net.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.2)
        for mod in net.modules():
            if isinstance(mod, nn.BatchNorm1d):
                mod.running_mean.copy_(torch.randn(mod.running_mean.shape, generator=g) * 0.1)
                mod.running_var.copy_(torch.rand(mod.running_var.shape, generator=g) * 0.5 + 0.75)
    net.eval()
    return net


def _merge(dst, src):
    for k, v in src.items():
        if isinstance(v, dict) and k in dst and isinstance(dst[k], dict):
            _merge(dst[k], v)
        else:
            dst[k] = v
    return dst


def test_backbone_golden_parity(ref_backbone_modules):
    gm, spconv = ref_backbone_modules
    from geoformer_tpu.models.geoformer import GeoFormer, ModelConfig
    from geoformer_tpu.utils.config import load_config
    from tools.convert_reference_checkpoint import convert_backbone

    m, depth, classes, spatial, scale = 8, 4, 13, 32, 50.0
    net = _build_ref_backbone(gm, spconv, m, depth, input_c=6, classes=classes)

    # scene: a connected blob of occupied voxels (1 point per voxel so our
    # voxel mean-pool is the identity and features compare 1:1)
    rng = np.random.default_rng(3)
    base = rng.integers(4, spatial - 12, size=(1, 3))
    offsets = rng.integers(0, 9, size=(600, 3))
    coords = np.unique(base + offsets, axis=0).astype(np.int32)  # [N,3] (x,y,z)
    n = coords.shape[0]
    feats_rgb = rng.normal(size=(n, 3)).astype(np.float32)
    points = ((coords.astype(np.float32) + 0.5) / scale).astype(np.float32)
    feats6 = np.concatenate([feats_rgb, points], axis=1)

    # ---- torch forward (reference module graph through the shim) ----
    indices = torch.tensor(
        np.concatenate([np.zeros((n, 1), np.int32), coords], axis=1), dtype=torch.int32
    )
    x = spconv.SparseConvTensor(
        torch.tensor(feats6), indices, [spatial] * 3, 1
    )
    with torch.no_grad():
        out = net.output_layer(net.unet(net.input_conv(x)))
        ref_feats = out.features.numpy()
        sem = net.semantic(out.features)
        ref_scores = net.semantic_linear(sem).numpy()

    # ---- ours with converted weights ----
    cfg = load_config(
        None, batch_size=1, m=m, classes=classes, tpu_max_points=1024,
        tpu_max_voxels=1024, tpu_unet_depth=depth, tpu_spatial_shape=spatial,
        tpu_voxel_decay=1.0,
        tpu_subm_k=27,  # dense blob: interior voxels have all 27 neighbors
    )
    mc = ModelConfig.from_cfg(cfg)
    model = GeoFormer(mc)
    p = cfg.tpu_max_points
    batch = {
        "points": jnp.asarray(np.pad(points, ((0, p - n), (0, 0)))[None]),
        "feats": jnp.asarray(np.pad(feats_rgb, ((0, p - n), (0, 0)))[None]),
        "coords": jnp.asarray(np.pad(coords, ((0, p - n), (0, 0)))[None]),
        "point_mask": jnp.asarray((np.arange(p) < n)[None]),
        "labels": jnp.zeros((1, p), jnp.int32),
        "instance_labels": jnp.zeros((1, p), jnp.int32),
        "pc_mins": jnp.asarray(points.min(0)[None]),
        "pc_maxs": jnp.asarray(points.max(0)[None]),
    }
    k = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(k, 3)
    variables = model.init({"params": k1, "sample": k2, "dropout": k3}, batch, train=False)

    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    conv_params, conv_stats = convert_backbone(sd, cfg, kernel_order="xyz", mirror=False)
    variables = jax.tree_util.tree_map(np.asarray, jax.device_get(variables))
    variables = dict(variables)
    variables["params"] = _merge(dict(variables["params"]), conv_params)
    variables["batch_stats"] = _merge(dict(variables.get("batch_stats", {})), conv_stats)

    def run(mdl, batch):
        return mdl.forward_backbone(batch, train=False)

    point_feats, scores, _, _ = model.apply(
        variables, batch, rngs={"sample": k2}, method=run
    )
    got_feats = np.asarray(point_feats[0, :n])
    got_scores = np.asarray(scores[0, :n])

    np.testing.assert_allclose(got_feats, ref_feats, rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(got_scores, ref_scores, rtol=2e-3, atol=5e-4)
