"""Checkpoint converter: fake reference state_dict -> our tree, 100% match.

Real reference weights aren't downloadable here (zero egress), so we
synthesize a state_dict with the reference's key names/shapes
(model/geoformer/geoformer.py modules) and assert the converted tree
aligns exactly — every leaf of our model's init tree present with the
right shape.
"""

import numpy as np
import jax
import pytest

from tools.convert_reference_checkpoint import convert


def _fake_reference_sd(cfg):
    """Minimal reference-shaped state_dict for the tiny config."""
    rng = np.random.default_rng(0)
    sd = {}

    def w(key, *shape):
        sd[key] = rng.normal(size=shape).astype(np.float32)

    def bn(prefix, c):
        w(f"{prefix}.weight", c)
        w(f"{prefix}.bias", c)
        w(f"{prefix}.running_mean", c)
        w(f"{prefix}.running_var", c)
        sd[f"{prefix}.running_var"] = np.abs(sd[f"{prefix}.running_var"]) + 0.5

    def linear(prefix, cin, cout, bias=True):
        w(f"{prefix}.weight", cout, cin)
        if bias:
            w(f"{prefix}.bias", cout)

    def conv1d(prefix, cin, cout, bias=True):
        w(f"{prefix}.weight", cout, cin, 1)
        if bias:
            w(f"{prefix}.bias", cout)

    m, dec, classes = cfg.m, cfg.dec_dim, cfg.classes
    cin0 = cfg.input_channel + (3 if cfg.use_coords else 0)

    w("input_conv.0.weight", 3, 3, 3, cin0, m)

    def resblock(prefix, cin, cout):
        if cin != cout:
            w(f"{prefix}.i_branch.0.weight", 1, 1, 1, cin, cout)
        bn(f"{prefix}.conv_branch.0", cin)
        w(f"{prefix}.conv_branch.2.weight", 3, 3, 3, cin, cout)
        bn(f"{prefix}.conv_branch.3", cout)
        w(f"{prefix}.conv_branch.5.weight", 3, 3, 3, cout, cout)

    def ublock(prefix, planes):
        c0 = planes[0]
        for i in range(cfg.block_reps):
            resblock(f"{prefix}.blocks.block{i}", c0, c0)
        if len(planes) > 1:
            c1 = planes[1]
            bn(f"{prefix}.conv.0", c0)
            w(f"{prefix}.conv.2.weight", 2, 2, 2, c0, c1)
            ublock(f"{prefix}.u", planes[1:])
            bn(f"{prefix}.deconv.0", c1)
            w(f"{prefix}.deconv.2.weight", 2, 2, 2, c1, c0)
            for i in range(cfg.block_reps):
                resblock(f"{prefix}.blocks_tail.block{i}", c0 * (2 - i), c0)
        if len(planes) <= 2:
            d_model, d_ff = 128, 64
            linear(f"{prefix}.before_transformer_linear", c0, d_model)
            linear(f"{prefix}.after_transformer_linear", d_model, c0)
            tf = f"{prefix}.transformer"
            linear(f"{tf}.position_linear", 3, d_model)
            for li in range(2):
                lp = f"{tf}.layers.{li}"
                for ni in (1, 2):
                    w(f"{lp}.norm_{ni}.alpha", d_model)
                    w(f"{lp}.norm_{ni}.bias", d_model)
                for t in ("q", "k", "v"):
                    linear(f"{lp}.attn_1.{t}_linear", d_model, d_model)
                linear(f"{lp}.attn_1.out", d_model, d_model)
                linear(f"{lp}.ff.linear_1", d_model, d_ff)
                linear(f"{lp}.ff.linear_2", d_ff, d_model)
            w(f"{tf}.norm.alpha", d_model)
            w(f"{tf}.norm.bias", d_model)

    planes = [m * (i + 1) for i in range(cfg.tpu_unet_depth)]
    ublock("unet", planes)
    bn("output_layer.0", m)

    linear("semantic.0", m, m)
    bn("semantic.1", m)
    linear("semantic.3", m, m)
    bn("semantic.4", m)
    linear("semantic_linear", m, classes)

    for i in range(3):
        conv1d(f"mask_tower.{i}.0", m, m, bias=False)
        bn(f"mask_tower.{i}.1", m)
    conv1d("mask_tower.3", m, m)

    agg = 2 * m
    dims = [m + 3, agg, agg, agg]
    for i in range(3):
        w(f"set_aggregator.mlp_module.layer{i}.conv.weight", dims[i + 1], dims[i], 1, 1)
        bn(f"set_aggregator.mlp_module.layer{i}.bn.bn", dims[i + 1])

    w("pos_embedding.gauss_B", 3, dec // 2)

    conv1d("query_projection.layers.0", dec, dec)
    conv1d("query_projection.layers.2", dec, dec)
    conv1d("encoder_to_decoder_projection.layers.0", agg, agg, bias=False)
    bn("encoder_to_decoder_projection.layers.1", agg)
    conv1d("encoder_to_decoder_projection.layers.3", agg, dec, bias=False)
    bn("encoder_to_decoder_projection.layers.4", dec)

    conv1d("detr_sem_head.layers.0", dec, dec, bias=False)
    bn("detr_sem_head.layers.1", dec)
    conv1d("detr_sem_head.layers.3", dec, dec, bias=False)
    bn("detr_sem_head.layers.4", dec)
    conv1d("detr_sem_head.layers.6", dec, classes)

    num_gen = ((m + 3) * m + m) + (m + 1)
    conv1d("before_embedding_tower.0.0", dec, m, bias=False)
    bn("before_embedding_tower.0.1", m)
    conv1d("controller", m, num_gen)

    for li in range(cfg.dec_nlayers):
        lp = f"decoder.layers.{li}"
        w(f"{lp}.self_attn.in_proj_weight", 3 * dec, dec)
        w(f"{lp}.self_attn.in_proj_bias", 3 * dec)
        linear(f"{lp}.self_attn.out_proj", dec, dec)
        for n in ("norm1", "norm2", "norm3"):
            w(f"{lp}.{n}.weight", dec)
            w(f"{lp}.{n}.bias", dec)
        linear(f"{lp}.attn_mlp.0", dec, dec)
        linear(f"{lp}.attn_mlp.2", dec, dec)
        linear(f"{lp}.v_mlp.0", dec, dec)
        linear(f"{lp}.out_mlp.0", dec, dec)
        linear(f"{lp}.linear1", dec, cfg.dec_ffn_dim)
        linear(f"{lp}.linear2", cfg.dec_ffn_dim, dec)
    w("decoder.norm.weight", dec)
    w("decoder.norm.bias", dec)
    return sd


def _flat(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        path = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flat(v, path))
        else:
            out[path] = np.shape(v)
    return out


def test_converter_covers_model_tree(tiny_cfg):
    import jax.numpy as jnp

    from geoformer_tpu.models.geoformer import GeoFormer, ModelConfig
    from tests.test_model_forward import synthetic_batch

    cfg = tiny_cfg
    sd = _fake_reference_sd(cfg)
    params, stats, consts = convert(sd, cfg)

    mc = ModelConfig.from_cfg(cfg)
    model = GeoFormer(mc)
    rng = np.random.default_rng(0)
    batch = synthetic_batch(rng, 1, cfg.tpu_max_points, cfg.tpu_spatial_shape)
    k = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(k, 3)
    variables = model.init({"params": k1, "sample": k2, "dropout": k3}, batch, train=False)

    want_p = _flat(jax.device_get(variables["params"]))
    got_p = _flat(params)
    missing = sorted(set(want_p) - set(got_p))
    extra = sorted(set(got_p) - set(want_p))
    assert not missing, f"converter missing params: {missing[:10]}"
    assert not extra, f"converter extra params: {extra[:10]}"
    for k_, shape in want_p.items():
        assert got_p[k_] == shape, f"{k_}: {got_p[k_]} vs {shape}"

    want_s = _flat(jax.device_get(variables["batch_stats"]))
    got_s = _flat(stats)
    assert set(want_s) == set(got_s), (
        f"batch_stats mismatch: missing={sorted(set(want_s) - set(got_s))[:8]} "
        f"extra={sorted(set(got_s) - set(want_s))[:8]}"
    )

    want_c = _flat(jax.device_get(variables["constants"]))
    got_c = _flat(consts)
    assert set(want_c) == set(got_c)
    for k_, shape in want_c.items():
        assert got_c[k_] == shape


def test_converted_checkpoint_runs_forward(tiny_cfg, tmp_path):
    """Converted tree actually drives a forward pass (no shape errors)."""
    import jax.numpy as jnp

    from geoformer_tpu.models.geoformer import GeoFormer, ModelConfig
    from tests.test_model_forward import synthetic_batch

    cfg = tiny_cfg
    sd = _fake_reference_sd(cfg)
    params, stats, consts = convert(sd, cfg)
    mc = ModelConfig.from_cfg(cfg)
    model = GeoFormer(mc)
    rng = np.random.default_rng(1)
    batch = synthetic_batch(rng, 1, cfg.tpu_max_points, cfg.tpu_spatial_shape)
    out = model.apply(
        {"params": params, "batch_stats": stats, "constants": consts},
        batch, train=False, rngs={"sample": jax.random.PRNGKey(0)},
    )
    assert np.isfinite(np.asarray(out["semantic_scores"])).all()
    assert np.isfinite(np.asarray(out["mask_logits"])).all()
