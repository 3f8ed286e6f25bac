"""Golden parity vs torch (CPU): converter weight conventions are correct.

These tests build the torch primitive (BatchNorm1d, MultiheadAttention,
Linear/Conv1d) with random weights, convert with the converter's mapping
functions, and assert our flax modules reproduce the torch outputs. This
pins the transpose/reshape conventions the reference-checkpoint import
relies on (tools/convert_reference_checkpoint.py) without copying any
reference code.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from geoformer_tpu.models.blocks import MaskedBatchNorm, MultiHeadSelfAttention
from tools.convert_reference_checkpoint import dense, mha


def test_masked_bn_matches_torch_eval():
    rng = np.random.default_rng(0)
    c = 8
    bn_t = torch.nn.BatchNorm1d(c, eps=1e-4, momentum=0.1)
    bn_t.weight.data = torch.tensor(rng.normal(size=c).astype(np.float32))
    bn_t.bias.data = torch.tensor(rng.normal(size=c).astype(np.float32))
    bn_t.running_mean.data = torch.tensor(rng.normal(size=c).astype(np.float32))
    bn_t.running_var.data = torch.tensor(np.abs(rng.normal(size=c)).astype(np.float32) + 0.5)
    bn_t.eval()

    x = rng.normal(size=(20, c)).astype(np.float32)
    want = bn_t(torch.tensor(x)).detach().numpy()

    mod = MaskedBatchNorm(c)
    variables = {
        "params": {"scale": bn_t.weight.detach().numpy(), "bias": bn_t.bias.detach().numpy()},
        "batch_stats": {
            "mean": bn_t.running_mean.numpy(),
            "var": bn_t.running_var.numpy(),
        },
    }
    got = mod.apply(variables, jnp.asarray(x), jnp.ones(20, bool), False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_masked_bn_train_stats_match_torch():
    """One training step: normalized output + updated running stats."""
    rng = np.random.default_rng(1)
    c = 4
    bn_t = torch.nn.BatchNorm1d(c, eps=1e-4, momentum=0.1)
    bn_t.train()
    x = rng.normal(size=(50, c)).astype(np.float32)
    want = bn_t(torch.tensor(x)).detach().numpy()

    mod = MaskedBatchNorm(c)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.ones(50, bool), True)
    got, mut = mod.apply(
        variables, jnp.asarray(x), jnp.ones(50, bool), True, mutable=["batch_stats"]
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(mut["batch_stats"]["mean"]), bn_t.running_mean.numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(mut["batch_stats"]["var"]), bn_t.running_var.numpy(), rtol=1e-4, atol=1e-5
    )


def test_mha_matches_torch_with_converted_weights():
    rng = np.random.default_rng(2)
    d, h, b, n = 16, 4, 2, 6
    mha_t = torch.nn.MultiheadAttention(d, h, batch_first=True)
    mha_t.eval()
    sd = {f"attn.{k}": v.detach().numpy() for k, v in mha_t.state_dict().items()}

    x = rng.normal(size=(b, n, d)).astype(np.float32)
    want, _ = mha_t(torch.tensor(x), torch.tensor(x), torch.tensor(x), need_weights=False)
    want = want.detach().numpy()

    params = mha(sd, "attn", d, h)
    mod = MultiHeadSelfAttention(d, h)
    got = mod.apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(x), jnp.asarray(x),
        jnp.ones((b, n), bool), False,
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_dense_conversion_matches_torch_linear():
    rng = np.random.default_rng(3)
    lin = torch.nn.Linear(6, 4)
    sd = {f"l.{k}": v.detach().numpy() for k, v in lin.state_dict().items()}
    x = rng.normal(size=(5, 6)).astype(np.float32)
    want = lin(torch.tensor(x)).detach().numpy()
    p = dense(sd, "l")
    got = np.asarray(jnp.asarray(x) @ p["kernel"] + p["bias"])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_fourier_embedding_matches_formula():
    from geoformer_tpu.models.pos_embedding import PositionEmbeddingCoordsFourier

    rng = np.random.default_rng(4)
    d_pos = 8
    gauss = rng.normal(size=(3, d_pos // 2)).astype(np.float32)
    xyz = rng.uniform(0, 2, size=(1, 7, 3)).astype(np.float32)
    mins = xyz.min(1)
    maxs = xyz.max(1)
    mod = PositionEmbeddingCoordsFourier(d_pos=d_pos)
    got = mod.apply(
        {"constants": {"gauss_B": gauss}},
        jnp.asarray(xyz), jnp.asarray(mins), jnp.asarray(maxs),
    )
    norm = (xyz - mins[:, None]) / (maxs - mins)[:, None]
    proj = 2 * np.pi * norm @ gauss
    want = np.concatenate([np.sin(proj), np.cos(proj)], axis=-1)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)
