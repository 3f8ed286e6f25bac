"""Chunked (online-softmax) attention == dense masked softmax attention.

The U-Net bottleneck transformer attends over up to 8k voxels; the dense
path materializes [B,H,N,N] (109 ms/layer at prod scale on v5e). The
chunked path must be exact up to fp reassociation."""

import numpy as np
import jax
import jax.numpy as jnp

from geoformer_tpu.models.blocks import (
    MultiHeadSelfAttention,
    _chunked_attention,
    masked_softmax,
)


def _dense_attention(q, k, v, mask):
    d = q.shape[-1]
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(d).astype(q.dtype)
    attn = masked_softmax(logits, mask[:, None, None, :], axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", attn, v)


def test_chunked_attention_matches_dense():
    rng = np.random.default_rng(0)
    b, n, h, d = 2, 1536, 4, 32
    q = jnp.asarray(rng.normal(size=(b, n, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, n, h, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, n, h, d)).astype(np.float32))
    mask = np.ones((b, n), bool)
    mask[0, 1200:] = False  # padded tail
    mask[1, :] = rng.random(n) > 0.3  # scattered invalids
    mask = jnp.asarray(mask)

    ref = _dense_attention(q, k, v, mask)
    got = _chunked_attention(q, k, v, mask, chunk=512)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_chunked_attention_all_masked_rows_zero():
    rng = np.random.default_rng(1)
    b, n, h, d = 1, 1024, 2, 16
    q = jnp.asarray(rng.normal(size=(b, n, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, n, h, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, n, h, d)).astype(np.float32))
    mask = jnp.zeros((b, n), bool)  # empty scene
    got = _chunked_attention(q, k, v, mask)
    assert float(jnp.max(jnp.abs(got))) == 0.0


def test_mha_module_chunked_path_matches_dense_path():
    """The module-level switch: same params, N above vs below threshold."""
    rng = np.random.default_rng(2)
    b, n, dm, heads = 1, 1100, 64, 4
    x = jnp.asarray(rng.normal(size=(b, n, dm)).astype(np.float32))
    mask = jnp.asarray(np.arange(n) < 1000)[None, :]
    chunked = MultiHeadSelfAttention(dm, heads, chunk_threshold=1024)
    dense = MultiHeadSelfAttention(dm, heads, chunk_threshold=1 << 30)
    params = chunked.init(jax.random.PRNGKey(0), x, x, x, mask, False)
    out_c = chunked.apply(params, x, x, x, mask, False)
    out_d = dense.apply(params, x, x, x, mask, False)
    np.testing.assert_allclose(np.asarray(out_c), np.asarray(out_d),
                               rtol=2e-5, atol=2e-5)


def test_mha_chunked_grads_flow():
    rng = np.random.default_rng(3)
    b, n, dm, heads = 1, 1152, 32, 2
    x = jnp.asarray(rng.normal(size=(b, n, dm)).astype(np.float32))
    mask = jnp.asarray(np.ones((b, n), bool))
    mha = MultiHeadSelfAttention(dm, heads, chunk_threshold=512)
    params = mha.init(jax.random.PRNGKey(0), x, x, x, mask, True)

    def loss(p):
        return jnp.sum(mha.apply(p, x, x, x, mask, True) ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert sum(float(jnp.abs(l).sum()) for l in leaves) > 0


def test_chunked_attention_grad_parity_with_masks():
    """Backward parity: d/d(q,k,v) of the chunked path == dense path under
    a padded tail + scattered invalid keys (the production bottleneck
    regime — training runs the chunked path at N=8192)."""
    rng = np.random.default_rng(4)
    b, n, h, d = 2, 1536, 2, 16
    q = jnp.asarray(rng.normal(size=(b, n, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, n, h, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, n, h, d)).astype(np.float32))
    mask = np.ones((b, n), bool)
    mask[0, 1200:] = False
    mask[1, :] = rng.random(n) > 0.3
    mask = jnp.asarray(mask)
    cot = jnp.asarray(rng.normal(size=(b, n, h, d)).astype(np.float32))
    # only valid-row outputs feed the loss (pad rows are where'd out
    # downstream in the bottleneck)
    cot = cot * mask[..., None, None]

    def loss_c(q, k, v):
        return jnp.sum(_chunked_attention(q, k, v, mask, chunk=512) * cot)

    def loss_d(q, k, v):
        return jnp.sum(_dense_attention(q, k, v, mask) * cot)

    gc = jax.grad(loss_c, argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(loss_d, argnums=(0, 1, 2))(q, k, v)
    for got, ref, name in zip(gc, gd, "qkv"):
        assert np.isfinite(np.asarray(got)).all(), name
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=3e-4, atol=3e-5, err_msg=name)


def test_chunked_attention_all_masked_chunk_grads_finite():
    """An entirely-masked key CHUNK (first 512 keys invalid) exercises the
    online-softmax's running-max at its -inf init — the 0-upstream * inf
    backward pattern that NaN'd SimpleNorm must not appear here."""
    rng = np.random.default_rng(5)
    b, n, h, d = 1, 1024, 2, 16
    q = jnp.asarray(rng.normal(size=(b, n, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, n, h, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, n, h, d)).astype(np.float32))
    mask = np.ones((b, n), bool)
    mask[0, :512] = False  # chunk 0 fully dead
    mask = jnp.asarray(mask)

    def loss(q, k, v):
        out = _chunked_attention(q, k, v, mask, chunk=512)
        return jnp.sum((out * mask[..., None, None]) ** 2)

    g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for got, name in zip(g, "qkv"):
        assert np.isfinite(np.asarray(got)).all(), name
