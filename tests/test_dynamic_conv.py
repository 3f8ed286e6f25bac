"""Dynamic conv: split-einsum forward == reference concat formulation."""

import numpy as np
import jax.numpy as jnp

from geoformer_tpu.models.dynamic_conv import (
    dynamic_param_sizes,
    geodesic_corrected_coords,
    mask_heads_forward,
    parse_dynamic_params,
)


def test_mask_heads_forward_matches_concat_formulation():
    rng = np.random.default_rng(0)
    P, Q, m = 50, 4, 8
    c_in = m + 3
    geo = rng.uniform(-1, 2, size=(P, Q)).astype(np.float32)
    feats = rng.normal(size=(P, m)).astype(np.float32)
    w1 = rng.normal(size=(Q, m, c_in)).astype(np.float32)
    b1 = rng.normal(size=(Q, m)).astype(np.float32)
    w2 = rng.normal(size=(Q, m)).astype(np.float32)
    b2 = rng.normal(size=(Q,)).astype(np.float32)
    coords = rng.normal(size=(P, 3)).astype(np.float32)
    qlocs = rng.normal(size=(Q, 3)).astype(np.float32)

    got = np.asarray(mask_heads_forward(
        jnp.asarray(geo), jnp.asarray(feats), jnp.asarray(w1), jnp.asarray(b1),
        jnp.asarray(w2), jnp.asarray(b2), jnp.asarray(coords), jnp.asarray(qlocs),
    ))
    # multi-chunk path (q_chunk=3 forces padding + 2 chunks) is identical
    got_chunked = np.asarray(mask_heads_forward(
        jnp.asarray(geo), jnp.asarray(feats), jnp.asarray(w1), jnp.asarray(b1),
        jnp.asarray(w2), jnp.asarray(b2), jnp.asarray(coords), jnp.asarray(qlocs),
        q_chunk=3,
    ))
    np.testing.assert_allclose(got_chunked, got, rtol=1e-5, atol=1e-5)

    # reference formulation: concat [rel | feats] then one einsum
    rel = qlocs[:, None, :] - coords[None, :, :]
    rel = np.asarray(geodesic_corrected_coords(jnp.asarray(rel), jnp.asarray(geo.T)))
    x = np.concatenate([rel, np.broadcast_to(feats[None], (Q, P, m))], axis=-1)
    h = np.einsum("qpc,qmc->qpm", x, w1) + b1[:, None, :]
    h = np.maximum(h, 0)
    want = np.einsum("qpm,qm->qp", h, w2) + b2[:, None]
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-4)


def test_parse_dynamic_params_roundtrip():
    rng = np.random.default_rng(1)
    m = 8
    _, _, total = dynamic_param_sizes(m)
    params = rng.normal(size=(4, total)).astype(np.float32)
    w1, b1, w2, b2 = parse_dynamic_params(jnp.asarray(params), m)
    assert w1.shape == (4, m, m + 3)
    assert b1.shape == (4, m)
    assert w2.shape == (4, m)
    assert b2.shape == (4,)
    # torch layout: w1 rows are output channels (row-major [m, c_in])
    np.testing.assert_allclose(np.asarray(w1)[0, 0], params[0, : m + 3])
