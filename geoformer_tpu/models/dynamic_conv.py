"""CondInst-style dynamic convolution mask head.

Reference geoformer.py:73-105 (controller), 264-324 (param parsing + grouped
conv1d forward). The grouped conv1d over (n_queries x (m+3)) x N becomes a
batched einsum over queries — MXU-native and mask-friendly.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def dynamic_param_sizes(m: int, use_coords: bool = True):
    """weight/bias split sizes for the 2-layer dynamic conv
    (geoformer.py:84-102): [(m+3)*m, m] weights, [m, 1] biases."""
    c_in = m + 3 if use_coords else m
    weight_nums = [c_in * m, m]
    bias_nums = [m, 1]
    return weight_nums, bias_nums, sum(weight_nums) + sum(bias_nums)


class Controller(nn.Module):
    """before_embedding_tower (Dense+BN+ReLU dec_dim->m) + controller conv
    (geoformer.py:72-105). Controller init: normal(0.01), bias 0."""

    m: int
    num_gen_params: int

    @nn.compact
    def __call__(self, x, mask, train: bool):
        from geoformer_tpu.models.blocks import MLPConvBlock

        x = MLPConvBlock(self.m, name="before_embedding")(x, mask, train)
        return nn.Dense(
            self.num_gen_params,
            kernel_init=nn.initializers.normal(0.01),
            bias_init=nn.initializers.zeros,
            name="controller",
        )(x)


def parse_dynamic_params(params, m: int, use_coords: bool = True):
    """params [..., Q, num_gen_params] -> (w1 [...,Q,c_in,m], b1 [...,Q,m],
    w2 [...,Q,m], b2 [...,Q])."""
    weight_nums, bias_nums, total = dynamic_param_sizes(m, use_coords)
    assert params.shape[-1] == total
    c_in = m + 3 if use_coords else m
    w1, w2, b1, b2 = jnp.split(
        params, [weight_nums[0], weight_nums[0] + weight_nums[1],
                 weight_nums[0] + weight_nums[1] + bias_nums[0]], axis=-1
    )
    # torch reshape (Q*m, c_in, 1): the flat layout is row-major [m, c_in]
    w1 = w1.reshape(params.shape[:-1] + (m, c_in))
    w2 = w2.reshape(params.shape[:-1] + (1, m))
    b2 = b2.reshape(params.shape[:-1])
    return w1, b1, w2[..., 0, :], b2


def geodesic_corrected_coords(rel_coords, geo_qp, max_geo=None):
    """Push unreached points away (geoformer.py:296-311).

    rel_coords [Q,P,3] = query_loc - point_loc; geo_qp [Q,P] (-1 unreached).
    For each query: max_geo = max over reached points (fallback: global max
    over all queries), and unreached points get |rel| shifted by
    sqrt(max_geo)*sign(rel). Pass `max_geo` [Q] to pin the per-query maxima
    (needed when processing query chunks so the global fallback stays global).
    """
    if max_geo is None:
        max_geo = jnp.max(geo_qp, axis=1)  # [Q]; -1 if nothing reached
        global_max = jnp.max(max_geo)
        max_geo = jnp.where(max_geo < 0, global_max, max_geo)
    max_geo = jnp.sqrt(jnp.maximum(max_geo, 0.0))
    unreached = (geo_qp < 0)[..., None]  # [Q,P,1]
    shift = max_geo[:, None, None] * jnp.sign(rel_coords)
    return jnp.where(unreached, rel_coords + shift, rel_coords)


def mask_heads_forward(geo_dist, mask_features, w1, b1, w2, b2, coords, query_locs,
                       q_chunk: int = 64, compute_dtype=None):
    """Per-scene dynamic conv (geoformer.py:286-324).

    geo_dist [P,Q], mask_features [P,m], w1 [Q,m,c_in], b1 [Q,m], w2 [Q,m],
    b2 [Q], coords [P,3], query_locs [Q,3] -> mask logits [Q,P].

    Queries run in chunks so the [Qc,P,m] hidden buffer stays bounded
    (full-resolution eval would otherwise hold Q x P x m floats, ~2GB).
    compute_dtype=bf16 runs the feature GEMMs in bf16 with fp32 accumulation
    (the reference autocasts this head to fp16, geoformer_fs.py:341).
    """
    if compute_dtype is not None:
        mask_features = mask_features.astype(compute_dtype)
        w1 = w1.astype(compute_dtype)
    q = w1.shape[0]
    q_chunk = min(q_chunk, q)
    pad = (-q) % q_chunk
    geo_qp = jnp.pad(geo_dist.T, ((0, pad), (0, 0)), constant_values=-1.0)  # [Qp,P]
    # per-query max with the reference's global fallback, computed over ALL
    # queries before chunking (geoformer.py:296-311)
    max_geo = jnp.max(geo_qp[: q], axis=1)
    global_max = jnp.max(max_geo)
    max_geo = jnp.pad(jnp.where(max_geo < 0, global_max, max_geo), (0, pad))

    def chunk(args):
        geo_c, mg_c, w1_c, b1_c, w2_c, b2_c, qloc_c = args
        rel = qloc_c[:, None, :] - coords[None, :, :]  # [Qc,P,3]
        rel = geodesic_corrected_coords(rel, geo_c, mg_c)
        if compute_dtype is not None:
            rel = rel.astype(compute_dtype)
        # split the first layer over its [rel | mask_features] input instead
        # of materializing the concatenated [Qc,P,c_in] buffer; the feature
        # term is Qc batched GEMMs, the coord term is tiny. The hidden runs
        # [Qc,m,P] — P on the LANE axis — because the qpm orientation puts
        # m(=16) minor and tile-pads every (8,128) tile 128/m x
        # (537 MB -> 4.3 GB physical per chunk at production P).
        h = (
            jnp.einsum("qpc,qmc->qmp", rel, w1_c[..., :3],
                       preferred_element_type=jnp.float32)
            + jnp.einsum("pf,qmf->qmp", mask_features, w1_c[..., 3:],
                         preferred_element_type=jnp.float32)
            + b1_c[:, :, None]
        )
        h = jax.nn.relu(h)
        return jnp.einsum("qmp,qm->qp", h, w2_c) + b2_c[:, None]

    def pad_q(a):
        return jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))

    n_chunks = (q + pad) // q_chunk
    parts = jax.lax.map(
        chunk,
        (
            geo_qp.reshape(n_chunks, q_chunk, -1),
            max_geo.reshape(n_chunks, q_chunk),
            pad_q(w1).reshape(n_chunks, q_chunk, *w1.shape[1:]),
            pad_q(b1).reshape(n_chunks, q_chunk, -1),
            pad_q(w2).reshape(n_chunks, q_chunk, -1),
            pad_q(b2).reshape(n_chunks, q_chunk),
            pad_q(query_locs).reshape(n_chunks, q_chunk, 3),
        ),
    )
    return parts.reshape(-1, coords.shape[0])[:q]
