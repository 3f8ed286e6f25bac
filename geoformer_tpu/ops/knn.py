"""Brute-force exact kNN with the matmul distance trick, tiled for HBM.

Replaces FAISS GpuIndexFlatL2 (reference geoformer.py:172-177,
geodesic_utils.py:12-24). |x-y|^2 = |x|^2 + |y|^2 - 2<x,y>; the cross term
is an MXU matmul. Queries are processed in chunks; keys are streamed in
tiles with a running top-k merge so nothing larger than
[query_chunk, key_tile] is ever materialized.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

BIG = 1e30  # python float, NOT a jnp scalar (device-array constants re-stage per call)


def _round_up(x, m):
    return -(-x // m) * m


def _knn_scene(queries, points, mask, k, query_chunk=1024, key_tile=16384):
    p = points.shape[0]
    # clamp tiling to the input so tiny scenes don't pad to huge tiles
    key_tile = min(key_tile, _round_up(p, 128))
    query_chunk = min(query_chunk, _round_up(queries.shape[0], 128))
    pad_keys = (-p) % key_tile
    pts = jnp.pad(points, ((0, pad_keys), (0, 0)))
    msk = jnp.pad(mask, (0, pad_keys))
    n_tiles = pts.shape[0] // key_tile
    pts_t = pts.reshape(n_tiles, key_tile, 3)
    msk_t = msk.reshape(n_tiles, key_tile)
    pts_sq = jnp.sum(pts_t * pts_t, axis=-1)

    def q_chunk_fn(qc):
        q_sq = jnp.sum(qc * qc, axis=-1)  # [qc]

        def tile_step(carry, tile):
            best_d, best_i = carry
            tp, tsq, tm, base = tile
            cross = jax.lax.dot_general(
                qc, tp, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,  # fp32 distances, not bf16
            )  # [qc, key_tile]
            d2 = q_sq[:, None] + tsq[None, :] - 2.0 * cross
            d2 = jnp.where(tm[None, :], d2, BIG)
            # top-k the tile first, then merge two k-lists: concatenating the
            # running best with the full [qc, key_tile] tile would make XLA
            # constant-fold a giant iota pad per scan step (minutes of
            # compile at production tiles)
            t_negd, t_pos = jax.lax.top_k(-d2, k)
            t_idx = base + t_pos.astype(jnp.int32)
            cat_d = jnp.concatenate([best_d, -t_negd], axis=1)  # [qc, 2k]
            cat_i = jnp.concatenate([best_i, t_idx], axis=1)
            top_negd, top_pos = jax.lax.top_k(-cat_d, k)
            new_d = -top_negd
            new_i = jnp.take_along_axis(cat_i, top_pos, axis=1)
            return (new_d, new_i), None

        init = (
            jnp.full((qc.shape[0], k), BIG, jnp.float32),
            jnp.zeros((qc.shape[0], k), jnp.int32),
        )
        bases = (jnp.arange(n_tiles, dtype=jnp.int32) * key_tile)
        (best_d, best_i), _ = jax.lax.scan(tile_step, init, (pts_t, pts_sq, msk_t, bases))
        # the matmul trick loses ~1e-3 to fp32 cancellation; recompute the
        # selected distances exactly (k gathers per query — cheap)
        sel = pts[best_i]  # [qc, k, 3]
        exact = jnp.sum((qc[:, None, :] - sel) ** 2, axis=-1)
        best_d = jnp.where(best_d >= BIG, best_d, exact)
        order = jnp.argsort(best_d, axis=-1)
        return jnp.take_along_axis(best_d, order, axis=-1), jnp.take_along_axis(best_i, order, axis=-1)

    nq = queries.shape[0]
    pad_q = (-nq) % query_chunk
    q = jnp.pad(queries, ((0, pad_q), (0, 0))).reshape(-1, query_chunk, 3)
    best_d, best_i = jax.lax.map(q_chunk_fn, q)
    best_d = best_d.reshape(-1, k)[:nq]
    best_i = best_i.reshape(-1, k)[:nq]
    return jnp.maximum(best_d, 0.0), best_i


def knn(queries, points, mask, k, query_chunk=1024, key_tile=16384):
    """queries [B,Q,3], points [B,P,3], mask [B,P] ->
    (sq-dists [B,Q,k] ascending, indices [B,Q,k] int32).

    Matches FAISS L2 semantics (squared distances; callers sqrt as the
    reference does in find_knn, geodesic_utils.py:22)."""
    return jax.vmap(lambda q, p, m: _knn_scene(q, p, m, k, query_chunk, key_tile))(
        queries, points, mask
    )
