"""Geodesic distance field: masked multi-source shortest paths.

Replaces the reference's dynamic-shape frontier BFS
(model/geoformer/geodesic_utils.py:91-164, FAISS + per-step torch.unique).
That BFS approximates geodesics (first-visit distance, visited-dedup); we
compute *true* shortest paths on the same radius-gated kNN graph with a
fixed-shape Bellman-Ford relaxation:

    dist[p, q] = min(dist[p, q], min_k dist[nbr[p, k], q] + w[p, k])

laid out [P, Q] so the Q=128 query axis rides the TPU lane dimension.
Each iteration relaxes both edge directions (gather for in-edges from p's
own kNN list, scatter-min for out-edges), i.e. the symmetrized graph; the
reference expands out-edges only. Unreached points keep -1, the sentinel
both the decoder (geoformer.py:630-641) and the mask head
(geoformer.py:296-311) rely on.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

INF = jnp.float32(3e38)


def _geodesic_scene(nbr_idx, nbr_dist, seeds, seed_mask, point_mask, radius, n_steps):
    p, k = nbr_idx.shape
    q = seeds.shape[0]

    w = jnp.where(
        (nbr_dist <= radius) & (nbr_idx >= 0) & (nbr_idx < p) & point_mask[:, None],
        nbr_dist,
        INF,
    )  # [P,K] edge weights; radius-gated like the reference, dead for pad points
    nb = jnp.clip(nbr_idx, 0, p - 1)
    nb = jnp.where(w < INF, nb, p)  # dead edges point at the pad row

    # dist [P+1, Q]; row P is a +inf pad sink
    dist = jnp.full((p + 1, q), INF, jnp.float32)
    seed_cols = jnp.arange(q, dtype=jnp.int32)
    safe_seeds = jnp.where(seed_mask, jnp.clip(seeds, 0, p - 1), p)
    dist = dist.at[safe_seeds, seed_cols].min(0.0)

    def one_round(state):
        dist, _, it = state
        prev = dist

        def slot(kk, d):
            nbk = nb[:, kk]  # [P]
            wk = w[:, kk]  # [P]
            cand = d[nbk] + wk[:, None]  # in-edge relax
            d = d.at[:p].set(jnp.minimum(d[:p], cand))
            out_cand = d[:p] + wk[:, None]  # out-edge relax
            d = d.at[nbk].min(jnp.where(wk[:, None] < INF, out_cand, INF))
            return d

        dist = jax.lax.fori_loop(0, k, slot, dist)
        changed = jnp.any(dist < prev)
        return dist, changed, it + 1

    def cond(state):
        _, changed, it = state
        return changed & (it < n_steps)

    dist, _, _ = jax.lax.while_loop(cond, one_round, (dist, jnp.bool_(True), jnp.int32(0)))
    dist = dist[:p]
    reached = (dist < INF) & point_mask[:, None]
    return jnp.where(reached, dist, -1.0)


def geodesic_distance(nbr_idx, nbr_dist, seeds, seed_mask, point_mask, radius, n_steps):
    """Multi-source geodesics over a kNN graph.

    nbr_idx  [B,P,K] int32 neighbor indices (self column already dropped)
    nbr_dist [B,P,K] float32 *euclidean* (not squared) edge lengths
    seeds    [B,Q] int32 query point indices; seed_mask [B,Q] validity
    point_mask [B,P]
    -> geo_dist [B,P,Q] float32, -1 where unreached (reference convention;
       note the reference returns [Q,P] per scene — we keep P-major so Q sits
       on the lane axis).
    """
    return jax.vmap(
        lambda ni, nd, s, sm, pm: _geodesic_scene(ni, nd, s, sm, pm, radius, n_steps)
    )(nbr_idx, nbr_dist, seeds, seed_mask, point_mask)
