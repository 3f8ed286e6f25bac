"""Connected-component clustering over a radius graph (PointGroup heritage).

TPU-native equivalents of the reference's proposal-clustering kernels
(unused by the GeoFormer forward pass but part of the PG_OP surface):

- ballquery_batch_p (lib/pointgroup_ops/src/bfs_cluster/bfs_cluster.cu:15-90):
  batched fixed-radius neighbor query. The CUDA op emits a CSR (idx,
  start_len) pair sized by a retry-on-overflow heuristic; the TPU version
  returns a fixed-degree padded neighbor table + per-point counts, which is
  the shape-static dual of CSR.
- bfs_cluster (src/bfs_cluster/bfs_cluster.cpp:28-112): connected components
  over the ball graph restricted to equal semantic label, dropping clusters
  below a size threshold. The host BFS becomes iterative min-label
  propagation (pointer-jumping) — O(log N) rounds of gathers, fully on
  device, shape-static.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from geoformer_tpu.ops.ball_query import ball_query


def ballquery_dense(points: jax.Array, mask: jax.Array, radius: float, nsample: int):
    """Fixed-radius neighbors of every point among all points.

    points [P,3], mask [P] -> (idx [P,nsample] int32, count [P] int32,
    valid [P,nsample] bool). Padded slots repeat the first hit (CUDA
    ball_query semantics, _ext_src/src/ball_query_gpu.cu:12-57).
    """
    idx, valid = ball_query(points[None], points[None], mask[None], radius, nsample)
    idx, valid = idx[0], valid[0]
    return idx, jnp.sum(valid, axis=-1, dtype=jnp.int32), valid


def connected_components(nbr_idx: jax.Array, nbr_valid: jax.Array,
                         point_valid: jax.Array, max_rounds: int | None = None):
    """Min-label propagation over an undirected neighbor graph.

    nbr_idx [P,K], nbr_valid [P,K], point_valid [P] -> component root id per
    point [P] (its own index for invalid points). Convergence: each round a
    min-reduce over neighbors plus pointer-jumping (label <- label[label]),
    so the label of the component minimum spreads in O(log diameter) rounds.
    """
    p = nbr_idx.shape[0]
    if max_rounds is None:
        max_rounds = max(2 * int(p).bit_length(), 8)
    labels0 = jnp.arange(p, dtype=jnp.int32)

    def body(state):
        labels, _ = state
        nbr_labels = jnp.where(nbr_valid, labels[nbr_idx], p)
        new = jnp.minimum(labels, jnp.min(nbr_labels, axis=-1))
        new = jnp.where(point_valid, new, labels0)
        new = new[new]  # pointer jumping
        return new, jnp.any(new != labels)

    def cond(state):
        return state[1]

    def scan_body(state, _):
        labels, changed = state
        labels, ch = jax.lax.cond(changed, body, lambda s: (s[0], False), (labels, changed))
        return (labels, ch), None

    (labels, _), _ = jax.lax.scan(scan_body, (labels0, jnp.bool_(True)), None, length=max_rounds)
    return labels


def bfs_cluster(semantic_preds: jax.Array, points: jax.Array, point_valid: jax.Array,
                radius: float, nsample: int, min_cluster: int):
    """Semantic-constrained connected components (bfs_cluster.cpp:28-112).

    Returns (cluster_root [P] int32, cluster_valid [P] bool): the component
    root index per point, and whether the point belongs to a kept cluster
    (same-label component with >= min_cluster members). Background points
    (semantic < 0) are dropped like the reference's label gating.
    """
    idx, _, valid = ballquery_dense(points, point_valid, radius, nsample)
    same_label = semantic_preds[idx] == semantic_preds[:, None]
    fg = point_valid & (semantic_preds >= 0)
    edge_valid = valid & same_label & fg[:, None] & fg[idx]
    roots = connected_components(idx, edge_valid, fg)
    sizes = jax.ops.segment_sum(
        fg.astype(jnp.int32), roots, num_segments=points.shape[0]
    )
    keep = fg & (sizes[roots] >= min_cluster)
    return roots, keep
