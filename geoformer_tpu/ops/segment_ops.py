"""Segment reductions + proposal utilities (PointGroup-heritage ops).

TPU-native equivalents of the pointgroup_ops kernels that the reference
ships for inventory completeness (unused by the GeoFormer forward path but
part of the PG_OP API surface, lib/pointgroup_ops/src/pointgroup_ops_api.cpp:6-24):

- sec_mean / sec_min / sec_max  (src/sec_mean/sec_mean.cu:12-86): segment
  mean/min/max over offset-delimited rows of a flat feature matrix.
- roipool (src/roipool/roipool.{cpp,cu}): per-proposal max-pool of point
  features (+argmax; JAX autodiff handles the backward for free).
- get_iou (src/get_iou/get_iou.cu:12-38): IoU matrix proposals x gt
  instances. The CUDA op consumes CSR index lists; the TPU version takes
  dense boolean masks so the intersection is one MXU matmul.

All ops are static-shape: segments are described by an offsets vector of
fixed length (n_segments + 1) over a fixed-capacity flat array; rows beyond
the last offset are ignored.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

BIG = 3.4e38  # python float, NOT a jnp scalar (device-array constants re-stage per call)


def _segment_ids(offsets: jax.Array, n_rows: int) -> jax.Array:
    """offsets [M+1] monotonically nondecreasing -> per-row segment id [N];
    rows at or beyond offsets[-1] get id M (an overflow bucket)."""
    iota = jnp.arange(n_rows, dtype=offsets.dtype)
    return jnp.searchsorted(offsets[1:], iota, side="right").astype(jnp.int32)


def sec_mean(feats: jax.Array, offsets: jax.Array) -> jax.Array:
    """feats [N, C], offsets [M+1] -> per-segment mean [M, C].

    Empty segments return 0 (the CUDA kernel divides by (end-start) and is
    never called with empty segments; we guard instead of NaN-ing).
    """
    m = offsets.shape[0] - 1
    seg = _segment_ids(offsets, feats.shape[0])
    sums = jax.ops.segment_sum(feats, seg, num_segments=m + 1)[:m]
    counts = (offsets[1:] - offsets[:-1]).astype(feats.dtype)
    return sums / jnp.maximum(counts, 1.0)[:, None]


def sec_min(feats: jax.Array, offsets: jax.Array) -> jax.Array:
    """feats [N, C], offsets [M+1] -> per-segment min [M, C] (0 if empty)."""
    m = offsets.shape[0] - 1
    seg = _segment_ids(offsets, feats.shape[0])
    mins = jax.ops.segment_min(feats, seg, num_segments=m + 1)[:m]
    empty = (offsets[1:] == offsets[:-1])[:, None]
    return jnp.where(empty, 0.0, mins)


def sec_max(feats: jax.Array, offsets: jax.Array) -> jax.Array:
    """feats [N, C], offsets [M+1] -> per-segment max [M, C] (0 if empty)."""
    m = offsets.shape[0] - 1
    seg = _segment_ids(offsets, feats.shape[0])
    maxs = jax.ops.segment_max(feats, seg, num_segments=m + 1)[:m]
    empty = (offsets[1:] == offsets[:-1])[:, None]
    return jnp.where(empty, 0.0, maxs)


def roipool(feats: jax.Array, proposals_offset: jax.Array) -> jax.Array:
    """Segment max-pool of point features per proposal.

    feats [sumNPoint, C] (rows ordered by proposal), proposals_offset
    [nProposal+1] -> pooled [nProposal, C]. Gradients flow to the argmax
    row exactly like the CUDA backward (roipool.cu's atomic argmax scatter).
    """
    return sec_max(feats, proposals_offset)


def get_iou(proposal_masks: jax.Array, instance_masks: jax.Array,
            instance_sizes: jax.Array | None = None) -> jax.Array:
    """IoU matrix between proposals and gt instances.

    proposal_masks [nProp, N] bool, instance_masks [nInst, N] bool ->
    iou [nProp, nInst] f32. The intersection is a single f32 matmul (MXU);
    `instance_sizes` overrides |gt| (the CUDA op takes precomputed
    instance_pointnum, get_iou.cu:21).
    """
    p = proposal_masks.astype(jnp.float32)
    g = instance_masks.astype(jnp.float32)
    inter = jax.lax.dot_general(
        p, g, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [nProp, nInst]
    p_sz = jnp.sum(p, axis=1, keepdims=True)
    g_sz = (
        instance_sizes.astype(jnp.float32)[None, :]
        if instance_sizes is not None
        else jnp.sum(g, axis=1)[None, :]
    )
    union = p_sz + g_sz - inter
    return inter / jnp.maximum(union, 1.0)
