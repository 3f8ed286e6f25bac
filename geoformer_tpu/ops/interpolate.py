"""3-NN inverse-distance interpolation + gather/group wrappers (pointnet2).

TPU-native equivalents of the pointnet2 CUDA ops
(lib/pointnet2/_ext_src/src/interpolate_gpu.cu, sampling_gpu.cu:11-60,
group_points_gpu.cu) used by PointnetFPModule (pointnet2_modules.py:445+).
Autodiff replaces the hand-written CUDA backward kernels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from geoformer_tpu.ops.knn import knn


def three_nn(unknown: jax.Array, known: jax.Array, known_mask: jax.Array):
    """unknown [B,N,3], known [B,M,3], known_mask [B,M] ->
    (dists [B,N,3] sqrt-L2 ascending, idx [B,N,3] int32)."""
    d2, idx = knn(unknown, known, known_mask, 3)
    return jnp.sqrt(jnp.maximum(d2, 0.0)), idx


def three_interpolate_weights(dists: jax.Array, eps: float = 1e-8):
    """Inverse-distance weights (interpolate_gpu.cu / pointnet2_utils.py:
    weight = (1/d) / sum(1/d))."""
    recip = 1.0 / (dists + eps)
    return recip / jnp.sum(recip, axis=-1, keepdims=True)


def three_interpolate(feats: jax.Array, idx: jax.Array, weight: jax.Array):
    """feats [B,C,M], idx [B,N,3], weight [B,N,3] -> [B,C,N].

    Keeps the reference's channel-first layout for drop-in parity."""
    gathered = jax.vmap(lambda f, i: f[:, i])(feats, idx)  # [B,C,N,3]
    return jnp.sum(gathered * weight[:, None, :, :], axis=-1)


def gather_points(feats: jax.Array, idx: jax.Array):
    """gather_operation: feats [B,C,N], idx [B,m] -> [B,C,m]
    (sampling_gpu.cu:11-60)."""
    return jax.vmap(lambda f, i: f[:, i])(feats, idx)


def group_points(feats: jax.Array, idx: jax.Array):
    """grouping_operation: feats [B,C,N], idx [B,npoint,nsample] ->
    [B,C,npoint,nsample] (group_points_gpu.cu)."""
    return jax.vmap(lambda f, i: f[:, i])(feats, idx)
