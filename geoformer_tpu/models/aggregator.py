"""Set aggregator: FPS -> ball group -> SharedMLP -> pool.

Reference: PointnetSAModuleVotesSeparate (lib/pointnet2/pointnet2_modules.py:
150-249) with radius=0.2, nsample=64, npoint=n_decode_point, mlp
[m(+3), 2m, 2m, 2m], normalize_xyz=True (geoformer.py:107-116).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from geoformer_tpu.models.blocks import MaskedBatchNorm
from geoformer_tpu.ops.ball_query import query_and_group
from geoformer_tpu.ops.fps import furthest_point_sample


class SharedMLP(nn.Module):
    """Per-point MLP over grouped features [B,K,ns,C]: Dense+BN+ReLU stack
    (pt_utils.SharedMLP with bn=True)."""

    dims: Sequence[int]

    @nn.compact
    def __call__(self, x, mask, train: bool):
        for i, d in enumerate(self.dims):
            x = nn.Dense(d, use_bias=False, name=f"layer{i}")(x)
            x = MaskedBatchNorm(d, name=f"bn{i}")(x, mask, train)
            x = nn.relu(x)
        return x


class SetAggregator(nn.Module):
    """group_points + mlp (max or avg pool). Returns per-sample context
    features; FPS indices come from `group` so callers can reuse them
    (pre_enc_inds drive query selection + geodesic seeds)."""

    mlp_dims: Sequence[int]
    radius: float = 0.2
    nsample: int = 64
    use_xyz: bool = True
    ball_cell_cap: int = 0  # >0: voxel-hash ball query (ops/ball_query.py)

    def group(self, points, feats, mask, npoint):
        """FPS + ball grouping (no params). points [B,P,3], feats [B,P,C]."""
        inds, inds_valid = furthest_point_sample(points, mask, npoint)
        new_xyz = jnp.take_along_axis(points, inds[..., None], axis=1)  # [B,K,3]
        gx, gf, idx, hit = query_and_group(
            new_xyz, points, feats, mask, self.radius, self.nsample,
            normalize_xyz=True, cell_cap=self.ball_cell_cap,
        )
        if self.use_xyz:
            gf = jnp.concatenate([gx, gf], axis=-1)
        return new_xyz, gf, gx, inds, inds_valid, hit

    @nn.compact
    def __call__(self, grouped, group_mask, train: bool, pooling: str = "max"):
        """grouped [B,K,ns,3+C] -> [B,K,mlp[-1]]."""
        h = SharedMLP(self.mlp_dims, name="mlp")(grouped, group_mask, train)
        if pooling == "max":
            neg = jnp.finfo(h.dtype).min
            h = jnp.max(jnp.where(group_mask[..., None], h, neg), axis=2)
            h = jnp.where(jnp.any(group_mask, axis=2)[..., None], h, 0.0)
        elif pooling == "avg":
            m = group_mask.astype(h.dtype)[..., None]
            h = jnp.sum(h * m, axis=2) / jnp.maximum(jnp.sum(m, axis=2), 1.0)
        else:
            raise ValueError(pooling)
        return h
