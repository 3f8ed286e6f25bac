"""Sort-based voxelization — TPU-native replacement for pointgroup_ops.

The reference builds point<->voxel maps with a host C++ hash map
(lib/pointgroup_ops/src/voxelize/voxelize.cpp:10-152) and scatters features
with CUDA atomics (voxelize.cu:9-56). Here the whole thing is jittable XLA:
sort packed int32 keys, flag segment heads, prefix-sum to assign voxel slots.
Static shapes: every scene is padded to P points and V voxels; slot V is a
zero "pad" voxel that absorbs invalid points and capacity overflow.

No colliding scatters anywhere: points sorted by key are sorted by voxel
slot, so per-voxel reductions are cumsum + segment-boundary gathers, and the
only scatter (building p2v) has provably unique indices (a permutation) —
colliding scatter-adds serialize on TPU and dominated early profiles.

Layout is per-scene `[B, P, ...]` (vmapped), so keys fit int32 for grids up
to 1024^3 (the reference caps spatial extent at full_scale=512 after crop;
uncropped eval scenes at 2cm stay under 1024).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class VoxelGrid(NamedTuple):
    """Point->voxel assignment for one padded batch.

    p2v:          [B, P] int32, point -> voxel slot in [0, V]; V = pad slot.
    voxel_coords: [B, V, 3] int32 grid coords of each voxel (pad slots: -1).
    voxel_keys:   [B, V] int32 packed keys, ascending over valid slots
                  (pad slots hold the sentinel), ready for searchsorted.
    voxel_mask:   [B, V] bool validity.
    n_voxels:     [B] int32 number of valid voxels.
    counts:       [B, V] int32 points per voxel.
    order:        [B, P] int32 point indices sorted by voxel slot (then by
                  original index); invalid points last.
    starts:       [B, V+1] int32 segment boundaries of `order` per voxel:
                  points of voxel j are order[starts[j]:starts[j+1]].
    n_overflow:   [B] int32 valid in-range points dropped to the pad voxel
                  because the scene has more distinct voxels than V.
    n_oor:        [B] int32 valid points whose coords fall outside
                  [0, spatial)^3 (would alias the packed key; they are
                  masked into the pad voxel instead).
    """

    p2v: jax.Array
    voxel_coords: jax.Array
    voxel_keys: jax.Array
    voxel_mask: jax.Array
    n_voxels: jax.Array
    counts: jax.Array
    order: jax.Array
    starts: jax.Array
    n_overflow: jax.Array
    n_oor: jax.Array


def pack_key(coords: jax.Array, spatial: int) -> jax.Array:
    """Pack [..., 3] int32 grid coords into a scalar int32 key (z-major)."""
    return (coords[..., 2] * spatial + coords[..., 1]) * spatial + coords[..., 0]


def unpack_key(key: jax.Array, spatial: int) -> jax.Array:
    x = key % spatial
    y = (key // spatial) % spatial
    z = key // (spatial * spatial)
    return jnp.stack([x, y, z], axis=-1)


def _voxelize_scene(coords: jax.Array, mask: jax.Array, num_voxels: int, spatial: int):
    """Single-scene voxelization. coords [P,3] int32 >=0, mask [P] bool."""
    p = coords.shape[0]
    v = num_voxels
    sentinel = jnp.int32(spatial * spatial * spatial)  # > any valid key

    # coords outside [0, spatial) would alias another cell's packed key
    # (e.g. a >20.5 m scene at scale 50 under spatial 1024): mask them into
    # the pad voxel and count them instead of corrupting keys
    in_range = jnp.all((coords >= 0) & (coords < spatial), axis=-1)
    ok = mask & in_range
    n_oor = jnp.sum((mask & ~in_range).astype(jnp.int32))

    key = jnp.where(ok, pack_key(coords, spatial), sentinel)
    order = jnp.argsort(key).astype(jnp.int32)  # stable; invalid points sort last
    skey = key[order]

    valid_sorted = skey < sentinel
    prev = jnp.concatenate([jnp.full((1,), -1, skey.dtype), skey[:-1]])
    head = valid_sorted & (skey != prev)

    vox_id_sorted = jnp.cumsum(head.astype(jnp.int32)) - 1  # [P], -1 before first head
    n_vox = jnp.sum(head.astype(jnp.int32))
    # invalid points and capacity overflow land in the pad slot V — counted,
    # not silent: bench/drivers surface n_overflow > 0 as a degraded run
    n_overflow = jnp.sum((valid_sorted & (vox_id_sorted >= v)).astype(jnp.int32))
    vox_id_sorted = jnp.where(valid_sorted & (vox_id_sorted < v), vox_id_sorted, v)

    # p2v: unique-index scatter (order is a permutation)
    p2v = jnp.zeros((p,), jnp.int32).at[order].set(
        vox_id_sorted.astype(jnp.int32), unique_indices=True, mode="promise_in_bounds"
    )

    # segment boundaries per voxel slot. Voxel ids are dense ranks with
    # exactly one head each, so starts come from ONE unique-index scatter
    # of the head positions — searchsorted here lowered to a binary-search
    # while_loop costing ~32 ms at 262k slots on v5e (~110 ms/forward over
    # all levels); the scatter is ~2 ms.
    n_valid = jnp.sum((vox_id_sorted < v).astype(jnp.int32))
    pos = jnp.arange(p, dtype=jnp.int32)
    head_tgt = jnp.where(head & (vox_id_sorted < v), vox_id_sorted, v)
    starts_v = jnp.full((v,), n_valid, jnp.int32).at[head_tgt].set(
        pos, unique_indices=True, mode="drop"
    )
    starts = jnp.concatenate([starts_v, n_valid[None]])
    counts = starts[1:] - starts[:-1]

    # voxel keys: first sorted point of each segment (gather, no scatter)
    first = jnp.minimum(starts[:v], p - 1)
    n_vox = jnp.minimum(n_vox, v)
    slot = jnp.arange(v, dtype=jnp.int32)
    voxel_mask = slot < n_vox
    voxel_keys = jnp.where(voxel_mask, skey[first], sentinel)
    voxel_coords = jnp.where(voxel_mask[:, None], unpack_key(voxel_keys, spatial), -1)

    return (p2v, voxel_coords, voxel_keys, voxel_mask, n_vox, counts, order, starts,
            n_overflow, n_oor)


def voxelize(coords: jax.Array, mask: jax.Array, num_voxels: int, spatial: int) -> VoxelGrid:
    """Batched voxelization. coords [B,P,3] int32, mask [B,P] bool."""
    fn = lambda c, m: _voxelize_scene(c, m, num_voxels, spatial)
    out = jax.vmap(fn)(coords, mask)
    return VoxelGrid(*out)


def voxel_mean_pool(feats: jax.Array, grid: VoxelGrid) -> jax.Array:
    """Scatter-mean point features into voxels (reference mode=4 'mean',
    voxelize.cu:9-38). feats [B,P,C] -> [B,V,C].

    Points sorted by voxel are contiguous, so the reduction is one cumsum +
    two boundary gathers — no colliding scatter."""
    v = grid.voxel_keys.shape[1]

    def scene(f, order, starts, counts):
        sf = f[order]  # [P, C] sorted by voxel
        csum = jnp.cumsum(sf, axis=0, dtype=jnp.float32)
        csum0 = jnp.concatenate([jnp.zeros((1, f.shape[-1]), csum.dtype), csum], axis=0)
        seg = csum0[starts[1:]] - csum0[starts[:-1]]  # [V, C]
        return (seg / jnp.maximum(counts, 1)[:, None]).astype(f.dtype)

    return jax.vmap(scene)(feats, grid.order, grid.starts, grid.counts)


def devoxelize(voxel_feats: jax.Array, grid: VoxelGrid) -> jax.Array:
    """Gather voxel features back to points (reference point_recover /
    `output.features[p2v_map]`, geoformer.py:541). [B,V,C] -> [B,P,C]."""

    def scene(vf, p2v):
        vf_pad = jnp.concatenate([vf, jnp.zeros((1, vf.shape[-1]), vf.dtype)], axis=0)
        return vf_pad[p2v]

    return jax.vmap(scene)(voxel_feats, grid.p2v)
