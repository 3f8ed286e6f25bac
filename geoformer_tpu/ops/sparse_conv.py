"""Sparse 3D convolution as neighbor-map gather + implicit GEMM.

TPU-native replacement for spconv 1.0 (the reference backbone's external
CUDA dep; model/geoformer/geoformer_modules.py:10-129). Design:

* Voxels live in sorted-key order per scene (`VoxelGrid`). Rulebooks are
  *gather maps*: for every output voxel, the indices of its (potential)
  input voxels. Built on device with `jnp.searchsorted` over the sorted
  keys — no host hash maps, fully jittable.
* SubMConv3d(k=3): neighbor map [V, 27]; conv = gather -> one fused GEMM
  `[V, 27*Cin] @ [27*Cin, Cout]` (chunked to bound the gathered buffer).
  Missing neighbors point at a zero pad row, so no masking in the GEMM.
* SparseConv3d(k=2, s=2) down: output voxels = unique(coords // 2). Each
  child voxel has exactly one parent and a 3-bit within-parent offset;
  conv = per-child GEMM with the offset's weight, then segment-sum by
  parent. No scatter conflicts beyond one segment_sum.
* SparseInverseConv3d(k=2) up (shares the down rulebook / indice_key):
  exact transpose — gather parent features, apply the offset's weight.

Weight layouts (ours, row-major over offsets):
  subm k3:  w[27, Cin, Cout], offset index = (dz+1)*9 + (dy+1)*3 + (dx+1)
  down/up:  w[8, Cin, Cout],  offset index = cz%2*4 + cy%2*2 + cx%2
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from geoformer_tpu.ops.voxelize import VoxelGrid, pack_key, voxelize

SUBM_OFFSETS = np.array(
    [(dz, dy, dx) for dz in (-1, 0, 1) for dy in (-1, 0, 1) for dx in (-1, 0, 1)],
    dtype=np.int32,
)  # [27, 3] as (dz, dy, dx)


def build_subm_neighbors(grid: VoxelGrid, spatial: int) -> jax.Array:
    """[B, V, 27] gather map; entry = input voxel slot or V (pad)."""
    v = grid.voxel_keys.shape[1]
    offsets = jnp.asarray(SUBM_OFFSETS)  # (dz,dy,dx)

    def scene(coords, keys, mask, n_vox):
        # coords [V,3] as (x,y,z); offsets are (dz,dy,dx)
        nc = coords[:, None, :] + offsets[None, :, ::-1]  # [V,27,3] (x,y,z)
        in_range = jnp.all((nc >= 0) & (nc < spatial), axis=-1) & mask[:, None]
        nkey = pack_key(jnp.clip(nc, 0, spatial - 1), spatial)
        # two-level compare-count rank: no sort, no binary-search scalar
        # gathers (method="sort" sorted the ~7M-key concat at level 0;
        # XLA's binary-search lowering was 5x worse still — 256 vs 52 ms
        # for 65536x27 queries on v5e)
        from geoformer_tpu.ops.radius_graph import ranked_lookup

        idx = ranked_lookup(keys, nkey).astype(jnp.int32)
        idx = jnp.minimum(idx, v - 1)
        found = in_range & (keys[idx] == nkey) & (idx < n_vox)
        return jnp.where(found, idx, v).astype(jnp.int32)

    return jax.vmap(scene)(grid.voxel_coords, grid.voxel_keys, grid.voxel_mask, grid.n_voxels)


def compact_subm_neighbors(nbr: jax.Array, k: int):
    """Pack live neighbor slots first: [B,V,27] -> (idx [B,V,k], oid [B,V,k]).

    Surface scans occupy ~6 of the 27 offsets per voxel (mean 5.7, max ~18
    at 2cm ScanNet density), and gather cost on v5e is per-ROW (~7 ns/row,
    row width nearly free), so dropping dead slots cuts the conv's gather
    time proportionally. oid is the offset index of each slot (27 = dead);
    offsets beyond the k-th live neighbor are dropped — exact whenever the
    per-voxel live count <= k (use k=27 for dense volumetric data).
    """
    v = nbr.shape[1]
    ok = nbr < v
    order = jnp.argsort(~ok, axis=-1, stable=True).astype(jnp.int32)
    sel = order[..., :k]
    idx = jnp.take_along_axis(nbr, sel, axis=-1)
    oid = jnp.where(jnp.take_along_axis(ok, sel, axis=-1), sel, 27)
    idx = jnp.where(oid < 27, idx, v)
    return idx, oid.astype(jnp.int32)


def subm_conv_compact(feats: jax.Array, idx: jax.Array, oid: jax.Array,
                      w: jax.Array, precision=None, compute_dtype=None) -> jax.Array:
    """Submanifold conv over a compacted slot table.

    feats [B,V,Cin], idx/oid [B,V,K] (see compact_subm_neighbors),
    w [27,Cin,Cout]. The per-slot weight is routed by a one-hot over the
    offset id and contracted on the MXU:
        out[v] = sum_k onehot(oid[v,k]) . W @ feats[idx[v,k]]
    """
    k27, cin, cout = w.shape
    wpad = jnp.concatenate([w, jnp.zeros((1, cin, cout), w.dtype)])  # oid 27 -> 0
    if compute_dtype is not None:
        feats = feats.astype(compute_dtype)
        wpad = wpad.astype(compute_dtype)
    fpad = _pad_zero_row(feats)
    g = jax.vmap(lambda f, i: f[i])(fpad, idx)  # [B,V,K,Cin]
    onehot = jax.nn.one_hot(oid, k27 + 1, dtype=wpad.dtype)  # [B,V,K,28]
    return jnp.einsum(
        "bvkc,bvko,ocd->bvd", g, onehot, wpad,
        preferred_element_type=jnp.float32, precision=precision,
    )


class DownLink(NamedTuple):
    """Connectivity between a level and its 2x-downsampled parent level.

    parent:      [B, V_child] int32, child voxel -> parent slot (pad -> V_parent)
    offset_idx:  [B, V_child] int32 in [0, 8): child position within parent cell
    children:    [B, V_parent, 8] int32, parent -> child slots (pad -> V_child);
                 exactly <= 8 children per parent, so the down-conv reduction
                 is 8 gathers instead of a colliding scatter-add
    parent_grid: VoxelGrid of the parent level (coords are child coords // 2)
    """

    parent: jax.Array
    offset_idx: jax.Array
    children: jax.Array
    parent_grid: VoxelGrid


def build_downsample(grid: VoxelGrid, spatial: int, num_parent_voxels: int) -> DownLink:
    half = jnp.where(grid.voxel_mask[..., None], grid.voxel_coords // 2, 0)
    pgrid = voxelize(half, grid.voxel_mask, num_parent_voxels, spatial // 2)
    c = grid.voxel_coords
    offset_idx = (c[..., 2] % 2) * 4 + (c[..., 1] % 2) * 2 + (c[..., 0] % 2)
    offset_idx = jnp.where(grid.voxel_mask, offset_idx, 0).astype(jnp.int32)

    # children rulebook from the parent grid's sorted order: children of
    # parent j are pgrid.order[starts[j] : starts[j+1]] (<= 8 of them)
    vc = grid.voxel_keys.shape[1]

    def scene(order, starts, counts):
        idx = starts[:-1, None] + jnp.arange(8, dtype=jnp.int32)[None, :]
        ok = jnp.arange(8, dtype=jnp.int32)[None, :] < counts[:, None]
        child = order[jnp.minimum(idx, vc - 1)]
        return jnp.where(ok, child, vc).astype(jnp.int32)

    children = jax.vmap(scene)(pgrid.order, pgrid.starts, pgrid.counts)
    return DownLink(parent=pgrid.p2v, offset_idx=offset_idx, children=children,
                    parent_grid=pgrid)


def _pad_zero_row(feats: jax.Array) -> jax.Array:
    b, _, c = feats.shape
    return jnp.concatenate([feats, jnp.zeros((b, 1, c), feats.dtype)], axis=1)


def subm_conv(feats: jax.Array, nbr: jax.Array, w: jax.Array, precision=None,
              compute_dtype=None) -> jax.Array:
    """Submanifold conv. feats [B,V,Cin], nbr [B,V,K], w [K,Cin,Cout].

    compute_dtype=bf16 casts features *before* the neighbor gather (the
    HBM-bound part — halves gather traffic) and weights before the GEMM;
    accumulation stays fp32 via preferred_element_type."""
    k, cin, cout = w.shape
    if compute_dtype is not None:
        feats = feats.astype(compute_dtype)
        w = w.astype(compute_dtype)
    fpad = _pad_zero_row(feats)
    # chunk offsets so the gathered buffer stays bounded and the GEMM's
    # contracting dim is >= 128 where possible (MXU-friendly)
    chunk = max(1, 128 // max(cin, 1))
    out = None
    for s in range(0, k, chunk):
        e = min(s + chunk, k)
        idx = nbr[:, :, s:e]  # [B,V,c]
        g = jax.vmap(lambda f, i: f[i])(fpad, idx)  # [B,V,c,Cin]
        gm = g.reshape(g.shape[0], g.shape[1], -1)
        wm = w[s:e].reshape(-1, cout)
        part = jax.lax.dot_general(
            gm, wm, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        out = part if out is None else out + part
    return out


def dense_1x1(feats: jax.Array, w: jax.Array, precision=None) -> jax.Array:
    """SubMConv3d kernel_size=1 (residual identity branch) == matmul."""
    return jax.lax.dot_general(
        feats, w, (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )


def _offset_gemm(feats: jax.Array, offset_idx: jax.Array, w: jax.Array, precision=None,
                 compute_dtype=None) -> jax.Array:
    """out[v] = feats[v] @ w[offset_idx[v]] via 8 masked GEMMs."""
    if compute_dtype is not None:
        feats = feats.astype(compute_dtype)
        w = w.astype(compute_dtype)
    out = jnp.zeros(feats.shape[:-1] + (w.shape[-1],), jnp.float32)
    for k in range(w.shape[0]):
        sel = (offset_idx == k).astype(feats.dtype)[..., None]
        out = out + sel * jax.lax.dot_general(
            feats, w[k], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
    return out


def down_conv(feats: jax.Array, link: DownLink, w: jax.Array, precision=None,
              compute_dtype=None) -> jax.Array:
    """Strided k=2 s=2 conv: child feats [B,Vc,Cin] -> parent [B,Vp,Cout].

    The parent reduction walks the <=8-slot children rulebook (gathers) —
    a scatter-add over colliding parent indices serializes on TPU."""
    transformed = _offset_gemm(feats, link.offset_idx, w, precision, compute_dtype)  # [B,Vc,Cout]
    tpad = _pad_zero_row(transformed)

    def scene(t, children):
        return jnp.sum(t[children], axis=1)  # [Vp, 8, C] -> [Vp, C]

    return jax.vmap(scene)(tpad, link.children)


def up_conv(parent_feats: jax.Array, link: DownLink, w: jax.Array, precision=None,
            compute_dtype=None) -> jax.Array:
    """Inverse k=2 conv: parent feats [B,Vp,Cin] -> child [B,Vc,Cout]."""
    if compute_dtype is not None:
        parent_feats = parent_feats.astype(compute_dtype)
    fpad = _pad_zero_row(parent_feats)
    gathered = jax.vmap(lambda f, i: f[i])(fpad, link.parent)  # [B,Vc,Cin]
    return _offset_gemm(gathered, link.offset_idx, w, precision, compute_dtype)


class GridPlan(NamedTuple):
    """Per-forward connectivity for the whole U-Net: one entry per level.

    grids:  tuple of VoxelGrid, level 0 = point-resolution voxels.
    subm:   tuple of [B, V_l, 27] neighbor maps (() in brick mode — the
            per-voxel rulebooks and their 27V-query sorts are not built).
    links:  tuple of DownLink, links[l] connects level l -> l+1 (len depth-1).
    subm_compact: () or tuple of (idx, oid) compacted slot tables
            (compact_subm_neighbors) consumed by subm_conv_compact.
    bricks: () or tuple of BrickPlan (ops/brick.py) — dense-brick subm
            convs, the production TPU path.
    brick_links: () or tuple of BrickDownLink (len depth-1) — brick-space
            down/up convs so levels stay dense end-to-end (no per-level
            sparse<->dense transitions).
    """

    grids: tuple
    subm: tuple
    links: tuple
    subm_compact: tuple = ()
    bricks: tuple = ()
    brick_links: tuple = ()


def apply_subm(feats, nbr, w, precision=None, compute_dtype=None):
    """Dispatch: BrickPlan (dense bricks), (idx, oid) compacted table, or
    plain [B,V,27] neighbor map."""
    from geoformer_tpu.ops.brick import BrickPlan, subm_conv_bricks

    if isinstance(nbr, BrickPlan):
        return subm_conv_bricks(feats, nbr, w, precision, compute_dtype)
    if isinstance(nbr, tuple):
        return subm_conv_compact(feats, nbr[0], nbr[1], w, precision, compute_dtype)
    return subm_conv(feats, nbr, w, precision, compute_dtype)


def plan_stats(plan: "GridPlan") -> dict:
    """Capacity-health counters for a built plan, all [B] int32.

    Surfaces what used to be silent (ops/voxelize.py pad-slot absorption):
    level-0 points dropped by voxel-capacity overflow, points outside the
    spatial grid, voxels dropped at coarser levels, and whether any level
    saturated its capacity (n_voxels == cap means the scene may be
    truncated — raise `tpu_max_voxels`)."""
    g0 = plan.grids[0]
    zeros = jnp.zeros_like(g0.n_overflow)
    deeper = zeros
    saturated = g0.n_voxels >= g0.voxel_keys.shape[1]
    for g in plan.grids[1:]:
        deeper = deeper + g.n_overflow
        saturated = saturated | (g.n_voxels >= g.voxel_keys.shape[1])
    brick_overflow = zeros
    for bp in plan.bricks:
        brick_overflow = brick_overflow + bp.n_overflow
        saturated = saturated | (bp.n_overflow > 0)
    return {
        "n_voxels": g0.n_voxels,
        "capacity": jnp.full_like(g0.n_voxels, g0.voxel_keys.shape[1]),
        "n_overflow_points": g0.n_overflow,
        "n_oor_points": g0.n_oor,
        "n_dropped_voxels_deeper": deeper,
        "n_brick_overflow": brick_overflow,
        "saturated": saturated,
    }


def voxel_capacities(v0: int, depth: int, decay: float = 0.5, floor: int = 64) -> list[int]:
    caps = [int(v0)]
    for _ in range(depth - 1):
        caps.append(max(int(np.ceil(caps[-1] * decay)), floor))
    return caps


def build_grid_plan(
    coords: jax.Array, mask: jax.Array, spatial: int, depth: int, caps: list[int],
    subm_k: int | None = None, brick_occupancy: int | None = None,
) -> GridPlan:
    """Build all rulebooks for a forward pass (device, jittable).

    coords [B,P,3] int32 point grid coords, mask [B,P]. caps[l] = V_l.
    subm_k < 27 additionally emits live-packed slot tables (exact as long
    as per-voxel live neighbor counts stay <= subm_k; ~18 max at surface
    densities).
    brick_occupancy (tpu_brick_occupancy) switches the subm convs to the
    dense-brick path: per level, NB = max(V_l // brick_occupancy, 16) brick
    slots, and the per-voxel [V,27] rulebooks (whose 27V-query sorts
    dominate both compile and rulebook runtime) are NOT built at all.
    """
    from geoformer_tpu.ops.brick import build_brick_plan

    assert len(caps) == depth
    grid0 = voxelize(coords, mask, caps[0], spatial)
    grids = [grid0]
    links = []
    s = spatial
    for lvl in range(depth - 1):
        link = build_downsample(grids[-1], s, caps[lvl + 1])
        links.append(link)
        grids.append(link.parent_grid)
        s //= 2
    if brick_occupancy:
        from geoformer_tpu.ops.brick import BS, build_brick_down_link

        bricks = []
        s = spatial
        for lvl in range(depth):
            # floor of 64 bricks covers tiny test capacities; never more
            # slots than voxels
            nb = min(caps[lvl], max(caps[lvl] // brick_occupancy, 64))
            bricks.append(build_brick_plan(grids[lvl], s, nb))
            s //= 2
        blinks = []
        s = spatial
        for lvl in range(depth - 1):
            blinks.append(build_brick_down_link(
                bricks[lvl].keys, bricks[lvl].mask,
                bricks[lvl + 1].keys, bricks[lvl + 1].mask,
                max(s // BS, 1),
            ))
            s //= 2
        return GridPlan(grids=tuple(grids), subm=(), links=tuple(links),
                        bricks=tuple(bricks), brick_links=tuple(blinks))
    subm = []
    s = spatial
    for lvl in range(depth):
        subm.append(build_subm_neighbors(grids[lvl], s))
        s //= 2
    compact = ()
    if subm_k is not None and subm_k < 27:
        compact = tuple(compact_subm_neighbors(n, subm_k) for n in subm)
    return GridPlan(grids=tuple(grids), subm=tuple(subm), links=tuple(links),
                    subm_compact=compact)
