#!/usr/bin/env python
"""Standalone timing of the geodesic leg's components at a given foreground
scale: radius-kNN graph build, coarse contraction, coarse fixpoint solve,
fine prolong+sweeps, and the assembled hier solve. This is the per-forward
hot path after the brick backbone (prod-scale Δ ~720 ms, BASELINE.md r3).

Usage: python tools/geo_bisect.py --fg 131072 --queries 256 [--stages ...]
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np


def synth_cloud(f, seed=0):
    """Room-scan-like surface cloud at ~2 cm spacing (matches
    __graft_entry__._synthetic_batch density assumptions)."""
    rng = np.random.default_rng(seed)
    # a few axis-aligned rectangles (floor/walls/furniture). Spacing ~2.8 cm:
    # fg points are the ~50% foreground subset of a 2 cm-spaced scan
    # (extent sized PER PLANE so per-plane density matches — the old
    # sqrt(f)*0.02 extent made the cloud 2x sparser than the bench scene)
    pts = []
    n_left = f
    planes = 8
    extent = max(1.0, float(np.sqrt(f / planes) * 0.028))
    for i in range(planes):
        n = n_left if i == planes - 1 else max(1, f // planes)
        n_left -= n
        u = rng.uniform(0, extent, size=(n,))
        v = rng.uniform(0, extent, size=(n,))
        h = rng.uniform(0, 0.3)
        axis = i % 3
        if axis == 0:
            p = np.stack([u, v, np.full_like(u, h)], -1)
        elif axis == 1:
            p = np.stack([u, np.full_like(u, h), v], -1)
        else:
            p = np.stack([np.full_like(u, h), u, v], -1)
        pts.append(p)
    pts = np.concatenate(pts)[:f]
    pts += rng.normal(0, 0.003, size=pts.shape)  # 3 mm sensor noise
    return jnp.asarray(pts.astype(np.float32))


def _observe(out):
    # D2H observes completion (block_until_ready is a no-op on the tunnel).
    # dtype= fuses the convert into the reduce — an explicit astype would
    # materialize a full f32 copy of every buffer (OOMs the probe at prod).
    return float(sum(jnp.sum(jnp.abs(x), dtype=jnp.float32)
                     for x in jax.tree.leaves(out) if hasattr(x, "dtype")))


def timed(fn, *args, iters=3, label=""):
    out = fn(*args)
    _observe(out)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        _observe(out)
        ts.append(time.perf_counter() - t0)
    print(f"{label:24s} run={np.median(ts) * 1000:9.1f}ms", flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fg", type=int, default=131072)
    ap.add_argument("--queries", type=int, default=256)
    ap.add_argument("--knn", type=int, default=64)
    ap.add_argument("--radius", type=float, default=0.05)
    ap.add_argument("--cell_cap", type=int, default=8)
    ap.add_argument("--cell_div", type=int, default=2)
    ap.add_argument("--window", type=int, default=64,
                    help="per-cell candidate compaction width (tpu_knn_window)")
    ap.add_argument("--fine_sweeps", type=int, default=6)
    ap.add_argument("--fine_k", type=int, default=16)
    ap.add_argument("--k_sub", type=int, default=16)
    ap.add_argument("--cell_factor", type=float, default=2.0)
    ap.add_argument("--coarse_eps", type=float, default=0.0)
    ap.add_argument("--fine_block", type=int, default=512)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--stages", type=str, default="all")
    args = ap.parse_args()

    from geoformer_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()

    from geoformer_tpu.ops.radius_graph import radius_knn
    from geoformer_tpu.ops.geodesic import (
        _coarse_contract, _prep_edges, _pad_edges, _block_sweeps,
        geodesic_distance_hier, INF,
    )

    f, q = args.fg, args.queries
    pts = synth_cloud(f)[None]  # [1,F,3]
    mask = jnp.ones((1, f), bool)
    seeds = jnp.asarray(np.random.default_rng(1).choice(f, q, replace=False)
                        .astype(np.int32))[None]
    seed_mask = jnp.ones((1, q), bool)
    print(f"device={jax.devices()[0]} fg={f} q={q} knn={args.knn}", flush=True)

    _ALL = [
        "knn_sorted", "knn_cellwin", "knn_window", "knn_unsorted", "knn_parts",
        "knn_ab", "contract", "contract_parts", "coarse", "fine", "hier",
    ]
    want = args.stages.split(",") if args.stages != "all" else [
        "knn_sorted", "knn_cellwin", "knn_window", "knn_parts", "contract",
        "coarse", "fine", "hier",
    ]
    unknown = [s for s in want if s not in _ALL]
    if unknown:
        # fail LOUDLY: silently ignored tokens wasted a queued on-chip run
        # (ADVICE r4 — '--stages knn' timed nothing)
        raise SystemExit(f"unknown --stages tokens {unknown}; valid: {_ALL}")

    knn = jax.jit(functools.partial(
        radius_knn, radius=args.radius, k=args.knn, cell_cap=args.cell_cap,
        cell_div=args.cell_div))
    d2, nbr = knn(pts, mask)
    nbr_d = jnp.sqrt(jnp.maximum(jnp.minimum(d2, 4.0), 0.0))

    if "knn_sorted" in want:
        timed(knn, pts, mask, label="radius_knn sort=True")
    if "knn_ab" in want:
        # full-op A/B of the r5 levers: dense-grid window lookup x
        # k-selection (topk sort / pallas VMEM kernel / argmin passes /
        # approx). Every arm's output is checked against the baseline op
        # (pallas/passes/dense are exact; approx reports its miss count)
        for dense in (0, 256):
            for sel in ("topk", "pallas", "passes", "approx"):
                arm = jax.jit(functools.partial(
                    radius_knn, radius=args.radius, k=args.knn,
                    cell_cap=args.cell_cap, cell_div=args.cell_div,
                    dense_grid=dense, select=sel))
                d2a, nbra = timed(
                    arm, pts, mask,
                    label=f"radius_knn dense={dense} select={sel}")
                n_mism = int(jnp.sum(nbra != nbr))
                tag = "exact" if sel != "approx" else "approx-misses"
                print(f"  {tag}: idx mismatches vs baseline = {n_mism}",
                      flush=True)
    if "knn_cellwin" in want:
        knn_cw = jax.jit(functools.partial(
            radius_knn, radius=args.radius, k=args.knn, cell_cap=args.cell_cap,
            cell_div=args.cell_div, cellwin=True))
        d2c, nbrc = timed(knn_cw, pts, mask, label="radius_knn cellwin=True")
        same = bool(jnp.all(nbrc == nbr)) and bool(
            jnp.allclose(jnp.minimum(d2c, 1e30), jnp.minimum(d2, 1e30))
        )
        print(f"  exact_match_vs_pointwise={same}", flush=True)
    if "knn_window" in want:
        knn_w = jax.jit(functools.partial(
            radius_knn, radius=args.radius, k=args.knn, cell_cap=args.cell_cap,
            cell_div=args.cell_div, window=args.window, with_stats=True))
        _, _, ovf, wovf = timed(knn_w, pts, mask,
                                label=f"radius_knn window={args.window}")
        print(f"  drops={int(ovf[0])} window_ovf_pts={int(wovf[0])}", flush=True)
    if "knn_unsorted" in want:
        knn_u = jax.jit(functools.partial(
            radius_knn, radius=args.radius, k=args.knn, cell_cap=args.cell_cap,
            cell_div=args.cell_div, sort=False))
        timed(knn_u, pts, mask, label="radius_knn sort=False")

    if "knn_parts" in want:
        # piecewise replication of _radius_knn_scene to attribute its cost
        from geoformer_tpu.ops.voxelize import pack_key, voxelize
        from geoformer_tpu.ops.radius_graph import _WINDOW, _BIG

        spatial = 1024
        cap = args.cell_cap
        cc = max(f // 2, 1)

        @jax.jit
        def s_grid(points, mask):
            origin = jnp.min(jnp.where(mask[0][:, None], points[0], _BIG), axis=0)
            cells = jnp.clip(
                jnp.floor((points[0] - origin) / args.radius).astype(jnp.int32),
                0, spatial - 1)
            grid = voxelize(cells[None], mask, cc, spatial)
            return cells, grid

        cells, grid = timed(s_grid, pts, mask, label="knn: voxelize cells")

        @jax.jit
        def s_cellpts(grid):
            p2c = grid.p2v[0]
            order = grid.order[0]
            starts = grid.starts[0]
            sorted_cells = p2c[order]
            rank = jnp.arange(f, dtype=jnp.int32) - starts[jnp.minimum(sorted_cells, cc)]
            ok = (sorted_cells < cc) & (rank < cap)
            slot = jnp.where(ok, sorted_cells * cap + rank, cc * cap)
            return jnp.full((cc * cap + 1,), f, jnp.int32).at[slot].set(
                jnp.where(ok, order, f), unique_indices=True,
                mode="promise_in_bounds")[: cc * cap].reshape(cc, cap)

        cell_pts = timed(s_cellpts, grid, label="knn: cell->points table")

        def _lookup_with(window_fn, grid, mask):
            cwin = window_fn(
                grid.voxel_keys[0], grid.n_voxels[0], cc, grid.voxel_coords[0],
                grid.voxel_mask[0], spatial)
            p2c = grid.p2v[0]
            cwin_pad = jnp.concatenate([cwin, jnp.full((1, 27), cc, jnp.int32)], axis=0)
            cidx = cwin_pad[jnp.minimum(p2c, cc)]
            return jnp.where((p2c < cc)[:, None] & mask[0][:, None], cidx, cc)

        from geoformer_tpu.ops.radius_graph import (_window_lookup_per_slot,
                                                    window_lookup)

        s_lookup = jax.jit(functools.partial(_lookup_with, window_lookup))
        s_lookup_slot = jax.jit(functools.partial(_lookup_with, _window_lookup_per_slot))
        cidx = timed(s_lookup, grid, mask, label="knn: 27-window lookup (runs)")
        cidx_slot = timed(s_lookup_slot, grid, mask,
                          label="knn: 27-window lookup (per-slot)")
        n_mism = int(jnp.sum(cidx != cidx_slot))
        print(f"  run-vs-slot lookup mismatches: {n_mism}", flush=True)

        # dense scatter-grid arm (experimental, ops/radius_graph.py): the
        # compare-count lookup's [CC, T/seg] bandwidth -> O(1) gathers from
        # a [grid_cap^3] table. grid_cap 256 covers 12.8 m at 5 cm cells.
        from geoformer_tpu.ops.radius_graph import window_lookup_dense

        def _lookup_dense(grid, mask):
            qcells = grid.voxel_coords[0]
            qvalid = grid.voxel_mask[0]
            cwin, n_oob = window_lookup_dense(
                qcells, qvalid, grid.n_voxels[0], cc, qcells, qvalid,
                grid_cap=256)
            p2c = grid.p2v[0]
            cwin_pad = jnp.concatenate(
                [cwin, jnp.full((1, 27), cc, jnp.int32)], axis=0)
            cidx = cwin_pad[jnp.minimum(p2c, cc)]
            return jnp.where(
                (p2c < cc)[:, None] & mask[0][:, None], cidx, cc), n_oob

        s_lookup_dense = jax.jit(_lookup_dense)
        cidx_dense, n_oob = timed(
            s_lookup_dense, grid, mask, label="knn: 27-window lookup (dense)")
        n_mism_d = int(jnp.sum(cidx_dense != cidx))
        print(f"  dense-vs-run lookup mismatches: {n_mism_d} "
              f"(oob cells: {int(n_oob)})", flush=True)

        @jax.jit
        def s_cand(cidx, cell_pts):
            cell_pts_pad = jnp.concatenate(
                [cell_pts, jnp.full((1, cap), f, jnp.int32)], axis=0)
            return cell_pts_pad[cidx].reshape(f, 27 * cap)

        cand = timed(s_cand, cidx, cell_pts, label="knn: cand idx gather")

        d2full = None
        if f * 27 * cap <= 2 ** 23:
            # the naive 3-minor gather pads xyz 3->128 lanes on TPU (42x
            # memory: [131072, 648, 3] allocated 43GB and OOM'd the r4d
            # suite) — run it only at small sizes, as a cross-check
            @jax.jit
            def s_d2(cand, points, mask):
                pts_pad = jnp.concatenate(
                    [points[0], jnp.zeros((1, 3), points.dtype)], axis=0)
                cpos = pts_pad[cand]
                d2 = jnp.sum((points[0][:, None, :] - cpos) ** 2, axis=-1)
                bad = (cand >= f) | (
                    cand == jnp.arange(f, dtype=jnp.int32)[:, None]) | (
                    d2 > args.radius * args.radius) | ~mask[0][:, None]
                return jnp.where(bad, _BIG, d2)

            d2full = timed(s_d2, cand, pts, mask,
                           label="knn: pos gather + d2 fusion (3-minor)")
        else:
            print("knn: 3-minor d2 variant skipped (42x lane padding at "
                  f"fg={f}, cap={cap})", flush=True)

        @jax.jit
        def s_d2_flat(cidx, cell_pts, cand, points, mask):
            # two-hop, flat-packed: cell positions as [CC, cap*3] 2D rows
            # (no 3-minor tensor anywhere), window gather [P,27] rows of
            # cap*12B, then strided-lane d2 on 2D [P, 27*cap*3]
            pts_pad = jnp.concatenate([points[0], jnp.zeros((1, 3), points.dtype)],
                                      axis=0)
            cell_xyz = pts_pad[cell_pts.reshape(-1)].reshape(cc, cap * 3)
            cell_xyz_pad = jnp.concatenate(
                [cell_xyz, jnp.zeros((1, cap * 3), points.dtype)], axis=0)
            cpos = cell_xyz_pad[cidx].reshape(f, 27 * cap * 3)  # [P, C*3]
            tq = jnp.tile(points[0], (1, 27 * cap))  # [P, C*3] (xyzxyz...)
            diff2 = (cpos - tq) ** 2
            d2 = diff2[:, 0::3] + diff2[:, 1::3] + diff2[:, 2::3]
            bad = (cand >= f) | (cand == jnp.arange(f, dtype=jnp.int32)[:, None]) | (
                d2 > args.radius * args.radius) | ~mask[0][:, None]
            return jnp.where(bad, _BIG, d2)

        d2flat = timed(s_d2_flat, cidx, cell_pts, cand, pts, mask,
                       label="knn: flat 2-hop pos + d2")
        if d2full is not None:
            err = float(jnp.max(jnp.abs(jnp.minimum(d2flat, _BIG) -
                                        jnp.minimum(d2full, _BIG))))
            print(f"  flat-vs-pointwise d2 max err: {err:.2e}", flush=True)

        @jax.jit
        def s_pack_d2(cidx, cell_pts, points, mask):
            # r5 production path: ONE row-gather per (point, window slot)
            # from the packed [CC, cap*4] table (xyz || f32 VALUE-encoded
            # idx — the bitcast form made every index < 2^23 a denormal
            # the TPU flushed to 0; this stage is the on-chip canary that
            # caught it: 84.9M/84.9M lanes corrupt, r5b)
            pts_pad = jnp.concatenate(
                [points[0], jnp.zeros((1, 3), points.dtype)], axis=0)
            cell_xyz = pts_pad[cell_pts.reshape(-1)].reshape(cc, cap * 3)
            pack = jnp.concatenate(
                [cell_xyz, cell_pts.astype(jnp.float32)], axis=1)
            pad_row = jnp.concatenate(
                [jnp.zeros((1, cap * 3), points.dtype),
                 jnp.full((1, cap), float(f), jnp.float32)], axis=1)
            g = jnp.concatenate([pack, pad_row], axis=0)[cidx]  # [P,27,cap*4]
            cpos = g[:, :, : cap * 3].reshape(f, 27 * cap * 3)
            candm = g[:, :, cap * 3:].astype(jnp.int32).reshape(f, 27 * cap)
            tq = jnp.tile(points[0], (1, 27 * cap))
            diff2 = (cpos - tq) ** 2
            d2 = diff2[:, 0::3] + diff2[:, 1::3] + diff2[:, 2::3]
            bad = (candm >= f) | (
                candm == jnp.arange(f, dtype=jnp.int32)[:, None]) | (
                d2 > args.radius * args.radius) | ~mask[0][:, None]
            return jnp.where(bad, _BIG, d2), candm

        d2m, candm = timed(s_pack_d2, cidx, cell_pts, pts, mask,
                           label="knn: MERGED pack gather+d2")
        err_m = float(jnp.max(jnp.abs(jnp.minimum(d2m, _BIG) -
                                      jnp.minimum(d2flat, _BIG))))
        n_cm = int(jnp.sum(candm != cand))
        print(f"  merged-vs-split: d2 max err {err_m:.2e}, "
              f"idx mismatches {n_cm}", flush=True)
        del d2m, candm

        @jax.jit
        def s_topk(d2, cand):
            neg_d, pos = jax.lax.top_k(-d2, args.knn)
            idx = jnp.take_along_axis(cand, pos, axis=1)
            return -neg_d, idx

        timed(s_topk, d2flat, cand, label=f"knn: top_k k={args.knn}")

        @jax.jit
        def s_approx_topk(d2, cand):
            neg_d, pos = jax.lax.approx_max_k(-d2, args.knn,
                                              recall_target=0.95)
            idx = jnp.take_along_axis(cand, pos.astype(jnp.int32), axis=1)
            return -neg_d, idx

        timed(s_approx_topk, d2flat, cand,
              label=f"knn: approx_top_k k={args.knn}")

        from geoformer_tpu.ops.radius_graph import select_min_k

        @jax.jit
        def s_passes(d2, cand):
            d2k, pos = select_min_k(d2, args.knn)
            idx = jnp.take_along_axis(cand, pos, axis=1)
            return d2k, idx

        timed(s_passes, d2flat, cand,
              label=f"knn: select_min_k k={args.knn}")
        del cand, d2full, d2flat, cidx, cell_pts

    cell = args.radius * args.cell_factor
    c_cap = max(512, f // 8)

    @jax.jit
    def contract(pts, mask, nbr, nbr_d):
        nb, w = _prep_edges(nbr[0], nbr_d[0], mask[0], args.radius)
        return _coarse_contract(pts[0], mask[0], nb, w, cell, c_cap, 32, args.k_sub)

    if "contract" in want:
        timed(contract, pts, mask, nbr, nbr_d, label="coarse contract")
    p2c, rep, rep_pos, to_rep, cnb, cw, cmask, ccoords = contract(pts, mask, nbr, nbr_d)

    if "contract_parts" in want:
        # piecewise replication of _coarse_contract to attribute its cost
        from geoformer_tpu.ops.voxelize import _voxelize_scene

        k_sub = args.k_sub
        big = 1e9

        @jax.jit
        def c_vox(pts, mask):
            origin = jnp.min(jnp.where(mask[0][:, None], pts[0], big), axis=0)
            cells = jnp.clip(jnp.floor((pts[0] - origin) / cell).astype(jnp.int32),
                             0, 1023)
            return _voxelize_scene(cells, mask[0], c_cap, 1024)

        vox = timed(c_vox, pts, mask, label="contract: voxelize cells")
        p2c_, _, _, _, _, _, order_, starts_, _, _ = vox

        @jax.jit
        def c_lift(vox, pts, mask, nbr, nbr_d):
            p2cx, _, _, cmaskx, _, _, orderx, startsx, _, _ = vox
            nb, w = _prep_edges(nbr[0], nbr_d[0], mask[0], args.radius)
            repx = orderx[jnp.minimum(startsx[:c_cap], f - 1)]
            repx = jnp.where(cmaskx, repx, f)
            pos_pad = jnp.concatenate([pts[0], jnp.zeros((1, 3), pts.dtype)])
            rep_posx = pos_pad[repx]
            p2c_pad = jnp.concatenate([p2cx, jnp.full((1,), c_cap, jnp.int32)])
            nbs = nb[:, :k_sub]
            ws = w[:, :k_sub]
            ci = jnp.broadcast_to(p2cx[:, None], nbs.shape)
            cj = p2c_pad[nbs]
            rep_pos_pad = jnp.concatenate([rep_posx, jnp.zeros((1, 3), rep_posx.dtype)])
            wc = jnp.linalg.norm(
                rep_pos_pad[jnp.minimum(ci, c_cap)] - rep_pos_pad[jnp.minimum(cj, c_cap)],
                axis=-1)
            live = (ws < INF) & (ci != cj) & (ci < c_cap) & (cj < c_cap)
            sent = jnp.int32((c_cap + 1) * c_cap + c_cap)
            skey = jnp.where(live, ci * (c_cap + 1) + cj, sent).reshape(-1)
            return skey, cj.reshape(-1), wc.reshape(-1)

        skey, cjf, wcf = timed(c_lift, vox, pts, mask, nbr, nbr_d,
                               label="contract: edge lift")

        @jax.jit
        def c_sort(skey, cjf, wcf):
            e_order = jnp.argsort(skey)
            return skey[e_order], cjf[e_order], wcf[e_order]

        skey_s, cj_s, wc_s = timed(c_sort, skey, cjf, wcf,
                                   label="contract: 2M argsort+gathers")

        @jax.jit
        def c_dedup(skey_s, cj_s, wc_s):
            kc = 32
            n_e = skey_s.shape[0]
            prev = jnp.concatenate([jnp.full((1,), -1, skey_s.dtype), skey_s[:-1]])
            sent = jnp.int32((c_cap + 1) * c_cap + c_cap)
            head = (skey_s != prev) & (skey_s < sent)
            hexc = jnp.cumsum(head.astype(jnp.int32)) - head.astype(jnp.int32)
            ci_starts = jnp.searchsorted(
                skey_s, jnp.arange(c_cap, dtype=jnp.int32) * (c_cap + 1)
            ).astype(jnp.int32)
            hexc_pad = jnp.concatenate([hexc, jnp.zeros((1,), jnp.int32)])
            ci_s = jnp.minimum(skey_s // (c_cap + 1), c_cap - 1)
            rank = (hexc + head.astype(jnp.int32) - 1
                    - hexc_pad[jnp.minimum(ci_starts[ci_s], n_e)])
            ok = head & (rank < kc)
            slot = jnp.where(ok, ci_s * kc + rank, c_cap * kc)
            cnbx = jnp.full((c_cap * kc + 1,), c_cap, jnp.int32).at[slot].set(
                jnp.where(ok, cj_s, c_cap), unique_indices=True,
                mode="promise_in_bounds")[: c_cap * kc].reshape(c_cap, kc)
            cwx = jnp.full((c_cap * kc + 1,), INF, jnp.float32).at[slot].set(
                jnp.where(ok, wc_s, INF), unique_indices=True,
                mode="promise_in_bounds")[: c_cap * kc].reshape(c_cap, kc)
            return cnbx, cwx

        timed(c_dedup, skey_s, cj_s, wc_s, label="contract: dedup scatter")

    cblock = min(512, max(c_cap // 8, 8))

    @jax.jit
    def coarse_it(cnb, cw, seeds, seed_mask, p2c, to_rep, ccoords, cmask):
        from geoformer_tpu.ops.geodesic import _fast_sweep_orders

        cpp = c_cap + ((-c_cap) % cblock)
        cdist = jnp.full((cpp + 1, q), INF, jnp.float32)
        cols = jnp.arange(q, dtype=jnp.int32)
        safe = jnp.clip(seeds[0], 0, f - 1)
        sc = jnp.where(seed_mask[0], p2c[safe], cpp)
        sc = jnp.where(sc >= c_cap, cpp, sc)
        cdist = cdist.at[sc, cols].min(jnp.where(seed_mask[0], to_rep[safe], INF))
        return _fast_sweep_orders(ccoords, cmask, cnb, cw, c_cap, cblock, cdist,
                                  max(args.steps, 256),
                                  n_live=jnp.sum(cmask.astype(jnp.int32)),
                                  return_iters=True, eps=args.coarse_eps)

    def coarse(cnb, cw, seeds, seed_mask, p2c, to_rep):
        return coarse_it(cnb, cw, seeds, seed_mask, p2c, to_rep, ccoords, cmask)[0]

    if "coarse" in want:
        timed(coarse_it, cnb, cw, seeds, seed_mask, p2c, to_rep, ccoords, cmask,
              label="coarse solve")
        _, iters = coarse_it(cnb, cw, seeds, seed_mask, p2c, to_rep, ccoords, cmask)
        n_cells = int(jnp.sum(cmask.astype(jnp.int32)))
        print(f"  coarse: sweeps to fixpoint={int(iters)}  live cells={n_cells}"
              f" / cap {c_cap}", flush=True)

    if "fine" in want:
        from geoformer_tpu.ops.geodesic import _spatial_order, _invert_perm

        cdist = coarse(cnb, cw, seeds, seed_mask, p2c, to_rep)

        @jax.jit
        def fine(cdist, nbr, nbr_d, pts, mask, seeds, seed_mask, p2c, to_rep):
            nb, w = _prep_edges(nbr[0], nbr_d[0], mask[0], args.radius)
            if args.fine_k and args.fine_k < nb.shape[1]:
                nb = nb[:, : args.fine_k]
                w = w[:, : args.fine_k]
            perm = _spatial_order(pts[0], mask[0], cell * 2)
            inv = _invert_perm(perm)
            inv_pad = jnp.concatenate([inv, jnp.full((1,), f, jnp.int32)])
            nb_s = inv_pad[nb[perm]]
            w_s = w[perm]
            nb2, w2, pp = _pad_edges(nb_s, w_s, f, args.fine_block)
            cdist_pad = jnp.concatenate(
                [cdist[:c_cap], jnp.full((1, q), INF, jnp.float32)])
            p2c_s = jnp.where(p2c[perm] < c_cap, p2c[perm], c_cap)
            d0 = cdist_pad[p2c_s] + to_rep[perm][:, None]
            d0 = jnp.where(d0 < INF * 0.5, d0, INF)
            d0 = jnp.pad(d0, ((0, pp - f + 1), (0, 0)), constant_values=INF)
            cols = jnp.arange(q, dtype=jnp.int32)
            safe = jnp.clip(seeds[0], 0, f - 1)
            ss = jnp.where(seed_mask[0], inv[safe], pp)
            d0 = d0.at[ss, cols].min(0.0)
            return _block_sweeps(nb2, w2, d0, args.fine_sweeps, args.fine_block)

        timed(fine, cdist, nbr, nbr_d, pts, mask, seeds, seed_mask, p2c, to_rep,
              label=f"fine prolong+{args.fine_sweeps}sw@k{args.fine_k}b{args.fine_block}")

    if "hier" in want:
        @jax.jit
        def hier(nbr, nbr_d, seeds, seed_mask, mask, pts):
            return geodesic_distance_hier(
                nbr, nbr_d, seeds, seed_mask, mask, args.radius, args.steps,
                pts, fine_sweeps=args.fine_sweeps, cell_factor=args.cell_factor,
                k_sub=args.k_sub, fine_k=args.fine_k or None,
                coarse_eps=args.coarse_eps,
                fine_block=args.fine_block or None,
            )

        timed(hier, nbr, nbr_d, seeds, seed_mask, mask, pts, label="hier solve (full)")


if __name__ == "__main__":
    main()
