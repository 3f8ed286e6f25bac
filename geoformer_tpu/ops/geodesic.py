"""Geodesic distance field: masked multi-source shortest paths.

Replaces the reference's dynamic-shape frontier BFS
(model/geoformer/geodesic_utils.py:91-164, FAISS + per-step torch.unique).
That BFS approximates geodesics (first-visit distance, visited-dedup); we
compute *true* shortest paths on the same radius-gated kNN graph with a
fixed-shape relaxation:

    dist[p, q] = min(dist[p, q], min_k dist[nbr[p, k], q] + w[p, k])

laid out [P, Q] so the Q=128 query axis rides the TPU lane dimension.

The kNN table is **symmetrized once up front** (reverse edges bucketed by
destination with a single sort) so every relaxation round is gather-only —
no scatter-min, which serializes on colliding indices on TPU. Rounds run
Gauss-Seidel over edge slots (each slot's update is visible to the next),
under a `while_loop` that exits as soon as a round changes nothing — the
shape-static analog of the reference's frontier-empty termination.
Unreached points keep -1, the sentinel both the decoder
(geoformer.py:630-641) and the mask head (geoformer.py:296-311) rely on.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

INF = 3e38  # python float: a module-level jnp scalar is a device array that
# re-stages through the device link on every call (~180ms tunnel RTT)


def symmetrize_graph(nbr_idx: jax.Array, w: jax.Array, rev_slots: int | None = None):
    """Append reverse edges to a forward kNN table.

    nbr_idx [P,K] int32 (dead edges -> P), w [P,K] f32 (dead -> INF) ->
    (nbr2 [P,K+R], w2 [P,K+R]). Reverse edges are grouped by destination via
    one argsort; destinations with more than R in-edges drop the overflow
    (those edges still exist in the forward direction, so connectivity is
    preserved — only a relaxation shortcut is lost).
    """
    p, k = nbr_idx.shape
    r = rev_slots or k
    dst = nbr_idx.reshape(-1)
    src = jnp.repeat(jnp.arange(p, dtype=jnp.int32), k)
    wf = w.reshape(-1)
    dst = jnp.where(wf < INF, dst, p)

    order = jnp.argsort(dst)
    sdst = dst[order]
    ssrc = src[order]
    sw = wf[order]
    # within-destination rank (sdst sorted: rank = position - segment start)
    starts = jnp.searchsorted(sdst, jnp.arange(p + 1, dtype=jnp.int32))
    rank = jnp.arange(p * k, dtype=jnp.int32) - starts[jnp.minimum(sdst, p)]

    ok = (sdst < p) & (rank < r)
    slot = jnp.where(ok, sdst * r + rank, p * r)
    rev_i = jnp.full((p * r + 1,), p, jnp.int32).at[slot].set(
        jnp.where(ok, ssrc, p), unique_indices=True, mode="promise_in_bounds"
    )[: p * r].reshape(p, r)
    rev_w = jnp.full((p * r + 1,), INF, jnp.float32).at[slot].set(
        jnp.where(ok, sw, INF), unique_indices=True, mode="promise_in_bounds"
    )[: p * r].reshape(p, r)

    return (
        jnp.concatenate([nbr_idx, rev_i], axis=1),
        jnp.concatenate([w, rev_w], axis=1),
    )


def _invert_perm(perm: jax.Array) -> jax.Array:
    """Inverse of a permutation via unique-index scatter instead of a
    second argsort (~4 ms amortized at 32k on v5e)."""
    n = perm.shape[0]
    return (
        jnp.zeros((n,), jnp.int32)
        .at[perm]
        .set(jnp.arange(n, dtype=jnp.int32), unique_indices=True,
             mode="promise_in_bounds")
    )


def _spatial_order(positions, point_mask, radius):
    """Permutation sorting points along the packed (z,y,x) cell key at
    `radius` resolution — the sweep order for fast-sweeping relaxation."""
    big = jnp.float32(1e9)
    origin = jnp.min(jnp.where(point_mask[:, None], positions, big), axis=0)
    cells = jnp.clip(
        jnp.floor((positions - origin) / radius).astype(jnp.int32), 0, 1023
    )
    key = (cells[:, 2] * 1024 + cells[:, 1]) * 1024 + cells[:, 0]
    key = jnp.where(point_mask, key, jnp.int32(2**30))
    return jnp.argsort(key).astype(jnp.int32)


def _geodesic_scene(nbr_idx, nbr_dist, seeds, seed_mask, point_mask, radius, n_steps,
                    rev_slots=None, symmetrize=True, positions=None,
                    block_size=512, relax_dtype=None):
    p, k = nbr_idx.shape
    q = seeds.shape[0]

    w = jnp.where(
        (nbr_dist <= radius) & (nbr_idx >= 0) & (nbr_idx < p) & point_mask[:, None],
        nbr_dist,
        INF,
    )  # [P,K] edge weights; radius-gated like the reference, dead for pad points
    nb = jnp.clip(nbr_idx, 0, p - 1)
    nb = jnp.where(w < INF, nb, p)  # dead edges point at the pad row
    if symmetrize:
        nb2, w2 = symmetrize_graph(nb, w, rev_slots)
    else:
        # a K-nearest-within-radius graph is symmetric whenever the K cap
        # doesn't bind (b in N_r(a) <=> a in N_r(b)); callers building the
        # graph with ops/radius_graph.py can skip the reverse table and
        # halve the per-round gather traffic
        nb2, w2 = nb, w
    k2 = nb2.shape[1]

    # ---- fast sweeping: reorder points along a spatial key so alternating
    # forward/backward block sweeps (Gauss-Seidel) propagate across the
    # whole scene per sweep — same fixpoint as Jacobi rounds, far fewer
    # iterations (the classic fast-sweeping trick for Eikonal problems) ----
    if positions is not None:
        perm = _spatial_order(positions, point_mask, max(radius, 1e-4) * 4)
    else:
        perm = jnp.arange(p, dtype=jnp.int32)
    inv = _invert_perm(perm)  # old index -> sorted position
    inv_pad = jnp.concatenate([inv, jnp.full((1,), p, jnp.int32)])
    nb2 = inv_pad[nb2[perm]]  # remap edges into sorted space
    w2 = w2[perm]

    pad_p = (-p) % block_size
    nb2 = jnp.pad(nb2, ((0, pad_p), (0, 0)), constant_values=p + pad_p)
    w2 = jnp.pad(w2, ((0, pad_p), (0, 0)), constant_values=INF)
    pp = p + pad_p
    nb2 = jnp.where(nb2 >= p, pp, nb2)  # pad sink moved to row pp
    n_blocks = pp // block_size

    # optional int16 fixed-point relaxation table (~1mm resolution, 32m
    # range): halves the gather traffic that dominates relaxation with no
    # wavefront stall (bf16 would: its eps at 4m exceeds a 2cm hop).
    # Per-hop rounding is to-nearest, so errors random-walk (~mm overall).
    quant = relax_dtype == jnp.int16
    RS = 1024.0  # units per meter (power of two)
    INF_I = jnp.int16(32767)
    if quant:
        dist = jnp.full((pp + 1, q), INF_I, jnp.int16)
    else:
        dist = jnp.full((pp + 1, q), INF, jnp.float32)
    seed_cols = jnp.arange(q, dtype=jnp.int32)
    safe_seeds = jnp.where(seed_mask, inv[jnp.clip(seeds, 0, p - 1)], pp)
    dist = dist.at[safe_seeds, seed_cols].min(
        jnp.asarray(0, dist.dtype)
    )

    slab = 8
    pad_slots = (-k2) % slab
    nb2 = jnp.pad(nb2, ((0, 0), (0, pad_slots)), constant_values=pp)
    w2 = jnp.pad(w2, ((0, 0), (0, pad_slots)), constant_values=INF)
    n_slabs = nb2.shape[1] // slab
    if quant:
        w2r = jnp.where(
            w2 < INF, jnp.round(w2 * RS), jnp.float32(32767.0)
        ).astype(jnp.int32)
    else:
        w2r = w2

    # slabs past the last live edge slot are all-dead (radius_knn packs real
    # edges first) — bound the slab loop dynamically on the live width
    slot_live = jnp.any(w2 < INF, axis=0)  # [k2+pad]
    last_live = jnp.max(
        jnp.where(slot_live, jnp.arange(slot_live.shape[0], dtype=jnp.int32), -1)
    )
    n_slabs_live = jnp.minimum((last_live + slab) // slab, n_slabs)

    def block_relax(b, d):
        """Relax all edges of block b against the current global dist."""
        base = b * block_size
        nb_b = jax.lax.dynamic_slice(nb2, (base, 0), (block_size, nb2.shape[1]))
        w_b = jax.lax.dynamic_slice(w2r, (base, 0), (block_size, w2r.shape[1]))
        dblk = jax.lax.dynamic_slice(d, (base, 0), (block_size, q))

        def slab_step(si, dacc):
            idx = jax.lax.dynamic_slice(nb_b, (0, si * slab), (block_size, slab))
            wk = jax.lax.dynamic_slice(w_b, (0, si * slab), (block_size, slab))
            if quant:
                # widen to int32 for the add, clip back to the int16 INF
                cand32 = d[idx].astype(jnp.int32) + wk[..., None]
                cand = jnp.minimum(jnp.min(cand32, axis=1), 32767).astype(jnp.int16)
            else:
                cand = jnp.min(d[idx] + wk[..., None], axis=1)
            return jnp.minimum(dacc, cand)

        dblk = jax.lax.fori_loop(0, n_slabs_live, slab_step, dblk)
        return jax.lax.dynamic_update_slice(d, dblk, (base, 0))

    def one_pass(state):
        dist, _, it = state
        prev = dist
        # forward sweep then backward sweep
        dist = jax.lax.fori_loop(0, n_blocks, block_relax, dist)
        dist = jax.lax.fori_loop(
            0, n_blocks, lambda i, d: block_relax(n_blocks - 1 - i, d), dist
        )
        changed = jnp.any(dist < prev)
        return dist, changed, it + 2

    def cond(state):
        _, changed, it = state
        return changed & (it < n_steps)

    dist, _, _ = jax.lax.while_loop(cond, one_pass, (dist, jnp.bool_(True), jnp.int32(0)))
    dist = dist[inv]  # back to original point order
    if quant:
        reached = (dist < INF_I) & point_mask[:, None]
        return jnp.where(reached, dist.astype(jnp.float32) / RS, -1.0)
    reached = (dist < INF * 0.5) & point_mask[:, None]
    return jnp.where(reached, dist.astype(jnp.float32), -1.0)


def _prep_edges(nbr_idx, nbr_dist, point_mask, radius):
    """Gate the kNN table to live radius edges: idx sink -> P, weight -> INF."""
    p = nbr_idx.shape[0]
    w = jnp.where(
        (nbr_dist <= radius) & (nbr_idx >= 0) & (nbr_idx < p) & point_mask[:, None],
        nbr_dist,
        INF,
    )
    nb = jnp.clip(nbr_idx, 0, p - 1)
    nb = jnp.where(w < INF, nb, p)
    return nb, w


def _block_sweeps(nb2, w2, dist, n_steps, block_size, early_exit=True,
                  n_live=None, return_iters=False):
    """Alternating forward/backward Gauss-Seidel block sweeps over a padded
    sorted edge table. nb2/w2 [PP, K2] (sink row = PP, slabs of 8 padded),
    dist [PP+1, Q] f32. Runs until fixpoint or n_steps sweeps.

    n_live (traced scalar) bounds the sweeps to the first n_live rows:
    valid nodes are packed first everywhere this is used, so rows past
    n_live are pad (sink edges, INF weights) and sweeping them is a no-op
    — the coarse cell capacity is sized for worst-case scenes (~3x typical
    occupancy) and the skipped blocks are pure gather waste."""
    pp = nb2.shape[0]
    q = dist.shape[1]
    n_blocks = pp // block_size
    if n_live is not None:
        n_blocks = jnp.minimum(
            (n_live + block_size - 1) // block_size, n_blocks
        ).astype(jnp.int32)
    slab = 8
    n_slabs = nb2.shape[1] // slab
    slot_live = jnp.any(w2 < INF, axis=0)
    last_live = jnp.max(
        jnp.where(slot_live, jnp.arange(slot_live.shape[0], dtype=jnp.int32), -1)
    )
    n_slabs_live = jnp.minimum((last_live + slab) // slab, n_slabs)

    def block_relax(b, d):
        base = b * block_size
        nb_b = jax.lax.dynamic_slice(nb2, (base, 0), (block_size, nb2.shape[1]))
        w_b = jax.lax.dynamic_slice(w2, (base, 0), (block_size, w2.shape[1]))
        dblk = jax.lax.dynamic_slice(d, (base, 0), (block_size, q))

        def slab_step(si, dacc):
            idx = jax.lax.dynamic_slice(nb_b, (0, si * slab), (block_size, slab))
            wk = jax.lax.dynamic_slice(w_b, (0, si * slab), (block_size, slab))
            cand = jnp.min(d[idx] + wk[..., None], axis=1)
            return jnp.minimum(dacc, cand)

        dblk = jax.lax.fori_loop(0, n_slabs_live, slab_step, dblk)
        return jax.lax.dynamic_update_slice(d, dblk, (base, 0))

    def pass_pair(d):
        d = jax.lax.fori_loop(0, n_blocks, block_relax, d)
        return jax.lax.fori_loop(
            0, n_blocks, lambda i, dd: block_relax(n_blocks - 1 - i, dd), d
        )

    # NOTE: always the while_loop form, even for a fixed sweep budget —
    # the identical pass body measured 3x slower per sweep under a
    # fori_loop on v5e (XLA buffer scheduling), and the convergence
    # compare costs ~0.2 ms/pass while enabling early exit.
    del early_exit

    def one_pass(state):
        d, _, it = state
        prev = d
        d = pass_pair(d)
        return d, jnp.any(d < prev), it + 2

    def cond(state):
        _, changed, it = state
        return changed & (it < n_steps)

    dist, _, iters = jax.lax.while_loop(
        cond, one_pass, (dist, jnp.bool_(True), jnp.int32(0))
    )
    if return_iters:
        return dist, iters
    return dist


def _pad_edges(nb, w, p, block_size, slab=8):
    """Pad [P,K] edge tables to block/slab multiples; sink row P -> PP."""
    pad_p = (-p) % block_size
    pp = p + pad_p
    nb = jnp.pad(nb, ((0, pad_p), (0, 0)), constant_values=pp)
    w = jnp.pad(w, ((0, pad_p), (0, 0)), constant_values=INF)
    nb = jnp.where(nb >= p, pp, nb)
    pad_slots = (-nb.shape[1]) % slab
    nb = jnp.pad(nb, ((0, 0), (0, pad_slots)), constant_values=pp)
    w = jnp.pad(w, ((0, 0), (0, pad_slots)), constant_values=INF)
    return nb, w, pp


def _coarse_contract(positions, point_mask, nb, w, cell, c_cap, kc, k_sub):
    """Contract the fine radius graph onto `cell`-sized voxel cells.

    Coarse nodes are occupied cells, represented by their first member point
    (so coarse distances are real graph-node distances). A coarse edge
    (a, b) exists only where a *fine* edge crosses the two cells — walls and
    gaps in the fine graph stay walls in the coarse graph (building cell
    adjacency from cell proximity instead would bridge thin walls and leak
    the geodesic field through them). Edge weight = fine edge + euclidean
    point->rep corrections (locally-flat intra-cell approximation).

    Returns (p2c [P] cell slot (c_cap = pad), rep [C] fine index of each
    cell's representative, to_rep [P] euclid point->rep, cnb [C,kc],
    cw [C,kc], cmask [C]).
    """
    from geoformer_tpu.ops.voxelize import _voxelize_scene

    p = positions.shape[0]
    big = 1e9
    origin = jnp.min(jnp.where(point_mask[:, None], positions, big), axis=0)
    cells = jnp.clip(jnp.floor((positions - origin) / cell).astype(jnp.int32), 0, 1023)
    p2c, ccoords, _, cmask, _, _, order, starts, _, _ = _voxelize_scene(
        cells, point_mask, c_cap, 1024
    )

    rep = order[jnp.minimum(starts[:c_cap], p - 1)]
    rep = jnp.where(cmask, rep, p)
    pos_pad = jnp.concatenate([positions, jnp.zeros((1, 3), positions.dtype)])
    rep_pos = pos_pad[rep]
    p2c_pad = jnp.concatenate([p2c, jnp.full((1,), c_cap, jnp.int32)])
    rep_of_point = jnp.where(p2c < c_cap, rep[jnp.minimum(p2c, c_cap - 1)], p)
    to_rep = jnp.linalg.norm(positions - pos_pad[rep_of_point], axis=-1)
    to_rep = jnp.where(point_mask & (rep_of_point < p), to_rep, 0.0)
    to_rep_pad = jnp.concatenate([to_rep, jnp.zeros((1,), to_rep.dtype)])

    # fine edges (first k_sub slots: nearest-first packing) -> cell pairs.
    # Weight = euclidean rep-to-rep: cells joined by a fine edge are
    # adjacent at `cell` scale, where surfaces are locally flat, so the
    # rep->rep geodesic ~ euclid; summing (rep->fine->fine->rep) instead
    # would detour via both reps at every hop and inflate long paths ~50%.
    # Single-operand key sort: the edge (ci, cj) IS the packed key, so the
    # payloads never ride the sort — cj is recovered arithmetically from
    # the sorted key, and the weights are computed AFTER the kc-cap dedup
    # on the [C, kc] table (524k rep-row gathers instead of 2M payload
    # gathers + a 2M argsort index). Measured: contract 195 -> ~110 ms at
    # fg=131072 (tools/geo_bisect.py contract_parts).
    nbs = nb[:, :k_sub]
    ws = w[:, :k_sub]
    ci = jnp.broadcast_to(p2c[:, None], nbs.shape)
    cj = p2c_pad[nbs]
    live = (ws < INF) & (ci != cj) & (ci < c_cap) & (cj < c_cap)
    sent = jnp.int32((c_cap + 1) * c_cap + c_cap)
    skey_s = jnp.sort(jnp.where(live, ci * (c_cap + 1) + cj, sent).reshape(-1))

    n_e = skey_s.shape[0]
    prev = jnp.concatenate([jnp.full((1,), -1, skey_s.dtype), skey_s[:-1]])
    head = (skey_s != prev) & (skey_s < sent)
    hexc = jnp.cumsum(head.astype(jnp.int32)) - head.astype(jnp.int32)  # exclusive
    ci_starts = jnp.searchsorted(
        skey_s, jnp.arange(c_cap, dtype=jnp.int32) * (c_cap + 1)
    ).astype(jnp.int32)
    hexc_pad = jnp.concatenate([hexc, jnp.zeros((1,), jnp.int32)])
    ci_s = jnp.minimum(skey_s // (c_cap + 1), c_cap - 1)
    cj_s = skey_s - ci_s * (c_cap + 1)  # exact where skey_s < sent
    rank = hexc + head.astype(jnp.int32) - 1 - hexc_pad[jnp.minimum(ci_starts[ci_s], n_e)]
    ok = head & (rank < kc)
    slot = jnp.where(ok, ci_s * kc + rank, c_cap * kc)
    cnb = jnp.full((c_cap * kc + 1,), c_cap, jnp.int32).at[slot].set(
        jnp.where(ok, cj_s, c_cap), unique_indices=True, mode="promise_in_bounds"
    )[: c_cap * kc].reshape(c_cap, kc)
    # weights on the deduped table: euclid rep(ci) -> rep(cnb[ci, slot])
    rep_pos_pad = jnp.concatenate([rep_pos, jnp.zeros((1, 3), rep_pos.dtype)])
    cw = jnp.linalg.norm(
        rep_pos[:, None, :] - rep_pos_pad[jnp.minimum(cnb, c_cap)], axis=-1
    )
    cw = jnp.where(cnb < c_cap, cw, INF)
    return p2c, rep, rep_pos, to_rep, cnb, cw, cmask, ccoords


def _fast_sweep_orders(ccoords, cmask, cnb, cw, c_cap, cblock, dist, n_steps,
                       n_live, return_iters=False, eps=0.0):
    """Coarse fixpoint via fast sweeping over 4 alternating lexicographic
    orderings (each run as a forward+backward pass-pair, covering all 8
    directional sign combinations). A single zyx ordering needs ~O(number
    of direction reversals along the longest shortest-path) pass-pairs to
    converge (measured 156 sweeps on a room scan); cycling the 4 orderings
    converges in a few cycles — the classic fast-sweeping result.

    ccoords [C,3] int cell coords (x,y,z; garbage at pads), cnb/cw [C,kc]
    slot-space edge tables (sink = c_cap), dist [CPP+1, Q] seeded in slot
    space. n_steps caps TOTAL sweeps (a cycle is 8).
    """
    S = 1024
    x, y, z = ccoords[..., 0], ccoords[..., 1], ccoords[..., 2]
    sent = jnp.int32(S * S * S)

    # slot space is already (z,y,x)-ascending (voxelize key order), so
    # ordering 0 is the identity; build the 3 flipped orderings
    tables = [None]
    cross = []  # cross[i]: row map taking dist from ordering i to i+1 (mod 4)
    perms = [jnp.arange(c_cap, dtype=jnp.int32)]
    invs = [jnp.arange(c_cap, dtype=jnp.int32)]
    for fz, fy in ((1, 0), (0, 1), (1, 1)):
        zz = (S - 1 - z) if fz else z
        yy = (S - 1 - y) if fy else y
        key = jnp.where(cmask, (zz * S + yy) * S + x, sent)
        perm = jnp.argsort(key).astype(jnp.int32)
        perms.append(perm)
        invs.append(_invert_perm(perm))
    nb2_0, cw2_0, cpp = _pad_edges(cnb, cw, c_cap, cblock)
    tables[0] = (nb2_0, cw2_0)
    for o in range(1, 4):
        inv_pad = jnp.concatenate([invs[o], jnp.full((1,), c_cap, jnp.int32)])
        nb_o = inv_pad[jnp.minimum(cnb, c_cap)[perms[o]]]
        nb_o = jnp.where(cnb[perms[o]] >= c_cap, c_cap, nb_o)
        tables.append(_pad_edges(nb_o, cw[perms[o]], c_cap, cblock)[:2])
    for o in range(4):
        nxt = (o + 1) % 4
        cm = invs[o][perms[nxt]]  # [C] rows of ordering nxt in ordering o
        cross.append(jnp.concatenate(
            [cm, jnp.full((cpp + 1 - c_cap,), cpp, jnp.int32)]
        ))

    def permute(d, cm):
        d_pad = d  # row cpp is the INF sink in every ordering
        return d_pad[cm]

    def one_cycle(state):
        d, _, it = state
        prev = d
        for o in range(4):
            nb2, w2 = tables[o]
            d = _block_sweeps(nb2, w2, d, 2, cblock, n_live=n_live)
            d = permute(d, cross[o])
        # eps > 0: stop once no cell improved by more than eps (meters) in a
        # full 8-sweep cycle — the exact-fixpoint tail spends cycles
        # shaving sub-mm amounts off far-field values the fine sweeps
        # re-smooth anyway; eps=0 keeps the exact d < prev semantics
        return d, jnp.any(prev - d > eps), it + 8

    def cond(state):
        _, changed, it = state
        return changed & (it < n_steps)

    dist, _, iters = jax.lax.while_loop(
        cond, one_cycle, (dist, jnp.bool_(True), jnp.int32(0))
    )
    if return_iters:
        return dist, iters
    return dist


def _hier_scene(nbr_idx, nbr_dist, seeds, seed_mask, point_mask, radius,
                positions, n_steps, fine_sweeps=6, cell_factor=2.0,
                c_cap=None, kc=32, k_sub=16, block_size=512, fine_k=None,
                coarse_eps=0.0, fine_block=None):
    """Two-level geodesic solve: coarse cell-graph fixpoint + prolongation +
    a fixed number of fine sweeps.

    The exact solver (_geodesic_scene) needs ~100 Gauss-Seidel sweeps on
    room scans — each a full pass over the [P,K] edge table gathering [Q]
    rows from HBM. Here the long-range propagation runs on a graph ~25x
    smaller (occupied `cell_factor * radius` cells), and the fine table only
    smooths local structure for `fine_sweeps` sweeps. The result is an
    approximation: coarse paths take euclidean intra-cell shortcuts, so
    values can deviate by O(cell) locally (the reference's own field is a
    capped first-visit BFS, geodesic_utils.py:91-164 — also approximate).
    The -1 unreached convention is preserved.
    """
    p, k = nbr_idx.shape
    q = seeds.shape[0]
    if c_cap is None:
        c_cap = max(512, p // 8)
    nb, w = _prep_edges(nbr_idx, nbr_dist, point_mask, radius)
    cell = max(radius, 1e-4) * cell_factor
    p2c, rep, rep_pos, to_rep, cnb, cw, cmask, ccoords = _coarse_contract(
        positions, point_mask, nb, w, cell, c_cap, kc, min(k_sub, k)
    )

    # ---- coarse solve: fast sweeping over 4 alternating orderings (slot
    # space is already zyx-sorted = ordering 0). Sweeps only the occupied
    # slot prefix (valid cells pack first in every ordering).
    cblock = min(block_size, max(c_cap // 8, 8))
    cpp = c_cap + ((-c_cap) % cblock)
    cdist = jnp.full((cpp + 1, q), INF, jnp.float32)
    seed_cols = jnp.arange(q, dtype=jnp.int32)
    safe = jnp.clip(seeds, 0, p - 1)
    seed_cell = jnp.where(seed_mask, p2c[safe], cpp)
    seed_cell = jnp.where(seed_cell >= c_cap, cpp, seed_cell)
    cdist = cdist.at[seed_cell, seed_cols].min(
        jnp.where(seed_mask, to_rep[safe], INF)
    )
    # coarse sweeps are ~100x cheaper than fine ones and the early exit
    # fires at the fixpoint, so give the cap a generous floor rather than
    # letting a fine-tuned n_steps truncate the long-range solve
    cdist = _fast_sweep_orders(
        ccoords, cmask, cnb, cw, c_cap, cblock, cdist, max(n_steps, 256),
        n_live=jnp.sum(cmask.astype(jnp.int32)), eps=coarse_eps,
    )

    # ---- prolong + fine smoothing sweeps (spatially sorted, fixed count).
    # The fine sweeps only smooth the coarse prolongation locally, so they
    # can run on the first fine_k (nearest — radius_knn packs ascending)
    # edge slots: at 2 cm scan density the 64-NN-within-5cm table is ~4x
    # redundant for local smoothing, and each dropped slot removes a full
    # [Q]-row gather per point per sweep (the prod-scale hot spot).
    if fine_k is not None and fine_k < nb.shape[1]:
        nb = nb[:, :fine_k]
        w = w[:, :fine_k]
    perm = _spatial_order(positions, point_mask, cell * 2)
    inv = _invert_perm(perm)
    inv_pad = jnp.concatenate([inv, jnp.full((1,), p, jnp.int32)])
    nb_s = inv_pad[nb[perm]]
    w_s = w[perm]
    # fine_block: solver-level override for measurement (tools/geo_bisect).
    # Measured a TIE on-chip at 512/2048/4096 (159.4/159.3/156.8 ms,
    # ONCHIP_SUITE_r4.log suite r4f): the fine stage is bound by its
    # [P,K,Q] edge-distance gathers (~2 GB/sweep at prod), not by the
    # sequential block dispatches, so no product knob ships for it.
    fb = fine_block or block_size
    nb2, w2, pp = _pad_edges(nb_s, w_s, p, fb)

    cdist_pad = jnp.concatenate([cdist[:c_cap], jnp.full((1, q), INF, jnp.float32)])
    p2c_sorted = jnp.where(p2c[perm] < c_cap, p2c[perm], c_cap)
    d0 = cdist_pad[p2c_sorted] + to_rep[perm][:, None]
    d0 = jnp.where(d0 < INF * 0.5, d0, INF)
    d0 = jnp.pad(d0, ((0, pp - p + 1), (0, 0)), constant_values=INF)
    safe_seeds = jnp.where(seed_mask, inv[safe], pp)
    d0 = d0.at[safe_seeds, seed_cols].min(0.0)
    dist = _block_sweeps(nb2, w2, d0, fine_sweeps, fb, early_exit=False)

    dist = dist[inv]
    reached = (dist < INF * 0.5) & point_mask[:, None]
    return jnp.where(reached, dist, -1.0)


def geodesic_distance_hier(nbr_idx, nbr_dist, seeds, seed_mask, point_mask, radius,
                           n_steps, positions, fine_sweeps=6, cell_factor=2.0,
                           kc=32, k_sub=16, fine_k=None, coarse_eps=0.0,
                           fine_block=None):
    """Batched two-level approximate geodesics (see _hier_scene).

    Same [B,P,Q] / -1 contract as geodesic_distance; `n_steps` bounds the
    coarse solve (it converges and early-exits long before room-scale caps).
    fine_k restricts the fine smoothing sweeps to the nearest fine_k edges
    (None = all). coarse_eps > 0 relaxes the coarse fixpoint exit to
    "no cell improved by more than eps meters in a cycle". fine_block
    overrides the fine-sweep block size (None = block_size default).
    """
    return jax.lax.map(
        lambda a: _hier_scene(
            a[0], a[1], a[2], a[3], a[4], radius, a[5], n_steps,
            fine_sweeps=fine_sweeps, cell_factor=cell_factor, kc=kc, k_sub=k_sub,
            fine_k=fine_k, coarse_eps=coarse_eps, fine_block=fine_block,
        ),
        (nbr_idx, nbr_dist, seeds, seed_mask, point_mask, positions),
    )


def geodesic_distance(nbr_idx, nbr_dist, seeds, seed_mask, point_mask, radius, n_steps,
                      rev_slots=None, symmetrize=True, positions=None,
                      relax_dtype=None):
    """Multi-source geodesics over a kNN graph.

    nbr_idx  [B,P,K] int32 neighbor indices (self column already dropped)
    nbr_dist [B,P,K] float32 *euclidean* (not squared) edge lengths
    seeds    [B,Q] int32 query point indices; seed_mask [B,Q] validity
    point_mask [B,P]
    -> geo_dist [B,P,Q] float32, -1 where unreached (reference convention;
       note the reference returns [Q,P] per scene — we keep P-major so Q sits
       on the lane axis).

    rev_slots caps the per-node reverse-edge bucket (default K). Nodes whose
    in-degree exceeds it lose the overflow shortcuts — negligible on dense
    scans (the reference's frontier BFS is itself approximate); pass
    rev_slots=P for the exact symmetric closure on small graphs.
    """
    # lax.map, not vmap: the batched while/fori + dynamic slices of a
    # vmapped body lower ~2.6x slower even at B=1 (batched DUS becomes
    # scatter); the sequential unbatched body keeps the fast lowering
    if positions is None:
        return jax.lax.map(
            lambda a: _geodesic_scene(
                a[0], a[1], a[2], a[3], a[4], radius, n_steps, rev_slots,
                symmetrize, relax_dtype=relax_dtype,
            ),
            (nbr_idx, nbr_dist, seeds, seed_mask, point_mask),
        )
    return jax.lax.map(
        lambda a: _geodesic_scene(
            a[0], a[1], a[2], a[3], a[4], radius, n_steps, rev_slots,
            symmetrize, a[5], relax_dtype=relax_dtype,
        ),
        (nbr_idx, nbr_dist, seeds, seed_mask, point_mask, positions),
    )
