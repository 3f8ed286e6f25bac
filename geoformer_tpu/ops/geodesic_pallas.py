"""Blocked geodesic relaxation: Pallas block-local rounds + XLA global rounds.

The XLA relaxation (ops/geodesic.py) re-reads the [P, Q] distance table from
HBM for every edge slab of every round. Points are voxel-key sorted, so most
kNN edges stay within a contiguous block of rows; this kernel exploits that:

  outer (XLA while_loop, until converged):
    1. one global gather round over all edges   (cross-block propagation)
    2. Pallas block pass: each P-block loads its dist rows + edge table into
       VMEM and runs T relaxation rounds over *intra-block* edges with zero
       HBM traffic (inner Gauss-Seidel over slabs)

Fixpoint identical to plain relaxation: cross-block edges are applied by the
global rounds, intra-block shortcuts by the block rounds; the while_loop
runs until nothing changes (or the step cap).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from geoformer_tpu.ops.geodesic import INF, symmetrize_graph

_BIG = 3e38


def _block_relax_kernel(nb_ref, w_ref, dist_ref, out_ref, *, rounds, slab):
    """One P-block. nb [Pb,K2] i32 (global indices), w [Pb,K2] f32,
    dist [Pb,Q] f32 -> out [Pb,Q]."""
    pb = nb_ref.shape[0]
    k2 = nb_ref.shape[1]
    block_start = pl.program_id(0) * pb

    li = nb_ref[:] - block_start  # local index
    in_block = (li >= 0) & (li < pb) & (w_ref[:] < _BIG)
    li = jnp.where(in_block, li, 0)
    w = jnp.where(in_block, w_ref[:], _BIG)

    n_slabs = k2 // slab
    d0 = dist_ref[:]

    def one_round(_, d):
        def slab_step(si, d):
            idx = jax.lax.dynamic_slice(li, (0, si * slab), (pb, slab))  # [Pb,S]
            wk = jax.lax.dynamic_slice(w, (0, si * slab), (pb, slab))
            gathered = jnp.take(d, idx.reshape(-1), axis=0).reshape(
                pb, slab, d.shape[-1]
            )
            cand = jnp.min(gathered + wk[..., None], axis=1)
            return jnp.minimum(d, cand)

        return jax.lax.fori_loop(0, n_slabs, slab_step, d)

    out_ref[:] = jax.lax.fori_loop(0, rounds, one_round, d0)


def block_relax(nb2, w2, dist, block_size=2048, rounds=8, slab=8, interpret=False):
    """dist [P, Q] f32 (INF = unreached), nb2/w2 [P, K2] -> relaxed dist.

    P must be padded to a multiple of block_size and Q to the lane width by
    the caller (geodesic_distance_blocked handles this).
    """
    p, q = dist.shape
    k2 = nb2.shape[1]
    assert p % block_size == 0 and k2 % slab == 0
    n_blocks = p // block_size
    return pl.pallas_call(
        functools.partial(_block_relax_kernel, rounds=rounds, slab=slab),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((block_size, k2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_size, k2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_size, q), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_size, q), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p, q), jnp.float32),
        interpret=interpret,
    )(nb2, w2, dist)


def _geodesic_scene_blocked(nbr_idx, nbr_dist, seeds, seed_mask, point_mask,
                            radius, n_steps, block_size, inner_rounds, interpret):
    p, k = nbr_idx.shape
    q = seeds.shape[0]

    w = jnp.where(
        (nbr_dist <= radius) & (nbr_idx >= 0) & (nbr_idx < p) & point_mask[:, None],
        nbr_dist,
        INF,
    )
    nb = jnp.clip(nbr_idx, 0, p - 1)
    nb = jnp.where(w < INF, nb, p)
    nb2, w2 = symmetrize_graph(nb, w)

    # pad P to block multiple, Q to lane width, K2 to slab multiple
    slab = 8
    pad_p = (-p) % block_size
    pad_q = (-q) % 128
    pad_k = (-nb2.shape[1]) % slab
    nb2p = jnp.pad(nb2, ((0, pad_p), (0, pad_k)), constant_values=p)
    w2p = jnp.pad(w2, ((0, pad_p), (0, pad_k)), constant_values=INF)
    # dead edges point at row p which may now be a real padded row — they
    # carry INF weight so they can never win a min

    dist = jnp.full((p + 1, q), INF, jnp.float32)
    seed_cols = jnp.arange(q, dtype=jnp.int32)
    safe_seeds = jnp.where(seed_mask, jnp.clip(seeds, 0, p - 1), p)
    dist = dist.at[safe_seeds, seed_cols].min(0.0)

    n_slabs_g = nb2p.shape[1] // slab

    def global_round(d):
        def slab_step(si, d):
            idx = jax.lax.dynamic_slice(nb2p[:p], (0, si * slab), (p, slab))
            wk = jax.lax.dynamic_slice(w2p[:p], (0, si * slab), (p, slab))
            cand = jnp.min(d[idx] + wk[..., None], axis=1)
            return d.at[:p].set(jnp.minimum(d[:p], cand))

        return jax.lax.fori_loop(0, n_slabs_g, slab_step, d)

    def body(state):
        d, _, it = state
        prev = d
        d = global_round(d)
        # block-local pass on the padded [Pp, Qp] table
        dp = jnp.pad(d[:p], ((0, pad_p), (0, pad_q)), constant_values=_BIG)
        dp = block_relax(
            nb2p, w2p, dp, block_size=block_size, rounds=inner_rounds,
            slab=slab, interpret=interpret,
        )
        d = d.at[:p].set(dp[:p, :q])
        return d, jnp.any(d < prev), it + 1

    def cond(state):
        _, changed, it = state
        return changed & (it < n_steps)

    dist, _, _ = jax.lax.while_loop(cond, body, (dist, jnp.bool_(True), jnp.int32(0)))
    dist = dist[:p]
    reached = (dist < INF) & point_mask[:, None]
    return jnp.where(reached, dist, -1.0)


def geodesic_distance_blocked(nbr_idx, nbr_dist, seeds, seed_mask, point_mask,
                              radius, n_steps, block_size=2048, inner_rounds=8,
                              interpret=False):
    """Drop-in for ops.geodesic.geodesic_distance with Pallas block rounds.

    Same [B,P,Q] output/-1 semantics; converges to the same fixpoint (the
    while_loop covers any propagation the block pass can't see).
    """
    return jax.vmap(
        lambda ni, nd, s, sm, pm: _geodesic_scene_blocked(
            ni, nd, s, sm, pm, radius, n_steps, block_size, inner_rounds, interpret
        )
    )(nbr_idx, nbr_dist, seeds, seed_mask, point_mask)
