"""k-smallest selection for the radius-kNN build as a Pallas TPU kernel.

`lax.top_k` over the [P, 27*cell_cap] candidate distance table lowers to a
full per-row variadic SORT — measured 91.9 ms at [131072, 648] k=16 on
v5e (ONCHIP_SUITE_r4 r4n knn_parts), the single biggest kNN build stage,
~200x the HBM roofline of the ~340 MB it reads. The k-argmin-pass XLA
formulation (radius_graph.select_min_k) re-reads the table from HBM every
pass and measured 295 ms. This kernel reads each row block from HBM ONCE,
keeps it VMEM-resident, and runs the k extraction passes on the VPU:
min -> first-attaining lane -> mask, emitting both the distance and the
candidate id (gathered in-kernel, which also removes the caller's [P, k]
take_along_axis over the candidate table).

Tie order matches lax.top_k (lowest lane first among equals); the
exhausted-row divergence (fewer than k finite lanes -> repeated _BIG
picks) is the same sanctioned one select_min_k documents — both die at
the caller's `d2k < _BIG` validity gate. Pinned bit-identical vs the
lax.top_k path in tests/test_radius_graph.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e30  # matches radius_graph._BIG (dead-candidate sentinel)
_LANES = 128


def _select_kernel(d2_ref, cand_ref, vals_ref, idx_ref, *, k):
    v = d2_ref[:]  # [R, W] f32, VMEM-resident across all k passes
    c = cand_ref[:]  # [R, W] i32
    lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    w = v.shape[1]
    vcols, icols = [], []
    for _ in range(k):
        m = jnp.min(v, axis=1, keepdims=True)  # [R,1]
        # first lane attaining the min (lax.top_k tie order)
        j = jnp.min(jnp.where(v == m, lane, w), axis=1, keepdims=True)
        pick = lane == j
        vcols.append(m)
        icols.append(jnp.sum(jnp.where(pick, c, 0), axis=1, keepdims=True))
        v = jnp.where(pick, _BIG, v)
    vals_ref[:] = jnp.concatenate(vcols, axis=1)
    idx_ref[:] = jnp.concatenate(icols, axis=1)


@functools.partial(jax.jit, static_argnames=("k", "block_rows", "interpret"))
def select_min_k_cand(d2: jax.Array, cand: jax.Array, k: int,
                      block_rows: int = 256, interpret: bool = False):
    """d2 [N, W] f32 (dead lanes = _BIG), cand [N, W] i32 ->
    (vals [N, k] f32 ascending, idx [N, k] i32 candidate ids at the picked
    lanes). Exact; tie order identical to lax.top_k."""
    n, w = d2.shape
    wp = w + ((-w) % _LANES)
    npad = (-n) % block_rows
    if wp != w:
        d2 = jnp.pad(d2, ((0, 0), (0, wp - w)), constant_values=_BIG)
        cand = jnp.pad(cand, ((0, 0), (0, wp - w)))
    if npad:
        d2 = jnp.pad(d2, ((0, npad), (0, 0)), constant_values=_BIG)
        cand = jnp.pad(cand, ((0, npad), (0, 0)))
    grid = (n + npad) // block_rows

    kernel = functools.partial(_select_kernel, k=k)
    vals, idx = pl.pallas_call(
        kernel,
        grid=(grid,),
        out_shape=(
            jax.ShapeDtypeStruct((n + npad, k), jnp.float32),
            jax.ShapeDtypeStruct((n + npad, k), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec((block_rows, wp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, wp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_rows, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(d2, cand)
    return vals[:n], idx[:n]
