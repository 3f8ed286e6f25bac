"""Furthest point sampling as a single Pallas TPU kernel.

The XLA formulation (ops/fps.py) runs n_samples sequential fori_loop steps,
each a separate fused kernel that re-reads the [P,3] points from HBM —
~n_samples kernel dispatches + n_samples*P*16B of HBM traffic. Here the
whole loop lives in one kernel with points and the running min-distance
array resident in VMEM (P=65k -> ~1MB), so each pick is a few VPU passes
with zero HBM traffic.

Semantics identical to ops/fps.py:_fps_scene (seed = index 0, CUDA FPS
contract, lib/pointnet2/_ext_src/src/sampling_gpu.cu:72-232): ties broken
by lowest index, invalid points never picked (unless a scene has zero valid
points, in which case index 0 repeats).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_BIG = 1e10  # python float: jnp scalars would be captured consts in the kernel


def _fps_kernel(x_ref, y_ref, z_ref, mask_ref, out_ref, dist_ref, *, n_samples, rows):
    """Refs: x/y/z [rows,128] f32, mask [rows,128] f32 (1/0),
    out [n_samples,1] i32, dist scratch [rows,128] f32."""
    mask = mask_ref[:]
    valid = mask > 0.5
    dist_ref[:] = jnp.where(valid, _BIG, -1.0)
    out_ref[0:1, 0:1] = jnp.zeros((1, 1), jnp.int32)  # scalar VMEM stores don't lower

    flat_id = (
        jax.lax.broadcasted_iota(jnp.int32, (rows, _LANES), 0) * _LANES
        + jax.lax.broadcasted_iota(jnp.int32, (rows, _LANES), 1)
    )
    big_id = jnp.int32(rows * _LANES)

    def body(i, last):
        # pick the last point's coords via masked reductions (scalar VMEM
        # loads don't reliably lower in Mosaic)
        sel = flat_id == last
        xs = jnp.sum(jnp.where(sel, x_ref[:], 0.0))
        ys = jnp.sum(jnp.where(sel, y_ref[:], 0.0))
        zs = jnp.sum(jnp.where(sel, z_ref[:], 0.0))
        dx = x_ref[:] - xs
        dy = y_ref[:] - ys
        dz = z_ref[:] - zs
        d = dx * dx + dy * dy + dz * dz
        nd = jnp.where(valid, jnp.minimum(dist_ref[:], d), -1.0)
        dist_ref[:] = nd
        m = jnp.max(nd)
        # lowest flat index attaining the max (stable argmax)
        nxt = jnp.min(jnp.where(nd >= m, flat_id, big_id))
        nxt = jnp.minimum(nxt, big_id - 1).astype(jnp.int32)
        out_ref[pl.ds(i, 1), 0:1] = jnp.reshape(nxt, (1, 1))
        return nxt

    jax.lax.fori_loop(1, n_samples, body, jnp.int32(0))


@functools.partial(jax.jit, static_argnames=("n_samples", "interpret"))
def fps_pallas_scene(points: jax.Array, mask: jax.Array, n_samples: int,
                     interpret: bool = False):
    """points [P,3] f32, mask [P] bool -> idx [n_samples] i32."""
    p = points.shape[0]
    pad = (-p) % _LANES
    pts = jnp.pad(points, ((0, pad), (0, 0)))
    msk = jnp.pad(mask, (0, pad)).astype(jnp.float32)
    rows = (p + pad) // _LANES
    x = pts[:, 0].reshape(rows, _LANES)
    y = pts[:, 1].reshape(rows, _LANES)
    z = pts[:, 2].reshape(rows, _LANES)
    m2 = msk.reshape(rows, _LANES)

    out = pl.pallas_call(
        functools.partial(_fps_kernel, n_samples=n_samples, rows=rows),
        out_shape=jax.ShapeDtypeStruct((n_samples, 1), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((rows, _LANES), jnp.float32)],
        interpret=interpret,
    )(x, y, z, m2)
    return out[:, 0]


def fps_pallas(points: jax.Array, mask: jax.Array, n_samples: int,
               interpret: bool = False):
    """Batched [B,P,3]/[B,P] -> (idx [B,n_samples], valid [B,n_samples])."""
    idx = jax.vmap(lambda pt, m: fps_pallas_scene(pt, m, n_samples, interpret))(
        points, mask
    )
    n_valid = jnp.sum(mask.astype(jnp.int32), axis=-1)
    sample_mask = jnp.arange(n_samples)[None, :] < jnp.minimum(n_valid, n_samples)[:, None]
    return idx, sample_mask
