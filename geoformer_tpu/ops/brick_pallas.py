"""Banded Pallas kernel for the dense-brick submanifold conv.

XLA runs the [NB,10,10,10,C] brick conv (ops/brick.py dense_subm_conv) at
~9.6 ms/conv at prod scale — ~8x the HBM roofline (BASELINE.md r3): at the
backbone's small channel counts (m=16 -> C in 16..112) the conv lowering
materializes patch/relayout intermediates in HBM and underfills the MXU
(N=C lanes of 128). This kernel removes both costs at once:

- the halo-padded block lives in VMEM for all taps — the padded tensor is
  read from HBM exactly once per conv;
- the brick x axis folds into the LANE dimension ([bn,10,10,10C] view) and
  all three x-taps run as ONE matmul against a block-banded weight
  wb[(dz,dy)] of shape [10*Cin, 8*Cout]: K=10C, N=8C >= 128 at C >= 16 —
  full MXU tiles at every backbone width. The band's zero blocks cost
  ~3.3x the sparse-ideal FLOPs, which the now-unstarved MXU absorbs.

This is the round-3 "banded" formulation that measured ZERO win as an XLA
rewrite (the chain stayed HBM/overhead-bound, DESIGN.md) — moved to where
it actually pays: inside a VMEM-resident kernel.

Semantics: identical to dense_subm_conv's conv step (VALID 3^3 conv over
the halo-padded brick, subm weight layout w[27,Cin,Cout], offset index
(dz+1)*9+(dy+1)*3+(dx+1) — reference spconv 1.0 SubMConv3d,
model/geoformer_modules.py:10-129). Occupancy masking and halo padding
stay with the caller (ops/brick.py). Output is f32 (the kernel accumulates
f32; callers cast to the level residency dtype).

Falls back to the XLA conv when the banded weight would not fit VMEM
(wb = 9*10C*8C', deep-level channel counts) — those levels hold few bricks
and are cheap either way.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# selection tensor: sel[kx, r, x] = 1 iff padded-x row-block r feeds output
# x-block x under tap kx (r = x + kx; kx in 0..2 means dx = kx-1)
_SEL = np.zeros((3, 10, 8), np.float32)
for _kx in range(3):
    for _x in range(8):
        _SEL[_kx, _x + _kx, _x] = 1.0


def build_banded_weight(w: jax.Array) -> jax.Array:
    """w [27, Cin, Cout] (subm layout) -> wb [9, 10*Cin, 8*Cout].

    wb[kz*3+ky] maps a padded x-row [10*Cin] to all 8 output x-blocks at
    once: row-block r=x+kx, col-block x holds w[(kz,ky,kx)]."""
    cin, cout = w.shape[1], w.shape[2]
    w3 = w.reshape(3, 3, 3, cin, cout)  # [kz, ky, kx, i, o]
    sel = jnp.asarray(_SEL, w.dtype)
    wb = jnp.einsum("zykio,krx->zyrixo", w3, sel)
    return wb.reshape(9, 10 * cin, 8 * cout)


def _fwd_kernel(x_ref, wb_ref, o_ref, *, bn):
    """x [bn,10,10,10C] (padded bricks, x folded into lanes), wb [1,10C,8Co],
    o [bn,8,8,8Co] f32. Grid (n_blocks, 9), tap-pair index j inner so the x
    and o blocks stay VMEM-resident across all 9 (kz,ky) matmuls."""
    j = pl.program_id(1)
    kz = j // 3
    ky = j % 3
    xs = x_ref[:, pl.ds(kz, 8), pl.ds(ky, 8), :]  # [bn,8,8,10C]
    xs = xs.reshape(bn * 64, x_ref.shape[-1])
    acc = jnp.dot(xs, wb_ref[0], preferred_element_type=jnp.float32)
    acc = acc.reshape(bn, 8, 8, o_ref.shape[-1])

    @pl.when(j == 0)
    def _():
        o_ref[:] = acc

    @pl.when(j > 0)
    def _():
        o_ref[:] += acc


def _bwd_kernel(g_ref, wbt_ref, dx_ref, *, bn):
    """Transpose pass: g [bn,8,8,8Co], wbt [1,8Co,10C] (= wb[j].T),
    dx [bn,10,10,10C] f32 accumulated over the 9 tap pairs."""
    j = pl.program_id(1)
    kz = j // 3
    ky = j % 3

    @pl.when(j == 0)
    def _():
        dx_ref[:] = jnp.zeros_like(dx_ref)

    g = g_ref[:].reshape(bn * 64, g_ref.shape[-1])
    d = jnp.dot(g, wbt_ref[0], preferred_element_type=jnp.float32)
    d = d.reshape(bn, 8, 8, dx_ref.shape[-1])
    dx_ref[:, pl.ds(kz, 8), pl.ds(ky, 8), :] += d


def _pick_bn(n: int, cin: int, cout: int, bytes_per: int) -> int:
    """Largest block size whose VMEM working set stays well under budget."""
    # x block [bn,10,16,ceil(10C/128)*128] + out [bn,8,8,8Co] f32 (+ wb)
    x_bytes = 10 * 16 * -(-(10 * cin) // 128) * 128 * bytes_per
    o_bytes = 8 * 8 * -(-(8 * cout) // 128) * 128 * 4
    wb_bytes = 10 * cin * 8 * cout * bytes_per
    budget = 10 * 2**20 - 2 * wb_bytes  # wb double-buffers across j
    bn = max(1, budget // (2 * (x_bytes + o_bytes)))
    bn = int(min(bn, 16, n))
    while n % bn:
        bn -= 1
    return bn


def banded_fits(cin: int, cout: int, bytes_per: int = 4) -> bool:
    """Whether the banded weight + a minimal block fit the VMEM budget."""
    wb_bytes = 9 * 10 * cin * 8 * cout * bytes_per
    return wb_bytes <= 6 * 2**20


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def band_conv_padded(xp: jax.Array, w: jax.Array, interpret: bool = False):
    """Halo-padded bricks [N,10,10,10,Cin] (any float dtype), w [27,Cin,Cout]
    -> [N,8,8,8,Cout] f32. The 3^3 VALID conv of dense_subm_conv as a
    banded Pallas kernel (see module docstring)."""
    return _band_conv_fwd(xp, w, interpret)[0]


def _band_conv_impl(xp, w, interpret):
    n, _, _, _, cin = xp.shape
    cout = w.shape[2]
    xm = xp.reshape(n, 10, 10, 10 * cin)  # x folds into lanes (free reshape)
    wb = build_banded_weight(w.astype(xp.dtype))
    bn = _pick_bn(n, cin, cout, xp.dtype.itemsize)
    grid = (n // bn, 9)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, bn=bn),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bn, 10, 10, 10 * cin), lambda i, j: (i, 0, 0, 0)),
            pl.BlockSpec((1, 10 * cin, 8 * cout), lambda i, j: (j, 0, 0)),
        ],
        out_specs=pl.BlockSpec((bn, 8, 8, 8 * cout), lambda i, j: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, 8, 8, 8 * cout), jnp.float32),
        interpret=interpret,
    )(xm, wb)
    return out.reshape(n, 8, 8, 8, cout)


def _band_conv_fwd(xp, w, interpret):
    return _band_conv_impl(xp, w, interpret), (xp, w)


def _band_conv_bwd(interpret, res, g):
    xp, w = res
    n, _, _, _, cin = xp.shape
    cout = w.shape[2]
    g = g.astype(xp.dtype)
    gm = g.reshape(n, 8, 8, 8 * cout)
    wbt = jnp.swapaxes(build_banded_weight(w.astype(xp.dtype)), 1, 2)
    bn = _pick_bn(n, cout, cin, xp.dtype.itemsize)
    while n % bn:
        bn -= 1
    grid = (n // bn, 9)
    dxm = pl.pallas_call(
        functools.partial(_bwd_kernel, bn=bn),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bn, 8, 8, 8 * cout), lambda i, j: (i, 0, 0, 0)),
            pl.BlockSpec((1, 8 * cout, 10 * cin), lambda i, j: (j, 0, 0)),
        ],
        out_specs=pl.BlockSpec((bn, 10, 10, 10 * cin), lambda i, j: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, 10, 10, 10 * cin), jnp.float32),
        interpret=interpret,
    )(gm, wbt)
    dx = dxm.reshape(n, 10, 10, 10, cin).astype(xp.dtype)

    # dw[kz,ky,kx] = sum_sites xp[.., z+kz, y+ky, x+kx, :]^T @ g — 27 GEMMs
    # in XLA (bwd only; the fwd never pays this)
    xf = xp.astype(jnp.float32)
    gf = g.astype(jnp.float32).reshape(n * 512, cout)
    taps = []
    for kz in range(3):
        for ky in range(3):
            for kx in range(3):
                xs = xf[:, kz:kz + 8, ky:ky + 8, kx:kx + 8, :].reshape(
                    n * 512, cin
                )
                taps.append(jnp.dot(xs.T, gf, preferred_element_type=jnp.float32))
    dw = jnp.stack(taps).astype(w.dtype)
    return dx, dw


band_conv_padded.defvjp(_band_conv_fwd, _band_conv_bwd)
