"""Banded Pallas kernel for the dense-brick submanifold conv.

XLA runs the [NB,10,10,10,C] brick conv (ops/brick.py dense_subm_conv) at
~9.6 ms/conv at prod scale — ~8x the HBM roofline (BASELINE.md r3): at the
backbone's small channel counts (m=16 -> C in 16..112) the conv lowering
materializes patch/relayout intermediates in HBM and underfills the MXU
(N=C lanes of 128). This kernel removes both costs at once:

- the halo-padded brick block is VMEM-resident for all 9 (kz,ky) tap
  pairs — the padded tensor is read from HBM exactly once per conv;
- the brick x axis folds into the LANE dimension and all three x-taps run
  as ONE matmul per (kz,ky) against a block-banded weight wb[(kz,ky)] of
  shape [10*Cin, 8*Cout]: K,N >= 128 at every backbone width (m=16 ->
  C in 16..112) — full MXU tiles. The band's zero blocks cost ~3.3x the
  sparse-ideal FLOPs, which the now-unstarved MXU absorbs.

Mosaic constraint that shaped the layout: dynamic slices on the SUBLANE
(second-to-last) dim must be provably 8-aligned ("cannot statically prove
index in dimension 2 is a multiple of 8" — the first version of this
kernel died there on the axon tunnel), while dynamic slices on untiled
leading dims are unrestricted. So blocks are 5-D
[b0, 10z, 10y, 8bricks, 10C]: z and y (the dynamically kz/ky-sliced axes)
are untiled leading dims, 8 bricks ride the sublane SHIFT-FREE, and the x
shifts live in the banded weight's lane structure.

This is the round-3 "banded" formulation that measured ZERO win as an XLA
rewrite (the chain stayed HBM/overhead-bound, DESIGN.md) — moved to where
it actually pays: inside a VMEM-resident kernel.

Semantics: identical to dense_subm_conv's conv step (VALID 3^3 conv over
the halo-padded brick, subm weight layout w[27,Cin,Cout], offset index
(dz+1)*9+(dy+1)*3+(dx+1) — reference spconv 1.0 SubMConv3d,
model/geoformer_modules.py:10-129). Occupancy masking and halo padding
stay with the caller (ops/brick.py). The kernel accumulates f32 in a VMEM
scratch and emits the caller's residency dtype directly (a bf16 level
never round-trips an f32 copy of itself through HBM).

Falls back to the XLA conv (dense_subm_conv gates on `banded_fits`) when
no Mosaic-LEGAL split fits VMEM: a lane split must leave a multiple of 128
lanes (or the full dim), so the fwd splits OUTPUT lanes (8*Cout, a %128
multiple at every backbone width) and the bwd splits the CONTRACTION dim
(g's 8*Cout lanes) — dx's 10*Cin lane width is never %128 and can only be
emitted whole.
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


def _fwd_kernel(x_ref, wb_ref, o_ref, acc_ref, *, b0):
    """x [b0, 10z, 10y, 8bricks, 10C] (halo-padded, x/C in lanes, bricks on
    the sublane), wb [1, 10C, 8Co/split], o [b0, 8, 8, 8, 8Co/split] in the
    caller's residency dtype, acc: f32 VMEM scratch of o's shape.
    Grid (n_blocks, split, 9): tap-pair index j innermost so the x and o
    blocks stay VMEM-resident across all 9 (kz,ky) matmuls; the split dim
    blocks OUTPUT lanes so wide banded weights still fit VMEM. Accumulation
    is always f32 (scratch); o_ref is written once at the last tap — a bf16
    o halves the kernel's HBM output vs emitting f32 and casting outside."""
    j = pl.program_id(2)
    kz = j // 3
    ky = j % 3
    # z and y are untiled leading dims of the 5-D block: dynamic ok
    xs = x_ref[:, pl.ds(kz, 8), pl.ds(ky, 8), :, :]  # [b0,8,8,8,10C]
    xs = xs.reshape(b0 * 512, x_ref.shape[-1])
    acc = jnp.dot(xs, wb_ref[0], preferred_element_type=jnp.float32)
    acc = acc.reshape(b0, 8, 8, 8, o_ref.shape[-1])

    @pl.when(j == 0)
    def _():
        acc_ref[:] = acc

    @pl.when(j > 0)
    def _():
        acc_ref[:] += acc

    @pl.when(j == 8)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _bwd_kernel(g_ref, wbt_ref, dx_ref, acc_ref, *, b0, ks):
    """Transpose pass: g [b0, 8, 8, 8bricks, 8Co/ksplit], wbt
    [1, 8Co/ksplit, 10C] (= wb[j].T K-blocked), dx [b0, 10, 10, 8bricks,
    10C] in the residency dtype, acc: f32 VMEM scratch of dx's shape,
    accumulated over the 9 tap pairs AND the K blocks (written to dx once
    at the last (k, j) step).

    The bwd splits the CONTRACTION dim, not the output lanes: dx's lane
    width 10C is a multiple of 128 at no backbone width, so a lane-blocked
    dx block would be Mosaic-illegal (block last dim must be %128 or the
    full dim) — whereas g's lane width 8Co always splits into %128 pieces."""
    k = pl.program_id(1)
    j = pl.program_id(2)
    kz = j // 3
    ky = j % 3

    @pl.when((j == 0) & (k == 0))
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    g = g_ref[:].reshape(b0 * 512, g_ref.shape[-1])
    d = jnp.dot(g, wbt_ref[0], preferred_element_type=jnp.float32)
    d = d.reshape(b0, 8, 8, 8, acc_ref.shape[-1])
    acc_ref[:, pl.ds(kz, 8), pl.ds(ky, 8), :, :] += d

    @pl.when((j == 8) & (k == ks - 1))
    def _():
        dx_ref[:] = acc_ref[:].astype(dx_ref.dtype)


def _lane_splits(lanes: int):
    """Legal Mosaic lane splits of `lanes`: s=1 (block == full dim), else
    the quotient must be a multiple of 128."""
    yield 1
    if lanes % 128 == 0:
        q = lanes // 128
        for s in range(2, q + 1):
            if q % s == 0:
                yield s


def _lane_bytes(rows: int, lanes: int, bytes_per: int) -> int:
    return rows * -(-lanes // 128) * 128 * bytes_per


_BUDGET = 13 * 2**20  # of the core's ~16MB VMEM


def _plan(n8: int, in_rows: int, in_lanes: int, out_rows: int,
          out_lanes: int, split_lanes: int, w_k: int,
          bytes_per: int):
    """Joint (split, b0) choice: smallest legal split of `split_lanes` and
    largest brick group whose working set fits VMEM. Streamed inputs and
    weight slices double-buffer; the output block and its f32 scratch
    accumulator are revisited across the inner grid dims (single copy
    each). Returns (split, b0) or None."""
    for s in _lane_splits(split_lanes):
        w_bytes = w_k * (split_lanes // s) * bytes_per
        in_l = in_lanes if split_lanes != in_lanes else in_lanes // s
        out_l = out_lanes if split_lanes != out_lanes else out_lanes // s
        for b0 in (8, 4, 2, 1):
            if n8 % b0:
                continue
            ws = (2 * w_bytes
                  + 2 * b0 * _lane_bytes(in_rows * 8, in_l, bytes_per)
                  + b0 * _lane_bytes(out_rows * 8, out_l, 4 + bytes_per))
            if ws <= _BUDGET:
                return s, b0
    return None


def _plan_fwd(n8: int, cin: int, cout: int, bytes_per: int):
    # splits OUTPUT lanes (8*cout); x block keeps full 10*cin lanes
    return _plan(n8, 100, 10 * cin, 64, 8 * cout, 8 * cout,
                 10 * cin, bytes_per)


def _plan_bwd(n8: int, cin: int, cout: int, bytes_per: int):
    # splits the CONTRACTION (g's 8*cout lanes); dx keeps full 10*cin
    return _plan(n8, 64, 8 * cout, 100, 10 * cin, 8 * cout,
                 10 * cin, bytes_per)


def banded_fits(cin: int, cout: int, bytes_per: int = 4) -> bool:
    """Whether both passes have a Mosaic-legal split + block fitting VMEM
    (n8=8 stands in for the worst-divisibility brick count)."""
    return (_plan_fwd(8, cin, cout, bytes_per) is not None
            and _plan_bwd(8, cin, cout, bytes_per) is not None)


def _group_bricks(xm: jax.Array):
    """[N, Z, Y, L] -> ([N8, Z, Y, 8, L], pad): 8 bricks onto the sublane."""
    n = xm.shape[0]
    pad = (-n) % 8
    if pad:
        xm = jnp.pad(xm, ((0, pad),) + ((0, 0),) * (xm.ndim - 1))
    n8 = (n + pad) // 8
    xg = xm.reshape((n8, 8) + xm.shape[1:]).transpose(0, 2, 3, 1, 4)
    return xg, pad


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def band_conv_padded(xp: jax.Array, w: jax.Array, interpret: bool = False):
    """Halo-padded bricks [N,10,10,10,Cin] (any float dtype), w [27,Cin,Cout]
    -> [N,8,8,8,Cout] in xp's dtype (f32 VMEM accumulation either way — a
    bf16 input emits bf16 directly, halving the kernel's HBM output vs an
    f32-out + cast-outside pair). The 3^3 VALID conv of dense_subm_conv as
    a banded Pallas kernel (see module docstring)."""
    return _band_conv_impl(xp, w, interpret)


def _band_conv_impl(xp, w, interpret):
    n, _, _, _, cin = xp.shape
    cout = w.shape[2]
    bytes_per = xp.dtype.itemsize
    # (x, C) fold into lanes; 8 bricks onto the sublane dim
    xg, pad = _group_bricks(xp.reshape(n, 10, 10, 10 * cin))
    n8 = xg.shape[0]
    wb = build_banded_weight(w.astype(xp.dtype))
    plan = _plan_fwd(n8, cin, cout, bytes_per)
    assert plan is not None, (cin, cout, bytes_per)  # gated by banded_fits
    split, b0 = plan
    ob = 8 * cout // split
    grid = (n8 // b0, split, 9)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, b0=b0),
        grid=grid,
        in_specs=[
            pl.BlockSpec((b0, 10, 10, 8, 10 * cin),
                         lambda i, s, j: (i, 0, 0, 0, 0)),
            pl.BlockSpec((1, 10 * cin, ob), lambda i, s, j: (j, 0, s)),
        ],
        out_specs=pl.BlockSpec((b0, 8, 8, 8, ob),
                               lambda i, s, j: (i, 0, 0, 0, s)),
        out_shape=jax.ShapeDtypeStruct((n8, 8, 8, 8, 8 * cout), xp.dtype),
        scratch_shapes=[pltpu.VMEM((b0, 8, 8, 8, ob), jnp.float32)],
        interpret=interpret,
    )(xg, wb)
    # [N8, 8z, 8y, 8bricks, 8Co] -> [N, 8, 8, 8, Co]
    out = out.transpose(0, 3, 1, 2, 4).reshape(n8 * 8, 8, 8, 8, cout)
    return out[:n] if pad else out


def _band_conv_fwd(xp, w, interpret):
    return _band_conv_impl(xp, w, interpret), (xp, w)


def _band_conv_bwd(interpret, res, g):
    xp, w = res
    n, _, _, _, cin = xp.shape
    cout = w.shape[2]
    bytes_per = xp.dtype.itemsize
    g = g.astype(xp.dtype)
    gg, pad = _group_bricks(g.reshape(n, 8, 8, 8 * cout))
    n8 = gg.shape[0]
    wbt = jnp.swapaxes(build_banded_weight(w.astype(xp.dtype)), 1, 2)
    plan = _plan_bwd(n8, cin, cout, bytes_per)
    assert plan is not None, (cin, cout, bytes_per)  # gated by banded_fits
    ks, b0 = plan
    kb = 8 * cout // ks
    grid = (n8 // b0, ks, 9)
    dxg = pl.pallas_call(
        functools.partial(_bwd_kernel, b0=b0, ks=ks),
        grid=grid,
        in_specs=[
            pl.BlockSpec((b0, 8, 8, 8, kb),
                         lambda i, k, j: (i, 0, 0, 0, k)),
            pl.BlockSpec((1, kb, 10 * cin), lambda i, k, j: (j, k, 0)),
        ],
        out_specs=pl.BlockSpec((b0, 10, 10, 8, 10 * cin),
                               lambda i, k, j: (i, 0, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n8, 10, 10, 8, 10 * cin), xp.dtype),
        scratch_shapes=[pltpu.VMEM((b0, 10, 10, 8, 10 * cin), jnp.float32)],
        interpret=interpret,
    )(gg, wbt)
    dx = dxg.transpose(0, 3, 1, 2, 4).reshape(n8 * 8, 10, 10, 10, cin)
    dx = dx[:n] if pad else dx

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
