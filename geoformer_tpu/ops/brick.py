"""Submanifold sparse conv as dense 3D conv over occupied 8^3 bricks.

The gather-rulebook formulation (ops/sparse_conv.py subm_conv) is bound by
TPU gather granularity: every neighbor lookup costs a full (8,128) tile
(~7 ns/row), so a 27-slot conv over V voxels pays 27*V tile reads — the
measured backbone bottleneck. This module exploits that surface scans are
*locally dense*: voxels are scattered once into dense 8^3 bricks (occupied
16 cm cubes at 2 cm resolution, typically 50-150 voxels each), the conv runs
as `lax.conv_general_dilated` over [NB, 10,10,10, C] halo-padded bricks —
pure MXU work XLA tiles natively — and results gather back to the sparse
voxel list. Cost per conv: 2*V tile-granularity ops (scatter in + gather
out) + a dense conv whose FLOPs are ~8x the sparse ideal but effectively
free on the MXU.

Exactness: empty cells hold zero features, so they contribute nothing to
the accumulation; outputs are read only at occupied cells. This is exactly
SubMConv3d (spconv 1.0, reference geoformer_modules.py:10-129) semantics —
same weight layout as subm_conv (w[27, Cin, Cout], offset index
(dz+1)*9+(dy+1)*3+(dx+1)), pinned by tests/test_brick_conv.py against the
rulebook path and by the golden backbone parity test.

Capacity: NB brick slots per level; overflow (more occupied bricks than
slots) drops voxels into the pad brick and is counted (`n_overflow`), same
contract as ops/voxelize.py.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from geoformer_tpu.ops.voxelize import VoxelGrid, pack_key, unpack_key, voxelize

BS = 8  # brick side (cells); 8^3 = 512 cells per brick


class BrickPlan(NamedTuple):
    """Per-level brick decomposition (batched [B, ...]).

    brick: [B, V] int32 voxel -> brick slot (NB = pad/overflow)
    cell:  [B, V] int32 voxel -> cell id in [0, 512) (z*64 + y*8 + x)
    nbr:   [B, NB, 27] int32 brick -> neighbor brick slots (NB = missing)
    mask:  [B, NB] bool brick validity
    occ:   [B, NB, 8,8,8] bool cell occupancy (the submanifold site set)
    n_overflow: [B] int32 voxels dropped by brick-capacity overflow
    """

    brick: jax.Array
    cell: jax.Array
    nbr: jax.Array
    mask: jax.Array
    occ: jax.Array
    n_overflow: jax.Array
    keys: jax.Array  # [B, NB] sorted packed brick keys (for level linking)

    @property
    def num_bricks(self) -> int:
        return self.nbr.shape[1]


def build_brick_plan(grid: VoxelGrid, spatial: int, num_bricks: int) -> BrickPlan:
    """Decompose a voxel level into bricks. spatial = level grid extent."""
    from geoformer_tpu.ops.sparse_conv import build_subm_neighbors

    bspatial = max(spatial // BS, 1)
    coords = grid.voxel_coords
    ok = grid.voxel_mask
    bc = jnp.where(ok[..., None], coords // BS, 0)
    bgrid = voxelize(bc, ok, num_bricks, bspatial)
    lc = jnp.where(ok[..., None], coords % BS, 0)
    cell = (lc[..., 2] * (BS * BS) + lc[..., 1] * BS + lc[..., 0]).astype(jnp.int32)
    nbr = build_subm_neighbors(bgrid, bspatial)
    # voxels whose brick overflowed the capacity land in the pad brick
    overflow = jnp.sum(((bgrid.p2v >= num_bricks) & ok).astype(jnp.int32), axis=1)
    ones = jnp.ones(cell.shape + (1,), jnp.float32)
    occ = jax.vmap(
        lambda br, ce, o: _scatter_scene(o, br, ce, br < num_bricks, num_bricks)
    )(bgrid.p2v, cell, ones)[..., 0] > 0.5
    return BrickPlan(
        brick=bgrid.p2v, cell=cell, nbr=nbr, mask=bgrid.voxel_mask, occ=occ,
        n_overflow=overflow, keys=bgrid.voxel_keys,
    )


def _scatter_scene(feats, brick, cell, ok, nb):
    """[V,C] sparse -> [NB, 8,8,8, C] dense (zeros at empty cells)."""
    v, c = feats.shape
    flat = brick * (BS ** 3) + cell
    # invalid/overflow voxels scatter out of bounds and are dropped —
    # no dump region, no iota, exactly-sized buffer
    flat = jnp.where(ok & (brick < nb), flat, nb * (BS ** 3))
    dense = jnp.zeros((nb * (BS ** 3), c), feats.dtype).at[flat].set(
        feats, unique_indices=True, mode="drop"
    )
    return dense.reshape(nb, BS, BS, BS, c)


def _gather_scene(dense, brick, cell, nb):
    """[NB, 8,8,8, C] dense -> [V, C] sparse (pad voxels -> 0)."""
    c = dense.shape[-1]
    flat_dense = dense.reshape(nb * (BS ** 3), c)
    flat_dense = jnp.concatenate(
        [flat_dense, jnp.zeros((1, c), dense.dtype)], axis=0
    )
    idx = jnp.where(brick < nb, brick * (BS ** 3) + cell, nb * (BS ** 3))
    return flat_dense[idx]


def _slot(dz, dy, dx):
    """Slot of (dz,dy,dx) in the SUBM_OFFSETS enumeration."""
    return (dz + 1) * 9 + (dy + 1) * 3 + (dx + 1)


def _nbr_gather(face, nbr_col, nb):
    """Gather per-brick `face` rows [NB, ...] by a neighbor column
    (missing bricks -> zeros): the only gather shape the halo uses —
    NB rows per gather, so the pad stays brick-granular (TPU gathers cost
    per ROW; an earlier (brick,z,y)-row formulation gathered 100x the
    rows and doubled the conv, ONCHIP_SUITE_r5 r5b parts)."""
    zero = jnp.zeros((1,) + face.shape[1:], face.dtype)
    return jnp.concatenate([face, zero], axis=0)[nbr_col]


_D2SL = {-1: slice(BS - 1, BS), 0: slice(None), 1: slice(0, 1)}
# region slab of the PADDED tensor per offset sign, and the zero-pad that
# places a gathered slab back at its SOURCE slice (the _D2SL dual)
_P2SL = {-1: slice(0, 1), 0: slice(1, BS + 1), 1: slice(BS + 1, BS + 2)}
_PAD3 = {-1: (BS - 1, 0), 0: (0, 0), 1: (0, BS - 1)}

_OFFS26 = [(dz, dy, dx) for dz in (-1, 0, 1) for dy in (-1, 0, 1)
           for dx in (-1, 0, 1) if (dz, dy, dx) != (0, 0, 0)]


def _halo_pad_scene_impl(dense, nbr, nb):
    """[NB,8,8,8,C] + neighbor table [NB,27] -> [NB,10,10,10,C].

    Exact halo for every occupied-brick configuration: each of the 27
    (dz,dy,dx) regions of the padded tensor gathers its slab DIRECTLY
    from the true (possibly diagonal) brick via the 27-slot neighbor
    table — 26 NB-row gathers + nested concats. The previous separable
    z-then-y-then-x face exchange lost edge/corner contributions whenever
    a face-neighbor brick was empty while the diagonal brick was occupied
    (a real submanifold adjacency on thin diagonal structures;
    regression-pinned in tests/test_brick_conv.py
    test_diagonal_corner_adjacency). An exact (brick,z,y)-row-map variant
    measured 2x worse: it gathered 100x the rows, and TPU gathers cost
    per row (ONCHIP_SUITE_r5 r5b parts)."""

    def piece(dz, dy, dx):
        slab = dense[:, _D2SL[dz], _D2SL[dy], _D2SL[dx], :]
        if dz == dy == dx == 0:
            return slab
        return _nbr_gather(slab, nbr[:, _slot(dz, dy, dx)], nb)

    return jnp.concatenate(
        [
            jnp.concatenate(
                [
                    jnp.concatenate([piece(dz, dy, -1), piece(dz, dy, 0),
                                     piece(dz, dy, 1)], axis=3)
                    for dy in (-1, 0, 1)
                ],
                axis=2,
            )
            for dz in (-1, 0, 1)
        ],
        axis=1,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _halo_pad_scene(dense, nbr, nb):
    return _halo_pad_scene_impl(dense, nbr, nb)


def _halo_pad_scene_fwd(dense, nbr, nb):
    return _halo_pad_scene_impl(dense, nbr, nb), nbr


def _halo_pad_scene_bwd(nb, nbr, g):
    """Transpose of the 27-region halo as 26 GATHERS, not scatters.

    The neighbor table is geometrically symmetric — m = nbr[n, (dz,dy,dx)]
    iff n = nbr[m, (-dz,-dy,-dx)] (both built from occupied coords) — so
    the cotangent of brick n's source slice accumulates each halo-region
    slab of g gathered through the NEGATED offset slot. Autodiff instead
    transposes each forward gather to a scatter-add; at prod train scale
    the scatter temps + fragmentation pushed the B=1 step 0.44 GB past
    one v5e's HBM (r5c train_bench OOM dump) where the r4 separable-halo
    step fit. Grads pinned against autodiff of the raw impl in
    tests/test_brick_fold.py test_halo_custom_vjp_matches_autodiff."""
    out = g[:, 1:BS + 1, 1:BS + 1, 1:BS + 1, :]
    for dz, dy, dx in _OFFS26:
        slab = g[:, _P2SL[dz], _P2SL[dy], _P2SL[dx], :]
        got = _nbr_gather(slab, nbr[:, _slot(-dz, -dy, -dx)], nb)
        out = out + jnp.pad(
            got, ((0, 0), _PAD3[dz], _PAD3[dy], _PAD3[dx], (0, 0))
        )
    return out, np.zeros(nbr.shape, jax.dtypes.float0)


_halo_pad_scene.defvjp(_halo_pad_scene_fwd, _halo_pad_scene_bwd)


def to_dense(feats: jax.Array, plan: BrickPlan) -> jax.Array:
    """[B,V,C] sparse level features -> [B,NB,8,8,8,C] dense bricks."""
    nb = plan.num_bricks
    return jax.vmap(
        lambda f, br, ce: _scatter_scene(f, br, ce, br < nb, nb)
    )(feats, plan.brick, plan.cell)


def from_dense(dense: jax.Array, plan: BrickPlan) -> jax.Array:
    """[B,NB,8,8,8,C] dense bricks -> [B,V,C] sparse (pad voxels -> 0)."""
    nb = plan.num_bricks
    return jax.vmap(
        lambda d, br, ce: _gather_scene(d, br, ce, nb)
    )(dense, plan.brick, plan.cell)


def dense_subm_conv(dense: jax.Array, plan: BrickPlan, w: jax.Array,
                    precision=None, compute_dtype=None) -> jax.Array:
    """Submanifold 3^3 conv on level-resident dense bricks.

    dense [B,NB,8,8,8,Cin], w [27,Cin,Cout] (subm_conv layout) ->
    [B,NB,8,8,8,Cout]. The input is masked to the occupancy (subm gating:
    only occupied sites feed the conv — BN/bias between convs makes empty
    cells nonzero), and the output is NOT masked (read it through
    `from_dense`/occ).

    The conv is XLA `conv_general_dilated` on the halo-padded bricks. A
    banded VMEM-resident Pallas kernel of the same conv (one [b0*512,10C]
    x [10C,8C'] matmul per (dz,dy) tap pair, padded input read from HBM
    once) measured 2-2.5x SLOWER than this XLA conv at every backbone
    width on TPU v5e, both f32 and bf16 (ONCHIP_SUITE_r4.log suite r4e,
    tools/brick_kernel_bench.py) — XLA's conv emitter already pipelines
    the taps without materializing the 27x patch tensor, and the kernel's
    9-step sequential grid revisiting the output block beats it on
    neither bandwidth nor MXU occupancy. Deleted in r4; see DESIGN.md."""
    cin, cout = w.shape[1], w.shape[2]
    nb = plan.num_bricks
    # kernel [kz,ky,kx,Cin,Cout]: offset o=(dz,dy,dx) means "input at
    # out + (dx,dy,dz)" (build_subm_neighbors), which in a VALID conv over
    # the 1-padded block is kernel tap (dz+1, dy+1, dx+1) — exactly the
    # reshape of the row-major subm layout
    kernel = w.reshape(3, 3, 3, cin, cout)
    if compute_dtype is not None:
        dense = dense.astype(compute_dtype)
        kernel = kernel.astype(compute_dtype)
    # bf16 mode: conv output STAYS bf16 — levels are bf16-resident end to
    # end (an astype(f32) here would round-trip every [NB,8,8,8,C] buffer
    # through HBM at double width between every pair of convs; the dense
    # chain is HBM-bound, BASELINE.md r3/r4). MXU still accumulates fp32
    # internally; preferred_element_type=f32 with bf16 operands breaks the
    # conv transpose rule under grad (mismatched cotangent dtype)
    preferred = jnp.float32 if compute_dtype is None else None
    dense = jnp.where(plan.occ[..., None], dense, 0)

    def scene(d, nbr):
        padded = _halo_pad_scene(d, nbr, nb)
        return jax.lax.conv_general_dilated(
            padded, kernel,
            window_strides=(1, 1, 1),
            padding="VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            precision=precision,
            preferred_element_type=preferred,
        )  # [NB, 8,8,8, Cout] in the compute dtype

    return jax.vmap(scene)(dense, plan.nbr)


def _halo_pad_folded_impl(x, nbr, segs):
    """Folded-layout halo: [NB,8,8,sum(8c)] -> [NB,10,10,sum(10c)].

    Same exact 27-region scheme as _halo_pad_scene; the x axis lives on
    the lanes, so the dx=+-1 pieces are per-segment lane-block slices
    (sliced BEFORE the gather — all segments ride one NB-row gather) and
    each (dz,dy) row interleaves [lo_s, body_s, hi_s] per segment, the
    layout build_banded_kernel's rows expect."""
    segs = tuple(segs)
    nb = x.shape[0]
    lo_sl, hi_sl, offs = [], [], []
    off = 0
    for c in segs:
        lo_sl.append(slice(off + 7 * c, off + 8 * c))
        hi_sl.append(slice(off, off + c))
        offs.append(off)
        off += 8 * c
    cs = sum(segs)

    def row(dz, dy):
        """[NB, zext, yext, sum(10c)] for one (dz,dy) region."""
        zsl, ysl = _D2SL[dz], _D2SL[dy]
        base = x[:, zsl, ysl, :]
        lo = jnp.concatenate([base[..., s] for s in lo_sl], axis=-1)
        hi = jnp.concatenate([base[..., s] for s in hi_sl], axis=-1)
        lo = _nbr_gather(lo, nbr[:, _slot(dz, dy, -1)], nb)
        hi = _nbr_gather(hi, nbr[:, _slot(dz, dy, 1)], nb)
        if not (dz == dy == 0):
            base = _nbr_gather(base, nbr[:, _slot(dz, dy, 0)], nb)
        out, foff = [], 0
        for c, o in zip(segs, offs):
            out.append(lo[..., foff:foff + c])
            out.append(base[..., o:o + 8 * c])
            out.append(hi[..., foff:foff + c])
            foff += c
        return jnp.concatenate(out, axis=-1)

    return jnp.concatenate(
        [
            jnp.concatenate([row(dz, -1), row(dz, 0), row(dz, 1)], axis=2)
            for dz in (-1, 0, 1)
        ],
        axis=1,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _halo_pad_folded(x, nbr, segs):
    return _halo_pad_folded_impl(x, nbr, segs)


def _halo_pad_folded_fwd(x, nbr, segs):
    return _halo_pad_folded_impl(x, nbr, segs), nbr


def _halo_pad_folded_bwd(segs, nbr, g):
    """Gather-form transpose of the folded halo (see _halo_pad_scene_bwd).

    Output lane layout per segment s (running offset po = sum 10c_t):
    lo [po, po+c) <- source block 7, body [po+c, po+9c) <- whole segment,
    hi [po+9c, po+10c) <- source block 0."""
    segs = tuple(segs)
    nb = g.shape[0]
    lo_sl, body_sl, hi_sl = [], [], []
    po = 0
    for c in segs:
        lo_sl.append(slice(po, po + c))
        body_sl.append(slice(po + c, po + 9 * c))
        hi_sl.append(slice(po + 9 * c, po + 10 * c))
        po += 10 * c

    def lanes(t, which):
        sl = {"lo": lo_sl, "body": body_sl, "hi": hi_sl}[which]
        return jnp.concatenate([t[..., s] for s in sl], axis=-1)

    def place(t, which):
        """Per-segment narrow slab [..., sum(c)] -> full [..., sum(8c)]
        at source block 7 ("lo") or 0 ("hi")."""
        out, foff = [], 0
        for c in segs:
            seg = t[..., foff:foff + c]
            pad = (7 * c, 0) if which == "lo" else (0, 7 * c)
            out.append(jnp.pad(seg, ((0, 0),) * (t.ndim - 1) + (pad,)))
            foff += c
        return jnp.concatenate(out, axis=-1)

    out = lanes(g[:, 1:BS + 1, 1:BS + 1, :], "body")
    for dz in (-1, 0, 1):
        for dy in (-1, 0, 1):
            slab = g[:, _P2SL[dz], _P2SL[dy], :]
            pad_zy = ((0, 0), _PAD3[dz], _PAD3[dy], (0, 0))
            for dx, which in ((-1, "lo"), (0, "body"), (1, "hi")):
                if dz == dy == dx == 0:
                    continue  # center body handled above (no gather)
                part = lanes(slab, which)
                got = _nbr_gather(part, nbr[:, _slot(-dz, -dy, -dx)], nb)
                if which != "body":
                    got = place(got, which)
                out = out + jnp.pad(got, pad_zy)
    return out, np.zeros(nbr.shape, jax.dtypes.float0)


_halo_pad_folded.defvjp(_halo_pad_folded_fwd, _halo_pad_folded_bwd)


# ---------------------------------------------------------------------------
# x-folded level residency
#
# XLA tiles the two minor dims of every buffer to (8 sublanes, 128 lanes):
# a level tensor [B,NB,8,8,8,C] at C=16 pads its lane dim 16 -> 128, an 8x
# physical expansion of EVERY buffer in the conv chain (measured: the
# B=2 prod train step's OOM dump shows bf16[2,4096,8,8,8,16] buffers at
# "8.0x expansion", 128 MB -> 1 GB each; the halo-pad chain materializes
# three such buffers per conv, which is why a level-0 conv costs ~9 ms
# against a ~0.3 ms roofline, ONCHIP_SUITE_r4.log). Folding the brick x
# axis into the channel lanes — [B,NB,8z,8y, 8x*C] — makes the lane dim
# 8*C (= exactly 128 at C=16), eliminating the padding. The 3^3 conv then
# runs as a 2D conv over (z,y) with a block-banded [3,3,10C,8C] kernel
# (x taps become lane-block offsets; ~3.3x band-zero FLOPs the MXU
# absorbs). The fold is LEVEL-resident: fold once per level, every conv /
# BN / ReLU / residual / concat runs folded, unfold once at the level's
# transitions — the r3 XLA-banded and r4 Pallas-banded attempts both paid
# a full-tensor relayout per conv, which is where their wins went.
#
# Folded tensors carry a static `segs` tuple: lane layout is the
# concatenation over segments s of x-major blocks [x*C_s + c]. A channel
# concat of two folded tensors is then a plain lane concat with
# segs = segs_a + segs_b (no relayout); the banded kernel builder and the
# masked BN understand the segmented layout directly.
# ---------------------------------------------------------------------------


def fold_x(dense: jax.Array) -> jax.Array:
    """[B,NB,8,8,8,C] -> [B,NB,8,8,8*C] (x-major lane fold; segs=(C,))."""
    b, nb, _, _, _, c = dense.shape
    return dense.reshape(b, nb, BS, BS, BS * c)


def unfold_x(folded: jax.Array, c: int) -> jax.Array:
    """Inverse of fold_x for a single-segment tensor."""
    b, nb, _, _, _ = folded.shape
    return folded.reshape(b, nb, BS, BS, BS, c)


def fold_mask(occ: jax.Array, segs) -> jax.Array:
    """Site occupancy [...,8] -> folded lane mask [..., sum(8*c)]."""
    return jnp.concatenate(
        [jnp.repeat(occ, c, axis=-1) for c in segs], axis=-1
    )


def build_banded_kernel(w: jax.Array, segs) -> jax.Array:
    """Subm weight [27, sum(segs), Cout] -> banded 2D kernel
    [3, 3, sum(10*c), 8*Cout] for the folded conv.

    Row (seg, xi, ci) of the kernel feeds output lane (xo, co) with
    w[(kz,ky,kx=xi-xo)][ci,co] when 0 <= xi-xo <= 2, else 0 — the VALID 2D
    conv over (z,y) of the halo-padded folded tensor then equals the VALID
    3D conv of dense_subm_conv exactly (same tap orientation: offset
    (dz,dy,dx) -> tap (dz+1,dy+1,dx+1))."""
    cin = sum(segs)
    cout = w.shape[2]
    wk = w.reshape(3, 3, 3, cin, cout)
    rows = []
    off = 0
    for c in segs:
        wseg = wk[..., off:off + c, :].reshape(3, 3, 3 * c, cout)
        cols = [
            jnp.pad(wseg, ((0, 0), (0, 0), (xo * c, (7 - xo) * c), (0, 0)))
            for xo in range(8)
        ]
        rows.append(jnp.stack(cols, axis=3))  # [3,3,10c,8,cout]
        off += c
    band = jnp.concatenate(rows, axis=2)  # [3,3,sum(10c),8,cout]
    return band.reshape(3, 3, -1, 8 * cout)


def dense_subm_conv_folded(folded: jax.Array, plan: BrickPlan, w: jax.Array,
                           segs, precision=None,
                           compute_dtype=None) -> jax.Array:
    """dense_subm_conv on an x-folded level tensor.

    folded [B,NB,8,8,sum(8c)] (lane layout per `segs`), w [27,sum(segs),
    Cout] -> [B,NB,8,8,8*Cout] (segs=(Cout,)). Semantics identical to
    dense_subm_conv (input masked to occupancy, output unmasked); pinned
    against it in tests/test_brick_fold.py."""
    segs = tuple(segs)
    assert sum(segs) == w.shape[1], (segs, w.shape)
    cout = w.shape[2]
    band = build_banded_kernel(w, segs)
    if compute_dtype is not None:
        folded = folded.astype(compute_dtype)
        band = band.astype(compute_dtype)
    preferred = jnp.float32 if compute_dtype is None else None
    folded = jnp.where(fold_mask(plan.occ, segs), folded, 0)

    def scene(f, nbr):
        p = _halo_pad_folded(f, nbr, segs)  # [NB,10,10,sum(10c)]
        return jax.lax.conv_general_dilated(
            p, band,
            window_strides=(1, 1),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=precision,
            preferred_element_type=preferred,
        )  # [NB, 8, 8, 8*Cout]

    return jax.vmap(scene)(folded, plan.nbr)


def dense_1x1_folded(folded: jax.Array, wi: jax.Array, segs) -> jax.Array:
    """1x1 (channel-mix) conv on a folded tensor: [...,sum(8c)] @ block
    matrix -> [...,8*Cout]. wi [sum(segs), Cout]."""
    segs = tuple(segs)
    cout = wi.shape[1]
    eye = jnp.eye(8, dtype=wi.dtype)
    blocks = []
    off = 0
    for c in segs:
        blocks.append(jnp.kron(eye, wi[off:off + c]))  # [8c, 8cout]
        off += c
    w1 = jnp.concatenate(blocks, axis=0)
    return jax.lax.dot_general(
        folded, w1.astype(folded.dtype), (((folded.ndim - 1,), (0,)), ((), ())),
    ).astype(folded.dtype)


class BrickDownLink(NamedTuple):
    """Brick-level connectivity between level l and level l+1.

    A level-(l+1) brick covers 16^3 level-l cells = exactly 2^3 level-l
    bricks, so strided/inverse k=2 convs stay entirely in brick space —
    no sparse<->dense transition per level (those cost ~17 ms each way at
    prod scale).

    parent:   [B, NBc] int32 child brick -> parent brick slot (NBp = pad)
    octant:   [B, NBc] int32 position within the parent brick (z*4+y*2+x)
    children: [B, NBp, 8] int32 parent -> child brick slot per octant
              (NBc = missing)
    """

    parent: jax.Array
    octant: jax.Array
    children: jax.Array


def build_brick_down_link(child_keys, child_mask, parent_keys, parent_mask,
                          child_bspatial: int) -> BrickDownLink:
    """child/parent brick grids' sorted packed keys -> BrickDownLink.

    child_keys [B,NBc], parent_keys [B,NBp] (sorted `BrickPlan.keys` of the
    respective levels' brick grids)."""
    nbc = child_keys.shape[1]
    nbp = parent_keys.shape[1]
    pbspatial = max(child_bspatial // 2, 1)

    def scene(ck, cm, pk, pm):
        cc = unpack_key(ck, child_bspatial)  # [NBc,3] (x,y,z); garbage at pads
        cc = jnp.where(cm[:, None], cc, 0)
        pkey = pack_key(cc // 2, pbspatial)
        idx = jnp.searchsorted(pk, pkey, method="sort").astype(jnp.int32)
        idx = jnp.minimum(idx, nbp - 1)
        found = cm & (pk[idx] == pkey) & pm[idx]
        parent = jnp.where(found, idx, nbp).astype(jnp.int32)
        par = cc % 2
        octant = (par[:, 2] * 4 + par[:, 1] * 2 + par[:, 0]).astype(jnp.int32)
        octant = jnp.where(found, octant, 0)
        # children rulebook: (parent, octant) -> child brick. Unique by
        # geometry (a parent octant is one child brick coord); not-found
        # children scatter out of bounds and drop
        slot = jnp.where(found, parent * 8 + octant, nbp * 8)
        children = jnp.full((nbp * 8,), nbc, jnp.int32).at[slot].set(
            jnp.arange(nbc, dtype=jnp.int32), unique_indices=True, mode="drop",
        ).reshape(nbp, 8)
        return parent, octant, children

    parent, octant, children = jax.vmap(scene)(
        child_keys, child_mask, parent_keys, parent_mask
    )
    return BrickDownLink(parent=parent, octant=octant, children=children)


def _cells_to_octants(x: jax.Array) -> jax.Array:
    """Within-brick stride-2 split: [N,8,8,8,C] -> [N,8,4,4,4,C].

    Cell (2i+a, 2j+b, 2k+c) lands at octant o=a*4+b*2+c, position (i,j,k)."""
    n, _, _, _, c = x.shape
    x = x.reshape(n, 4, 2, 4, 2, 4, 2, c)
    x = x.transpose(0, 2, 4, 6, 1, 3, 5, 7)  # [n, a,b,c, i,j,k, C]
    return x.reshape(n, 8, 4, 4, 4, c)


def _octants_to_cells(x: jax.Array) -> jax.Array:
    """Inverse of _cells_to_octants: [N,8,4,4,4,C] -> [N,8,8,8,C]."""
    n = x.shape[0]
    c = x.shape[-1]
    x = x.reshape(n, 2, 2, 2, 4, 4, 4, c)
    x = x.transpose(0, 4, 1, 5, 2, 6, 3, 7)  # [n, i,a, j,b, k,c, C]
    return x.reshape(n, 8, 8, 8, c)


def _assemble_bricks(x: jax.Array) -> jax.Array:
    """Quarter blocks -> parent brick: [N,8,4,4,4,C] -> [N,8,8,8,C].

    Octant zb contributes parent cells [4*zb, 4*zb+4) per axis (block
    layout, unlike the interleaved _octants_to_cells)."""
    n = x.shape[0]
    c = x.shape[-1]
    x = x.reshape(n, 2, 2, 2, 4, 4, 4, c)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)  # [n, zb,q, yb,q, xb,q, C]
    return x.reshape(n, 8, 8, 8, c)


def _disassemble_bricks(x: jax.Array) -> jax.Array:
    """Inverse of _assemble_bricks: [N,8,8,8,C] -> [N,8,4,4,4,C]."""
    n, _, _, _, c = x.shape
    x = x.reshape(n, 2, 4, 2, 4, 2, 4, c)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(n, 8, 4, 4, 4, c)


def down_conv_bricks(dense: jax.Array, child_plan: BrickPlan, link: BrickDownLink,
                     w: jax.Array, precision=None, compute_dtype=None) -> jax.Array:
    """Strided k=2 s=2 conv in brick space (SparseConv3d, sparse_conv.py
    down_conv semantics; w [8,Cin,Cout], offset index z*4+y*2+x).

    dense [B,NBc,8,8,8,Cin] (level l) -> [B,NBp,8,8,8,Cout] (level l+1).
    The 2^3 windows are even-aligned within a brick, so no halo is needed:
    one [NBc*64, 8*Cin] @ [8*Cin, Cout] GEMM per scene, then parent bricks
    assemble from their 8 child bricks' quarter outputs (one gather +
    transpose). The input is masked to the child occupancy; output cells
    follow the dense_subm_conv contract (unmasked — read via occ)."""
    cin, cout = w.shape[1], w.shape[2]
    if compute_dtype is not None:
        dense = dense.astype(compute_dtype)
        w = w.astype(compute_dtype)
    dense = jnp.where(child_plan.occ[..., None], dense, 0)
    wm = w.reshape(8 * cin, cout)
    # bf16 mode keeps the output bf16 (level residency; f32 MXU accum)
    preferred = jnp.float32 if compute_dtype is None else None

    def scene(d, children):
        oc = _cells_to_octants(d)  # [NBc, 8, 4,4,4, Cin]
        nbc = oc.shape[0]
        gm = oc.transpose(0, 2, 3, 4, 1, 5).reshape(nbc, 64, 8 * cin)
        q = jax.lax.dot_general(
            gm, wm, (((2,), (0,)), ((), ())),
            preferred_element_type=preferred, precision=precision,
        ).reshape(nbc, 4, 4, 4, cout)
        qp = jnp.concatenate([q, jnp.zeros((1,) + q.shape[1:], q.dtype)], axis=0)
        return _assemble_bricks(qp[children])  # [NBp, 8,8,8, Cout]

    return jax.vmap(scene)(dense, link.children)


def up_conv_bricks(parent_dense: jax.Array, link: BrickDownLink, w: jax.Array,
                   precision=None, compute_dtype=None) -> jax.Array:
    """Inverse k=2 conv in brick space (SparseInverseConv3d, sparse_conv.py
    up_conv semantics: out[child 2i+o] = parent[i] @ w[o]).

    parent_dense [B,NBp,8,8,8,Cin] -> child [B,NBc,8,8,8,Cout]: split each
    parent brick into its 8 quarter blocks, gather the quarter covering
    each child brick by flat index parent*8+octant (one gather), then one
    [NBc*64, Cin] @ [Cin, 8*Cout] GEMM distributes every parent cell to
    its 2^3 children. Output is unmasked (read via child occ)."""
    cin, cout = w.shape[1], w.shape[2]
    if compute_dtype is not None:
        parent_dense = parent_dense.astype(compute_dtype)
        w = w.astype(compute_dtype)
    wm = w.transpose(1, 0, 2).reshape(cin, 8 * cout)
    preferred = jnp.float32 if compute_dtype is None else None

    def scene(pd, parent, octant):
        nbp = pd.shape[0]
        quarters = _disassemble_bricks(pd).reshape(nbp * 8, 4, 4, 4, cin)
        qp = jnp.concatenate(
            [quarters, jnp.zeros((1,) + quarters.shape[1:], quarters.dtype)], axis=0
        )
        flat = jnp.where(parent < nbp, parent * 8 + octant, nbp * 8)
        g = qp[flat]  # [NBc, 4,4,4, Cin] — the parent quarter over this brick
        nbc = g.shape[0]
        out = jax.lax.dot_general(
            g.reshape(nbc, 64, cin), wm, (((2,), (0,)), ((), ())),
            preferred_element_type=preferred, precision=precision,
        ).reshape(nbc, 4, 4, 4, 8, cout)
        return _octants_to_cells(out.transpose(0, 4, 1, 2, 3, 5))

    return jax.vmap(scene)(parent_dense, link.parent, link.octant)


def subm_conv_bricks(feats: jax.Array, plan: BrickPlan, w: jax.Array,
                     precision=None, compute_dtype=None) -> jax.Array:
    """One-shot submanifold conv via dense bricks: [B,V,Cin] -> [B,V,Cout].

    Chained level convs should use to_dense/dense_subm_conv/from_dense
    directly so the scatter/gather amortizes over the level."""
    return from_dense(
        dense_subm_conv(to_dense(feats, plan), plan, w, precision, compute_dtype),
        plan,
    )
