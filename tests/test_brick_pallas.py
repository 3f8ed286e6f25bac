"""Banded Pallas brick conv (ops/brick_pallas.py) vs the XLA oracle.

The XLA `conv_general_dilated` path in ops/brick.py dense_subm_conv is the
exactness oracle (itself pinned against the rulebook path and the real
reference spconv modules, tests/test_brick_conv.py). Interpret mode runs
the kernel's exact dataflow on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geoformer_tpu.ops.brick_pallas import (
    band_conv_padded,
    banded_fits,
    build_banded_weight,
)


def _xla_conv(xp, w):
    cin, cout = w.shape[1], w.shape[2]
    kernel = w.reshape(3, 3, 3, cin, cout)
    return jax.lax.conv_general_dilated(
        xp, kernel, window_strides=(1, 1, 1), padding="VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32,
    )


@pytest.mark.parametrize("n,cin,cout", [(4, 8, 8), (6, 16, 8), (2, 8, 24)])
def test_band_conv_matches_xla(n, cin, cout):
    rng = np.random.default_rng(3)
    xp = jnp.asarray(rng.normal(size=(n, 10, 10, 10, cin)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(27, cin, cout)).astype(np.float32) * 0.2)
    got = band_conv_padded(xp, w, True)
    want = _xla_conv(xp, w)
    assert got.shape == want.shape == (n, 8, 8, 8, cout)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_band_conv_bf16():
    rng = np.random.default_rng(5)
    xp32 = rng.normal(size=(2, 10, 10, 10, 16)).astype(np.float32)
    w32 = rng.normal(size=(27, 16, 16)).astype(np.float32) * 0.2
    got = band_conv_padded(jnp.asarray(xp32, jnp.bfloat16),
                           jnp.asarray(w32, jnp.bfloat16), True)
    want = _xla_conv(jnp.asarray(xp32), jnp.asarray(w32))
    # residency-dtype output (f32 VMEM accumulation inside the kernel)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want), rtol=0.1, atol=0.15)


def test_band_conv_grads_match_xla():
    rng = np.random.default_rng(7)
    xp = jnp.asarray(rng.normal(size=(2, 10, 10, 10, 8)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(27, 8, 8)).astype(np.float32) * 0.3)
    cot = jnp.asarray(rng.normal(size=(2, 8, 8, 8, 8)).astype(np.float32))

    def loss_pallas(xp, w):
        return jnp.sum(band_conv_padded(xp, w, True) * cot)

    def loss_xla(xp, w):
        return jnp.sum(_xla_conv(xp, w) * cot)

    gx_p, gw_p = jax.grad(loss_pallas, argnums=(0, 1))(xp, w)
    gx_x, gw_x = jax.grad(loss_xla, argnums=(0, 1))(xp, w)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_x),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_x),
                               rtol=1e-4, atol=1e-4)


def test_banded_weight_structure():
    """wb[(kz,ky)] row-block r, col-block x holds w[tap] iff r == x + kx."""
    rng = np.random.default_rng(9)
    cin, cout = 4, 4
    w = jnp.asarray(rng.normal(size=(27, cin, cout)).astype(np.float32))
    wb = np.asarray(build_banded_weight(w)).reshape(9, 10, cin, 8, cout)
    w3 = np.asarray(w).reshape(3, 3, 3, cin, cout)
    for kz in range(3):
        for ky in range(3):
            for r in range(10):
                for x in range(8):
                    blk = wb[kz * 3 + ky, r, :, x, :]
                    kx = r - x
                    if 0 <= kx <= 2:
                        np.testing.assert_array_equal(blk, w3[kz, ky, kx])
                    else:
                        assert not blk.any()


def test_banded_fits_thresholds():
    assert banded_fits(16, 16)            # level 0 (split 1)
    assert banded_fits(64, 32)            # level-1 tail
    assert banded_fits(224, 112, 2)       # deepest concat at bf16 residency
    assert not banded_fits(224, 112, 4)   # ...f32 x-block blows VMEM: XLA
    assert not banded_fits(1024, 1024)    # beyond any split: XLA fallback


def _backbone_widths(m=16, depth=7, input_ch=6):
    """Every (cin, cout) dense_subm_conv sees: input conv, 2 blocks and 2
    tail blocks per level (models/unet.py)."""
    planes = [m * (i + 1) for i in range(depth)]
    widths = {(input_ch, planes[0])}
    prev = planes[0]
    for lvl, c0 in enumerate(planes):
        widths |= {(prev, c0), (c0, c0)}
        if lvl + 1 < depth:
            widths |= {(2 * c0, c0)}  # tail concat
        prev = planes[lvl + 1] if lvl + 1 < depth else c0
    return sorted(widths)


@pytest.mark.parametrize("bytes_per", [2, 4])
def test_mosaic_block_legality_all_backbone_widths(bytes_per):
    """Mosaic requires a block's last dim be a multiple of 128 OR the full
    array dim, and its 2nd-to-last a multiple of 8 OR full (the first two
    on-chip kernel versions died on exactly these rules — the compile-time
    legality is checkable on CPU, interpret mode is not enough). Mirrors
    the block shapes _band_conv_impl/_band_conv_bwd construct. At bf16 (the
    shipped prod residency) EVERY m=16 width must engage the kernel; f32
    may fall back at the wide deep-tail widths (few bricks, XLA is fine)."""
    from geoformer_tpu.ops.brick_pallas import _plan_bwd, _plan_fwd

    def lane_ok(block_last, full_last):
        return block_last == full_last or block_last % 128 == 0

    for m in (16, 32):
        for cin, cout in _backbone_widths(m=m):
            if not banded_fits(cin, cout, bytes_per):
                assert bytes_per == 4 or m == 32, (m, cin, cout)
                continue
            nf = 8 * cout
            s, _ = _plan_fwd(8, cin, cout, bytes_per)
            # fwd: x [b0,10,10,8,10C] (lane = full dim), wb [1,10C,8Co/s]
            # (sublane = full dim), o [b0,8,8,8,8Co/s] — the only non-full
            # block dim is the 8Co split
            assert lane_ok(nf // s, nf), (cin, cout, s)
            ks, _ = _plan_bwd(8, cin, cout, bytes_per)
            # bwd: g [b0,8,8,8,8Co/ks] (lane split), wbt [1,8Co/ks,10C]
            # (sublane split, lane full), dx [b0,10,10,8,10C] (lane full)
            assert lane_ok(nf // ks, nf), (cin, cout, ks)
            assert ks == 1 or (nf // ks) % 8 == 0
    # the shipped bf16 residency engages the kernel at every m=16 width
    if bytes_per == 2:
        assert all(banded_fits(c, o, 2) for c, o in _backbone_widths(m=16))


@pytest.mark.parametrize("cin,cout,dtype", [(112, 112, jnp.float32),
                                            (224, 112, jnp.bfloat16)])
def test_band_conv_split_matches_xla(cin, cout, dtype):
    """Widths/dtypes that force splits > 1 in BOTH passes: the deepest
    level at f32 and the deepest concat at bf16 (the shipped prod
    residency; that width at f32 falls back to XLA entirely)."""
    from geoformer_tpu.ops.brick_pallas import _plan_bwd, _plan_fwd

    bp = jnp.dtype(dtype).itemsize
    assert _plan_fwd(8, cin, cout, bp)[0] > 1
    assert _plan_bwd(8, cin, cout, bp)[0] > 1
    rng = np.random.default_rng(13)
    xp32 = rng.normal(size=(2, 10, 10, 10, cin)).astype(np.float32) * 0.25
    w32 = rng.normal(size=(27, cin, cout)).astype(np.float32) * 0.1
    xp = jnp.asarray(xp32, dtype)
    w = jnp.asarray(w32, dtype)
    rtol, atol = (2e-4, 2e-4) if dtype == jnp.float32 else (0.1, 0.3)
    got = band_conv_padded(xp, w, True)
    assert got.dtype == dtype  # residency-dtype output
    # oracle at f32 operand precision (f32 accumulation both sides)
    want = _xla_conv(xp.astype(jnp.float32), w.astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want), rtol=rtol, atol=atol)
    # grads through the K-split bwd kernel
    cot = jnp.asarray(rng.normal(size=got.shape).astype(np.float32))
    gx_p = jax.grad(lambda x: jnp.sum(band_conv_padded(x, w, True) * cot))(xp)
    gx_x = jax.grad(lambda x: jnp.sum(
        _xla_conv(x.astype(jnp.float32), w.astype(jnp.float32)) * cot))(xp)
    np.testing.assert_allclose(np.asarray(gx_p, np.float32),
                               np.asarray(gx_x, np.float32),
                               rtol=rtol, atol=atol * 2)
