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
    assert got.dtype == jnp.float32  # f32 accumulation contract
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0.1, atol=0.15)


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
    assert banded_fits(16, 16)            # level 0
    assert banded_fits(64, 32)            # level-1 tail
    assert not banded_fits(224, 112)      # deep-level concat: XLA fallback
