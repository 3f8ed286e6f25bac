"""Pallas FPS (interpret mode on CPU) vs the XLA reference implementation."""

import numpy as np
import jax
import jax.numpy as jnp

from geoformer_tpu.ops.fps import furthest_point_sample
from geoformer_tpu.ops.fps_pallas import fps_pallas


def test_fps_pallas_matches_xla():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(2, 300, 3)).astype(np.float32)
    mask = np.ones((2, 300), bool)
    mask[1, 250:] = False
    want_i, want_m = furthest_point_sample(jnp.asarray(pts), jnp.asarray(mask), 32)
    got_i, got_m = fps_pallas(jnp.asarray(pts), jnp.asarray(mask), 32, interpret=True)
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
    np.testing.assert_array_equal(np.asarray(got_m), np.asarray(want_m))


def test_fps_pallas_prefix_property():
    """FPS prefix: first k of FPS(n) == FPS(k) — queries depend on this
    (geoformer.py:450-451)."""
    rng = np.random.default_rng(1)
    pts = rng.normal(size=(1, 200, 3)).astype(np.float32)
    mask = np.ones((1, 200), bool)
    i16, _ = fps_pallas(jnp.asarray(pts), jnp.asarray(mask), 16, interpret=True)
    i64, _ = fps_pallas(jnp.asarray(pts), jnp.asarray(mask), 64, interpret=True)
    np.testing.assert_array_equal(np.asarray(i16)[0], np.asarray(i64)[0, :16])


def test_fps_pallas_no_invalid_picks():
    rng = np.random.default_rng(2)
    pts = rng.normal(size=(1, 256, 3)).astype(np.float32)
    mask = np.zeros((1, 256), bool)
    mask[0, :40] = True
    idx, valid = fps_pallas(jnp.asarray(pts), jnp.asarray(mask), 40, interpret=True)
    assert np.asarray(idx).max() < 40
    assert np.asarray(valid).all()
