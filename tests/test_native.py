"""Native C++ host ops vs their numpy/scipy fallbacks (bit-compatibility)."""

import numpy as np
import pytest

from geoformer_tpu import native


def _scipy_blur(noise):
    import scipy.ndimage

    blur0 = np.ones((3, 1, 1), np.float32) / 3
    blur1 = np.ones((1, 3, 1), np.float32) / 3
    blur2 = np.ones((1, 1, 3), np.float32) / 3
    grids = [g for g in noise]
    for blur in (blur0, blur1, blur2, blur0, blur1, blur2):
        grids = [scipy.ndimage.convolve(g, blur, mode="constant", cval=0) for g in grids]
    return np.stack(grids)


def _scipy_gather(noise, gran, pts):
    import scipy.interpolate

    d = noise.shape[1:]
    ax = [np.linspace(-(b - 1) * gran, (b - 1) * gran, b) for b in d]
    interp = [
        scipy.interpolate.RegularGridInterpolator(ax, n, bounds_error=False, fill_value=0)
        for n in noise
    ]
    return np.stack([i(pts) for i in interp], axis=1).astype(np.float32)


def test_native_lib_builds():
    assert native.get_lib() is not None, "g++ build of host_ops.cpp failed"


def test_voxelize_idx_matches_numpy_unique():
    rng = np.random.default_rng(0)
    coords = rng.integers(0, 16, size=(500, 3)).astype(np.int32)
    input_map, vox, counts = native.voxelize_idx(coords, spatial=32)
    # every point maps to a voxel with its own coords
    np.testing.assert_array_equal(vox[input_map], coords)
    # counts are consistent
    assert counts.sum() == 500
    m = len(vox)
    assert m == len(np.unique(coords.astype(np.int64) @ np.array([1, 10**3, 10**6])))
    # keys strictly ascending (sorted order contract)
    keys = (vox[:, 2].astype(np.int64) * 32 + vox[:, 1]) * 32 + vox[:, 0]
    assert np.all(np.diff(keys) > 0)


def test_voxelize_idx_batched():
    coords = np.zeros((6, 3), np.int32)  # same cell, 3 batches
    batch = np.array([0, 0, 1, 1, 2, 2], np.int32)
    input_map, vox, counts = native.voxelize_idx(coords, batch, spatial=8)
    assert len(vox) == 3
    np.testing.assert_array_equal(counts, [2, 2, 2])
    assert input_map[0] != input_map[2] != input_map[4]


def test_voxel_rulebook():
    input_map = np.array([0, 1, 0, 2, 0, 1], np.int32)
    rb = native.voxel_rulebook(input_map, 3, max_active=2)
    assert rb.shape == (3, 3)
    np.testing.assert_array_equal(rb[:, 0], [2, 2, 1])  # count clamped to 2
    assert set(rb[0, 1:3]) <= {0, 2, 4}
    np.testing.assert_array_equal(rb[2], [1, 3, -1])


def test_elastic_blur_matches_scipy():
    if native.get_lib() is None:
        pytest.skip("no native lib")
    rng = np.random.default_rng(1)
    noise = rng.standard_normal((3, 7, 6, 5)).astype(np.float32)
    np.testing.assert_allclose(
        native.elastic_blur(noise), _scipy_blur(noise), rtol=1e-5, atol=1e-6
    )


def test_trilinear_gather_matches_scipy():
    if native.get_lib() is None:
        pytest.skip("no native lib")
    rng = np.random.default_rng(2)
    noise = rng.standard_normal((3, 9, 8, 7)).astype(np.float32)
    gran = 6.0
    # in-bounds points + a few out of bounds
    pts = rng.uniform(-40, 40, size=(200, 3)).astype(np.float32)
    got = native.trilinear_gather(noise, gran, pts)
    want = _scipy_gather(noise, gran, pts)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_elastic_augment_runs():
    from geoformer_tpu.data.augment import elastic

    rng = np.random.default_rng(3)
    x = rng.uniform(0, 100, size=(1000, 3)).astype(np.float32)
    out = elastic(x, 6 * 50 // 50, 40 * 50 / 50, rng)
    assert out.shape == x.shape
    assert np.isfinite(out).all()
    assert not np.allclose(out, x)  # it actually distorted
