"""Test harness: force an 8-device virtual CPU mesh before jax import.

Multi-chip hardware is not available in CI; sharding paths are validated on a
virtual CPU mesh per the build contract.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: env presets axon (the TPU tunnel)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# the axon sitecustomize force-registers the TPU tunnel backend regardless of
# JAX_PLATFORMS; override via config (must happen before first backend use)
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    return jax.devices()


@pytest.fixture(scope="session")
def tiny_cfg():
    from geoformer_tpu.utils.config import load_config

    return load_config(
        None,
        batch_size=2,
        m=4,
        classes=13,
        dec_dim=16,
        dec_nhead=4,
        dec_ffn_dim=16,
        dec_nlayers=2,
        n_decode_point=32,
        n_query_points=8,
        n_downsampling=256,
        tpu_max_points=512,
        tpu_max_voxels=512,
        tpu_max_fg_points=256,
        tpu_train_subsample=128,
        tpu_max_instances=8,
        tpu_knn_neighbors=8,
        tpu_geodesic_steps_train=16,
        tpu_geodesic_steps_eval=32,
        tpu_spatial_shape=64,
        tpu_unet_depth=3,
        tpu_ball_nsample=8,
    )
