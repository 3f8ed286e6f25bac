"""Engine train-step + multi-chip dryrun + entry compile checks."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from geoformer_tpu.engine import Engine
from geoformer_tpu.parallel.mesh import make_mesh
from tests.test_model_forward import synthetic_batch


def small_cfg(tiny_cfg, **kw):
    return tiny_cfg.replace(prepare_epochs=0, **kw)


def test_supervised_train_step_updates_params(tiny_cfg):
    cfg = small_cfg(tiny_cfg, batch_size=2)
    mesh = make_mesh(2)
    engine = Engine(cfg, few_shot=False, mesh=mesh)
    rng = np.random.default_rng(0)
    batch = synthetic_batch(rng, 2, cfg.tpu_max_points, cfg.tpu_spatial_shape)
    state = engine.init_state(batch, seed=0)
    p_before = jax.device_get(state.params)

    state, loss, loss_dict, lr = engine.train_step(
        state, batch, epoch=1, rng=jax.random.PRNGKey(1)
    )
    assert np.isfinite(float(loss))
    p_after = jax.device_get(state.params)
    changed = jax.tree.reduce(
        lambda a, b: a or b,
        jax.tree.map(lambda a, b: bool(np.any(a != b)), p_before, p_after),
    )
    assert changed

    # second step reuses the compiled function
    state, loss2, _, _ = engine.train_step(state, batch, epoch=2, rng=jax.random.PRNGKey(2))
    assert np.isfinite(float(loss2))


def test_supervised_prepare_phase(tiny_cfg):
    cfg = tiny_cfg.replace(prepare_epochs=5, batch_size=2)
    engine = Engine(cfg, few_shot=False, mesh=make_mesh(1))
    rng = np.random.default_rng(1)
    batch = synthetic_batch(rng, 2, cfg.tpu_max_points, cfg.tpu_spatial_shape)
    state = engine.init_state(batch, seed=0)
    state, loss, loss_dict, _ = engine.train_step(
        state, batch, epoch=1, rng=jax.random.PRNGKey(0)
    )
    assert "dice_loss" not in loss_dict  # semantic-only phase


def test_fs_train_step(tiny_cfg):
    cfg = small_cfg(tiny_cfg, batch_size=2, fix_module=["unet", "semantic"])
    engine = Engine(cfg, few_shot=True, mesh=make_mesh(2))
    rng = np.random.default_rng(2)
    query = synthetic_batch(rng, 2, cfg.tpu_max_points, cfg.tpu_spatial_shape)
    support = synthetic_batch(rng, 2, cfg.tpu_max_points, cfg.tpu_spatial_shape)
    support["support_masks"] = jnp.asarray(
        (np.asarray(support["instance_labels"]) == 1).astype(np.int32)
    )
    state = engine.init_state(query, seed=0, example_support=support)
    bb_before = jax.device_get(state.params["backbone"])
    state, loss, _, _ = engine.train_step(
        state, query, epoch=1, rng=jax.random.PRNGKey(0), support=support
    )
    assert np.isfinite(float(loss))
    # frozen backbone must not move
    bb_after = jax.device_get(state.params["backbone"])
    unchanged = jax.tree.reduce(
        lambda a, b: a and b,
        jax.tree.map(lambda a, b: bool(np.all(a == b)), bb_before, bb_after),
    )
    assert unchanged


def test_dryrun_multichip_8():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__

    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)


def test_train_step_deterministic(tiny_cfg):
    """Same seed + data -> bitwise-identical loss (reproducibility contract;
    the reference seeds torch/np/cuda, train.py:165-171)."""
    cfg = small_cfg(tiny_cfg, batch_size=1)
    rng = np.random.default_rng(7)
    batch = synthetic_batch(rng, 1, cfg.tpu_max_points, cfg.tpu_spatial_shape)

    losses = []
    for _ in range(2):
        engine = Engine(cfg, few_shot=False, mesh=make_mesh(1))
        state = engine.init_state(batch, seed=3)
        _, loss, _, _ = engine.train_step(state, batch, epoch=1, rng=jax.random.PRNGKey(11))
        losses.append(float(loss))
    assert losses[0] == losses[1]


def test_grad_accum_matches_single_step(tiny_cfg):
    """grad_accum_steps=2 with the SAME micro-batch twice applies exactly
    the single-step update (mean of two identical grads = the grad), and
    applies it only on the k-th micro-step (params frozen between).
    Replaces the reference's effective-batch story (bs=16 on one GPU,
    /root/reference/config/geoformer_scannet.yaml:38-42) on a chip that
    fits B=1 (BASELINE.md r4 B=2 OOM)."""
    rng = np.random.default_rng(5)
    batch = None

    def run(accum, n_micro):
        nonlocal batch
        cfg = small_cfg(tiny_cfg, batch_size=1, grad_accum_steps=accum)
        engine = Engine(cfg, few_shot=False, mesh=make_mesh(1))
        if batch is None:
            batch = synthetic_batch(rng, 1, cfg.tpu_max_points, cfg.tpu_spatial_shape)
        state = engine.init_state(batch, seed=0)
        states = [jax.device_get(state.params)]
        for i in range(n_micro):
            state, loss, _, _ = engine.train_step(
                state, batch, epoch=1, rng=jax.random.PRNGKey(9)
            )
            states.append(jax.device_get(state.params))
        return states

    acc = run(2, 2)
    ref = run(1, 1)

    def same(a, b):
        return jax.tree.reduce(
            lambda x, y: x and y,
            jax.tree.map(lambda p, q: bool(np.all(p == q)), a, b),
        )

    assert same(acc[0], acc[1])          # micro-step 1: no update applied
    assert not same(acc[1], acc[2])      # micro-step 2: update applied
    # ... and it equals the accum=1 update. Tolerance, not bitwise: the two
    # runs are DIFFERENT compiled programs (MultiSteps wraps the optimizer
    # graph), and XLA's fusion/reassociation of the identical Adam math
    # differs at the ~1e-10 level (measured; the accumulated mean of two
    # identical grads is exact in both)
    jax.tree.map(
        lambda p, q: np.testing.assert_allclose(p, q, rtol=1e-5, atol=1e-8),
        acc[2], ref[1],
    )
