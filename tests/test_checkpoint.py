"""Checkpoint round-trip + tolerant partial restore."""

import jax
import numpy as np

from geoformer_tpu.utils.checkpoint import (
    align_and_update,
    checkpoint_path,
    find_last_checkpoint,
    load_checkpoint,
    save_checkpoint,
)
from geoformer_tpu.utils.scheduler import adjust_learning_rate, cosine_lr_after_step


def test_save_load_roundtrip(tmp_path):
    state = {
        "params": {"a": np.ones((2, 3), np.float32), "b": {"w": np.arange(4.0)}},
        "epoch": 7,
    }
    p = str(tmp_path / "ckpt.ckpt")
    save_checkpoint(p, state)
    loaded = load_checkpoint(p)
    np.testing.assert_array_equal(loaded["params"]["a"], state["params"]["a"])
    assert int(loaded["epoch"]) == 7


def test_align_and_update_partial():
    target = {
        "backbone": {"w": np.zeros((3, 3))},
        "head": {"w": np.zeros((5,))},
        "new_module": {"w": np.zeros((2,))},
    }
    loaded = {
        "backbone": {"w": np.ones((3, 3))},
        "head": {"w": np.ones((7,))},  # shape mismatch -> skipped
    }
    out = align_and_update(target, loaded)
    np.testing.assert_array_equal(out["backbone"]["w"], 1.0)
    np.testing.assert_array_equal(out["head"]["w"], 0.0)
    np.testing.assert_array_equal(out["new_module"]["w"], 0.0)


def test_find_last_checkpoint(tmp_path):
    d = str(tmp_path)
    assert find_last_checkpoint(d) is None
    save_checkpoint(checkpoint_path(d, 3), {"epoch": 3})
    save_checkpoint(checkpoint_path(d, 10), {"epoch": 10})
    assert find_last_checkpoint(d).endswith("checkpoint_epoch_10.ckpt")
    save_checkpoint(checkpoint_path(d), {"epoch": 11})
    assert find_last_checkpoint(d).endswith("checkpoint_last.ckpt")


def test_opt_state_roundtrip(tmp_path, tiny_cfg):
    """Full resume restores optimizer moments (reference saves optimizer)."""
    import jax.numpy as jnp
    import optax

    from geoformer_tpu.parallel.train_state import TrainState, make_optimizer
    from geoformer_tpu.utils.checkpoint import restore_train_state, state_payload

    params = {"backbone": {"w": np.ones((3, 3), np.float32)}}
    tx = make_optimizer(tiny_cfg, params)
    state = TrainState(
        step=0, params=params, batch_stats={}, constants={}, opt_state=tx.init(params)
    )
    grads = {"backbone": {"w": np.full((3, 3), 0.5, np.float32)}}
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    state = state.replace(
        step=5,
        params=optax.apply_updates(state.params, updates),
        opt_state=opt_state,
    )
    p = str(tmp_path / "full.ckpt")
    save_checkpoint(p, state_payload(state, epoch=3))
    loaded = load_checkpoint(p)
    fresh = TrainState(
        step=0, params=params, batch_stats={}, constants={}, opt_state=tx.init(params)
    )
    restored = restore_train_state(fresh, loaded)
    assert restored.step == 5
    # Adam moments survive the round trip
    mu0 = jax.tree_util.tree_leaves(state.opt_state)
    mu1 = jax.tree_util.tree_leaves(restored.opt_state)
    assert len(mu0) == len(mu1)
    for a, b in zip(mu0, mu1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_schedulers():
    # warmup then cosine
    lr0 = adjust_learning_rate(1e-3, 1e-6, 1e-6, 3, 100, 0)
    lr2 = adjust_learning_rate(1e-3, 1e-6, 1e-6, 3, 100, 2)
    lr3 = adjust_learning_rate(1e-3, 1e-6, 1e-6, 3, 100, 3)
    lr100 = adjust_learning_rate(1e-3, 1e-6, 1e-6, 3, 100, 100)
    assert lr0 < lr2 < lr3
    np.testing.assert_allclose(lr3, 1e-3, rtol=1e-6)
    np.testing.assert_allclose(lr100, 1e-6, rtol=1e-3)

    assert cosine_lr_after_step(1e-3, 5, 10, 100) == 1e-3
    assert cosine_lr_after_step(1e-3, 50, 10, 100) < 1e-3


def test_sgd_weight_decay_and_lr_injection(tiny_cfg):
    """Reference SGD carries weight_decay (train.py:192-197); LR is injected
    per epoch through the optax hyperparams."""
    from geoformer_tpu.parallel.train_state import _set_lr, make_optimizer

    cfg = tiny_cfg.replace(optim="SGD", lr=0.1, momentum=0.9, weight_decay=1e-4)
    params = {"backbone": {"w": np.ones(3, np.float32)}}
    tx = make_optimizer(cfg, params)
    st = _set_lr(tx.init(params), 0.05)
    grads = {"backbone": {"w": np.ones(3, np.float32)}}
    ups, _ = tx.update(grads, st, params)
    np.testing.assert_allclose(np.asarray(ups["backbone"]["w"]), -0.05 * (1 + 1e-4), rtol=1e-6)
