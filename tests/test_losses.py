"""Matcher + criterion tests against hand-computable cases."""

import numpy as np
import jax
import jax.numpy as jnp

from geoformer_tpu.losses.matcher import (
    build_gt_instances,
    dice_cost,
    hungarian_assign,
)
from geoformer_tpu.losses.criterion import InstSetCriterion, softmax_cross_entropy_ignore
from geoformer_tpu.losses.criterion_fs import FSInstSetCriterion, similarity_loss
from geoformer_tpu.utils.config import load_config


def test_build_gt_instances():
    inst = jnp.asarray([[0, 0, 1, 1, -100, 2, 0, -100]])
    sem = jnp.asarray([[4, 4, 5, 5, 2, 6, 4, 2]])
    valid = jnp.asarray([[True] * 7 + [False]])
    masks, iv, isem = build_gt_instances(inst, sem, valid, 4)
    assert masks.shape == (1, 4, 8)
    np.testing.assert_array_equal(np.asarray(iv[0]), [True, True, True, False])
    np.testing.assert_array_equal(np.asarray(isem[0]), [4, 5, 6, 0])
    np.testing.assert_array_equal(np.asarray(masks[0, 0]), [1, 1, 0, 0, 0, 0, 1, 0])


def test_hungarian_matches_perfect_predictions():
    rng = np.random.default_rng(0)
    Q, I, F = 6, 4, 50
    inst = np.full(F, -100, np.int32)
    inst[:10] = 0
    inst[10:20] = 1
    inst[20:30] = 2
    sem = np.where(inst >= 0, inst + 4, 2).astype(np.int32)
    valid = np.ones(F, bool)
    masks, iv, isem = build_gt_instances(
        jnp.asarray(inst[None]), jnp.asarray(sem[None]), jnp.asarray(valid[None]), I
    )
    # predictions: query q predicts instance (q+1)%3 strongly
    logits = np.full((Q, F), -10.0, np.float32)
    perm = [2, 0, 1]
    for q in range(3):
        tgt = perm[q]
        logits[q, tgt * 10 : (tgt + 1) * 10] = 10.0
    cost = dice_cost(jnp.asarray(logits), masks[0], jnp.asarray(valid))
    pred = hungarian_assign(cost[None], iv)
    pred = np.asarray(pred[0])
    assert pred[perm[0]] == 0 and pred[perm[1]] == 1 and pred[perm[2]] == 2


def test_cross_entropy_ignore():
    logits = jnp.asarray([[2.0, 0.0], [0.0, 2.0], [5.0, 0.0]])
    labels = jnp.asarray([0, 1, -100])
    got = float(softmax_cross_entropy_ignore(logits, labels))
    expect = -np.log(np.exp(2) / (np.exp(2) + 1))
    np.testing.assert_allclose(got, expect, rtol=1e-5)


def _fake_outputs(rng, B, Q, F, C, L, max_inst):
    inst = rng.integers(-1, 3, size=(B, F)).astype(np.int32)
    inst[inst < 0] = -100
    sem = np.where(inst >= 0, inst + 4, 1).astype(np.int32)
    fg_valid = np.ones((B, F), bool)
    fg_valid[:, -5:] = False
    outputs = {
        "semantic_scores": jnp.asarray(rng.normal(size=(B, 200, C)).astype(np.float32)),
        "mask_logits": jnp.asarray(rng.normal(size=(L, B, Q, F)).astype(np.float32)),
        "cls_logits": jnp.asarray(rng.normal(size=(L, B, Q, C)).astype(np.float32)),
        "fg_idx": jnp.asarray(np.tile(np.arange(F, dtype=np.int32), (B, 1))),
        "fg_valid": jnp.asarray(fg_valid),
        "query_valid": jnp.ones((B, Q), bool),
        "similarity": jnp.asarray(rng.normal(size=(B, Q)).astype(np.float32)),
    }
    batch = {
        "labels": jnp.asarray(np.tile(sem[:, :1], (1, 200)) * 0 + 4),
        "instance_labels": jnp.asarray(
            np.pad(inst, ((0, 0), (0, 200 - F)), constant_values=-100)
        ),
        "point_mask": jnp.ones((B, 200), bool),
    }
    batch["labels"] = jnp.asarray(
        np.pad(sem, ((0, 0), (0, 200 - F)), constant_values=-100)
    )
    return outputs, batch


def test_supervised_criterion_runs():
    cfg = load_config(None, n_query_points=8, tpu_max_instances=8, prepare_epochs=0)
    crit = InstSetCriterion(cfg)
    rng = np.random.default_rng(1)
    outputs, batch = _fake_outputs(rng, B=2, Q=8, F=50, C=13, L=2, max_inst=8)
    loss, ld = crit(outputs, batch, epoch=5)
    assert np.isfinite(float(loss))
    for k in ("sem_loss", "dice_loss", "focal_loss", "cls_loss"):
        assert np.isfinite(float(ld[k])), k

    # prepare phase: only semantic
    loss2, ld2 = crit(outputs, batch, epoch=0)
    assert "dice_loss" not in ld2


def test_fs_criterion_runs():
    cfg = load_config(None, n_query_points=8, tpu_max_instances=8, prepare_epochs=0)
    crit = FSInstSetCriterion(cfg)
    rng = np.random.default_rng(2)
    outputs, batch = _fake_outputs(rng, B=2, Q=8, F=50, C=13, L=2, max_inst=8)
    loss, ld = crit(outputs, batch, epoch=5)
    assert np.isfinite(float(loss))
    assert "sim_loss" in ld and "dice_loss" in ld


def test_similarity_loss_perfect_predictions():
    # one query exactly covers instance 0 -> positive with low loss when
    # similarity logit is high
    F = 30
    inst = np.full((1, F), -100, np.int32)
    inst[0, :10] = 0
    fg_valid = np.ones((1, F), bool)
    mask_logits = np.full((1, 2, F), -10.0, np.float32)
    mask_logits[0, 0, :10] = 10.0  # query 0 covers inst 0 (iou 1.0 -> pos)
    mask_logits[0, 1, 15:25] = 10.0  # query 1 covers unlabeled -> negative
    sim = np.asarray([[8.0, -8.0]], np.float32)  # confident correct
    qv = np.ones((1, 2), bool)
    l_good = float(
        similarity_loss(
            jnp.asarray(sim), jnp.asarray(mask_logits), jnp.asarray(inst),
            jnp.asarray(fg_valid), jnp.asarray(qv), 2,
        )
    )
    sim_bad = np.asarray([[-8.0, 8.0]], np.float32)
    l_bad = float(
        similarity_loss(
            jnp.asarray(sim_bad), jnp.asarray(mask_logits), jnp.asarray(inst),
            jnp.asarray(fg_valid), jnp.asarray(qv), 2,
        )
    )
    assert l_good < 0.01 < l_bad
