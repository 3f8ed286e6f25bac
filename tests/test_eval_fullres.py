"""Full-resolution eval contract: over-capacity scenes score correctly.

When a scene exceeds `tpu_max_points`, `pad_scene` subsamples it and the
device predicts on the subsample. The reference always scores masks at the
scene's full N (/root/reference/test.py:33-134; no eval crop in
datasets/scannetv2_inst.py:389-455). These tests pin our contract: gt is
taken at raw resolution (never truncated) and predicted masks are projected
back to raw N through the recorded `sel` indices — feeding a scene with
N > tpu_max_points through test.py's scoring path must give the same AP as
the full-capacity run.
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

from geoformer_tpu.data.collate import pad_scene
from geoformer_tpu.evaluation.gt import make_gt_ids
from geoformer_tpu.evaluation.predictions import (
    labels_to_raw,
    masks_to_raw,
    nn_projection,
    scene_alignment,
)
from geoformer_tpu.evaluation.scannet_eval import ScanNetEval


def _load_test_driver():
    spec = importlib.util.spec_from_file_location(
        "geoformer_test_driver", os.path.join(ROOT, "test.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def make_clustered_scene(n_inst=3, pts_per_inst=400, seed=0):
    """Well-separated 1m instance clusters so 1-NN projection is exact."""
    rng = np.random.default_rng(seed)
    xyz, labels, inst = [], [], []
    for i in range(n_inst):
        center = np.array([10.0 * i, 0.0, 0.0])
        xyz.append(center + rng.random((pts_per_inst, 3)))
        # raw nyu-remap semantic id 2 = fold0 class "cabinet"
        labels.append(np.full(pts_per_inst, 2, np.int32))
        inst.append(np.full(pts_per_inst, i, np.int32))
    xyz = np.concatenate(xyz)
    raw = np.concatenate(
        [xyz, np.zeros_like(xyz), np.concatenate(labels)[:, None].astype(np.float64),
         np.concatenate(inst)[:, None].astype(np.float64)], axis=1
    )
    scene = {
        "points": xyz.astype(np.float32),
        "feats": np.zeros_like(xyz, np.float32),
        "coords": np.floor(xyz * 50).astype(np.int32),
        "labels": np.concatenate(labels),
        "instance_labels": np.concatenate(inst),
    }
    return raw, scene


def fabricate_proposals(batch, q_cap=8):
    """Perfect predictions on the padded/subsampled points, in the
    proposals layout test.py consumes ([B,Q,P] masks + scores/classes/keep)."""
    inst = np.asarray(batch["instance_labels"][0])
    pmask = np.asarray(batch["point_mask"][0])
    p = inst.shape[0]
    inst_ids = sorted(set(inst[pmask & (inst >= 0)]))
    masks = np.zeros((q_cap, p), np.int32)
    scores = np.zeros(q_cap, np.float32)
    classes = np.zeros(q_cap, np.int32)
    keep = np.zeros(q_cap, bool)
    for q, i in enumerate(inst_ids):
        masks[q] = ((inst == i) & pmask).astype(np.int32)
        scores[q] = 0.9
        classes[q] = 4  # remapped class 4 -> fold0[0]=2 -> benchmark id 3
        keep[q] = True
    return {
        "masks": masks[None],
        "scores": scores[None],
        "classes": classes[None],
        "keep": keep[None],
    }


class _Cfg:
    cvfold = 0
    TEST_NMS_THRESH = 0.05


def run_scoring_path(raw, scene, max_points):
    """test.py's per-scene scoring path: pad -> proposals -> pred_info ->
    untruncated gt -> evaluator."""
    driver = _load_test_driver()
    batch = {k: np.asarray(v)[None] for k, v in pad_scene(dict(scene), max_points).items()}
    proposals = fabricate_proposals(batch)
    pred_info = driver.proposals_to_pred_info(_Cfg(), proposals, batch, raw[:, :3])
    gt_ids = make_gt_ids(raw[:, 6].astype(np.int32), raw[:, 7].astype(np.int32))
    ev = ScanNetEval(cvfold=0)
    ev.assign_instances_for_scan("scene_test", pred_info, gt_ids)
    return ev.compute_averages(), pred_info


def test_overcapacity_ap_equals_full_capacity():
    raw, scene = make_clustered_scene()
    n = raw.shape[0]  # 1200
    avgs_sub, pred_sub = run_scoring_path(raw, scene, max_points=512)
    avgs_full, pred_full = run_scoring_path(raw, scene, max_points=2048)

    # every mask is at raw resolution in both runs
    assert all(m.shape[0] == n for m in pred_sub["mask"])
    assert all(m.shape[0] == n for m in pred_full["mask"])
    # separated clusters -> the 1-NN projection reconstructs the exact masks
    np.testing.assert_array_equal(
        np.asarray(pred_sub["mask"]), np.asarray(pred_full["mask"])
    )
    assert avgs_full["all_ap_50%"] == 1.0
    assert avgs_sub["all_ap_50%"] == avgs_full["all_ap_50%"]
    assert avgs_sub["all_ap"] == avgs_full["all_ap"]
    assert avgs_sub["all_ap_25%"] == avgs_full["all_ap_25%"]


def test_scene_alignment_identity_when_fits():
    raw, scene = make_clustered_scene()
    batch = {k: np.asarray(v)[None] for k, v in pad_scene(dict(scene), 2048).items()}
    n_points, n_raw, sel = scene_alignment(batch)
    assert n_points == n_raw == raw.shape[0]
    np.testing.assert_array_equal(sel, np.arange(raw.shape[0]))


def test_sel_records_subsample_indices():
    raw, scene = make_clustered_scene()
    batch = {k: np.asarray(v)[None] for k, v in pad_scene(dict(scene), 512).items()}
    n_points, n_raw, sel = scene_alignment(batch)
    assert n_points == 512 and n_raw == raw.shape[0]
    # sel indexes the raw scene: padded points equal raw points gathered at sel
    np.testing.assert_allclose(
        np.asarray(batch["points"][0][:512]), raw[sel, :3].astype(np.float32)
    )
    # labels gathered through sel match too (the alignment the old
    # truncation `[:n_points]` silently violated)
    np.testing.assert_array_equal(
        np.asarray(batch["instance_labels"][0][:512]), raw[sel, 7].astype(np.int32)
    )


def test_nn_projection_exact_on_kept_points():
    raw, scene = make_clustered_scene()
    batch = {k: np.asarray(v)[None] for k, v in pad_scene(dict(scene), 512).items()}
    _, _, sel = scene_alignment(batch)
    nn = nn_projection(raw[:, :3], sel)
    # every kept point maps to itself
    np.testing.assert_array_equal(nn[sel], np.arange(len(sel)))


def test_labels_to_raw_shape_and_identity():
    raw, scene = make_clustered_scene()
    batch = {k: np.asarray(v)[None] for k, v in pad_scene(dict(scene), 512).items()}
    n_points, n_raw, sel = scene_alignment(batch)
    sem = np.asarray(batch["labels"][0]).astype(np.float32)[:, None]
    up = labels_to_raw(sem, batch, raw[:, :3])
    assert up.shape == (n_raw, 1)
    np.testing.assert_array_equal(up[sel, 0], sem[:n_points, 0])
