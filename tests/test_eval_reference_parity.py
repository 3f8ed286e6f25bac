"""AP parity: our evaluator vs the reference's util/eval.py on random data.

The reference evaluator is pure numpy/torch-cpu and importable (its cfg
singleton parses sys.argv at import, so we shim argv). We feed identical
randomized predictions/gt to both and require identical AP / AP50 / AP25
per class and on average — the strongest available check that our ScanNet
protocol implementation matches, short of real checkpoints.
"""

import os
import sys

import numpy as np
import pytest


@pytest.fixture(scope="module")
def ref_eval():
    ref_root = "/root/reference"
    if not os.path.isdir(ref_root):
        pytest.skip("reference tree not mounted")
    argv_backup = sys.argv
    sys.argv = [
        "parity",
        "--config", os.path.join(ref_root, "config", "test_geoformer_scannet.yaml"),
        "--output_path", "/tmp/ref_eval_parity",
    ]
    # the reference targets numpy<1.20 (np.float et al.); shim the aliases
    for alias, typ in (("float", float), ("int", int), ("bool", bool), ("long", int)):
        if not hasattr(np, alias):
            setattr(np, alias, typ)
    sys.path.insert(0, ref_root)
    try:
        import util.eval as ref_eval_mod  # noqa: PLC0415
    finally:
        sys.argv = argv_backup
        sys.path.remove(ref_root)
    return ref_eval_mod


def _random_scene(rng, n_points=2000, n_gt=6, n_pred=10):
    """Random gt ids + prediction masks over fold-0 classes (+ void)."""
    fold0_bench = [3, 4, 5, 8, 10, 12, 14, 16, 36]
    gt_ids = np.zeros(n_points, np.int64)
    start = 0
    for g in range(n_gt):
        size = rng.integers(120, 400)
        cls = rng.choice(fold0_bench + [1, 2])  # some void (wall/floor) gt
        gt_ids[start : start + size] = cls * 1000 + g + 1
        start += size
        if start >= n_points:
            break
    preds = {"label_id": [], "conf": [], "mask": []}
    for _ in range(n_pred):
        cls = int(rng.choice(fold0_bench))
        conf = float(rng.random())
        mask = np.zeros(n_points, np.int32)
        # overlap a random gt span with jitter, or random points
        if rng.random() < 0.7 and n_gt:
            g = int(rng.integers(0, n_gt))
            lo = g * 250
            hi = min(lo + int(rng.integers(100, 380)), n_points)
            mask[lo:hi] = 1
        else:
            mask[rng.choice(n_points, 300, replace=False)] = 1
        preds["label_id"].append(cls)
        preds["conf"].append(conf)
        preds["mask"].append(mask)
    pred_info = {
        "label_id": np.asarray(preds["label_id"], np.int64),
        "conf": np.asarray(preds["conf"], np.float64),
        "mask": np.stack(preds["mask"]),
    }
    return gt_ids, pred_info


def test_ap_matches_reference(ref_eval):
    from geoformer_tpu.evaluation.scannet_eval import ScanNetEval

    rng = np.random.default_rng(42)
    ours = ScanNetEval(cvfold=0)
    matches = {}
    for s in range(6):
        gt_ids, pred_info = _random_scene(rng)
        scene = f"scene{s:04d}_00"
        ours.assign_instances_for_scan(scene, pred_info, gt_ids)
        gt2pred, pred2gt = ref_eval.assign_instances_for_scan(scene, pred_info, gt_ids)
        matches[scene] = {"gt": gt2pred, "pred": pred2gt}

    ref_aps = ref_eval.evaluate_matches(matches)
    ref_avgs = ref_eval.compute_averages(ref_aps)
    our_avgs = ours.compute_averages()

    assert np.isclose(our_avgs["all_ap"], ref_avgs["all_ap"], equal_nan=True)
    assert np.isclose(our_avgs["all_ap_50%"], ref_avgs["all_ap_50%"], equal_nan=True)
    assert np.isclose(our_avgs["all_ap_25%"], ref_avgs["all_ap_25%"], equal_nan=True)
    for cls, ref_c in ref_avgs["classes"].items():
        our_c = our_avgs["classes"][cls]
        for k in ("ap", "ap50%", "ap25%"):
            np.testing.assert_allclose(
                our_c[k], ref_c[k], rtol=1e-9, atol=1e-12, equal_nan=True,
                err_msg=f"{cls}/{k}",
            )
