"""Matrix NMS + ScanNet AP protocol tests."""

import numpy as np
import jax.numpy as jnp

from geoformer_tpu.evaluation.gt import make_gt_ids
from geoformer_tpu.evaluation.scannet_eval import ScanNetEval, average_over_runs
from geoformer_tpu.ops.nms import matrix_nms


def test_matrix_nms_suppresses_duplicates():
    P = 200
    m1 = np.zeros(P, bool)
    m1[:100] = True
    m2 = np.zeros(P, bool)
    m2[5:100] = True  # heavy overlap with m1
    m3 = np.zeros(P, bool)
    m3[150:] = True  # disjoint
    masks = jnp.asarray(np.stack([m1, m2, m3]))
    scores = jnp.asarray([0.9, 0.8, 0.7])
    cats = jnp.asarray([4, 4, 4])
    valid = jnp.ones(3, bool)
    keep, new_scores = matrix_nms(masks, scores, cats, valid, final_score_thresh=0.3)
    keep = np.asarray(keep)
    assert keep[0] and keep[2]
    assert not keep[1]  # decayed below threshold
    # different category is not suppressed
    keep2, _ = matrix_nms(masks, scores, jnp.asarray([4, 5, 4]), valid, final_score_thresh=0.3)
    assert np.asarray(keep2)[1]


def _perfect_scene(n=1000):
    """GT: two chairs (label 5 -> fold0 'chair', benchmark id 5)."""
    raw_labels = np.full(n, -100, np.int32)
    inst = np.full(n, -100, np.int32)
    raw_labels[:300] = 4  # raw label 4 == 'chair' in 0-19 remap? use bench map
    inst[:300] = 0
    raw_labels[300:500] = 4
    inst[300:500] = 1
    gt_ids = make_gt_ids(raw_labels, inst)
    return raw_labels, inst, gt_ids


def test_scannet_eval_perfect_predictions():
    _, _, gt_ids = _perfect_scene()
    bench_id = int(np.unique(gt_ids[gt_ids > 0] // 1000)[0])
    ev = ScanNetEval(cvfold=0)
    if bench_id not in ev.id_to_label:
        ev = ScanNetEval(cvfold=1)
    assert bench_id in ev.id_to_label

    masks = np.zeros((2, 1000), np.int32)
    masks[0, :300] = 1
    masks[1, 300:500] = 1
    pred_info = {
        "label_id": np.asarray([bench_id, bench_id]),
        "conf": np.asarray([0.95, 0.9]),
        "mask": masks,
    }
    ev.assign_instances_for_scan("scene0000_00", pred_info, gt_ids)
    avgs = ev.compute_averages()
    assert avgs["all_ap_50%"] == 1.0
    assert avgs["all_ap"] == 1.0


def test_scannet_eval_false_positive_lowers_ap():
    _, _, gt_ids = _perfect_scene()
    bench_id = int(np.unique(gt_ids[gt_ids > 0] // 1000)[0])
    ev = ScanNetEval(cvfold=0)
    if bench_id not in ev.id_to_label:
        ev = ScanNetEval(cvfold=1)
    masks = np.zeros((3, 1000), np.int32)
    masks[0, :300] = 1
    masks[1, 300:500] = 1
    masks[2, 500:800] = 1  # false positive on unannotated region... void -> ignored
    pred_info = {
        "label_id": np.asarray([bench_id] * 3),
        "conf": np.asarray([0.95, 0.9, 0.99]),
        "mask": masks,
    }
    ev.assign_instances_for_scan("scene0000_00", pred_info, gt_ids)
    avgs = ev.compute_averages()
    # the FP overlaps void (unannotated) so it is ignored by the protocol
    assert avgs["all_ap_50%"] == 1.0

    # FP on annotated-but-wrong region instead
    ev.reset()
    raw_labels = np.full(1000, -100, np.int32)
    inst = np.full(1000, -100, np.int32)
    raw_labels[:300] = 4
    inst[:300] = 0
    raw_labels[300:500] = 4
    inst[300:500] = 1
    raw_labels[500:800] = 4
    inst[500:800] = 2  # third real instance, not predicted well
    gt_ids2 = make_gt_ids(raw_labels, inst)
    masks2 = np.zeros((3, 1000), np.int32)
    masks2[0, :300] = 1
    masks2[1, 300:500] = 1
    masks2[2, 500:650] = 1  # 50% overlap: below 0.5 IoU of gt inst 2
    pred_info2 = {
        "label_id": np.asarray([bench_id] * 3),
        "conf": np.asarray([0.95, 0.9, 0.99]),
        "mask": masks2,
    }
    ev.assign_instances_for_scan("scene0000_00", pred_info2, gt_ids2)
    avgs2 = ev.compute_averages()
    assert avgs2["all_ap_50%"] < 1.0


def test_average_over_runs():
    a = {"all_ap": 0.5, "all_ap_50%": 0.6, "all_ap_25%": 0.7,
         "classes": {"chair": {"ap": 0.5, "ap50%": 0.6, "ap25%": 0.7}}}
    b = {"all_ap": 0.7, "all_ap_50%": 0.8, "all_ap_25%": 0.9,
         "classes": {"chair": {"ap": 0.7, "ap50%": 0.8, "ap25%": 0.9}}}
    out = average_over_runs([a, b])
    np.testing.assert_allclose(out["all_ap"], 0.6)
    np.testing.assert_allclose(out["all_ap_std"], 0.1)
    np.testing.assert_allclose(out["classes"]["chair"]["ap50%"], 0.7)


def test_greedy_nms():
    import jax.numpy as jnp
    from geoformer_tpu.ops.nms import greedy_nms

    masks = np.zeros((3, 50), np.float32)
    masks[0, :30] = 1
    masks[1, :28] = 1  # heavy overlap with 0, lower score -> suppressed
    masks[2, 40:] = 1  # disjoint -> kept
    scores = jnp.asarray([0.9, 0.8, 0.5])
    valid = jnp.asarray([True, True, True])
    keep = np.asarray(greedy_nms(jnp.asarray(masks), scores, valid, iou_thresh=0.3))
    np.testing.assert_array_equal(keep, [True, False, True])


def test_decoupled_mha_shapes():
    import jax
    import jax.numpy as jnp
    from geoformer_tpu.models.blocks import MultiHeadAttention

    mha = MultiHeadAttention(d_model=16, nhead=4, kdim=8, vdim=12)
    q = jnp.ones((2, 5, 16))
    k = jnp.ones((2, 7, 8))
    v = jnp.ones((2, 7, 12))
    mask = jnp.ones((2, 7), bool)
    vars_ = mha.init(jax.random.PRNGKey(0), q, k, v, mask, False)
    out = mha.apply(vars_, q, k, v, mask, False)
    assert out.shape == (2, 5, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_benchmark_prediction_roundtrip(tmp_path):
    """save_benchmark_predictions (test.py) -> load_benchmark_predictions."""
    import sys
    sys.path.insert(0, ".")
    from test import save_benchmark_predictions
    from geoformer_tpu.evaluation.gt import load_benchmark_predictions

    pred_info = {
        "label_id": np.asarray([5, 8]),
        "conf": np.asarray([0.9, 0.4]),
        "mask": np.asarray([[1, 0, 1, 0], [0, 1, 1, 0]], np.int32),
    }
    save_benchmark_predictions(str(tmp_path), "sceneX", pred_info)
    got = load_benchmark_predictions(str(tmp_path / "sceneX.txt"))
    np.testing.assert_array_equal(got["label_id"], pred_info["label_id"])
    np.testing.assert_allclose(got["conf"], pred_info["conf"], atol=1e-4)
    np.testing.assert_array_equal(np.stack(got["mask"]), pred_info["mask"])


def test_unused_loss_primitives():
    import jax.numpy as jnp
    from geoformer_tpu.losses.criterion import compute_score_loss, focal_loss_v1

    logits = jnp.asarray([2.0, -2.0, 0.0])
    labels = jnp.asarray([1.0, 0.0, 1.0])
    l = float(focal_loss_v1(logits, labels))
    assert 0 < l < 1
    scores = jnp.asarray([1.0, -1.0])
    ious = jnp.asarray([0.9, 0.1])
    v = jnp.asarray([True, True])
    s = float(compute_score_loss(scores, ious, v))
    assert s > 0
