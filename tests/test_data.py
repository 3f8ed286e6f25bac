"""Data layer tests on synthetic ScanNet-format scenes."""

import os
import pickle

import numpy as np
import pytest

from geoformer_tpu.data.augment import compact_instance_labels, crop_to_budget
from geoformer_tpu.data.collate import pad_batch
from geoformer_tpu.data.scannet import FOLD, InstDataset, remap_semantic_labels
from geoformer_tpu.data.episodic import FSInstDataset
from geoformer_tpu.utils.config import load_config


def make_scene_npy(rng, n=500, cls_set=(0, 1, 2, 5, 7)):
    xyz = rng.uniform(0, 4, size=(n, 3))
    rgb = rng.uniform(-1, 1, size=(n, 3))
    label = rng.choice(cls_set, size=n).astype(np.float64)
    inst = np.full(n, -100.0)
    k = 0
    for c in cls_set:
        if c < 2:
            continue
        sel = np.nonzero(label == c)[0]
        if len(sel):
            inst[sel[: len(sel) // 2]] = k
            inst[sel[len(sel) // 2 :]] = k + 1
            k += 2
    return np.concatenate([xyz, rgb, label[:, None], inst[:, None]], axis=1)


@pytest.fixture
def data_root(tmp_path):
    rng = np.random.default_rng(0)
    root = tmp_path / "scannetv2"
    (root / "scenes").mkdir(parents=True)
    names = [f"scene{i:04d}_00" for i in range(4)]
    for name in names:
        np.save(root / "scenes" / f"{name}.npy", make_scene_npy(rng))
    (root / "scannetv2_train.txt").write_text("\n".join(names))
    (root / "scannetv2_val.txt").write_text("\n".join(names))
    class2scans = {c: names for c in FOLD[2]}
    class2instances = {c: [[names[0], 0], [names[1], 0]] for c in FOLD[2]}
    with open(root / "class2scans.pkl", "wb") as f:
        pickle.dump(class2scans, f)
    with open(root / "class2instances.pkl", "wb") as f:
        pickle.dump(class2instances, f)
    return str(tmp_path)


def _cfg(data_root, **kw):
    return load_config(
        None, data_root=data_root, dataset="scannetv2", tpu_max_points=700,
        max_npoint=600, batch_size=2, **kw
    )


def test_remap_semantic_labels():
    label = np.asarray([0, 1, -100, 5, 2, 19])
    out = remap_semantic_labels(label, FOLD[0])  # FOLD0 = [2,3,4,7,9,11,12,13,18]
    assert out[0] == 0 and out[1] == 1 and out[2] == 2
    assert out[4] == 4  # class 2 is FOLD0[0] -> 4
    assert out[3] == 3 and out[5] == 3  # 5, 19 not in fold0 -> test candidate


def test_compact_instance_labels():
    inst = np.asarray([-100, 7, 3, 7, -100, 9])
    out = compact_instance_labels(inst)
    assert set(out) == {-100, 0, 1, 2}
    assert out[1] == out[3]


def test_inst_dataset_batches(data_root):
    cfg = _cfg(data_root)
    ds = InstDataset(cfg, "train")
    assert len(ds) == 4
    batch = next(ds.train_batches(2, seed=0))
    assert batch["points"].shape == (2, 700, 3)
    assert batch["coords"].dtype == np.int32
    assert batch["point_mask"].sum() > 0
    assert (batch["coords"][batch["point_mask"]] >= 0).all()
    # labels remapped into [0, 13)
    lbl = batch["labels"][batch["point_mask"]]
    assert lbl.min() >= 0 and lbl.max() < 13

    name, tb = next(iter(ds.test_batches()))
    assert tb["points"].shape == (1, 700, 3)
    assert name.startswith("scene")


def test_fs_dataset_episodes(data_root):
    cfg = _cfg(data_root, cvfold=0)
    ds = FSInstDataset(cfg, "train")
    support, query, infos = next(ds.train_batches(2, seed=0))
    assert support["support_masks"].shape == (2, 700)
    assert query["labels"].max() <= 1  # binary episodic labels
    assert len(infos) == 2
    # instances restricted to the sampled class
    q_inst = query["instance_labels"][query["point_mask"]]
    assert ((q_inst == -100) | (q_inst >= 0)).all()


def test_crop_to_budget():
    rng = np.random.default_rng(1)
    xyz = rng.uniform(0, 300, size=(1000, 3))
    out, valid = crop_to_budget(xyz, 400, 512, rng)
    assert valid.sum() <= 400 or valid.sum() == 1000  # shrinks only if needed
    xyz2 = rng.uniform(0, 600, size=(1000, 3))
    out2, valid2 = crop_to_budget(xyz2, 400, 512, rng)
    assert valid2.sum() <= 400
    assert (out2[valid2] >= 0).all() and (out2[valid2] < 512).all()


def test_support_region_crop_matches_reference_math():
    """region/sphere crops reproduce the reference formulas
    (scannetv2_fs_inst.py:277-328) on a synthetic scene."""
    import numpy as np
    from geoformer_tpu.data.episodic import region_crop_instance, sphere_crop_instance

    rng = np.random.default_rng(7)
    xyz = rng.uniform(-2, 2, size=(500, 3)).astype(np.float32)
    inst = np.full(500, -100, np.int32)
    inst[:40] = 3
    xyz[:40] = rng.uniform(0.2, 0.6, size=(40, 3))  # compact instance blob

    for sf in (1, 2):
        keep = region_crop_instance(xyz, inst, 3, scale_factor=sf)
        pc = xyz[inst == 3]
        lo, hi = pc.min(0), pc.max(0)
        mid, size = (lo + hi) / 2, (hi - lo + 0.1)
        expect = np.nonzero(np.all(
            (xyz >= mid - size * sf / 2) & (xyz <= mid + size * sf / 2), axis=1
        ))[0]
        np.testing.assert_array_equal(keep, expect)
        assert set(np.nonzero(inst == 3)[0]) <= set(keep.tolist())  # instance kept

    keep = sphere_crop_instance(xyz, inst, 3, scale_factor=2)
    pc = xyz[inst == 3]
    c = pc.mean(0)
    r = np.linalg.norm(pc - c, axis=1).max()
    expect = np.nonzero(np.linalg.norm(xyz - c, axis=1) <= r)[0]
    np.testing.assert_array_equal(keep, expect)

    # scale_factor=-2 (half=-1): keep everything, reference escape hatch
    assert region_crop_instance(xyz, inst, 3, scale_factor=-2).shape[0] == 500
