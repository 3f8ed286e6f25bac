"""Visualization exporters produce parseable PLY/OBJ files."""

import numpy as np

from geoformer_tpu.utils.visualize import (
    box_corners,
    color_semantic,
    export_scene_predictions,
    write_boxes_obj,
    write_obj,
    write_ply,
)
from geoformer_tpu.utils.scheduler import (
    exp_lr,
    get_scheduler,
    multi_step_lr,
    poly_lr,
    step_lr,
)


def test_write_ply_roundtrip(tmp_path):
    xyz = np.random.default_rng(0).normal(size=(10, 3)).astype(np.float32)
    p = str(tmp_path / "x.ply")
    write_ply(p, xyz, color_semantic(np.arange(10) % 5))
    lines = open(p).read().splitlines()
    assert lines[0] == "ply"
    assert f"element vertex 10" in lines[2]
    body = lines[lines.index("end_header") + 1:]
    assert len(body) == 10
    vals = body[0].split()
    assert len(vals) == 6


def test_write_obj_and_boxes(tmp_path):
    xyz = np.zeros((4, 3), np.float32)
    p = str(tmp_path / "x.obj")
    write_obj(p, xyz)
    assert open(p).read().count("v ") == 4
    b = str(tmp_path / "boxes.obj")
    write_boxes_obj(b, [(np.zeros(3), np.ones(3)), (np.ones(3), np.ones(3))])
    txt = open(b).read()
    assert txt.count("v ") == 16 and txt.count("l ") == 24
    c = box_corners(np.zeros(3), np.array([2.0, 2.0, 2.0]))
    assert c.min() == -1.0 and c.max() == 1.0


def test_export_scene_predictions(tmp_path):
    rng = np.random.default_rng(1)
    xyz = rng.normal(size=(50, 3)).astype(np.float32)
    sem = rng.integers(-100, 13, size=50)
    masks = rng.random((3, 50)) > 0.7
    export_scene_predictions(str(tmp_path), "scene0000_00", xyz, sem, masks)
    assert (tmp_path / "scene0000_00_sem.ply").exists()
    assert (tmp_path / "scene0000_00_inst.ply").exists()
    assert (tmp_path / "scene0000_00_boxes.obj").exists()


def test_scheduler_zoo():
    np.testing.assert_allclose(step_lr(1.0, 10, 5, 0.1), 0.01)
    np.testing.assert_allclose(multi_step_lr(1.0, 7, [3, 6, 9], 0.5), 0.25)
    assert poly_lr(1.0, 0, 10) == 1.0 and poly_lr(1.0, 10, 10) == 0.0
    assert 0 < exp_lr(1.0, 10) < 1
    assert get_scheduler("poly") is poly_lr
