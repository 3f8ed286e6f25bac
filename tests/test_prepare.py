"""Data prep tooling: PLY reader round-trip, gt ids, class indices, dist."""

import json
import os
import pickle
import struct
import subprocess
import sys

import numpy as np

from tools.prepare_scannet import (
    NYU40_BENCHMARK,
    build_class_indices,
    make_gt_txt,
    prepare_scene,
    read_ply,
)
from geoformer_tpu.parallel.dist import get_rank, get_world_size, is_primary, local_seed, shard_indices


def _write_binary_ply(path, xyz, rgb=None, label=None):
    props = [("float", "x"), ("float", "y"), ("float", "z")]
    if rgb is not None:
        props += [("uchar", "red"), ("uchar", "green"), ("uchar", "blue")]
    if label is not None:
        props += [("ushort", "label")]
    with open(path, "wb") as f:
        f.write(b"ply\nformat binary_little_endian 1.0\n")
        f.write(f"element vertex {len(xyz)}\n".encode())
        for t, n in props:
            f.write(f"property {t} {n}\n".encode())
        f.write(b"end_header\n")
        for i in range(len(xyz)):
            f.write(struct.pack("<fff", *xyz[i]))
            if rgb is not None:
                f.write(struct.pack("<BBB", *rgb[i]))
            if label is not None:
                f.write(struct.pack("<H", label[i]))


def test_read_ply_binary(tmp_path):
    rng = np.random.default_rng(0)
    xyz = rng.normal(size=(20, 3)).astype(np.float32)
    rgb = rng.integers(0, 256, (20, 3)).astype(np.uint8)
    lab = rng.integers(0, 40, 20).astype(np.uint16)
    p = str(tmp_path / "a.ply")
    _write_binary_ply(p, xyz, rgb, lab)
    x, c, l = read_ply(p)
    np.testing.assert_allclose(x, xyz, rtol=1e-6)
    np.testing.assert_array_equal(c, rgb)
    np.testing.assert_array_equal(l, lab)


def test_prepare_scene_end_to_end(tmp_path):
    """Full raw-scan layout -> [N,8] npy."""
    scene = "scene0001_00"
    d = tmp_path / scene
    d.mkdir()
    rng = np.random.default_rng(1)
    n = 30
    xyz = rng.normal(size=(n, 3)).astype(np.float32)
    rgb = rng.integers(0, 256, (n, 3)).astype(np.uint8)
    nyu = np.full(n, 5, np.uint16)  # chair (nyu 5 -> prepared 4)
    base = str(d / scene)
    _write_binary_ply(base + "_vh_clean_2.ply", xyz, rgb)
    _write_binary_ply(base + "_vh_clean_2.labels.ply", xyz, rgb, nyu)
    segs = {"segIndices": [i // 10 for i in range(n)]}  # 3 segments
    json.dump(segs, open(base + "_vh_clean_2.0.010000.segs.json", "w"))
    agg = {"segGroups": [{"segments": [0, 1], "label": "chair"},
                         {"segments": [2], "label": "chair"}]}
    json.dump(agg, open(base + ".aggregation.json", "w"))

    out = prepare_scene(str(tmp_path), scene)
    assert out.shape == (n, 8)
    np.testing.assert_allclose(out[:, :3].mean(0), 0, atol=1e-5)  # centered
    assert out[:, 3:6].min() >= -1 and out[:, 3:6].max() <= 1
    assert (out[:, 6] == NYU40_BENCHMARK.index(5)).all()
    np.testing.assert_array_equal(np.unique(out[:, 7]), [0, 1])
    assert (out[out[:, 7] == 1][:, 7] == 1).sum() == 10  # segment 2


def test_make_gt_txt(tmp_path):
    scene = np.zeros((5, 8), np.float32)
    scene[:, 6] = [4, 4, -100, 0, 1]   # prepared labels
    scene[:, 7] = [0, 1, -100, -100, -100]
    p = str(tmp_path / "gt.txt")
    make_gt_txt(scene, p)
    ids = np.loadtxt(p, dtype=np.int64)
    # prepared 4 -> nyu 5; gt = 5*1000 + inst + 1
    np.testing.assert_array_equal(ids, [5001, 5002, 0, 1000, 2000])


def test_build_class_indices(tmp_path):
    scenes = tmp_path / "scenes"
    scenes.mkdir()
    n = 300
    data = np.zeros((n, 8), np.float32)
    data[:, 6] = 4
    data[:150, 7] = 0
    data[150:, 7] = 1
    np.save(scenes / "sceneA.npy", data)
    c2s, c2i = build_class_indices(str(scenes), ["sceneA"], min_points=100)
    assert c2s == {4: ["sceneA"]}
    assert sorted(x[1] for x in c2i[4]) == [0, 1]


def test_dist_single_process():
    assert get_rank() == 0 and get_world_size() >= 1
    assert is_primary()
    assert local_seed(42) == 42
    idx = shard_indices(10, 2, seed=0)
    assert len(idx) == 10  # world=1 -> everything
    assert sorted(idx) == list(range(10))
