#!/usr/bin/env python
"""Prepare real ScanNetV2 scans for geoformer_tpu.

Equivalent of the reference data prep pipeline
(data/scannetv2/prepare_data_inst.py:35-108, prepare_data_inst_gttxt.py:33-71,
split_data.py, scannet_util.py): raw ScanNet scans
(*_vh_clean_2.ply, *_vh_clean_2.labels.ply / .0.010000.segs.json,
*.aggregation.json) -> per-scene [N, 8] .npy of
(xyz centered, rgb in [-1,1], nyu-remapped label 0-19 / -100, instance id),
plus gt txt files (sem*1000 + inst + 1) for the evaluator, split lists, and
the class2scans / class2instances pickles the episodic sampler uses.

Usage:
  python tools/prepare_scannet.py --scans /path/scans --out data/scannetv2 \
      --split_train train.txt --split_val val.txt [--workers 8]
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import pickle
import struct

import numpy as np

# the 20 nyu40 benchmark classes (scannet_util.py g_label_names order);
# prepared label = index in this list; floor/wall stay 0/1
NYU40_BENCHMARK = [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 14, 16, 24, 28, 33, 34, 36, 39]
NYU40_TO_PREPARED = {n: i for i, n in enumerate(NYU40_BENCHMARK)}


def read_ply(path):
    """Minimal PLY reader (ascii or binary_little_endian) for ScanNet meshes:
    returns (xyz [N,3] f32, rgb [N,3] u8, label [N] i32 or None)."""
    with open(path, "rb") as f:
        if f.readline().strip() != b"ply":
            raise ValueError(f"{path}: not a PLY")
        fmt = None
        n_verts = 0
        props = []
        in_vertex = False
        while True:
            line = f.readline().strip()
            if line == b"end_header":
                break
            parts = line.split()
            if parts[0] == b"format":
                fmt = parts[1].decode()
            elif parts[0] == b"element":
                in_vertex = parts[1] == b"vertex"
                if in_vertex:
                    n_verts = int(parts[2])
            elif parts[0] == b"property" and in_vertex:
                props.append((parts[1].decode(), parts[2].decode()))

        type_map = {
            "float": ("f", 4), "float32": ("f", 4), "double": ("d", 8),
            "uchar": ("B", 1), "uint8": ("B", 1), "char": ("b", 1),
            "short": ("h", 2), "ushort": ("H", 2),
            "int": ("i", 4), "int32": ("i", 4), "uint": ("I", 4),
        }
        names = [n for _, n in props]
        if fmt == "ascii":
            rows = np.loadtxt(f, max_rows=n_verts, dtype=np.float64)
            rows = np.atleast_2d(rows)
            table = {n: rows[:, i] for i, (_, n) in enumerate(props)}
        else:
            fmt_str = "<" + "".join(type_map[t][0] for t, _ in props)
            stride = struct.calcsize(fmt_str)
            buf = f.read(stride * n_verts)
            arr = np.frombuffer(buf, dtype=np.dtype(
                [(n, "<" + type_map[t][0]) for t, n in props]
            ))
            table = {n: arr[n].astype(np.float64) for n in names}

    xyz = np.stack([table["x"], table["y"], table["z"]], 1).astype(np.float32)
    rgb = None
    if "red" in table:
        rgb = np.stack([table["red"], table["green"], table["blue"]], 1).astype(np.uint8)
    label = table["label"].astype(np.int32) if "label" in table else None
    return xyz, rgb, label


def prepare_scene(scans_dir, scene, with_labels=True):
    """One scan -> [N, 8] array (reference prepare_data_inst.py:35-84)."""
    base = os.path.join(scans_dir, scene, scene)
    xyz, rgb, _ = read_ply(base + "_vh_clean_2.ply")
    xyz = (xyz - xyz.mean(0)).astype(np.float32)
    colors = rgb.astype(np.float32) / 127.5 - 1.0

    if not with_labels:
        sem = np.full(len(xyz), -100, np.float32)
        inst = np.full(len(xyz), -100, np.float32)
        return np.concatenate([xyz, colors, sem[:, None], inst[:, None]], 1)

    _, _, nyu = read_ply(base + "_vh_clean_2.labels.ply")
    sem = np.full(len(xyz), -100, np.int32)
    for n, p in NYU40_TO_PREPARED.items():
        sem[nyu == n] = p

    with open(base + "_vh_clean_2.0.010000.segs.json") as f:
        seg = np.asarray(json.load(f)["segIndices"], np.int64)
    with open(base + ".aggregation.json") as f:
        agg = json.load(f)["segGroups"]
    inst = np.full(len(xyz), -100, np.int32)
    seg_to_points: dict[int, np.ndarray] = {}
    order = np.argsort(seg)
    sseg = seg[order]
    bounds = np.searchsorted(sseg, np.unique(sseg))
    uniq = np.unique(sseg)
    for i, s in enumerate(uniq):
        lo = bounds[i]
        hi = bounds[i + 1] if i + 1 < len(bounds) else len(sseg)
        seg_to_points[int(s)] = order[lo:hi]
    for inst_id, group in enumerate(agg):
        for s in group["segments"]:
            pts = seg_to_points.get(int(s))
            if pts is not None:
                inst[pts] = inst_id
    # instances only exist where semantics do
    inst[sem < 0] = -100
    return np.concatenate(
        [xyz, colors, sem.astype(np.float32)[:, None], inst.astype(np.float32)[:, None]], 1
    )


def make_gt_txt(scene_npy, out_path):
    """gt ids = benchmark_sem * 1000 + inst + 1 (prepare_data_inst_gttxt.py:33-71)."""
    sem = scene_npy[:, 6].astype(np.int32)
    inst = scene_npy[:, 7].astype(np.int32)
    bench = np.zeros(len(sem), np.int32)
    ok = sem >= 0
    bench[ok] = np.asarray(NYU40_BENCHMARK, np.int32)[sem[ok]]
    ids = bench * 1000
    has_inst = inst >= 0
    ids[has_inst] += inst[has_inst] + 1
    np.savetxt(out_path, ids, fmt="%d")


def build_class_indices(scenes_dir, scan_names, min_points=100):
    """class2scans + class2instances pickles (datasets/scannetv2.py:44-159):
    a scene lists a class if it has >= min_points of it; an instance is
    (scene, id) with >= min_points points."""
    class2scans: dict[int, list] = {}
    class2instances: dict[int, list] = {}
    for name in scan_names:
        data = np.load(os.path.join(scenes_dir, f"{name}.npy"))
        sem = data[:, 6].astype(np.int32)
        inst = data[:, 7].astype(np.int32)
        for c in np.unique(sem[sem >= 2]):  # skip floor/wall like the reference
            if np.sum(sem == c) >= min_points:
                class2scans.setdefault(int(c), []).append(name)
        for i in np.unique(inst[inst >= 0]):
            sel = inst == i
            if np.sum(sel) >= min_points:
                c = int(np.bincount(sem[sel][sem[sel] >= 0]).argmax())
                if c >= 2:
                    class2instances.setdefault(c, []).append([name, int(i)])
    return class2scans, class2instances


def _work(args):
    scans_dir, out_dir, scene, with_labels = args
    out = os.path.join(out_dir, "scenes", f"{scene}.npy")
    if not os.path.exists(out):
        np.save(out, prepare_scene(scans_dir, scene, with_labels))
    return scene


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scans", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--split_train", default=None)
    ap.add_argument("--split_val", default=None)
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--no_labels", action="store_true")
    args = ap.parse_args()

    os.makedirs(os.path.join(args.out, "scenes"), exist_ok=True)
    os.makedirs(os.path.join(args.out, "val_gt"), exist_ok=True)
    scenes = sorted(
        d for d in os.listdir(args.scans)
        if os.path.isdir(os.path.join(args.scans, d))
    )
    jobs = [(args.scans, args.out, s, not args.no_labels) for s in scenes]
    with mp.Pool(args.workers) as pool:
        for i, s in enumerate(pool.imap_unordered(_work, jobs)):
            if (i + 1) % 50 == 0:
                print(f"{i + 1}/{len(scenes)} scenes")

    for split, path in (("train", args.split_train), ("val", args.split_val)):
        if path:
            with open(path) as f:
                names = f.read().splitlines()
        else:
            names = scenes
        with open(os.path.join(args.out, f"scannetv2_{split}.txt"), "w") as f:
            f.write("\n".join(names))
        if split == "val":
            for name in names:
                data = np.load(os.path.join(args.out, "scenes", f"{name}.npy"))
                make_gt_txt(data, os.path.join(args.out, "val_gt", f"{name}.txt"))

    with open(os.path.join(args.out, "scannetv2_train.txt")) as f:
        train_names = f.read().splitlines()
    c2s, c2i = build_class_indices(os.path.join(args.out, "scenes"), train_names)
    with open(os.path.join(args.out, "class2scans.pkl"), "wb") as f:
        pickle.dump(c2s, f)
    with open(os.path.join(args.out, "class2instances.pkl"), "wb") as f:
        pickle.dump(c2i, f)
    print(f"prepared {len(scenes)} scenes -> {args.out}")


if __name__ == "__main__":
    main()
