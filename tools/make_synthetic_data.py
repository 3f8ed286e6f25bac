#!/usr/bin/env python
"""Generate a synthetic ScanNet-format dataset for smoke tests.

Creates data_root/scannetv2/{scenes/*.npy, split txts, class2*.pkl,
test_combinations_fold*.pkl, support_sets/*.pkl} so every driver
(train/test/train_fs/test_fs) can run without real ScanNet data.
Scene format matches prepare_data_inst.py: [N, 8] =
(xyz, rgb, label 0-19/-100, instance id).
"""

from __future__ import annotations

import argparse
import os
import pickle

import numpy as np

from geoformer_tpu.data.scannet import FOLD


def make_scene(rng, n_points=800, n_instances=6, extent=4.0):
    """Clustered blobs so instances are spatially coherent."""
    pts, labels, insts = [], [], []
    classes = rng.choice(FOLD[2], size=n_instances)
    per = n_points // (n_instances + 2)
    for i in range(n_instances):
        center = rng.uniform(0.5, extent - 0.5, 3)
        p = center + rng.normal(0, 0.15, size=(per, 3))
        pts.append(p)
        labels.append(np.full(per, classes[i]))
        insts.append(np.full(per, i))
    # floor + wall
    n_bg = n_points - per * n_instances
    floor = np.column_stack(
        [rng.uniform(0, extent, n_bg), rng.uniform(0, extent, n_bg), rng.uniform(0, 0.05, n_bg)]
    )
    pts.append(floor)
    labels.append(np.zeros(n_bg))
    insts.append(np.full(n_bg, -100))
    xyz = np.concatenate(pts).clip(0, extent)
    label = np.concatenate(labels)
    inst = np.concatenate(insts)
    rgb = rng.uniform(-1, 1, size=(len(xyz), 3))
    return np.concatenate([xyz, rgb, label[:, None], inst[:, None]], axis=1)


def main(root="data", n_scenes=8, n_points=800, seed=0):
    rng = np.random.default_rng(seed)
    base = os.path.join(root, "scannetv2")
    os.makedirs(os.path.join(base, "scenes"), exist_ok=True)
    os.makedirs(os.path.join(base, "support_sets"), exist_ok=True)
    names = [f"scene{i:04d}_00" for i in range(n_scenes)]
    scenes = {}
    for name in names:
        data = make_scene(rng, n_points)
        scenes[name] = data
        np.save(os.path.join(base, "scenes", f"{name}.npy"), data)

    half = max(n_scenes // 2, 1)
    with open(os.path.join(base, "scannetv2_train.txt"), "w") as f:
        f.write("\n".join(names[:half]))
    with open(os.path.join(base, "scannetv2_val.txt"), "w") as f:
        f.write("\n".join(names[half:]))

    class2scans = {c: [] for c in FOLD[2]}
    class2instances = {c: [] for c in FOLD[2]}
    for name, data in scenes.items():
        label = data[:, 6].astype(int)
        inst = data[:, 7].astype(int)
        for c in np.unique(label):
            if c in class2scans:
                class2scans[c].append(name)
        for i in np.unique(inst[inst >= 0]):
            c = int(label[inst == i][0])
            if c in class2instances:
                class2instances[c].append([name, int(i)])
    # every class needs at least one scene/instance for the episodic sampler
    for c in FOLD[2]:
        if not class2scans[c]:
            class2scans[c] = [names[0]]
        if not class2instances[c]:
            class2instances[c] = [[names[0], 0]]
    with open(os.path.join(base, "class2scans.pkl"), "wb") as f:
        pickle.dump(class2scans, f)
    with open(os.path.join(base, "class2instances.pkl"), "wb") as f:
        pickle.dump(class2instances, f)

    for fold in (0, 1):
        combs = {}
        for name in names[half:]:
            label = scenes[name][:, 6].astype(int)
            active = [int(c) for c in np.unique(label) if c in FOLD[fold]]
            combs[name] = {"active_label": active}
            for c in active:
                combs[name][c] = class2instances[c][0]
        with open(os.path.join(base, f"test_combinations_fold{fold}.pkl"), "wb") as f:
            pickle.dump(combs, f)

        # k-shot support sets for K in {1, 5} (the reference protocol,
        # /root/reference/test_fs.py:136; file naming matches
        # episodic.load_support_sets). Classes with fewer than K distinct
        # instances repeat (the mean embedding is still over K tuples).
        for k in (1, 5):
            sets = []
            for run in range(10):
                sets.append({
                    c: [tuple(class2instances[c][i % len(class2instances[c])])
                        for i in range(k)]
                    for c in FOLD[fold]
                })
            with open(
                os.path.join(base, "support_sets",
                             f"fullscene_fold{fold}_{k}shot_10sets.pkl"), "wb"
            ) as f:
                pickle.dump(sets, f)
    print(f"synthetic dataset at {base}: {n_scenes} scenes x {n_points} pts")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="data")
    p.add_argument("--n_scenes", type=int, default=8)
    p.add_argument("--n_points", type=int, default=800)
    main(**vars(p.parse_args()))
