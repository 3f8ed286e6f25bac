"""Episodic few-shot dataset (reference datasets/scannetv2_fs_inst.py).

Train episodes: sample a fold class -> a query scene containing it (binary
labels, instances of that class only) + a support scene with a masked
instance. Test: fixed `test_combinations_fold{k}.pkl` and the 10 pickled
support sets, for reproducible evaluation (scannetv2_fs_inst.py:98-182).
"""

from __future__ import annotations

import os
import pickle
import random

import numpy as np

from geoformer_tpu.data.augment import augment_affine, compact_instance_labels, crop_to_budget, elastic
from geoformer_tpu.data.collate import pad_batch
from geoformer_tpu.data.scannet import FOLD


class FSInstDataset:
    def __init__(self, cfg, split_set="train"):
        self.cfg = cfg
        self.split_set = split_set
        self.scale = cfg.scale
        self.full_scale = cfg.full_scale
        self.max_npoint = cfg.max_npoint
        self.root = os.path.join(cfg.data_root, cfg.dataset)
        with open(os.path.join(self.root, f"scannetv2_{split_set}.txt")) as f:
            self.scan_names = f.read().splitlines()
        scenes_dir = os.path.join(self.root, "scenes")
        files = os.listdir(scenes_dir) if os.path.isdir(scenes_dir) else []
        self.file_names = sorted(
            os.path.join(scenes_dir, f)
            for f in files
            if f.split(".")[0] in set(self.scan_names)
        )
        self.fold_classes = FOLD[cfg.cvfold]
        with open(os.path.join(self.root, "class2scans.pkl"), "rb") as f:
            self.class2scans = pickle.load(f)
        with open(os.path.join(self.root, "class2instances.pkl"), "rb") as f:
            self.class2instances = pickle.load(f)

    def __len__(self):
        return len(self.file_names)

    # ------------- scene loading -------------

    def _scene_path(self, scene_name):
        return os.path.join(self.root, "scenes", f"{scene_name}.npy")

    def load_single(self, scene_name, rng, aug=True, crop=True):
        data = np.load(self._scene_path(scene_name))
        xyz_origin = data[:, :3]
        rgb = data[:, 3:6]
        label = data[:, 6].astype(np.int32)
        instance_label = data[:, 7].astype(np.int32)

        if aug:
            xyz_middle = augment_affine(xyz_origin, rng, jitter=True, flip=True, rot=True)
        else:
            xyz_middle = xyz_origin
        xyz = xyz_middle * self.scale
        if aug:
            xyz = elastic(xyz, 6 * self.scale // 50, 40 * self.scale / 50, rng)
            xyz = elastic(xyz, 20 * self.scale // 50, 160 * self.scale / 50, rng)
        xyz -= xyz.min(0)
        if crop:
            xyz, valid = crop_to_budget(xyz, self.max_npoint, self.full_scale[1], rng)
            xyz_middle, xyz = xyz_middle[valid], xyz[valid]
            rgb, label, instance_label = rgb[valid], label[valid], instance_label[valid]
        return xyz_middle, xyz, rgb, label, instance_label

    def _query_scene(self, scene_name, sampled_class, rng, aug):
        xyz_middle, xyz, rgb, label, instance_label = self.load_single(
            scene_name, rng, aug=aug, crop=aug
        )
        # binary semantics: 1 where the sampled class lives
        binary = (label == sampled_class).astype(np.int32)
        instance_label = instance_label.copy()
        instance_label[binary == 0] = -100
        instance_label = compact_instance_labels(instance_label)
        return {
            "points": xyz_middle.astype(np.float32),
            "feats": rgb.astype(np.float32),
            "coords": np.floor(xyz).astype(np.int32),
            "labels": binary,
            "instance_labels": instance_label,
        }

    def _support_scene(self, scene_name, instance_id, rng):
        xyz_middle, xyz, rgb, label, instance_label = self.load_single(
            scene_name, rng, aug=False, crop=False
        )
        mask = (instance_label == instance_id).astype(np.int32)
        return {
            "points": xyz_middle.astype(np.float32),
            "feats": rgb.astype(np.float32),
            "coords": np.floor(xyz).astype(np.int32),
            "labels": label,
            "instance_labels": instance_label,
            "support_masks": mask,
        }

    # ------------- train episodes -------------

    def train_batches(self, batch_size, seed=0, epochs=1):
        rng = np.random.default_rng(seed)
        pyrng = random.Random(seed)
        n_batches = max(len(self) // batch_size, 1)
        for _ in range(epochs):
            for _ in range(n_batches):
                queries, supports, infos = [], [], []
                for _ in range(batch_size):
                    cls = pyrng.choice(self.fold_classes)
                    query_name = pyrng.choice(self.class2scans[cls])
                    queries.append(self._query_scene(query_name, cls, rng, aug=True))
                    # bounded retry (the reference's unbounded while-True,
                    # scannetv2_fs_inst.py:461-476, can spin forever on
                    # datasets with only small instances)
                    for _ in range(20):
                        sup_name, sup_inst = pyrng.choice(self.class2instances[cls])
                        sup = self._support_scene(sup_name, sup_inst, rng)
                        if sup["support_masks"].sum() > 100:
                            break
                    supports.append(sup)
                    infos.append({"class": cls, "query": query_name, "support": sup_name})
                yield (
                    pad_batch(supports, self.cfg.tpu_max_points, rng),
                    pad_batch(queries, self.cfg.tpu_max_points, rng),
                    infos,
                )

    # ------------- test protocol -------------

    def load_test_combinations(self):
        path = os.path.join(self.root, f"test_combinations_fold{self.cfg.cvfold}.pkl")
        with open(path, "rb") as f:
            return pickle.load(f)

    def load_support_sets(self, k_shot=None):
        k_shot = k_shot or self.cfg.k_shot
        path = os.path.join(
            self.root, "support_sets",
            f"{self.cfg.type_support}{self.cfg.cvfold}_{k_shot}shot_10sets.pkl",
        )
        with open(path, "rb") as f:
            return pickle.load(f)

    def test_batches(self):
        """Yield (scene_name, active_classes, per-class query batches)."""
        rng = np.random.default_rng(self.cfg.test_seed)
        combs = self.load_test_combinations()
        for path in self.file_names:
            name = os.path.basename(path).split(".")[0][:12]
            comb = combs.get(name, {})
            active = comb.get("active_label", [])
            if not active:
                continue
            query_by_class = {
                cls: pad_batch(
                    [self._query_scene(name, cls, rng, aug=False)],
                    self.cfg.tpu_max_points, rng,
                )
                for cls in active
            }
            yield name, active, query_by_class

    def support_batch(self, scene_name, instance_id, rng=None):
        rng = rng or np.random.default_rng(self.cfg.test_seed)
        sup = self._support_scene(scene_name, instance_id, rng)
        return pad_batch([sup], self.cfg.tpu_max_points, rng)
