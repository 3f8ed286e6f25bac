#!/usr/bin/env python
"""Generate fixed few-shot evaluation assets for a prepared dataset.

The reference ships these as frozen pickles (data/scannetv2/support_sets/
*.pkl, test_combinations_fold{k}.pkl; consumed by
datasets/scannetv2_fs_inst.py:98-182) so evaluation is reproducible. This
tool regenerates equivalents from any prepared dataset:

- test_combinations_fold{k}.pkl: per val scene, which fold classes are
  active (>= min_points present) + one frozen support instance per class.
- support_sets/{type}fold{k}_{K}shot_10sets.pkl: 10 fixed support sets,
  each mapping class -> K (scene, instance) pairs.

Usage: python tools/make_support_sets.py --root data/scannetv2 \
    --fold 0 --k_shot 1 [--seed 567]
"""

from __future__ import annotations

import argparse
import os
import pickle
import random

import numpy as np

from geoformer_tpu.data.scannet import FOLD


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--fold", type=int, default=0)
    ap.add_argument("--k_shot", type=int, default=1)
    ap.add_argument("--n_sets", type=int, default=10)
    ap.add_argument("--seed", type=int, default=567)
    ap.add_argument("--min_points", type=int, default=100)
    ap.add_argument("--type_support", default="fullscene_fold")
    args = ap.parse_args()

    rng = random.Random(args.seed)
    with open(os.path.join(args.root, "class2instances.pkl"), "rb") as f:
        class2instances = pickle.load(f)
    with open(os.path.join(args.root, "scannetv2_val.txt")) as f:
        val_names = f.read().splitlines()

    fold_classes = [c for c in FOLD[args.fold] if c in class2instances]

    combs = {}
    for name in val_names:
        data = np.load(os.path.join(args.root, "scenes", f"{name}.npy"))
        sem = data[:, 6].astype(np.int32)
        active = [
            int(c) for c in fold_classes if np.sum(sem == c) >= args.min_points
        ]
        if not active:
            continue
        entry = {"active_label": active}
        for c in active:
            # frozen support drawn from *other* scenes where possible
            cands = [si for si in class2instances[c] if si[0] != name] or class2instances[c]
            entry[c] = tuple(rng.choice(cands))
        combs[name] = entry
    out = os.path.join(args.root, f"test_combinations_fold{args.fold}.pkl")
    with open(out, "wb") as f:
        pickle.dump(combs, f)
    print(f"wrote {out} ({len(combs)} scenes)")

    os.makedirs(os.path.join(args.root, "support_sets"), exist_ok=True)
    sets = []
    for _ in range(args.n_sets):
        one = {}
        for c in fold_classes:
            cands = class2instances[c]
            picks = [tuple(rng.choice(cands)) for _ in range(args.k_shot)]
            one[c] = picks
        sets.append(one)
    out = os.path.join(
        args.root, "support_sets",
        f"{args.type_support}{args.fold}_{args.k_shot}shot_{args.n_sets}sets.pkl",
    )
    with open(out, "wb") as f:
        pickle.dump(sets, f)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
