#!/usr/bin/env python
"""Fully-supervised evaluation driver (reference test.py).

Per scene: forward(training=False) -> class id -> benchmark label ->
matrix NMS -> ScanNet AP vs ground truth derived from the scene labels.
"""

from __future__ import annotations

import os
import time

import jax
import numpy as np

from geoformer_tpu.data.scannet import BENCHMARK_SEMANTIC_LABELS, FOLD, InstDataset
from geoformer_tpu.engine import Engine
from geoformer_tpu.evaluation.gt import make_gt_ids
from geoformer_tpu.evaluation.predictions import labels_to_raw, masks_to_raw
from geoformer_tpu.evaluation.scannet_eval import ScanNetEval, print_results
from geoformer_tpu.ops.nms import matrix_nms
from geoformer_tpu.utils.checkpoint import load_checkpoint
from geoformer_tpu.utils.config import config_from_args
from geoformer_tpu.utils.logger import create_logger

import jax.numpy as jnp


def proposals_to_pred_info(cfg, proposals, batch, raw_xyz, idx=0):
    """Apply keep flags + matrix NMS; project masks to raw resolution
    (reference scores at the scene's full N — test.py:33-134); return host
    pred_info dict. `idx` selects a scene of a batched eval dispatch."""
    masks = proposals["masks"][idx]  # [Q,P]
    scores = proposals["scores"][idx]
    classes = proposals["classes"][idx]
    keep = proposals["keep"][idx]
    fold = np.asarray(FOLD[cfg.cvfold])
    bench = np.asarray(BENCHMARK_SEMANTIC_LABELS)

    keep_nms, new_scores = matrix_nms(
        masks, scores, classes, keep,
        sigma=2.0, final_score_thresh=cfg.TEST_NMS_THRESH,
    )
    keep_np = np.asarray(keep_nms)
    masks_np = masks_to_raw(np.asarray(masks)[keep_np], batch, raw_xyz,
                            scene_index=idx)
    scores_np = np.asarray(scores)[keep_np]
    cls_np = np.asarray(classes)[keep_np]
    semantic_ids = bench[fold[np.clip(cls_np - 4, 0, len(fold) - 1)]]
    return {
        "label_id": semantic_ids,
        "conf": scores_np,
        "mask": masks_np.astype(np.int32),
    }


def save_benchmark_predictions(out_dir, scene_name, pred_info):
    """ScanNet benchmark submission format: <scene>.txt listing
    `predicted_masks/<scene>_NNN.txt label_id conf` + one 0/1 mask file per
    proposal (the format the reference's saved pred_info feeds,
    util/eval.py `load_ids` / docs of the ScanNet benchmark)."""
    mask_dir = os.path.join(out_dir, "predicted_masks")
    os.makedirs(mask_dir, exist_ok=True)
    lines = []
    for i in range(len(pred_info["conf"])):
        rel = f"predicted_masks/{scene_name}_{i:03d}.txt"
        np.savetxt(
            os.path.join(out_dir, rel),
            pred_info["mask"][i].astype(np.int32),
            fmt="%d",
        )
        lines.append(f"{rel} {int(pred_info['label_id'][i])} {pred_info['conf'][i]:.4f}")
    with open(os.path.join(out_dir, f"{scene_name}.txt"), "w") as f:
        f.write("\n".join(lines) + ("\n" if lines else ""))


def main():
    cfg = config_from_args()
    exp_path = os.path.join(cfg.output_path, cfg.exp_name)
    logger = create_logger(exp_path)
    engine = Engine(cfg, few_shot=False)
    dataset = InstDataset(cfg, cfg.split)
    logger.info(f"eval scenes: {len(dataset)}")
    save_dir = os.path.join(exp_path, "result") if (cfg.save_instance or cfg.save_semantic) else None

    ckpt = load_checkpoint(cfg.pretrain or cfg.resume)
    variables = {
        "params": ckpt["params"],
        "batch_stats": ckpt["batch_stats"],
        "constants": ckpt.get("constants", {}),
    }
    evaluator = ScanNetEval(cfg.cvfold)
    rng = jax.random.PRNGKey(cfg.test_seed)

    from geoformer_tpu.utils.tracking import profile_trace

    prof = profile_trace(cfg.profile_dir, enabled=cfg.profile_dir is not None)
    prof.__enter__()
    # Scenes are evaluated `test_batch_size` per dispatch: one jitted
    # forward over a [G, P, ...] batch, sharded across the mesh's data axis
    # when G divides it (multi-chip eval; no reference analog — test.py is
    # strictly bs=1). The final partial group is padded by repeating the
    # last scene; padded lanes are never post-processed.
    group_size = max(1, int(getattr(cfg, "test_batch_size", 1)))
    n_scenes = len(dataset)

    def process_group(group, rng_sub):
        t0 = time.time()
        batches = [b for _, _, b in group]
        pad = group_size - len(batches)
        stacked = jax.tree.map(
            lambda *xs: np.concatenate([np.asarray(x) for x in xs], axis=0),
            *(batches + [batches[-1]] * pad),
        ) if (group_size > 1) else batches[0]
        out = engine.eval_batch(
            variables, jax.tree.map(jnp.asarray, stacked), rng_sub
        )
        proposals = jax.device_get(out["proposals"])
        vs = jax.device_get(out["voxel_stats"])
        sem_all = (
            np.asarray(jax.device_get(out["semantic_scores"]))
            if (save_dir is not None and cfg.save_semantic) else None
        )
        dt = (time.time() - t0) / len(group)
        for j, (i, scene_name, batch) in enumerate(group):
            raw = np.load(dataset.file_names[i])
            pred_info = proposals_to_pred_info(
                cfg, proposals, stacked, raw[:, :3], idx=j
            )
            # gt at full raw resolution, never truncated — masks above are
            # projected to the same raw N (reference test.py:33-134)
            gt_ids = make_gt_ids(
                raw[:, 6].astype(np.int32), raw[:, 7].astype(np.int32)
            )
            evaluator.assign_instances_for_scan(scene_name, pred_info, gt_ids)
            if (int(vs["n_overflow_points"][j]) or int(vs["n_oor_points"][j])
                    or bool(vs["saturated"][j])
                    or int(vs["n_radius_cell_overflow"][j])
                    or int(vs["n_radius_window_overflow"][j])):
                logger.warning(
                    f"{scene_name}: voxel capacity degraded — "
                    f"{int(vs['n_overflow_points'][j])} points over voxel capacity, "
                    f"{int(vs['n_oor_points'][j])} outside the spatial grid, "
                    f"saturated={bool(vs['saturated'][j])} "
                    f"({int(vs['n_voxels'][j])}/{int(vs['capacity'][j])} voxels), "
                    f"{int(vs['n_radius_cell_overflow'][j])} fg points dropped from "
                    f"the geodesic graph (radius-cell capacity), "
                    f"{int(vs['n_radius_window_overflow'][j])} with an overflowed "
                    f"kNN candidate window (non-nearest edges); "
                    f"raise TPU.tpu_max_voxels / tpu_spatial_shape / "
                    f"tpu_knn_window / lower tpu_radius_cell_div"
                )
            if save_dir is not None:
                if cfg.save_instance:
                    save_benchmark_predictions(save_dir, scene_name, pred_info)
                if cfg.save_semantic:
                    from geoformer_tpu.utils.visualize import export_scene_predictions

                    sem = labels_to_raw(
                        sem_all[j], stacked, raw[:, :3], scene_index=j
                    ).argmax(-1)
                    export_scene_predictions(
                        save_dir, scene_name, raw[:, :3], sem,
                        pred_info["mask"].astype(bool),
                    )
            n_points = int(batch["n_points"][0])  # device-resolution count
            logger.info(
                f"[{i + 1}/{n_scenes}] {scene_name}: {n_points} pts, "
                f"{len(pred_info['conf'])} proposals, {dt:.2f}s"
            )

    group = []
    for i, (scene_name, batch) in enumerate(dataset.test_batches()):
        group.append((i, scene_name, batch))
        if len(group) == group_size:
            rng, sub = jax.random.split(rng)
            process_group(group, sub)
            group = []
    if group:
        rng, sub = jax.random.split(rng)
        process_group(group, sub)

    prof.__exit__(None, None, None)
    avgs = evaluator.compute_averages()
    print_results(avgs, logger)


if __name__ == "__main__":
    main()
