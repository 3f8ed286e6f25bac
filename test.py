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


def proposals_to_pred_info(cfg, proposals, batch, raw_xyz):
    """Apply keep flags + matrix NMS; project masks to raw resolution
    (reference scores at the scene's full N — test.py:33-134); return host
    pred_info dict."""
    masks = proposals["masks"][0]  # [Q,P]
    scores = proposals["scores"][0]
    classes = proposals["classes"][0]
    keep = proposals["keep"][0]
    fold = np.asarray(FOLD[cfg.cvfold])
    bench = np.asarray(BENCHMARK_SEMANTIC_LABELS)

    keep_nms, new_scores = matrix_nms(
        masks, scores, classes, keep,
        sigma=2.0, final_score_thresh=cfg.TEST_NMS_THRESH,
    )
    keep_np = np.asarray(keep_nms)
    masks_np = masks_to_raw(np.asarray(masks)[keep_np], batch, raw_xyz)
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
    eval_fn = engine.eval_fn()
    evaluator = ScanNetEval(cfg.cvfold)
    rng = jax.random.PRNGKey(cfg.test_seed)

    from geoformer_tpu.utils.tracking import profile_trace

    prof = profile_trace(cfg.profile_dir, enabled=cfg.profile_dir is not None)
    prof.__enter__()
    for i, (scene_name, batch) in enumerate(dataset.test_batches()):
        t0 = time.time()
        rng, sub = jax.random.split(rng)
        out = eval_fn(variables, jax.tree.map(jnp.asarray, batch), sub)
        n_points = int(batch["n_points"][0])  # device-resolution count (log only)
        raw = np.load(dataset.file_names[i])
        pred_info = proposals_to_pred_info(
            cfg, jax.device_get(out["proposals"]), batch, raw[:, :3]
        )
        # gt at full raw resolution, never truncated — masks above are
        # projected to the same raw N (reference test.py:33-134)
        gt_ids = make_gt_ids(raw[:, 6].astype(np.int32), raw[:, 7].astype(np.int32))
        evaluator.assign_instances_for_scan(scene_name, pred_info, gt_ids)
        vs = jax.device_get(out["voxel_stats"])
        if (int(vs["n_overflow_points"][0]) or int(vs["n_oor_points"][0])
                or bool(vs["saturated"][0])
                or int(vs["n_radius_cell_overflow"][0])):
            logger.warning(
                f"{scene_name}: voxel capacity degraded — "
                f"{int(vs['n_overflow_points'][0])} points over voxel capacity, "
                f"{int(vs['n_oor_points'][0])} outside the spatial grid, "
                f"saturated={bool(vs['saturated'][0])} "
                f"({int(vs['n_voxels'][0])}/{int(vs['capacity'][0])} voxels), "
                f"{int(vs['n_radius_cell_overflow'][0])} fg points dropped from "
                f"the geodesic graph (radius-cell capacity); "
                f"raise TPU.tpu_max_voxels / tpu_spatial_shape / "
                f"lower tpu_radius_cell_div"
            )
        if save_dir is not None:
            if cfg.save_instance:
                save_benchmark_predictions(save_dir, scene_name, pred_info)
            if cfg.save_semantic:
                from geoformer_tpu.utils.visualize import export_scene_predictions

                sem_dev = np.asarray(jax.device_get(out["semantic_scores"]))[0]
                sem = labels_to_raw(sem_dev, batch, raw[:, :3]).argmax(-1)
                export_scene_predictions(
                    save_dir, scene_name, raw[:, :3], sem,
                    pred_info["mask"].astype(bool),
                )
        logger.info(
            f"[{i + 1}/{len(dataset)}] {scene_name}: {n_points} pts, "
            f"{len(pred_info['conf'])} proposals, {time.time() - t0:.2f}s"
        )

    prof.__exit__(None, None, None)
    avgs = evaluator.compute_averages()
    print_results(avgs, logger)


if __name__ == "__main__":
    main()
