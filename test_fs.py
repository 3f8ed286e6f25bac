#!/usr/bin/env python
"""Few-shot evaluation driver (reference test_fs.py).

Protocol: for each of run_num support sets, precompute mean support
embeddings per class (k_shot instances); per query scene x active class x
run, decode with the cached scene encoding (the reference's `remember`
path, geoformer_fs.py:439-527) -> per-run NMS + ScanNet AP -> mean±std
over runs (test_fs.py:33-118,121-259).
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from geoformer_tpu.data.episodic import FSInstDataset
from geoformer_tpu.data.scannet import BENCHMARK_SEMANTIC_LABELS
from geoformer_tpu.engine import Engine
from geoformer_tpu.evaluation.gt import make_gt_ids
from geoformer_tpu.evaluation.scannet_eval import ScanNetEval, average_over_runs, print_results
from geoformer_tpu.models.geoformer_fs import GeoFormerFS
from geoformer_tpu.ops.nms import matrix_nms
from geoformer_tpu.utils.checkpoint import load_checkpoint
from geoformer_tpu.utils.config import config_from_args
from geoformer_tpu.utils.logger import create_logger


def load_set_support(engine, variables, dataset, logger):
    """Precompute mean support embedding per (run, class) (test_fs.py:33-118)."""
    cfg = engine.cfg
    support_sets = dataset.load_support_sets()
    model = engine.model
    rng = jax.random.PRNGKey(cfg.test_seed)

    @jax.jit
    def embed(batch, r):
        return model.apply(variables, batch, rngs={"sample": r}, method=GeoFormerFS.process_support)

    out = []
    for run_i, sset in enumerate(support_sets[: cfg.run_num]):
        per_class = {}
        for cls, tuples in sset.items():
            embs = []
            for scene_name, inst_id in tuples[: cfg.k_shot]:
                batch = dataset.support_batch(scene_name, inst_id)
                rng, sub = jax.random.split(rng)
                embs.append(np.asarray(embed(jax.tree.map(jnp.asarray, batch), sub))[0])
            per_class[cls] = np.mean(embs, axis=0)
        out.append(per_class)
        logger.info(f"support set {run_i}: {len(per_class)} classes")
    return out


def main():
    cfg = config_from_args()
    exp_path = os.path.join(cfg.output_path, cfg.exp_name)
    logger = create_logger(exp_path)
    engine = Engine(cfg, few_shot=True)
    dataset = FSInstDataset(cfg, cfg.split)

    ckpt = load_checkpoint(cfg.pretrain or cfg.resume)
    variables = {
        "params": ckpt["params"],
        "batch_stats": ckpt["batch_stats"],
        "constants": ckpt.get("constants", {}),
    }
    model = engine.model
    rng = jax.random.PRNGKey(cfg.test_seed)

    @jax.jit
    def encode(batch, r):
        return model.apply(
            variables, batch, False, rngs={"sample": r}, method=GeoFormerFS.encode_scene
        )

    @jax.jit
    def decode(cache, emb, pc_mins, pc_maxs):
        dec = model.apply(
            variables, cache, emb, pc_mins, pc_maxs, False,
            method=GeoFormerFS.decode_with_support,
        )
        from geoformer_tpu.models.geoformer_fs import generate_fs_proposal

        props = generate_fs_proposal(
            dec["mask_logits"][-1], jax.nn.sigmoid(dec["similarity"]),
            dec["fg_idx"], dec["fg_valid"], cache_point_mask(cache),
            logit_thresh=0.2, score_thresh=cfg.TEST_SCORE_THRESH,
            npoint_thresh=cfg.TEST_NPOINT_THRESH, sim_score_thresh=cfg.similarity_thresh,
        )
        return props

    def cache_point_mask(cache):
        # full point mask for scatter target size; stored on first encode
        return cache["_point_mask"]

    @jax.jit
    def embed_support(batch, r):
        return model.apply(
            variables, batch, rngs={"sample": r}, method=GeoFormerFS.process_support
        )

    if cfg.fix_support:
        # frozen 10-set support pickles (reference fix_support path,
        # test_fs.py:33-118)
        support_embeddings = load_set_support(engine, variables, dataset, logger)
        combs = None
    else:
        # per-scene frozen supports from test_combinations (reference
        # test_fs.py:157-174 non-fixed path); same support for every run
        support_embeddings = None
        combs = dataset.load_test_combinations()

    evaluators = [ScanNetEval(cfg.cvfold) for _ in range(cfg.run_num)]
    bench = np.asarray(BENCHMARK_SEMANTIC_LABELS)

    n_scenes = 0
    for scene_name, active, query_by_class in dataset.test_batches():
        n_scenes += 1
        t0 = time.time()
        raw = np.load(dataset._scene_path(scene_name))
        gt_raw_labels = raw[:, 6].astype(np.int32)
        gt_inst = raw[:, 7].astype(np.int32)

        per_run_preds = [[] for _ in range(cfg.run_num)]
        for cls in active:
            batch = jax.tree.map(jnp.asarray, query_by_class[cls])
            rng, sub = jax.random.split(rng)
            cache = encode(batch, sub)
            cache["_point_mask"] = batch["point_mask"]
            n_points = int(batch["n_points"][0])
            scene_emb = None
            if support_embeddings is None:
                sup_scene, sup_inst = combs[scene_name][cls]
                sup_batch = dataset.support_batch(sup_scene, int(sup_inst))
                rng, sub2 = jax.random.split(rng)
                scene_emb = embed_support(jax.tree.map(jnp.asarray, sup_batch), sub2)
            for run_i in range(cfg.run_num):
                emb = (
                    scene_emb
                    if scene_emb is not None
                    else jnp.asarray(support_embeddings[run_i][cls][None])
                )
                props = jax.device_get(
                    decode(cache, emb, batch["pc_mins"], batch["pc_maxs"])
                )
                masks = props["masks"][0]
                scores = props["scores"][0]
                keep = props["keep"][0]
                cats = np.zeros(scores.shape, np.int32)  # single class per pass
                keep_nms, _ = matrix_nms(
                    jnp.asarray(masks), jnp.asarray(scores), jnp.asarray(cats),
                    jnp.asarray(keep), sigma=2.0, final_score_thresh=cfg.TEST_NMS_THRESH,
                )
                keep_np = np.asarray(keep_nms)
                for q in np.nonzero(keep_np)[0]:
                    per_run_preds[run_i].append(
                        {
                            "label_id": bench[cls],
                            "conf": float(scores[q]),
                            "mask": masks[q, :n_points].astype(np.int32),
                        }
                    )

        # gt restricted to active classes (reference evaluates the full gt txt)
        gt_ids = make_gt_ids(gt_raw_labels, gt_inst)[: n_points]
        for run_i in range(cfg.run_num):
            preds = per_run_preds[run_i]
            pred_info = {
                "label_id": np.asarray([p["label_id"] for p in preds], np.int64),
                "conf": np.asarray([p["conf"] for p in preds], np.float64),
                "mask": [p["mask"] for p in preds],
            }
            evaluators[run_i].assign_instances_for_scan(scene_name, pred_info, gt_ids)
        logger.info(f"{scene_name}: {len(active)} classes x {cfg.run_num} runs, {time.time() - t0:.2f}s")

    per_run_avgs = [ev.compute_averages() for ev in evaluators]
    avgs = average_over_runs(per_run_avgs)
    print_results(avgs, logger)


if __name__ == "__main__":
    main()
