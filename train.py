#!/usr/bin/env python
"""Fully-supervised pretraining driver (reference train.py).

Usage: python train.py --config config/geoformer_scannet.yaml --output_path exp/pretrain
"""

from __future__ import annotations

import os
import time

import jax
import numpy as np

from geoformer_tpu.data.scannet import InstDataset
from geoformer_tpu.engine import Engine
from geoformer_tpu.utils.checkpoint import (
    align_and_update,
    checkpoint_path,
    find_last_checkpoint,
    load_checkpoint,
    restore_train_state,
    save_checkpoint,
    state_payload,
)
from geoformer_tpu.utils.config import config_from_args
from geoformer_tpu.utils.logger import create_logger
from geoformer_tpu.utils.meters import AverageMeter, DictAverageMeter
from geoformer_tpu.utils.prefetch import prefetch
from geoformer_tpu.utils.tracking import ScalarWriter, device_memory_stats


def train_one_epoch(engine, state, dataset, epoch, logger, rng_seed, writer=None):
    cfg = engine.cfg
    iter_meter, data_meter = AverageMeter(), AverageMeter()
    loss_meter = DictAverageMeter()
    rng = jax.random.PRNGKey(rng_seed + epoch)
    end = time.time()
    n_batches = max(len(dataset) // cfg.batch_size, 1)
    batches = prefetch(
        dataset.train_batches(cfg.batch_size, seed=rng_seed + epoch),
        depth=max(int(cfg.num_workers), 0),
    )
    for it, batch in enumerate(batches):
        data_meter.update(time.time() - end)
        rng, sub = jax.random.split(rng)
        state, loss, loss_dict, lr = engine.train_step(state, batch, epoch, sub)
        loss = float(loss)
        loss_meter.update({k: float(v) for k, v in loss_dict.items()})
        iter_meter.update(time.time() - end)
        end = time.time()
        if it % 10 == 0:
            mem = device_memory_stats().get("peak_bytes_in_use", 0)
            logger.info(
                f"epoch {epoch}/{cfg.epochs} iter {it + 1}/{n_batches} "
                f"lr {lr:.6f} loss {loss:.4f} "
                f"data {data_meter.avg:.3f}s iter {iter_meter.avg:.3f}s "
                f"mem {mem / 2**30:.2f}GiB"
            )
    avgs = loss_meter.averages()
    logger.info(f"epoch {epoch} done: " + str({k: round(v, 4) for k, v in avgs.items()}))
    if writer is not None:
        writer.add_scalars(avgs, epoch, prefix="train/")
        writer.add_scalar("train/lr", lr, epoch)
    return state


def main():
    from geoformer_tpu.parallel.dist import init_distributed, is_primary, local_seed

    cfg = config_from_args()
    init_distributed()
    primary = is_primary()
    exp_path = os.path.join(cfg.output_path, cfg.exp_name)
    # rank-0-only logging/artifacts (reference util/dist.py:36-49 gate)
    logger = create_logger(exp_path if primary else None, primary=primary)
    writer = ScalarWriter(exp_path) if primary else None
    logger.info(f"config: {cfg.config}")
    np.random.seed(local_seed(cfg.manual_seed))

    engine = Engine(cfg, few_shot=False)
    dataset = InstDataset(cfg, "train")
    logger.info(f"training scenes: {len(dataset)}")

    example = next(dataset.train_batches(cfg.batch_size, seed=cfg.manual_seed))
    state = engine.init_state(example, seed=cfg.manual_seed)

    start_epoch = cfg.start_epoch
    if cfg.pretrain:
        loaded = load_checkpoint(cfg.pretrain)
        state = state.replace(
            params=align_and_update(state.params, loaded.get("params", {}), logger),
            batch_stats=align_and_update(state.batch_stats, loaded.get("batch_stats", {}), logger),
        )
        logger.info(f"loaded pretrain {cfg.pretrain}")
    resume = cfg.resume or find_last_checkpoint(exp_path)
    if resume and os.path.exists(resume):
        loaded = load_checkpoint(resume)
        state = restore_train_state(state, loaded)
        start_epoch = int(loaded.get("epoch", 0)) + 1
        logger.info(f"resumed {resume} at epoch {start_epoch}")

    for epoch in range(start_epoch, cfg.epochs + 1):
        state = train_one_epoch(engine, state, dataset, epoch, logger, cfg.manual_seed, writer)
        if primary:  # single checkpoint writer across processes
            payload = state_payload(state, epoch)
            if epoch % cfg.save_freq == 0:
                save_checkpoint(checkpoint_path(exp_path, epoch), payload)
            save_checkpoint(checkpoint_path(exp_path), payload)


if __name__ == "__main__":
    main()
