"""Few-shot criterion (reference criterion_fs.py:94-280).

dice + focal on Hungarian-matched masks (dice-only cost, fewshot=True) plus
the similarity loss: per-query IoU-vs-mode-instance labels (pos >= 0.5,
neg <= 0.3), BCE with hard-negative mining at negative_ratio x positives.

Note: the reference's `loss_neg[train_label.long()] = 0`
(criterion_fs.py:177) indexes *rows* with 0/1 label values — a bug that
zeroes the first two scenes' negative losses instead of masking positives.
We implement the intended semantics (positives excluded from the negative
pool).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from geoformer_tpu.losses.matcher import auction_assign, build_gt_instances, dice_cost, hungarian_assign
from geoformer_tpu.losses.criterion import (
    masked_dice_loss,
    masked_focal_loss,
)


def bce_with_logits(logits, targets):
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def similarity_loss(
    similarity, mask_logits, inst_fg, fg_valid, query_valid, negative_ratio,
    max_inst: int = 64,
):
    """[B,Q] logits, [B,Q,F] last-layer mask logits (detached), [B,F] labels.

    `max_inst` is the mode-search capacity and must be >= the collate-time
    instance-id remap capacity (`cfg.tpu_max_instances`) — the criterion
    passes it through so raising the config cannot silently truncate the
    label computation."""
    mask_logits = jax.lax.stop_gradient(mask_logits)
    pred = (jax.nn.sigmoid(mask_logits) > 0.5) & fg_valid[:, None, :]  # [B,Q,F]

    def scene(pred_b, inst_b, fval_b, qval_b, sim_b):
        max_i = jnp.max(jnp.where(fval_b, inst_b, -1)) + 1
        ids = jnp.arange(max_inst)  # mode search capacity (cfg.tpu_max_instances)
        inst_onehot = (inst_b[None, :] == ids[:, None]) & fval_b[None, :]  # [I,F]
        counts = jnp.einsum(
            "qf,if->qi", pred_b.astype(jnp.float32), inst_onehot.astype(jnp.float32)
        )
        cnt_unlab = jnp.sum(pred_b & (inst_b[None, :] == -100), axis=-1)  # [Q]
        best_i = jnp.argmax(counts, axis=-1)  # [Q]
        best_cnt = jnp.max(counts, axis=-1)
        npred = jnp.sum(pred_b, axis=-1)
        # torch.mode picks the smallest value on ties; -100 < any id
        mode_is_unlab = cnt_unlab >= best_cnt
        empty = npred == 0

        gt = inst_onehot[best_i]  # [Q,F]
        inter = jnp.sum(pred_b & gt, axis=-1)
        union = jnp.sum(pred_b | gt, axis=-1)
        iou = inter / jnp.maximum(union, 1)

        is_neg_dead = (empty | mode_is_unlab) & qval_b
        is_pos = (~empty) & (~mode_is_unlab) & (iou >= 0.5) & qval_b
        is_neg_iou = (~empty) & (~mode_is_unlab) & (iou <= 0.3) & qval_b
        is_neg = is_neg_dead | is_neg_iou

        num_pos = jnp.sum(is_pos)
        num_neg = jnp.sum(is_neg)
        n_hard = jnp.minimum(num_neg, negative_ratio * num_pos)

        losses = bce_with_logits(sim_b, is_pos.astype(jnp.float32))
        loss_pos = jnp.sum(losses * is_pos)
        neg_losses = jnp.where(is_neg, losses, -1.0)
        neg_sorted = jnp.sort(neg_losses)[::-1]
        ranks = jnp.arange(neg_sorted.shape[0])
        loss_hard_neg = jnp.sum(jnp.where(ranks < n_hard, jnp.maximum(neg_sorted, 0.0), 0.0))
        return loss_pos + loss_hard_neg, num_pos

    losses, num_pos = jax.vmap(scene)(pred, inst_fg, fg_valid, query_valid, similarity)
    total_pos = jnp.sum(num_pos)
    return jnp.where(total_pos > 0, jnp.sum(losses) / jnp.maximum(total_pos, 1), 0.0)


class FSInstSetCriterion:
    def __init__(self, cfg):
        self.cfg = cfg
        self.max_inst = cfg.tpu_max_instances
        self.negative_ratio = cfg.negative_ratio
        self.cal_simloss = "similarity_net" not in cfg.fix_module
        # reference hardwires {dice: 1, focal: 1} (criterion_fs.py:107-111);
        # exposed as config with bit-identical defaults
        # device-side auction matcher by default: no host callback in the
        # train step (pure_callback is rejected outright by the tunnel TPU
        # runtime, and on any backend it removes the per-step host bounce
        # the reference takes at matcher.py:122-124)
        self._assign = (
            auction_assign
            if getattr(cfg, "tpu_device_matcher", True)
            else hungarian_assign
        )
        self.w_dice = getattr(cfg, "loss_dice_weight", 1.0)
        self.w_focal = getattr(cfg, "loss_focal_weight", 1.0)

    def __call__(self, outputs, batch, epoch):
        cfg = self.cfg
        fg_idx, fg_valid = outputs["fg_idx"], outputs["fg_valid"]
        inst_fg = jnp.take_along_axis(batch["instance_labels"], fg_idx, axis=1)
        sem_fg = jnp.take_along_axis(batch["labels"], fg_idx, axis=1)
        query_valid = outputs["query_valid"]
        mask_logits = outputs["mask_logits"]  # [L,B,Q,F]
        similarity = outputs["similarity"]

        loss = jnp.float32(0.0)
        loss_dict = {}

        if epoch > cfg.prepare_epochs and self.cal_simloss:
            sim_l = similarity_loss(
                similarity, mask_logits[-1], inst_fg, fg_valid, query_valid,
                self.negative_ratio, max_inst=self.max_inst,
            )
            loss = loss + sim_l
            loss_dict["sim_loss"] = sim_l

        inst_masks, inst_valid, _ = build_gt_instances(
            inst_fg, sem_fg, fg_valid, self.max_inst
        )
        last_masks = jax.lax.stop_gradient(mask_logits[-1])
        cost = jax.vmap(dice_cost)(last_masks, inst_masks, fg_valid)
        cost = jnp.where(query_valid[:, :, None], cost, 1e6)
        pred_inds = self._assign(cost, inst_valid)

        num_gt = jnp.sum(inst_valid.astype(jnp.float32))
        bsz = mask_logits.shape[1]

        def layer_loss(ml):
            pm = jnp.take_along_axis(ml, pred_inds[:, :, None], axis=1)

            def scene(pm_b, gt_b, pv_b, fval_b):
                ngt_b = jnp.sum(pv_b)
                return (
                    masked_dice_loss(pm_b, gt_b, pv_b, fval_b, ngt_b),
                    masked_focal_loss(pm_b, gt_b, pv_b, fval_b, ngt_b),
                )

            d, f = jax.vmap(scene)(pm, inst_masks, inst_valid.astype(jnp.float32), fg_valid)
            return jnp.sum(d) / bsz, jnp.sum(f) / bsz

        for l in range(mask_logits.shape[0]):
            d, f = layer_loss(mask_logits[l])
            loss = loss + self.w_dice * d + self.w_focal * f
            if l == mask_logits.shape[0] - 1:
                loss_dict.update({"dice_loss": d, "focal_loss": f})

        loss_dict["num_gt"] = num_gt
        loss_dict["loss"] = loss
        return loss, loss_dict
