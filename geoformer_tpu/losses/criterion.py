"""Supervised set criterion (reference criterion.py:116-245).

Phase 1 (epoch <= prepare_epochs): semantic CE only. Phase 2: per-decoder-
layer dice + sigmoid-focal on Hungarian-matched masks + CE over query
classes, matched once on the last layer and reused for aux layers
(criterion.py:157-166,233-237). All losses are masked static-shape math.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from geoformer_tpu.losses.matcher import (
    build_gt_instances,
    dice_cost,
    auction_assign,
    hungarian_assign,
)


def softmax_cross_entropy_ignore(logits, labels, ignore_label=-100, valid=None):
    """Mean CE over entries whose label != ignore (torch CE semantics)."""
    mask = labels != ignore_label
    if valid is not None:
        mask = mask & valid
    safe = jnp.where(mask, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    return jnp.sum(jnp.where(mask, ce, 0.0)) / jnp.maximum(jnp.sum(mask), 1)


def masked_dice_loss(pred_logits, targets, pair_valid, point_valid, num_gt):
    """criterion.py:19-34. pred_logits [I,F], targets [I,F]."""
    probs = jax.nn.sigmoid(pred_logits) * point_valid[None, :]
    t = targets * point_valid[None, :]
    num = 2.0 * jnp.sum(probs * t, -1)
    den = jnp.sum(probs, -1) + jnp.sum(t, -1)
    loss = 1.0 - (num + 1.0) / (den + 1.0)
    return jnp.sum(loss * pair_valid) / (num_gt + 1e-6)


def masked_focal_loss(pred_logits, targets, pair_valid, point_valid, num_gt,
                      alpha=0.25, gamma=2.0):
    """criterion.py:37-62: mean over points then sum/num_gt."""
    p = jax.nn.sigmoid(pred_logits)
    ce = jnp.maximum(pred_logits, 0) - pred_logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(pred_logits))
    )
    p_t = p * targets + (1 - p) * (1 - targets)
    loss = ce * (1 - p_t) ** gamma
    alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
    loss = alpha_t * loss
    loss = loss * point_valid[None, :]
    per_pair = jnp.sum(loss, -1) / jnp.maximum(jnp.sum(point_valid), 1)
    return jnp.sum(per_pair * pair_valid) / (num_gt + 1e-6)


class InstSetCriterion:
    def __init__(self, cfg):
        self.cfg = cfg
        self.max_inst = cfg.tpu_max_instances
        self.n_queries = cfg.n_query_points
        self.ignore = cfg.ignore_label
        self.sem_fixed = "semantic" in cfg.fix_module or "semantic_linear" in cfg.fix_module
        # the reference hardwires {dice: 1, focal: 1, cls: 1}
        # (criterion.py:129-133; its cfg.loss_weight list is PointGroup
        # legacy for losses this model doesn't compute). We expose the same
        # dict as config, defaults bit-identical.
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
        self.w_cls = getattr(cfg, "loss_cls_weight", 1.0)

    def __call__(self, outputs, batch, epoch):
        cfg = self.cfg
        semantic_scores = outputs["semantic_scores"]  # [B,P,C]
        if self.sem_fixed:
            sem_loss = jnp.float32(0.0)
        else:
            sem_loss = softmax_cross_entropy_ignore(
                semantic_scores, batch["labels"], self.ignore, batch["point_mask"]
            )
        loss = sem_loss
        loss_dict = {"sem_loss": sem_loss}

        if epoch <= cfg.prepare_epochs or "mask_logits" not in outputs:
            loss_dict["loss"] = loss
            return loss, loss_dict

        fg_idx, fg_valid = outputs["fg_idx"], outputs["fg_valid"]
        inst_fg = jnp.take_along_axis(batch["instance_labels"], fg_idx, axis=1)
        sem_fg = jnp.take_along_axis(batch["labels"], fg_idx, axis=1)
        inst_masks, inst_valid, inst_sem = build_gt_instances(
            inst_fg, sem_fg, fg_valid, self.max_inst
        )

        mask_logits = outputs["mask_logits"]  # [L,B,Q,F]
        cls_logits = outputs["cls_logits"]  # [L,B,Q,C]
        query_valid = outputs["query_valid"]

        # match on the last layer (detached), reuse for aux layers
        last_masks = jax.lax.stop_gradient(mask_logits[-1])
        last_cls = jax.lax.stop_gradient(cls_logits[-1])
        cost_d = jax.vmap(dice_cost)(last_masks, inst_masks, fg_valid)
        cls_prob = jax.nn.softmax(last_cls, -1)  # [B,Q,C]
        cost_c = -jnp.take_along_axis(
            cls_prob, jnp.broadcast_to(inst_sem[:, None, :], cost_d.shape), axis=2
        )
        cost = cost_d + cost_c
        big = 1e6
        cost = jnp.where(query_valid[:, :, None], cost, big)
        pred_inds = self._assign(cost, inst_valid)  # [B,I]

        num_gt = jnp.sum(inst_valid.astype(jnp.float32))
        bsz = mask_logits.shape[1]

        def layer_loss(ml, cl):
            # gather matched prediction per instance
            pm = jnp.take_along_axis(ml, pred_inds[:, :, None], axis=1)  # [B,I,F]

            def scene(pm_b, gt_b, pv_b, fval_b):
                ngt_b = jnp.sum(pv_b)
                d = masked_dice_loss(pm_b, gt_b, pv_b, fval_b, ngt_b)
                f = masked_focal_loss(pm_b, gt_b, pv_b, fval_b, ngt_b)
                return d, f

            d, f = jax.vmap(scene)(pm, inst_masks, inst_valid.astype(jnp.float32), fg_valid)
            dice = jnp.sum(d) / bsz
            focal = jnp.sum(f) / bsz

            # classification: label 0 everywhere except matched queries
            cls_label = jnp.zeros(cl.shape[:2], jnp.int32)
            b_idx = jnp.arange(bsz)[:, None]
            cls_label = cls_label.at[b_idx, pred_inds].max(
                jnp.where(inst_valid, inst_sem, 0)
            )
            ce = jax.vmap(
                lambda c, l, v: softmax_cross_entropy_ignore(c, l, -100, v)
            )(cl, cls_label, query_valid)
            cls_l = jnp.sum(ce) / bsz
            return dice, focal, cls_l

        n_layers = mask_logits.shape[0]
        total_dice = total_focal = total_cls = 0.0
        for l in range(n_layers):
            d, f, c = layer_loss(mask_logits[l], cls_logits[l])
            total = self.w_dice * d + self.w_focal * f + self.w_cls * c
            loss = loss + total
            if l == n_layers - 1:
                loss_dict.update({"dice_loss": d, "focal_loss": f, "cls_loss": c})

        loss_dict["num_gt"] = num_gt
        loss_dict["loss"] = loss
        return loss, loss_dict


def focal_loss_v1(logits, labels, alpha=0.25, gamma=2.0, valid=None):
    """Standalone multi-label focal loss (reference criterion.py:87-113
    FocalLossV1 — unused by the shipped training loop, kept for surface
    parity). logits/labels [..., ], mean over valid entries."""
    p = jax.nn.sigmoid(logits)
    ce = jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    p_t = p * labels + (1 - p) * (1 - labels)
    alpha_t = alpha * labels + (1 - alpha) * (1 - labels)
    loss = alpha_t * ce * (1 - p_t) ** gamma
    if valid is None:
        return jnp.mean(loss)
    v = valid.astype(loss.dtype)
    return jnp.sum(loss * v) / jnp.maximum(jnp.sum(v), 1.0)


def compute_score_loss(scores, ious, valid, thresh_pos=0.5, thresh_neg=0.25):
    """Proposal-score regression loss (reference criterion.py:65-84, unused):
    BCE against soft labels derived from IoU — 1 above thresh_pos, 0 below
    thresh_neg, linear in between."""
    soft = jnp.clip((ious - thresh_neg) / (thresh_pos - thresh_neg), 0.0, 1.0)
    ce = jnp.maximum(scores, 0) - scores * soft + jnp.log1p(jnp.exp(-jnp.abs(scores)))
    v = valid.astype(ce.dtype)
    return jnp.sum(ce * v) / jnp.maximum(jnp.sum(v), 1.0)
