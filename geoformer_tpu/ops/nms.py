"""Matrix NMS (SOLO-style gaussian decay) on device.

Reference util/utils_3d.py:95-141. IoU matrix is one einsum over the
proposal masks — MXU work — and the decay is closed-form, so the whole NMS
is O(Q^2) with no sequential loop (unlike greedy NMS).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def matrix_nms(masks, scores, categories, valid, sigma=2.0, final_score_thresh=0.05):
    """masks [Q,P] bool/float, scores [Q], categories [Q], valid [Q]
    -> keep [Q] bool, updated scores [Q] (gaussian-decayed).

    Sorting is by score descending (invalid proposals sink)."""
    q = scores.shape[0]
    scores = jnp.where(valid, scores, -1.0)
    order = jnp.argsort(-scores)
    m = masks[order].astype(jnp.float32)
    s = scores[order]
    c = categories[order]
    v = valid[order]

    inter = jnp.einsum("nc,mc->nm", m, m)
    areas = jnp.sum(m, axis=1)
    union = areas[:, None] + areas[None, :] - inter
    ious = inter / jnp.maximum(union, 1e-6)

    same_label = (c[:, None] == c[None, :]) & v[:, None] & v[None, :]
    triu = jnp.triu(jnp.ones((q, q), bool), k=1)
    label_matrix = (same_label & triu).astype(jnp.float32)

    compensate = jnp.max(ious * label_matrix, axis=0)
    compensate = jnp.broadcast_to(compensate[:, None], (q, q))
    decay_iou = ious * label_matrix

    decay_matrix = jnp.exp(-sigma * decay_iou**2)
    compensate_matrix = jnp.exp(-sigma * compensate**2)
    decay_coeff = jnp.min(decay_matrix / compensate_matrix, axis=0)

    new_scores = s * decay_coeff
    keep_sorted = (new_scores >= final_score_thresh) & v

    # un-sort back to input order
    inv = jnp.argsort(order)
    return keep_sorted[inv], (new_scores)[inv]


def greedy_nms(masks, scores, valid, iou_thresh=0.3):
    """Classic greedy NMS (reference non_max_suppression,
    util/utils_3d.py:76-93): walk proposals by descending score, suppress
    any later proposal whose IoU with a kept one exceeds iou_thresh.

    masks [Q,P], scores [Q], valid [Q] -> keep [Q] bool (input order).
    Sequential by nature; Q is small (<=256) so the fori_loop is cheap.
    """
    q = scores.shape[0]
    scores = jnp.where(valid, scores, -1.0)
    order = jnp.argsort(-scores)
    m = masks[order].astype(jnp.float32)
    v = valid[order]

    inter = jnp.einsum("nc,mc->nm", m, m)
    areas = jnp.sum(m, axis=1)
    union = areas[:, None] + areas[None, :] - inter
    ious = inter / jnp.maximum(union, 1e-6)

    def body(i, keep):
        alive = keep[i] & v[i]
        suppress = (ious[i] > iou_thresh) & (jnp.arange(q) > i) & alive
        return keep & ~suppress

    keep_sorted = jax.lax.fori_loop(0, q, body, v)
    inv = jnp.argsort(order)
    return keep_sorted[inv]
