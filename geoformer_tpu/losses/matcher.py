"""Hungarian matcher: device-side cost, host-side LSA via pure_callback.

Reference model/matcher.py:43-126: dice cost (+ class cost for the
supervised model), scipy linear_sum_assignment on CPU per scene. The cost
matrix here is a static [Q, MAX_INST] array with an instance-validity mask;
only the assignment bounces to host (tiny, like the reference's
matcher.py:122-124 D2H hop).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def build_gt_instances(inst_labels_fg, sem_labels_fg, fg_valid, max_inst: int):
    """One-hot GT instance masks at fg resolution.

    inst_labels_fg [B,F] int32 (per-scene contiguous ids or -100),
    sem_labels_fg [B,F] -> (inst_masks [B,I,F] f32, inst_valid [B,I],
    inst_sem [B,I] int32).
    """
    ids = jnp.arange(max_inst, dtype=jnp.int32)
    inst_masks = (
        (inst_labels_fg[:, None, :] == ids[None, :, None])
        & fg_valid[:, None, :]
        & (inst_labels_fg[:, None, :] >= 0)
    )
    inst_valid = jnp.any(inst_masks, axis=-1)
    # semantic class of each instance (labels are uniform within an instance)
    sem = jnp.max(
        jnp.where(inst_masks, sem_labels_fg[:, None, :], -1), axis=-1
    )
    inst_sem = jnp.where(inst_valid, sem, 0).astype(jnp.int32)
    return inst_masks.astype(jnp.float32), inst_valid, inst_sem


def dice_cost(mask_logits, inst_masks, fg_valid):
    """[Q,F] x [I,F] -> [Q,I] dice cost (matcher.py:25-40)."""
    probs = jax.nn.sigmoid(mask_logits) * fg_valid[None, :]
    num = 2.0 * jnp.einsum("qf,if->qi", probs, inst_masks)
    den = jnp.sum(probs, -1)[:, None] + jnp.sum(inst_masks, -1)[None, :]
    return 1.0 - (num + 1.0) / (den + 1.0)


def _host_lsa(cost, inst_valid):
    import scipy.optimize

    cost = np.asarray(cost, np.float64)
    inst_valid = np.asarray(inst_valid)
    out = np.zeros(inst_valid.shape[0], np.int32)
    cols = np.nonzero(inst_valid)[0]
    if len(cols) > 0:
        rows, picked = scipy.optimize.linear_sum_assignment(cost[:, cols])
        out[cols[picked]] = rows.astype(np.int32)
    return out


def hungarian_assign(cost, inst_valid):
    """cost [B,Q,I], inst_valid [B,I] -> pred_inds [B,I] int32
    (query index matched to each valid instance)."""
    b, _, i = cost.shape

    def single(c, v):
        return jax.pure_callback(
            _host_lsa, jax.ShapeDtypeStruct((i,), jnp.int32), c, v, vmap_method="sequential"
        )

    return jax.vmap(single)(cost, inst_valid)
