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
    (query index matched to each valid instance). Host scipy LSA via
    pure_callback — exact, but host callbacks are unsupported on some TPU
    runtimes; the production train path uses auction_assign."""
    b, _, i = cost.shape

    def single(c, v):
        return jax.pure_callback(
            _host_lsa, jax.ShapeDtypeStruct((i,), jnp.int32), c, v, vmap_method="sequential"
        )

    return jax.vmap(single)(cost, inst_valid)


def _auction_scene(cost, inst_valid, eps_phases=(0.005,),
                   rounds_per_phase=2000):
    """Forward auction, fully on device.

    cost [Q, I] f32, inst_valid [I] -> query index per instance [I] int32.
    Valid instances bid for queries (value = -cost); Jacobi rounds: every
    unassigned agent bids best-minus-second-best + eps, each query goes to
    its highest bidder at the raised price. The result is within n*eps of
    the optimum (the matcher only shapes training targets — near-ties may
    resolve differently than scipy; total matching cost agrees to ~1e-2).
    A greedy sweep assigns any straggler left at the round cap.

    NOTE: single phase by design. Epsilon-scaling warm starts are UNSOUND
    for this rectangular (Q > I) problem: queries left unassigned at a
    previous phase keep inflated prices, which breaks the duality bound
    and produced arbitrarily bad matchings in testing.
    """
    q, i = cost.shape
    value = -cost.T  # [I, Q]
    neg = -1e9

    def phase(carry, eps):
        price, _ = carry
        assigned = jnp.full((i,), -1, jnp.int32)
        owner = jnp.full((q,), -1, jnp.int32)

        def cond(st):
            assigned, _, _, it = st
            return jnp.any((assigned < 0) & inst_valid) & (it < rounds_per_phase)

        def body(st):
            assigned, owner, price, it = st
            bidding = (assigned < 0) & inst_valid
            net = value - price[None, :]  # [I, Q]
            best_q = jnp.argmax(net, axis=1)
            v1 = jnp.max(net, axis=1)
            net2 = net.at[jnp.arange(i), best_q].set(neg)
            v2 = jnp.max(net2, axis=1)
            incr = jnp.where(bidding, v1 - v2 + eps, neg)
            # dense [I, Q] bid board: winner per query = highest bidder
            board = jnp.where(
                bidding[:, None] & (jnp.arange(q)[None, :] == best_q[:, None]),
                incr[:, None], neg,
            )
            win_bid = jnp.max(board, axis=0)  # [Q]
            win_agent = jnp.argmax(board, axis=0).astype(jnp.int32)
            won = win_bid > neg / 2
            price = jnp.where(won, price + win_bid, price)
            # displaced previous owners become unassigned
            displaced = jnp.where(won, owner, -1)  # [Q] agent ids or -1
            was_displaced = jnp.any(
                (jnp.arange(i)[:, None] == displaced[None, :]), axis=1
            )
            assigned = jnp.where(was_displaced, -1, assigned)
            owner = jnp.where(won, win_agent, owner)
            new_q = jnp.argmax(
                (jnp.arange(i)[:, None] == jnp.where(won, win_agent, -1)[None, :]),
                axis=1,
            ).astype(jnp.int32)
            got_one = jnp.any(
                (jnp.arange(i)[:, None] == jnp.where(won, win_agent, -1)[None, :]),
                axis=1,
            )
            assigned = jnp.where(got_one, new_q, assigned)
            return assigned, owner, price, it + 1

        assigned, owner, price, _ = jax.lax.while_loop(
            cond, body, (assigned, owner, price, jnp.int32(0))
        )
        return (price, assigned), None

    (price, assigned), _ = jax.lax.scan(
        phase, (jnp.zeros((q,), jnp.float32), jnp.full((i,), -1, jnp.int32)),
        jnp.asarray(eps_phases, jnp.float32),
    )

    # greedy fallback for agents unassigned at the round cap (rare)
    def fallback(k, st):
        assigned = st
        taken = jnp.any(
            (jnp.arange(q)[:, None] == jnp.where(inst_valid, assigned, -1)[None, :]),
            axis=1,
        )
        need = (assigned[k] < 0) & inst_valid[k]
        c = jnp.where(taken, 1e9, cost[:, k])
        pick = jnp.argmin(c).astype(jnp.int32)
        return assigned.at[k].set(jnp.where(need, pick, assigned[k]))

    assigned = jax.lax.fori_loop(0, i, fallback, assigned)
    return jnp.where(inst_valid, assigned, 0).astype(jnp.int32)


def auction_assign(cost, inst_valid, eps_phases=(0.005,)):
    """Device-side assignment, drop-in for hungarian_assign ([B,Q,I] ->
    [B,I]). No host callback: runs under jit on any backend (the tunnel
    TPU runtime rejects pure_callback entirely) and removes the reference's
    per-step GPU->CPU->GPU matcher bounce (model/matcher.py:122-124)."""
    return jax.vmap(
        lambda c, v: _auction_scene(c, v, eps_phases=eps_phases)
    )(cost, inst_valid)
