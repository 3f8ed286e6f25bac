"""Device-side auction matcher vs scipy's exact Hungarian solution.

The auction assignment replaces the per-step host callback (rejected by
some TPU runtimes). It is epsilon-optimal: assignments may differ from
scipy on near-ties, but the total matching cost must agree closely and
the assignment must always be a valid injection.
"""

import numpy as np
import jax.numpy as jnp
import scipy.optimize

from geoformer_tpu.losses.matcher import auction_assign


def _scipy_total(cost, valid):
    cols = np.nonzero(valid)[0]
    rows, picked = scipy.optimize.linear_sum_assignment(cost[:, cols])
    return cost[rows, cols[picked]].sum()


def test_auction_close_to_optimal():
    rng = np.random.default_rng(0)
    for trial in range(8):
        q = int(rng.integers(16, 129))
        i = int(rng.integers(2, min(q, 64)))
        n_valid = int(rng.integers(1, i + 1))
        cost = rng.uniform(-1.0, 2.0, (q, i)).astype(np.float32)
        valid = np.zeros(i, bool)
        valid[:n_valid] = True
        got = np.asarray(auction_assign(jnp.asarray(cost[None]), jnp.asarray(valid[None]))[0])
        # injection over valid instances
        picked = got[valid]
        assert len(set(picked.tolist())) == n_valid
        total = cost[picked, np.nonzero(valid)[0]].sum()
        opt = _scipy_total(cost, valid)
        assert total <= opt + 0.006 * n_valid + 1e-4, (trial, total, opt)


def test_auction_degenerate_cases():
    # single instance, duplicate-cost columns, all-invalid
    cost = np.zeros((8, 4), np.float32)
    valid = np.array([True, True, False, False])
    got = np.asarray(auction_assign(jnp.asarray(cost[None]), jnp.asarray(valid[None]))[0])
    assert len({got[0], got[1]}) == 2  # distinct despite identical costs
    none = np.asarray(auction_assign(
        jnp.asarray(cost[None]), jnp.asarray(np.zeros(4, bool)[None]))[0])
    assert (none == 0).all()
