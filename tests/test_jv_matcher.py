"""Jonker-Volgenant assignment solver vs scipy's exact Hungarian.

VERDICT r1 item 5: MATCHER="hungarian" must be exact AND fast on TPU. The
vectorized Jonker-Volgenant solver (models/matcher.jv_assign) replaces
optax's serial-DFS solver in the hot path; these tests pin exactness
against scipy.optimize.linear_sum_assignment.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from vision_instance_seg_tpu.models.matcher import assign, jv_assign


def _total(cost, rows, cols):
    return float(cost[np.asarray(rows), np.asarray(cols)].sum())


@pytest.mark.parametrize("r,c,seed", [(5, 8, 0), (20, 100, 1), (20, 100, 2),
                                      (32, 32, 3), (1, 50, 4), (20, 400, 5)])
def test_jv_matches_scipy_on_random_costs(r, c, seed):
    rng = np.random.default_rng(seed)
    cost = rng.standard_normal((r, c)).astype(np.float32) * 3.0
    i, j = jax.jit(jv_assign)(jnp.asarray(cost))
    i, j = np.asarray(i), np.asarray(j)
    # valid matching
    assert len(set(j.tolist())) == r
    si, sj = linear_sum_assignment(cost)
    assert _total(cost, i, j) == pytest.approx(_total(cost, si, sj),
                                               abs=1e-3)


def test_jv_matches_scipy_on_setprediction_like_costs():
    """Cost structure like real matching: many near-identical columns
    (background queries) + a few strongly-preferred ones, with padded
    invalid rows at a huge constant cost."""
    rng = np.random.default_rng(7)
    r, c = 20, 100
    cost = np.full((r, c), 8.0, np.float32) + rng.normal(0, .05, (r, c))
    for g in range(12):                       # 12 "real" GTs
        cost[g, rng.integers(0, c)] = -5.0 + rng.normal(0, .1)
    cost[12:] = 1e6                           # padded rows
    i, j = jax.jit(jv_assign)(jnp.asarray(cost))
    si, sj = linear_sum_assignment(cost)
    assert _total(cost, np.asarray(i), np.asarray(j)) == pytest.approx(
        _total(cost, si, sj), rel=1e-6)


def test_assign_dispatch():
    rng = np.random.default_rng(0)
    cost = jnp.asarray(rng.standard_normal((6, 10)).astype(np.float32))
    for method in ("hungarian", "hungarian_dfs", "greedy"):
        i, j = assign(cost, method)
        assert len(set(np.asarray(j).tolist())) == 6
    # exact methods agree on total cost (optax may permute the row order)
    i1, j1 = assign(cost, "hungarian")
    i2, j2 = assign(cost, "hungarian_dfs")
    c_np = np.asarray(cost)
    assert _total(c_np, np.asarray(i1), np.asarray(j1)) == pytest.approx(
        _total(c_np, np.asarray(i2), np.asarray(j2)), abs=1e-4)
