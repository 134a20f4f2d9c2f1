"""Jitted Hungarian matcher for set prediction (Mask2Former/MaskDINO).

Replaces the reference stack's ``HungarianMatcher`` (scipy
``linear_sum_assignment`` on CPU inside the torch loss, via MaskDINO —
reference train_original.py:29 build path). TPU-native differences:

- The assignment runs **on device inside jit** via
  ``optax.assignment.hungarian_algorithm`` (vmapped over the batch), so the
  train step never syncs to host (SURVEY.md §7 "hard parts": jitted
  Hungarian).
- Variable #GT per image is handled with pad-to-max + masked cost columns:
  invalid GT columns get a huge constant cost, so they absorb leftover
  queries and are dropped afterwards by ``gt_valid``.
- The mask/dice pair costs decompose into matmuls over sampled points
  (BCE(x,y) = y*softplus(-x) + (1-y)*softplus(x)), which the MXU eats —
  no (Q, M, P) intermediate is ever materialized.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax


class MatchResult(NamedTuple):
    # For each GT slot g: the query index assigned to it.
    gt_to_query: jnp.ndarray   # (B, M) int32
    gt_valid: jnp.ndarray      # (B, M) bool


def point_sample_nhw(grid: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Bilinear-sample (N, H, W) at normalized xy points (P, 2) -> (N, P).

    Convention matches torch.nn.functional.grid_sample align_corners=False
    (pixel centers at (i + 0.5) / size), zero padding outside.
    """
    n, h, w = grid.shape
    x = points[:, 0] * w - 0.5
    y = points[:, 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    lx = x - x0
    ly = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def corner(yi, xi, wgt):
        valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        idx = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
        g = grid.reshape(n, h * w)[:, idx]              # (N, P)
        return g * jnp.where(valid, wgt, 0.0)[None, :]

    return (corner(y0i, x0i, (1 - ly) * (1 - lx))
            + corner(y0i, x0i + 1, (1 - ly) * lx)
            + corner(y0i + 1, x0i, ly * (1 - lx))
            + corner(y0i + 1, x0i + 1, ly * lx))


def batch_sigmoid_ce_cost(pred_pts: jnp.ndarray, gt_pts: jnp.ndarray) -> jnp.ndarray:
    """(Q, P) logits x (M, P) {0,1} -> (Q, M) mean point BCE."""
    p = pred_pts.shape[1]
    pos = jax.nn.softplus(-pred_pts)                    # loss where gt = 1
    neg = jax.nn.softplus(pred_pts)                     # loss where gt = 0
    return (pos @ gt_pts.T + neg @ (1.0 - gt_pts).T) / p


def batch_dice_cost(pred_pts: jnp.ndarray, gt_pts: jnp.ndarray) -> jnp.ndarray:
    """(Q, P) logits x (M, P) {0,1} -> (Q, M) dice cost."""
    pr = jax.nn.sigmoid(pred_pts)
    num = 2.0 * (pr @ gt_pts.T)
    den = pr.sum(-1)[:, None] + gt_pts.sum(-1)[None, :]
    return 1.0 - (num + 1.0) / (den + 1.0)


_INVALID_COST = 1e6


def grid_sample_masks(masks: jnp.ndarray, num_points: int) -> jnp.ndarray:
    """(B, N, H, W) -> (B, N, g*g) values on a regular g x g grid.

    TPU-native replacement for random-point sampling: a bilinear resize is
    a fused vectorized op, whereas per-point bilinear gathers are
    element-serial on TPU (measured ~30ms per (80, 12544)-point sample at
    200x200 — the dominant train-step cost before this path existed).
    g = round(sqrt(num_points)), e.g. 12544 -> 112x112.
    """
    b, n_masks, _, _ = masks.shape
    g = max(1, int(round(num_points ** 0.5)))
    out = jax.image.resize(masks.astype(jnp.float32),
                           (b, n_masks, g, g), method="bilinear")
    return out.reshape(b, n_masks, g * g)


def greedy_assign(cost: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy linear assignment on an (R, C) cost matrix, R <= C.

    Repeatedly takes the globally-cheapest unassigned (row, col) pair —
    R iterations of a vectorized argmin, no serial DFS. Near-optimal for
    set-prediction matching (each GT usually has a distinct best query)
    and orders of magnitude faster on TPU than the exact solver, whose
    scalar-scatter DFS loops cost seconds per train step at (L=10, B=4,
    M=20, Q=100). Same return contract as
    ``optax.assignment.hungarian_algorithm``: (row_indices, col_indices).
    """
    r, c = cost.shape
    big = jnp.float32(1e9)

    def body(carry, _):
        cm, cols = carry
        idx = jnp.argmin(cm)
        ri = (idx // c).astype(jnp.int32)
        ci = (idx % c).astype(jnp.int32)
        cols = cols.at[ri].set(ci)
        cm = cm.at[ri, :].set(big)
        cm = cm.at[:, ci].set(big)
        return (cm, cols), None

    (_, cols), _ = jax.lax.scan(
        body, (cost.astype(jnp.float32), jnp.zeros((r,), jnp.int32)),
        None, length=r)
    return jnp.arange(r, dtype=jnp.int32), cols


def jv_assign(cost: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact rectangular linear assignment (R <= C), vectorized for TPU.

    Jonker-Volgenant successive shortest augmenting paths — the same
    algorithm as scipy.optimize.linear_sum_assignment, so the result is
    exactly the optimum (no epsilon). Replaces optax's serial-DFS Hungarian
    in the hot path: that solver's scalar-scatter while-loops cost ~2.4 s
    of a 2.9 s train step at (L=10, B=4, M=20, Q=100) (docs/PERF.md).

    TPU mapping: each Dijkstra step relaxes ALL columns with one (C,)
    vector op (the per-column inner loop of the CPU implementation), so the
    sequential depth is only the number of scanned columns per augmentation
    (typically << C), not R*C scalar steps. An eps-scaled auction was tried
    first and rejected: eps-scaling's optimality bound breaks on
    rectangular problems once phases reset assignments (stale prices on
    unassigned columns), and squaring with identical dummy rows livelocks
    in eps-sized bidding wars (~1500 iterations/phase measured at C=100).
    """
    r, c = cost.shape
    cost = cost.astype(jnp.float32)
    inf = jnp.float32(jnp.inf)
    rows = jnp.arange(r, dtype=jnp.int32)

    def augment(cur_row, carry):
        u, v, col4row, row4col = carry

        # ---- Dijkstra from cur_row until an unassigned column is reached
        def dj_cond(st):
            return st[0] < 0

        def dj_body(st):
            sink, i, min_val, remaining, shortest, path, sr = st
            sr = sr.at[i].set(True)
            red = min_val + cost[i] - u[i] - v          # (C,)
            upd = remaining & (red < shortest)
            shortest = jnp.where(upd, red, shortest)
            path = jnp.where(upd, i, path)
            masked = jnp.where(remaining, shortest, inf)
            j = jnp.argmin(masked).astype(jnp.int32)
            min_val = masked[j]
            remaining = remaining.at[j].set(False)
            owner = row4col[j]
            sink = jnp.where(owner < 0, j, jnp.int32(-1))
            i = jnp.where(owner < 0, i, owner)
            return sink, i, min_val, remaining, shortest, path, sr

        sink, _, min_val, remaining, shortest, path, sr = jax.lax.while_loop(
            dj_cond, dj_body,
            (jnp.int32(-1), cur_row, jnp.float32(0.0),
             jnp.ones((c,), bool), jnp.full((c,), inf),
             jnp.full((c,), -1, jnp.int32), jnp.zeros((r,), bool)))

        # ---- dual updates (scipy _lsap convention)
        u = u.at[cur_row].add(min_val)
        others = sr & (rows != cur_row)
        # rows in SR (other than cur_row) are assigned; col4row is valid
        delta_u = min_val - shortest[jnp.clip(col4row, 0, c - 1)]
        u = jnp.where(others, u + delta_u, u)
        scanned = ~remaining
        v = jnp.where(scanned, v + shortest - min_val, v)

        # ---- augment along the alternating path back to cur_row
        def aug_cond(st):
            done, _, _, _ = st
            return jnp.logical_not(done)

        def aug_body(st):
            _, j, col4row, row4col = st
            i = path[j]
            row4col = row4col.at[j].set(i)
            prev = col4row[jnp.clip(i, 0, r - 1)]
            col4row = col4row.at[jnp.clip(i, 0, r - 1)].set(j)
            return i == cur_row, prev, col4row, row4col

        _, _, col4row, row4col = jax.lax.while_loop(
            aug_cond, aug_body, (jnp.bool_(False), sink, col4row, row4col))
        return u, v, col4row, row4col

    init = (jnp.zeros((r,), jnp.float32), jnp.zeros((c,), jnp.float32),
            jnp.full((r,), -1, jnp.int32), jnp.full((c,), -1, jnp.int32))
    _, _, col4row, _ = jax.lax.fori_loop(
        0, r, lambda k, carry: augment(jnp.int32(k), carry), init)
    return rows, col4row


def assign(cost_t: jnp.ndarray, method: str = "hungarian"
           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Solve assignment on (R, C) cost (rows=GT).

    "hungarian": exact via the vectorized Jonker-Volgenant solver (fast on
    TPU — one (C,)-vector relax per Dijkstra step instead of scalar loops).
    "hungarian_dfs": optax's serial-DFS exact solver (reference oracle;
    seconds/step on TPU — kept for golden tests).
    "greedy": vectorized global-argmin (near-optimal, fastest).
    """
    if method == "greedy":
        return greedy_assign(cost_t)
    if method == "hungarian_dfs":
        return optax.assignment.hungarian_algorithm(cost_t)
    return jv_assign(cost_t)


def hungarian_match(cls_logits: jnp.ndarray, mask_logits: jnp.ndarray,
                    gt_classes: jnp.ndarray, gt_mask_pts: jnp.ndarray,
                    pred_mask_pts: jnp.ndarray, gt_valid: jnp.ndarray,
                    cost_class: float = 2.0, cost_mask: float = 5.0,
                    cost_dice: float = 5.0,
                    method: str = "hungarian") -> MatchResult:
    """Batched padded Hungarian matching.

    cls_logits (B, Q, C+1); mask_logits unused (kept for signature clarity);
    gt_classes (B, M) int32 (any value ok on invalid slots);
    gt_mask_pts (B, M, P) point-sampled GT {0,1};
    pred_mask_pts (B, Q, P) point-sampled mask logits;
    gt_valid (B, M) bool.
    """
    del mask_logits

    def per_image(cls_l, gt_c, gt_pts, pr_pts, valid):
        prob = jax.nn.softmax(cls_l.astype(jnp.float32), axis=-1)  # (Q, C+1)
        c_class = -prob[:, jnp.clip(gt_c, 0, prob.shape[1] - 1)]   # (Q, M)
        c_mask = batch_sigmoid_ce_cost(pr_pts.astype(jnp.float32),
                                       gt_pts.astype(jnp.float32))
        c_dice = batch_dice_cost(pr_pts.astype(jnp.float32),
                                 gt_pts.astype(jnp.float32))
        cost = (cost_class * c_class + cost_mask * c_mask + cost_dice * c_dice)
        cost = jnp.where(valid[None, :], cost, _INVALID_COST)      # (Q, M)
        # transpose: rows = GT (M <= Q) so every GT gets a query
        i, j = assign(cost.T, method)
        # i = GT rows, j = assigned query. Scatter to slot order.
        gt_to_q = jnp.zeros((cost.shape[1],), jnp.int32).at[i].set(
            j.astype(jnp.int32))
        return gt_to_q

    gt_to_query = jax.vmap(per_image)(
        cls_logits, gt_classes, gt_mask_pts, pred_mask_pts, gt_valid)
    return MatchResult(gt_to_query=gt_to_query, gt_valid=gt_valid)
