"""Fused multi-scale deformable-attention sampling (Pallas, TPU).

TPU-native replacement for the reference's compiled CUDA ``MSDeformAttn``
op (MaskDINO maskdino/modeling/pixel_decoder/ops, reached via
``add_maskdino_config``/``build_model`` — reference
training/maskdino/train_original.py:29). This is the BASELINE.md
north-star kernel: the reference-parity deformable encoder/decoder path
runs through it.

Why not a gather: TPU has no hardware gather unit — XLA lowers arbitrary
row gathers element-serially (~70 ms per encoder layer at 800 px,
docs/PERF.md), and Mosaic's ``dynamic_gather`` does not support these
shapes. The kernel therefore reformulates scattered bilinear sampling as
dense VPU + MXU work:

- Queries are processed in spatial tiles of their own feature level (the
  deformable encoder's queries ARE the multi-scale tokens, so each
  tile's sampling locations cluster around the tile's normalized
  footprint across ALL levels — reference points are shared normalized
  coordinates).
- For every value level, a halo window around the tile's footprint is
  DMA'd from HBM into VMEM (window extents are compile-time constants;
  origins are computed from the grid position).
- Each (point, corner) contributes a vectorized iota-compare row into a
  sparse selection matrix that already carries the bilinear lerp weights
  TIMES the softmaxed attention weights; the whole sample-lerp-reduce
  then collapses into ONE (S_tile x T_window) @ (T_window x head_dim)
  matmul per (head, level) on the MXU. No gathers anywhere.

Exactness contract: matches ``ms_deform_attn_core_jnp`` (same corner
arithmetic and align_corners=False convention, fp32 accumulation, out-of-
feature-map corners contribute exactly zero) whenever every sampling
offset stays within ``halo`` pixels (of the sampled level) of the query
tile footprint. That holds at the reference initialization (compass
offsets <= num_points px); to make it hold for ARBITRARY (trained or
imported) weights, ``fused_ms_deform_attn.offset_clamp`` instructs
``MSDeformAttn`` to clamp offsets to +-halo px before sampling, so the
contract is enforced rather than assumed — kernel and jnp core then agree
on the actual clamped locations (tests/test_msdeform_kernel.py pins the
equivalence and quantifies the unclamped beyond-halo deviation; the
checkpoint importer warns when imported offset biases exceed the halo).
The jnp core (models/deform_attn.py) remains the arbitrary-offset
reference path and the CPU fallback.
"""

from __future__ import annotations

import functools
import math
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Default halo margin, in pixels of the *sampled* level. Offsets are
# initialized to at most num_points (=4) px (deform_attn._offset_bias_init);
# the halo bounds how far trained offsets may wander with exact results.
DEFAULT_HALO = 6

# Query tile extent (rows, cols) in the query's own level. 8x16 = 128
# one-hot rows per tile; smaller tiles shrink the halo windows (less VPU
# compare work — the per-query cost is O(window area) = O((tile+2*halo)^2))
# but add grid steps and skinnier MXU matmuls. Env-overridable for sweeps
# (scripts/bench_msdeform.py); TILE_W must stay a multiple of 8 (Mosaic
# sublane DMA alignment).
import os as _os

TILE_H = int(_os.environ.get("VIST_MSDEFORM_TILE_H", "8"))
TILE_W = int(_os.environ.get("VIST_MSDEFORM_TILE_W", "16"))

# Forward selection-matrix construction strategy:
#   "outer"   — factorized: per point, build a row two-hot (wh, S) and a
#               col two-hot (ww, S) carrying the bilinear y/x weights (the
#               attention weight folded into the y side), then expand with
#               ONE broadcasted outer product into a query-on-lanes
#               (wh, ww, S) accumulator. ~5x fewer VPU vreg-ops than
#               "compare" (2 ops/element on the window footprint instead of
#               ~12, at full 128-lane utilization) at the price of one bulk
#               (S, nh*nl*p*3) loc/aw transpose per tile. Out-of-map
#               corners are exact zeros by construction: window rows always
#               lie in [0, Hj) and padded W columns hold zero values, so an
#               index compare that matches nothing (or a zero column)
#               contributes nothing. Beyond-halo samples (possible only
#               with offset_clamp disabled) contribute ZERO here, where
#               "compare" clamps them to the window edge — both are outside
#               the exactness contract.
#   "compare" — per (point, corner) full-footprint iota-compare rows
#               (the r2 kernel).
ONEHOT_MODE = _os.environ.get("VIST_MSDEFORM_ONEHOT", "outer")


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pick_tile(hi: int, wi: int,
               spatial_shapes: Sequence[Tuple[int, int]], halo: int,
               budget: Optional[int] = None) -> Tuple[int, int]:
    """Query-tile extents for a (hi, wi) query level.

    ``budget=None`` — the r2 policy: tiles shrink PROPORTIONALLY to the
    query level's resolution vs the finest sampled level, bounding halo
    windows but collapsing coarse-level tiles to 16-32 queries: the
    (S, hd) selection matmuls then use 1/16 of the MXU and the grid runs
    ~4x more steps (profiled 2026-08-19: the (50,50) query level cost
    almost as much as (100,100) with 4x fewer queries).

    ``budget=N`` — keep the tile as LARGE as possible (descending query
    count: 8x16, 8x8, 4x8, 2x8) subject to every halo window's area
    wh*ww <= N. The window area bounds both the per-(head,point) one-hot
    accumulator (wh, ww, S) and the matmul contraction size, so the
    budget caps VMEM/vreg pressure while restoring full-width MXU tiles
    on coarse query levels. tw candidates stay 8-divisible (Mosaic
    sublane-DMA rule) or clamp to the whole level width.
    """
    if budget is None:
        max_h = max(h for h, _ in spatial_shapes)
        max_w = max(w for _, w in spatial_shapes)
        th = min(TILE_H, hi, max(2, round(TILE_H * hi / max_h)))
        tw = min(TILE_W, _round_up(max(1, round(TILE_W * wi / max_w)), 8))
        if tw > wi:
            tw = wi
        return th, tw
    cands = [(TILE_H, TILE_W), (TILE_H, TILE_W // 2),
             (TILE_H // 2, TILE_W // 2), (max(2, TILE_H // 4), TILE_W // 2)]
    th = tw = None
    for cth, ctw in cands:
        th = min(cth, hi)
        tw = ctw if ctw <= wi else wi       # 8-divisible or whole width
        area = max(_window_extent(th, hi, hj, halo)
                   * _window_extent(tw, wi, wj, halo, align=8)
                   for hj, wj in spatial_shapes)
        if area <= budget:
            break
    return th, tw


TPAD_BUDGET = int(_os.environ.get("VIST_MSDEFORM_TPAD", "4096"))
_bwd_budget = _os.environ.get("VIST_MSDEFORM_TPAD_BWD", "")
TPAD_BUDGET_BWD = int(_bwd_budget) if _bwd_budget else None


def _window_extent(tile: int, src: int, dst: int, halo: int,
                   align: int = 1) -> int:
    """Static halo-window extent in the sampled level.

    Query centers of a ``tile``-row slab of an ``src``-row level span
    < ceil(tile * dst / src) pixels in a ``dst``-row level; +2*halo for
    the offset margin, +2 for floor()/+1 bilinear corners. With
    ``align`` > 1 (the W dim): Mosaic requires DMA slice sizes along the
    sublane dim to be multiples of the 8-row tiling, and the origin is
    aligned down by up to align-1, so the extent grows accordingly.
    ``dst`` is the TRUE level extent; the padded buffer extent is
    ``round_up(dst, align)`` and caps the window.
    """
    e = int(math.ceil(tile * dst / src)) + 2 * halo + 2
    if align > 1:
        e = _round_up(e + align - 1, align)
    return min(_round_up(dst, align), e)


def _window_origin(t, tile: int, src: int, dst: int, halo: int, extent: int,
                   align: int = 1):
    """Dynamic window origin (int32) from the tile index ``t``.

    ``dst`` is the TRUE level extent (the center math needs the real
    scale ratio); the clamp bound is the padded buffer extent, and aligned
    origins stay aligned under it because both bounds are multiples of
    ``align``.
    """
    first_center = (t.astype(jnp.float32) * tile + 0.5) * (dst / src) - 0.5
    o = jnp.floor(first_center).astype(jnp.int32) - halo
    o = jnp.clip(o, 0, _round_up(dst, align) - extent)
    if align > 1:
        # align LAST: Mosaic must statically prove the DMA offset divisible
        # by the tiling, and it can't see through a trailing clip (the clip
        # bounds are multiples of ``align``, so aligning after is safe)
        o = (o // align) * align
    return o


def _encoder_level_pallas(level_values: Sequence[Sequence[jnp.ndarray]],
                          loc_i: jnp.ndarray, aw_i: jnp.ndarray,
                          qi_hw: Tuple[int, int],
                          spatial_shapes: Sequence[Tuple[int, int]],
                          num_heads: int, head_dim: int, num_points: int,
                          halo: int, interpret: bool) -> jnp.ndarray:
    """All queries of ONE level sample ALL levels. Returns (B,Hi,Wi,C) f32.

    level_values: per level, a list of <=128-lane channel chunks
    (B, Hj, Wj, lane) in HBM — the Mosaic window DMA only compiles for lane
    counts <= 128, so C=256 is shipped as two chunks and each head reads
    from its own chunk (head_dim divides 128).
    loc_i: (B, Hi, Wi, nH*L*P*2) f32; aw_i: (B, Hi, Wi, nH*L*P) f32.
    """
    hi, wi = qi_hw
    nh, hd, p = num_heads, head_dim, num_points
    nl = len(spatial_shapes)
    c = nh * hd
    b = loc_i.shape[0]
    # largest tile under the window-area budget (see _pick_tile): restores
    # 128-query MXU tiles on coarse query levels while capping halo-window
    # VMEM/vreg pressure
    th, tw = _pick_tile(hi, wi, spatial_shapes, halo, TPAD_BUDGET)
    s = th * tw
    vdtype = level_values[0][0].dtype
    lane = level_values[0][0].shape[-1]
    nchunks = len(level_values[0])

    # W extents/origins 8-aligned: Mosaic DMA slice sizes along the sublane
    # dim must be multiples of the 8-row tiling (value buffers arrive with
    # W padded to a multiple of 8 by the caller)
    win_hw = [(_window_extent(th, hi, hj, halo),
               _window_extent(tw, wi, wj, halo, align=8))
              for (hj, wj) in spatial_shapes]
    sublane = 16 if vdtype == jnp.bfloat16 else 8
    t_pad = [_round_up(wh * ww, max(sublane, 128)) for (wh, ww) in win_hw]

    # tile grid is FLATTENED to one axis: a 3D pallas grid crashes this
    # platform's Mosaic compiler (tpu_compile_helper exit 1 on any 3D-grid
    # kernel with ANY-space refs; bisected 2026-08-16, /tmp/probe10 vs 11)
    nti, ntj = pl.cdiv(hi, th), pl.cdiv(wi, tw)

    def kernel(loc_ref, aw_ref, *refs):
        nv = nl * nchunks
        val_refs = refs[:nv]                 # [j * nchunks + k]
        out_ref = refs[nv]
        win_scratch = refs[nv + 1:nv + 1 + nv]
        sems = refs[nv + 1 + nv]

        bi = pl.program_id(0)
        t = pl.program_id(1)
        ti = t // ntj
        tj = t % ntj

        # start all window DMAs up front; compute overlaps the later ones
        copies, origins = [], []
        for j, (hj, wj) in enumerate(spatial_shapes):
            wh, ww = win_hw[j]
            y0 = _window_origin(ti, th, hi, hj, halo, wh)
            x0 = _window_origin(tj, tw, wi, wj, halo, ww, align=8)
            for k in range(nchunks):
                i = j * nchunks + k
                dma = pltpu.make_async_copy(
                    val_refs[i].at[bi, pl.ds(y0, wh), pl.ds(x0, ww), :],
                    win_scratch[i], sems.at[i])
                dma.start()
                copies.append(dma)
            origins.append((y0, x0))

        # keep 2D: Mosaic supports collapsing leading dims onto sublanes but
        # not splitting the lane dim — address (h, j, p) via static lane
        # slices of the flat layout instead
        loc = loc_ref[0].reshape(s, nh * nl * p * 2).astype(jnp.float32)
        aw = aw_ref[0].reshape(s, nh * nl * p).astype(jnp.float32)
        if ONEHOT_MODE == "outer":
            # one bulk transpose puts queries on LANES for the two-hot
            # builds below (vs nh*p per-column vector transposes)
            locT = loc.T                                     # (l2, S)
            awT = aw.T                                       # (la, S)

        out_acc = [jnp.zeros((s, hd), jnp.float32) for _ in range(nh)]
        for j, (hj, wj) in enumerate(spatial_shapes):
            wh, ww = win_hw[j]
            y0, x0 = origins[j]
            winf = []
            for k in range(nchunks):
                i = j * nchunks + k
                copies[i].wait()
                wk = win_scratch[i][:].reshape(wh * ww, lane)
                if t_pad[j] > wh * ww:
                    wk = jnp.pad(wk, ((0, t_pad[j] - wh * ww), (0, 0)))
                winf.append(wk)
            if ONEHOT_MODE == "outer":
                iota_wh = jax.lax.broadcasted_iota(jnp.int32, (wh, 1), 0)
                iota_ww = jax.lax.broadcasted_iota(jnp.int32, (ww, 1), 0)
                for h in range(nh):
                    acc3 = jnp.zeros((wh, ww, s), jnp.float32)
                    for pt in range(p):
                        base = ((h * nl + j) * p + pt) * 2
                        x = locT[base:base + 1, :] * wj - 0.5     # (1,S)
                        y = locT[base + 1:base + 2, :] * hj - 0.5
                        xf = jnp.clip(jnp.floor(x), -2.0, float(wj))
                        yf = jnp.clip(jnp.floor(y), -2.0, float(hj))
                        lx = x - xf
                        ly = y - yf
                        rx0 = xf.astype(jnp.int32) - x0           # (1,S)
                        ry0 = yf.astype(jnp.int32) - y0
                        ai = (h * nl + j) * p + pt
                        a = awT[ai:ai + 1, :]                     # (1,S)
                        wy0 = (1.0 - ly) * a
                        wy1 = ly * a
                        ryh = (jnp.where(iota_wh == ry0, wy0, 0.0)
                               + jnp.where(iota_wh == ry0 + 1, wy1, 0.0))
                        rxh = (jnp.where(iota_ww == rx0, 1.0 - lx, 0.0)
                               + jnp.where(iota_ww == rx0 + 1, lx, 0.0))
                        acc3 = acc3 + ryh[:, None, :] * rxh[None, :, :]
                    acc2 = acc3.reshape(wh * ww, s)
                    if t_pad[j] > wh * ww:
                        acc2 = jnp.pad(
                            acc2, ((0, t_pad[j] - wh * ww), (0, 0)))
                    off = (h * hd) % lane
                    # TN matmul: contract the window axis (sublanes of both
                    # operands); result lands queries-major (S, hd)
                    out_acc[h] = out_acc[h] + jax.lax.dot_general(
                        acc2.astype(vdtype),
                        winf[(h * hd) // lane][:, off:off + hd],
                        (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                continue
            iota = jax.lax.broadcasted_iota(jnp.int32, (1, t_pad[j]), 1)
            for h in range(nh):
                acc = jnp.zeros((s, t_pad[j]), jnp.float32)
                for pt in range(p):
                    base = ((h * nl + j) * p + pt) * 2
                    x = loc[:, base:base + 1] * wj - 0.5          # (S,1)
                    y = loc[:, base + 1:base + 2] * hj - 0.5
                    # clip BEFORE the int cast: padded-tile rows carry
                    # garbage loc; real out-of-map samples keep weight 0
                    xf = jnp.clip(jnp.floor(x), -2.0, float(wj))
                    yf = jnp.clip(jnp.floor(y), -2.0, float(hj))
                    lx = x - xf
                    ly = y - yf
                    xi = xf.astype(jnp.int32)
                    yi = yf.astype(jnp.int32)
                    ai = (h * nl + j) * p + pt
                    a = aw[:, ai:ai + 1]                          # (S,1)
                    for dy in (0, 1):
                        wy = ly if dy else 1.0 - ly
                        gy = yi + dy
                        vy = (gy >= 0) & (gy < hj)
                        ry = jnp.clip(gy - y0, 0, wh - 1)
                        for dx in (0, 1):
                            wx = lx if dx else 1.0 - lx
                            gx = xi + dx
                            valid = vy & (gx >= 0) & (gx < wj)
                            rx = jnp.clip(gx - x0, 0, ww - 1)
                            idx = ry * ww + rx                    # (S,1)
                            wgt = jnp.where(valid, wy * wx * a, 0.0)
                            acc = acc + jnp.where(iota == idx, wgt, 0.0)
                off = (h * hd) % lane
                out_acc[h] = out_acc[h] + jnp.dot(
                    acc.astype(vdtype),
                    winf[(h * hd) // lane][:, off:off + hd],
                    preferred_element_type=jnp.float32)

        out_ref[0] = jnp.concatenate(out_acc, axis=-1).reshape(th, tw, c)

    grid = (b, nti * ntj)
    imap = lambda bb, t: (bb, t // ntj, t % ntj, 0)
    flops_win = sum(2 * s * tp * hd * nh for tp in t_pad)
    flat_values = [v for halves in level_values for v in halves]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, th, tw, nh * nl * p * 2), imap,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, tw, nh * nl * p), imap,
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pl.ANY)] * (nl * nchunks),
        out_specs=pl.BlockSpec((1, th, tw, c), imap,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hi, wi, c), jnp.float32),
        scratch_shapes=[pltpu.VMEM((wh, ww, lane), vdtype)
                        for (wh, ww) in win_hw for _ in range(nchunks)]
        + [pltpu.SemaphoreType.DMA((nl * nchunks,))],
        # the default 16 MiB scoped-vmem compiler limit is conservative on
        # v5e; the finest-level kernel's unrolled body peaks ~17.5 MiB at 4
        # scales (windows + one-hot accumulators)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=grid[0] * grid[1] * flops_win,
            bytes_accessed=sum(v.size * v.dtype.itemsize
                               for v in flat_values)
            + loc_i.size * 4 + aw_i.size * 4 + b * hi * wi * c * 4,
            transcendentals=0),
        interpret=interpret,
    )(loc_i, aw_i, *flat_values)


def ms_deform_attn_encoder_pallas(value: jnp.ndarray,
                                  spatial_shapes: Sequence[Tuple[int, int]],
                                  locations: jnp.ndarray,
                                  weights: jnp.ndarray,
                                  halo: int = DEFAULT_HALO,
                                  interpret: bool = False,
                                  query_levels: Optional[Sequence[int]]
                                  = None) -> jnp.ndarray:
    """Deformable-encoder sampling core (queries == the multi-scale grid).

    Same contract as ``ms_deform_attn_core_jnp``: value (B, sum HW, nH, hd),
    locations (B, Q, nH, L, P, 2), weights (B, Q, nH, L, P); Q == sum HW and
    query q's location tile is its own grid position. Returns (B, Q, nH*hd)
    f32.

    ``query_levels`` restricts the QUERY side to a subset of levels (in
    level order): locations/weights then hold only those levels' token
    slices concatenated, while ``value`` still carries every level. Used
    by the hybrid dispatch in :func:`fused_ms_deform_attn` to keep coarse
    query levels off Pallas (fewer Mosaic kernel instantiations — the
    4-scale train-step compile OOM'd the remote helper on the full set).
    """
    b, sumhw, nh, hd = value.shape
    nl = len(spatial_shapes)
    p = weights.shape[-1]
    c = nh * hd
    splits = [h * w for h, w in spatial_shapes]
    qlv = list(query_levels) if query_levels is not None else list(range(nl))
    qsplits = [splits[i] for i in qlv]
    qoffs = np.cumsum([0] + qsplits)
    assert locations.shape[1] == sum(qsplits), (
        "encoder kernel requires one query per multi-scale token of its "
        "query levels; use the one-hot/jnp core for free queries")

    assert c <= 128 or (c % 128 == 0 and 128 % hd == 0), (
        "channel chunking requires head_dim to divide 128")
    offs = np.cumsum([0] + splits)
    lane = min(c, 128)
    levels = []
    for j, (h, w) in enumerate(spatial_shapes):
        full = value[:, offs[j]:offs[j + 1]].reshape(b, h, w, c)
        wp = _round_up(w, 8)     # sublane-dim DMA slices must be 8-aligned
        if wp > w:
            full = jnp.pad(full, ((0, 0), (0, 0), (0, wp - w), (0, 0)))
        levels.append([full[..., k * lane:(k + 1) * lane]
                       for k in range(c // lane)])

    outs = []
    for qi, i in enumerate(qlv):
        h, w = spatial_shapes[i]
        loc_i = locations[:, qoffs[qi]:qoffs[qi + 1]].astype(jnp.float32)
        aw_i = weights[:, qoffs[qi]:qoffs[qi + 1]].astype(jnp.float32)
        loc_i = loc_i.reshape(b, h, w, nh * nl * p * 2)
        aw_i = aw_i.reshape(b, h, w, nh * nl * p)
        out = _encoder_level_pallas(levels, loc_i, aw_i, (h, w),
                                    spatial_shapes, nh, hd, p, halo,
                                    interpret)
        outs.append(out.reshape(b, splits[i], c))
    return jnp.concatenate(outs, axis=1)


# --------------------------------------------------------------------------
# Backward kernels.
#
# The same blocked no-gather strategy as the forward, split by output:
#
# - d(locations)/d(weights) are QUERY-shaped: one query-centric kernel per
#   query level with the forward's exact window geometry. Per (level, head)
#   a single NT matmul M = g_h @ V_win^T puts the cotangent-weighted value
#   of EVERY window token in (S, T_pad); each (point, corner) then reads
#   its token with one masked row-reduction, and the chain rule closes with
#   scalar-column arithmetic (bilinear weight derivatives).
# - d(value) is VALUE-shaped: one value-centric kernel per value level.
#   Value tiles PARTITION the level, so each (query, point, corner)
#   contribution lands in exactly one tile — the transposed selection
#   matrix (T_q, S_v) built from the reverse halo window of every query
#   level turns the scatter-add into one TN matmul per (query level, head)
#   with no write races. loc/aw arrive pre-sliced per (query level, value
#   level) pair (nh*p*2 / nh*p lanes) so reverse windows stay < VMEM.
#
# Exactness contract matches the forward: gradients are exact while every
# sample stays within ``halo`` pixels (of the sampled level) of its query
# tile footprint; the golden tests pin both kernels against jax.vjp of the
# jnp core.
# --------------------------------------------------------------------------


def _corner_geometry(loc, aw, base_xy, base_a, wj, hj):
    """Shared corner math: returns (lx, ly, xi, yi, a) columns."""
    x = loc[:, base_xy:base_xy + 1] * wj - 0.5
    y = loc[:, base_xy + 1:base_xy + 2] * hj - 0.5
    xf = jnp.clip(jnp.floor(x), -2.0, float(wj))
    yf = jnp.clip(jnp.floor(y), -2.0, float(hj))
    return (x - xf, y - yf, xf.astype(jnp.int32), yf.astype(jnp.int32),
            aw[:, base_a:base_a + 1])


def _encoder_level_bwd_lw_pallas(level_values, loc_i, aw_i, g_i, qi_hw,
                                 spatial_shapes, num_heads, head_dim,
                                 num_points, halo, interpret):
    """d(loc), d(aw) for ONE query level. Returns ((B,Hi,Wi,nH*L*P*2) f32,
    (B,Hi,Wi,nH*L*P) f32). Window geometry identical to the forward."""
    hi, wi = qi_hw
    nh, hd, p = num_heads, head_dim, num_points
    nl = len(spatial_shapes)
    c = nh * hd
    b = loc_i.shape[0]
    # backward keeps the r2 proportional tiles unless VIST_MSDEFORM_TPAD_BWD
    # sets a budget (the bwd_lw body carries more live intermediates than
    # the forward, and its compile history is fragile — see module notes)
    th, tw = _pick_tile(hi, wi, spatial_shapes, halo, TPAD_BUDGET_BWD)
    s = th * tw
    vdtype = level_values[0][0].dtype
    lane = level_values[0][0].shape[-1]
    nchunks = len(level_values[0])
    win_hw = [(_window_extent(th, hi, hj, halo),
               _window_extent(tw, wi, wj, halo, align=8))
              for (hj, wj) in spatial_shapes]
    sublane = 16 if vdtype == jnp.bfloat16 else 8
    t_pad = [_round_up(wh * ww, max(sublane, 128)) for (wh, ww) in win_hw]
    nti, ntj = pl.cdiv(hi, th), pl.cdiv(wi, tw)
    la, l2 = nh * nl * p, nh * nl * p * 2

    def kernel(loc_ref, aw_ref, g_ref, *refs):
        nv = nl * nchunks
        val_refs = refs[:nv]
        dloc_ref, daw_ref = refs[nv], refs[nv + 1]
        win_scratch = refs[nv + 2:nv + 2 + nv]
        sems = refs[nv + 2 + nv]

        bi = pl.program_id(0)
        t = pl.program_id(1)
        ti = t // ntj
        tj = t % ntj

        copies, origins = [], []
        for j, (hj, wj) in enumerate(spatial_shapes):
            wh, ww = win_hw[j]
            y0 = _window_origin(ti, th, hi, hj, halo, wh)
            x0 = _window_origin(tj, tw, wi, wj, halo, ww, align=8)
            for k in range(nchunks):
                i = j * nchunks + k
                dma = pltpu.make_async_copy(
                    val_refs[i].at[bi, pl.ds(y0, wh), pl.ds(x0, ww), :],
                    win_scratch[i], sems.at[i])
                dma.start()
                copies.append(dma)
            origins.append((y0, x0))

        loc = loc_ref[0].reshape(s, l2).astype(jnp.float32)
        aw = aw_ref[0].reshape(s, la).astype(jnp.float32)
        g = g_ref[0].reshape(s, c)
        if ONEHOT_MODE == "outer":
            locT = loc.T                                     # (l2, S)
            awT = aw.T                                       # (la, S)

        dlx_cols = [None] * la
        dly_cols = [None] * la
        da_cols = [None] * la
        for j, (hj, wj) in enumerate(spatial_shapes):
            wh, ww = win_hw[j]
            y0, x0 = origins[j]
            winf = []
            for k in range(nchunks):
                i = j * nchunks + k
                copies[i].wait()
                wk = win_scratch[i][:].reshape(wh * ww, lane)
                if t_pad[j] > wh * ww:
                    wk = jnp.pad(wk, ((0, t_pad[j] - wh * ww), (0, 0)))
                winf.append(wk)
            if ONEHOT_MODE == "outer":
                # factorized corner reductions (see the forward): the
                # NT matmul lands M TRANSPOSED (window-major), each point
                # then needs two sublane contractions with small col
                # two-hots (bilinear weights / corner-difference signs)
                # and three row reductions — ~3x fewer VPU vreg-ops than
                # the per-corner full-footprint masked reductions
                iota_wh = jax.lax.broadcasted_iota(jnp.int32, (wh, 1), 0)
                iota_ww = jax.lax.broadcasted_iota(
                    jnp.int32, (1, ww, 1), 1)
                for h in range(nh):
                    off = (h * hd) % lane
                    vwin = winf[(h * hd) // lane][:wh * ww, off:off + hd]
                    gh = g[:, h * hd:(h + 1) * hd].astype(vdtype)
                    m3 = jax.lax.dot_general(
                        vwin, gh, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32) \
                        .reshape(wh, ww, s)      # window-major cotangent@V
                    for pt in range(p):
                        base = ((h * nl + j) * p + pt) * 2
                        x = locT[base:base + 1, :] * wj - 0.5     # (1,S)
                        y = locT[base + 1:base + 2, :] * hj - 0.5
                        xf = jnp.clip(jnp.floor(x), -2.0, float(wj))
                        yf = jnp.clip(jnp.floor(y), -2.0, float(hj))
                        lx = (x - xf)[None]                     # (1,1,S)
                        ly = y - yf
                        rx0 = (xf.astype(jnp.int32) - x0)[None]  # (1,1,S)
                        ry0 = yf.astype(jnp.int32) - y0
                        xw = (jnp.where(iota_ww == rx0, 1.0 - lx, 0.0)
                              + jnp.where(iota_ww == rx0 + 1, lx, 0.0))
                        xs = (jnp.where(iota_ww == rx0 + 1, 1.0, 0.0)
                              - jnp.where(iota_ww == rx0, 1.0, 0.0))
                        yw = (jnp.where(iota_wh == ry0, 1.0 - ly, 0.0)
                              + jnp.where(iota_wh == ry0 + 1, ly, 0.0))
                        ys = (jnp.where(iota_wh == ry0 + 1, 1.0, 0.0)
                              - jnp.where(iota_wh == ry0, 1.0, 0.0))
                        mx = jnp.sum(m3 * xw, axis=1)            # (wh,S)
                        mxs = jnp.sum(m3 * xs, axis=1)           # (wh,S)
                        ai = (h * nl + j) * p + pt
                        a = awT[ai:ai + 1, :]
                        da_cols[ai] = jnp.sum(mx * yw, axis=0,
                                              keepdims=True)
                        dlx_cols[ai] = a * float(wj) * jnp.sum(
                            mxs * yw, axis=0, keepdims=True)
                        dly_cols[ai] = a * float(hj) * jnp.sum(
                            mx * ys, axis=0, keepdims=True)
                continue
            iota = jax.lax.broadcasted_iota(jnp.int32, (1, t_pad[j]), 1)
            for h in range(nh):
                off = (h * hd) % lane
                vwin = winf[(h * hd) // lane][:, off:off + hd]
                gh = g[:, h * hd:(h + 1) * hd].astype(vdtype)
                # M[s, t] = <g_h[s], V_win[t]>: the cotangent-weighted value
                # of every window token, for every query of the tile
                m = jax.lax.dot_general(
                    gh, vwin, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)  # (S, T_pad)
                for pt in range(p):
                    ai = (h * nl + j) * p + pt
                    lx, ly, xi, yi, a = _corner_geometry(
                        loc, aw, ai * 2, ai, wj, hj)
                    da = jnp.zeros((s, 1), jnp.float32)
                    dx = jnp.zeros((s, 1), jnp.float32)
                    dy = jnp.zeros((s, 1), jnp.float32)
                    for cy in (0, 1):
                        wy = ly if cy else 1.0 - ly
                        sy = 1.0 if cy else -1.0
                        gy = yi + cy
                        vy = (gy >= 0) & (gy < hj)
                        ry = jnp.clip(gy - y0, 0, wh - 1)
                        for cx in (0, 1):
                            wx = lx if cx else 1.0 - lx
                            sx = 1.0 if cx else -1.0
                            gx = xi + cx
                            valid = vy & (gx >= 0) & (gx < wj)
                            rx = jnp.clip(gx - x0, 0, ww - 1)
                            idx = ry * ww + rx
                            # m_c[s] = M[s, idx_c(s)] for in-map corners
                            mc = jnp.sum(
                                jnp.where(iota == idx, m, 0.0), axis=1,
                                keepdims=True)
                            mc = jnp.where(valid, mc, 0.0)
                            da = da + wy * wx * mc
                            dx = dx + sx * wy * mc
                            dy = dy + sy * wx * mc
                    da_cols[ai] = da
                    dlx_cols[ai] = a * float(wj) * dx
                    dly_cols[ai] = a * float(hj) * dy

        if ONEHOT_MODE == "outer":
            # rows are (1, S); stack feature-major then transpose back
            dloc_T = jnp.concatenate(
                [row for pair in zip(dlx_cols, dly_cols) for row in pair],
                axis=0)                                      # (l2, S)
            dloc_ref[0] = dloc_T.T.reshape(th, tw, l2)
            daw_ref[0] = jnp.concatenate(da_cols, axis=0).T \
                .reshape(th, tw, la)
        else:
            dloc_flat = jnp.concatenate(
                [col for pair in zip(dlx_cols, dly_cols) for col in pair],
                axis=-1)
            dloc_ref[0] = dloc_flat.reshape(th, tw, l2)
            daw_ref[0] = jnp.concatenate(da_cols, axis=-1) \
                .reshape(th, tw, la)

    grid = (b, nti * ntj)
    imap = lambda bb, t: (bb, t // ntj, t % ntj, 0)
    flat_values = [v for halves in level_values for v in halves]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, th, tw, l2), imap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, tw, la), imap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, tw, c), imap, memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pl.ANY)] * (nl * nchunks),
        out_specs=[
            pl.BlockSpec((1, th, tw, l2), imap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, tw, la), imap, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, hi, wi, l2), jnp.float32),
            jax.ShapeDtypeStruct((b, hi, wi, la), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((wh, ww, lane), vdtype)
                        for (wh, ww) in win_hw for _ in range(nchunks)]
        + [pltpu.SemaphoreType.DMA((nl * nchunks,))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(loc_i, aw_i, g_i, *flat_values)


def _rev_extent(vtile: int, src: int, dst: int, halo: int,
                align: int = 1) -> int:
    """Reverse window extent: queries of a ``dst``-row level whose samples
    (within ``halo``+bilinear reach, in ``src``-level pixels) can touch a
    ``vtile``-row value slab of the ``src`` level."""
    e = int(math.ceil((vtile + 2 * halo + 2) * dst / src)) + 2
    if align > 1:
        e = _round_up(e + align - 1, align)
    return min(_round_up(dst, align), e)


def _rev_origin(t, vtile: int, src: int, dst: int, halo: int, extent: int,
                align: int = 1):
    """Reverse window origin: first query row of the ``dst`` level whose
    samples can reach value row ``t * vtile`` of the ``src`` level."""
    first = (t.astype(jnp.float32) * vtile - halo - 0.5) * (dst / src) - 0.5
    o = jnp.floor(first).astype(jnp.int32) - 1
    o = jnp.clip(o, 0, _round_up(dst, align) - extent)
    if align > 1:
        o = (o // align) * align
    return o


# A value level whose full (padded) dvalue accumulator fits in this many
# bytes of VMEM uses the DENSE reduction kernel below instead of the
# windowed value-centric kernel: for coarse levels the windowed geometry
# inverts (2x8 value tiles vs ~66x96 reverse query windows, because the
# +-halo+bilinear reach in value pixels spans many query pixels), which
# bloats the unrolled Mosaic IR ~30x (compile went >50 min; bisected r3)
# and re-DMAs giant cotangent windows per tiny tile at runtime.
DENSE_BWD_V_LIMIT_BYTES = 4 * 1024 * 1024


def _encoder_bwd_v_dense_pallas(g_i, loc_ij, aw_ij, qi_hw, vj_hw,
                                num_heads, head_dim, num_points,
                                tile_hw, interpret):
    """dvalue of ONE (query level i -> value level j) pair, dense layout.

    Query tiles stream through the grid (same tile geometry as the
    forward); the FULL value-level accumulator lives in VMEM as a
    grid-constant output block and every step adds its tile's transposed
    selection-matrix matmul: dV_j += sel_tile^T @ g_tile. Grid steps on a
    TPU core run sequentially, so += accumulation over the flattened tile
    axis is race-free. No reverse windows, no per-tile DMA of cotangent
    slabs — g/loc/aw arrive as ordinary VMEM blocks.

    g_i (B, Hi, Wi, C) cotangent of query level i (compute dtype);
    loc_ij (B, Hi, Wi, nh*p*2) f32 level-j sampling locations;
    aw_ij (B, Hi, Wi, nh*p) f32 level-j attention weights.
    Returns (B, Hj, Wjp, C) f32 with Wjp = round_up(Wj, 8).
    """
    hi, wi = qi_hw
    hj, wj = vj_hw
    nh, hd, p = num_heads, head_dim, num_points
    c = nh * hd
    b = g_i.shape[0]
    th, tw = tile_hw
    s = th * tw
    wjp = _round_up(wj, 8)
    t_out = hj * wjp
    la, l2 = nh * p, nh * p * 2
    nti, ntj = pl.cdiv(hi, th), pl.cdiv(wi, tw)
    gdtype = g_i.dtype

    def kernel(loc_ref, aw_ref, g_ref, out_ref):
        t = pl.program_id(1)
        ti = t // ntj
        tj = t % ntj

        @pl.when(t == 0)
        def _init():
            out_ref[...] = jnp.zeros_like(out_ref)

        loc = loc_ref[0].reshape(s, l2)
        aw = aw_ref[0].reshape(s, la)
        g = g_ref[0].reshape(s, c)
        # edge tiles run past the level: BlockSpec pads reads with garbage
        # (NaN in interpret mode), and unlike the forward (whose garbage
        # rows are cropped on write) a reduction kernel would ACCUMULATE
        # them — mask the selection weights AND the cotangent by tile-row
        # validity (a zero sel row does not save a NaN g row: 0*NaN=NaN
        # inside the matmul contraction)
        # (s, 1) iota + div/mod rather than reshaping a (th, tw) mask:
        # Mosaic cannot shape-cast (th, tw) i1 -> (s, 1)
        sidx = jax.lax.broadcasted_iota(jnp.int32, (s, 1), 0)
        row_ok = ((ti * th + sidx // tw < hi)
                  & (tj * tw + sidx % tw < wi))
        g = jnp.where(row_ok, g, 0)

        if ONEHOT_MODE == "outer":
            # factorized build in VALUE-major orientation (queries on
            # lanes): acc3 (Hj, Wjp, S) += row-two-hot x col-two-hot, then
            # ONE NN matmul acc2 (T_out, S) @ g (S, hd) lands the output
            # orientation directly. Garbage edge-tile query LANES must be
            # sanitized here (unlike the query-shaped kernels, the
            # contraction crosses lanes: 0*NaN = NaN) — zeroed loc rows
            # make every two-hot weight finite and g's zeroed rows already
            # kill their contribution.
            locT = loc.T                                     # (l2, S)
            awT = aw.T                                       # (la, S)
            sidx_r = jax.lax.broadcasted_iota(jnp.int32, (1, s), 1)
            okr = ((ti * th + sidx_r // tw < hi)
                   & (tj * tw + sidx_r % tw < wi))           # (1, S)
            locT = jnp.where(okr, locT, 0.0)
            awT = jnp.where(okr, awT, 0.0)
            iota_hj = jax.lax.broadcasted_iota(jnp.int32, (hj, 1), 0)
            iota_wj = jax.lax.broadcasted_iota(jnp.int32, (wjp, 1), 0)
            outs = []
            for h in range(nh):
                acc3 = jnp.zeros((hj, wjp, s), jnp.float32)
                for pt in range(p):
                    ai = h * p + pt
                    x = locT[2 * ai:2 * ai + 1, :] * wj - 0.5   # (1,S)
                    y = locT[2 * ai + 1:2 * ai + 2, :] * hj - 0.5
                    xf = jnp.clip(jnp.floor(x), -2.0, float(wj))
                    yf = jnp.clip(jnp.floor(y), -2.0, float(hj))
                    lx = x - xf
                    ly = y - yf
                    xi = xf.astype(jnp.int32)
                    yi = yf.astype(jnp.int32)
                    a = awT[ai:ai + 1, :]
                    wy0 = (1.0 - ly) * a
                    wy1 = ly * a
                    yh = (jnp.where(iota_hj == yi, wy0, 0.0)
                          + jnp.where(iota_hj == yi + 1, wy1, 0.0))
                    # gx == wj can match a PADDED col only when wjp > wj;
                    # that gradient lands in padding the caller crops —
                    # mask it anyway so wjp == wj and wjp > wj agree
                    xh = (jnp.where((iota_wj == xi) & (iota_wj < wj),
                                    1.0 - lx, 0.0)
                          + jnp.where((iota_wj == xi + 1) & (iota_wj < wj),
                                      lx, 0.0))
                    acc3 = acc3 + yh[:, None, :] * xh[None, :, :]
                gh = g[:, h * hd:(h + 1) * hd]
                outs.append(jax.lax.dot_general(
                    acc3.reshape(t_out, s).astype(gdtype), gh,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))   # (T_out, hd)
            out_ref[0] += jnp.concatenate(outs, -1).reshape(hj, wjp, c)
            return

        iota = jax.lax.broadcasted_iota(jnp.int32, (1, t_out), 1)
        outs = []
        for h in range(nh):
            acc = jnp.zeros((s, t_out), jnp.float32)
            for pt in range(p):
                ai = h * p + pt
                lx, ly, xi, yi, a = _corner_geometry(
                    loc, aw, ai * 2, ai, wj, hj)
                for cy in (0, 1):
                    wy = ly if cy else 1.0 - ly
                    gy = yi + cy
                    vy = (gy >= 0) & (gy < hj)
                    for cx in (0, 1):
                        wx = lx if cx else 1.0 - lx
                        gx = xi + cx
                        valid = vy & (gx >= 0) & (gx < wj) & row_ok
                        idx = gy * wjp + gx
                        wgt = jnp.where(valid, wy * wx * a, 0.0)
                        acc = acc + jnp.where(iota == idx, wgt, 0.0)
            gh = g[:, h * hd:(h + 1) * hd]
            outs.append(jax.lax.dot_general(
                acc.astype(gdtype), gh, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))   # (T_out, hd)
        out_ref[0] += jnp.concatenate(outs, -1).reshape(hj, wjp, c)

    imap = lambda bb, t: (bb, t // ntj, t % ntj, 0)
    return pl.pallas_call(
        kernel,
        grid=(b, nti * ntj),
        in_specs=[
            pl.BlockSpec((1, th, tw, l2), imap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, tw, la), imap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, tw, c), imap, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hj, wjp, c), lambda bb, t: (bb, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hj, wjp, c), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(loc_ij, aw_ij, g_i)


def _encoder_level_bwd_v_pallas(g_levels, meta_by_q, vj_hw,
                                spatial_shapes, num_heads, head_dim,
                                num_points, halo, interpret):
    """d(value) for ONE value level j. Returns (B, Hj, Wj, C) f32.

    g_levels: per query level, <=128-lane chunks of the cotangent
    (B, Hi, Wip, lane) — zero in padded columns, so padded query positions
    contribute nothing. meta_by_q: per query level, the LEVEL-j loc and aw
    slices PACKED into one 128-lane buffer (B, Hi, Wip, 128) laid out
    [loc (nh*p*2) | aw (nh*p) | zero pad]: Mosaic requires HBM DMA slice
    extents along the lane dim to be multiples of the (1, 128) tiling, so
    DMA'ing the raw 64-lane loc / 32-lane aw buffers is a compile error
    ("Slice shape along dimension 3 must be aligned to tiling (128)" —
    the r2 'Mosaic internal error', root-caused r3); one packed aligned
    buffer also halves the DMA count.
    """
    hj, wj = vj_hw
    nh, hd, p = num_heads, head_dim, num_points
    nl = len(spatial_shapes)
    c = nh * hd
    b = meta_by_q[0].shape[0]
    lane = g_levels[0][0].shape[-1]
    nchunks = len(g_levels[0])
    gdtype = g_levels[0][0].dtype

    # value tiles: same policy switch as bwd_lw (proportional unless
    # VIST_MSDEFORM_TPAD_BWD sets a budget)
    th, tw = _pick_tile(hj, wj, spatial_shapes, halo, TPAD_BUDGET_BWD)
    sv = th * tw
    # reverse halo windows per query level
    rwin = [( _rev_extent(th, hj, hi, halo),
              _rev_extent(tw, wj, wi, halo, align=8))
            for (hi, wi) in spatial_shapes]
    sublane = 16 if gdtype == jnp.bfloat16 else 8
    tq_pad = [_round_up(qh * qw, max(sublane, 128)) for (qh, qw) in rwin]
    nti, ntj = pl.cdiv(hj, th), pl.cdiv(wj, tw)
    la, l2 = nh * p, nh * p * 2

    def kernel(*refs):
        ng = nl * nchunks
        g_refs = refs[:ng]                     # [i * nchunks + k]
        meta_refs = refs[ng:ng + nl]
        out_ref = refs[ng + nl]
        g_scr = refs[ng + nl + 1:ng + nl + 1 + ng]
        meta_scr = refs[ng + nl + 1 + ng:ng + nl + 1 + ng + nl]
        sems = refs[-1]

        bi = pl.program_id(0)
        t = pl.program_id(1)
        ti = t // ntj
        tj = t % ntj
        ty0 = ti * th
        tx0 = tj * tw

        copies = []
        for i, (hi, wi) in enumerate(spatial_shapes):
            qh, qw = rwin[i]
            y0 = _rev_origin(ti, th, hj, hi, halo, qh)
            x0 = _rev_origin(tj, tw, wj, wi, halo, qw, align=8)
            for k in range(nchunks):
                n = i * nchunks + k
                dma = pltpu.make_async_copy(
                    g_refs[n].at[bi, pl.ds(y0, qh), pl.ds(x0, qw), :],
                    g_scr[n], sems.at[n])
                dma.start()
                copies.append(dma)
            dm = pltpu.make_async_copy(
                meta_refs[i].at[bi, pl.ds(y0, qh), pl.ds(x0, qw), :],
                meta_scr[i], sems.at[ng + i])
            dm.start()
            copies.append(dm)

        iota_v = jax.lax.broadcasted_iota(jnp.int32, (1, sv), 1)
        acc = [jnp.zeros((sv, hd), jnp.float32) for _ in range(nh)]
        for i, (hi, wi) in enumerate(spatial_shapes):
            qh, qw = rwin[i]
            for dma in copies[i * (nchunks + 1):(i + 1) * (nchunks + 1)]:
                dma.wait()
            tq = tq_pad[i]
            gw = []
            for k in range(nchunks):
                wk = g_scr[i * nchunks + k][:].reshape(qh * qw, lane)
                if tq > qh * qw:
                    wk = jnp.pad(wk, ((0, tq - qh * qw), (0, 0)))
                gw.append(wk)
            # pad BEFORE lane-slicing: Mosaic's concat lowering rejects
            # padding a lane-offset slice ("result/input offset mismatch
            # on non-concat dimension")
            meta = meta_scr[i][:].reshape(qh * qw, 128)
            if tq > qh * qw:
                meta = jnp.pad(meta, ((0, tq - qh * qw), (0, 0)))
            loc = meta[:, :l2]
            aw = meta[:, l2:l2 + la]
            if ONEHOT_MODE == "outer":
                # factorized build, value-TILE-major with queries on lanes
                # (the bwd mirror of the forward's outer branch): per point,
                # a row two-hot (th, T_q) carrying aw-folded y weights and a
                # col two-hot (tw, T_q), expanded by ONE broadcasted outer
                # product into (th, tw, T_q). ~6x fewer VPU vreg-ops than
                # the per-corner compare build on the (T_q, S_v) footprint;
                # one bulk (T_q, 128) meta transpose per (level, tile).
                # Padded T_q rows are zero (aw=0 -> zero two-hots) and the
                # DMA'd windows are real memory, so no NaN sanitizing is
                # needed. Rows/cols beyond the true level extent land in
                # edge-tile regions the out BlockSpec crops on write.
                metaT = meta.T                                # (128, T_q)
                iota_th = jax.lax.broadcasted_iota(jnp.int32, (th, 1), 0)
                iota_tw = jax.lax.broadcasted_iota(jnp.int32, (tw, 1), 0)
                for h in range(nh):
                    acc3 = jnp.zeros((th, tw, tq), jnp.float32)
                    for pt in range(p):
                        ai = h * p + pt
                        x = metaT[2 * ai:2 * ai + 1, :] * wj - 0.5  # (1,Tq)
                        y = metaT[2 * ai + 1:2 * ai + 2, :] * hj - 0.5
                        xf = jnp.clip(jnp.floor(x), -2.0, float(wj))
                        yf = jnp.clip(jnp.floor(y), -2.0, float(hj))
                        lx = x - xf
                        ly = y - yf
                        ry0 = yf.astype(jnp.int32) - ty0
                        rx0 = xf.astype(jnp.int32) - tx0
                        a = metaT[l2 + ai:l2 + ai + 1, :]
                        wy0 = (1.0 - ly) * a
                        wy1 = ly * a
                        yh = (jnp.where(iota_th == ry0, wy0, 0.0)
                              + jnp.where(iota_th == ry0 + 1, wy1, 0.0))
                        xh = (jnp.where(iota_tw == rx0, 1.0 - lx, 0.0)
                              + jnp.where(iota_tw == rx0 + 1, lx, 0.0))
                        acc3 = acc3 + yh[:, None, :] * xh[None, :, :]
                    off = (h * hd) % lane
                    gh = gw[(h * hd) // lane][:, off:off + hd]  # (T_q, hd)
                    # NN matmul: contract the query axis (lanes of acc3,
                    # sublanes of gh); result lands value-major (S_v, hd)
                    acc[h] = acc[h] + jax.lax.dot_general(
                        acc3.reshape(sv, tq).astype(gdtype), gh,
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                continue
            for h in range(nh):
                sel = jnp.zeros((tq, sv), jnp.float32)
                for pt in range(p):
                    ai = h * p + pt
                    lx, ly, xi, yi, a = _corner_geometry(
                        loc, aw, ai * 2, ai, wj, hj)
                    for cy in (0, 1):
                        wy = ly if cy else 1.0 - ly
                        gy = yi + cy
                        vy = (gy >= ty0) & (gy < jnp.minimum(ty0 + th, hj))
                        for cx in (0, 1):
                            wx = lx if cx else 1.0 - lx
                            gx = xi + cx
                            valid = vy & (gx >= tx0) \
                                & (gx < jnp.minimum(tx0 + tw, wj))
                            rv = (gy - ty0) * tw + (gx - tx0)   # (T_q, 1)
                            wgt = jnp.where(valid, wy * wx * a, 0.0)
                            sel = sel + jnp.where(iota_v == rv, wgt, 0.0)
                off = (h * hd) % lane
                gh = gw[(h * hd) // lane][:, off:off + hd]
                # transposed scatter -> one TN matmul, no write races
                acc[h] = acc[h] + jax.lax.dot_general(
                    sel.astype(gdtype), gh, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)  # (S_v, hd)

        out_ref[0] = jnp.concatenate(acc, axis=-1).reshape(th, tw, c)

    grid = (b, nti * ntj)
    imap = lambda bb, t: (bb, t // ntj, t % ntj, 0)
    flat_g = [x for halves in g_levels for x in halves]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * (nl * nchunks + nl),
        out_specs=pl.BlockSpec((1, th, tw, c), imap,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hj, wj, c), jnp.float32),
        scratch_shapes=[pltpu.VMEM((qh, qw, lane), gdtype)
                        for (qh, qw) in rwin for _ in range(nchunks)]
        + [pltpu.VMEM((qh, qw, 128), jnp.float32) for (qh, qw) in rwin]
        + [pltpu.SemaphoreType.DMA((nl * nchunks + nl,))],
        # the fine-level windowed kernel's reverse-window scratch + one-hot
        # temporaries peak ~68 MiB at 800 px (v5e has 128 MiB VMEM)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*flat_g, *meta_by_q)


def ms_deform_attn_encoder_bwd_pallas(value, spatial_shapes, locations,
                                      weights, g, halo: int = DEFAULT_HALO,
                                      interpret: bool = False,
                                      query_levels: Optional[Sequence[int]]
                                      = None):
    """Blocked backward: returns (d_value, d_locations, d_weights) with the
    same shapes/dtypes as the jnp core's VJP. ``g`` is (B, Q, nH*hd).

    With ``query_levels`` (see :func:`ms_deform_attn_encoder_pallas`),
    ``g``/``locations``/``weights`` cover only the listed query levels;
    ``d_value`` still spans every value level (the one-hot-routed query
    levels' contribution to d_value flows through XLA autodiff outside
    this kernel and is summed by the caller's cotangent plumbing).
    """
    b, sumhw, nh, hd = value.shape
    nl = len(spatial_shapes)
    p = weights.shape[-1]
    c = nh * hd
    lane = min(c, 128)
    splits = [h * w for h, w in spatial_shapes]
    offs = np.cumsum([0] + splits)
    qlv = list(query_levels) if query_levels is not None else list(range(nl))
    qsplits = [splits[i] for i in qlv]
    qoffs = np.cumsum([0] + qsplits)
    vdtype = value.dtype

    # value levels, W-padded + chunked (as in the forward)
    levels = []
    for j, (h, w) in enumerate(spatial_shapes):
        full = value[:, offs[j]:offs[j + 1]].reshape(b, h, w, c)
        wp = _round_up(w, 8)
        if wp > w:
            full = jnp.pad(full, ((0, 0), (0, 0), (0, wp - w), (0, 0)))
        levels.append([full[..., k * lane:(k + 1) * lane]
                       for k in range(c // lane)])
    # cotangent levels (per QUERY level), W-padded (zeros) + chunked; bf16
    # matmul operand when the value is bf16 (same precision as the forward)
    g_levels = []
    for qi, i in enumerate(qlv):
        h, w = spatial_shapes[i]
        gi = g[:, qoffs[qi]:qoffs[qi + 1]].reshape(b, h, w, c).astype(vdtype)
        wp = _round_up(w, 8)
        if wp > w:
            gi = jnp.pad(gi, ((0, 0), (0, 0), (0, wp - w), (0, 0)))
        g_levels.append([gi[..., k * lane:(k + 1) * lane]
                         for k in range(c // lane)])

    d_loc_parts, d_aw_parts = [], []
    for qi, i in enumerate(qlv):
        h, w = spatial_shapes[i]
        loc_i = locations[:, qoffs[qi]:qoffs[qi + 1]].astype(jnp.float32) \
            .reshape(b, h, w, nh * nl * p * 2)
        aw_i = weights[:, qoffs[qi]:qoffs[qi + 1]].astype(jnp.float32) \
            .reshape(b, h, w, nh * nl * p)
        g_i = g[:, qoffs[qi]:qoffs[qi + 1]].astype(jnp.float32) \
            .reshape(b, h, w, c)
        dloc, daw = _encoder_level_bwd_lw_pallas(
            levels, loc_i, aw_i, g_i, (h, w), spatial_shapes, nh, hd, p,
            halo, interpret)
        d_loc_parts.append(dloc.reshape(b, splits[i], nh, nl, p, 2))
        d_aw_parts.append(daw.reshape(b, splits[i], nh, nl, p))
    d_locations = jnp.concatenate(d_loc_parts, axis=1)
    d_weights = jnp.concatenate(d_aw_parts, axis=1)

    assert nh * p * 3 <= 128, (
        "bwd_v packs loc+aw into one 128-lane DMA buffer; "
        f"nh*p*(2+1)={nh * p * 3} lanes do not fit")

    def _lvl_slices(qi, j):
        h, w = spatial_shapes[qlv[qi]]
        loc_ij = locations[:, qoffs[qi]:qoffs[qi + 1]] \
            .reshape(b, h, w, nh, nl, p, 2)[:, :, :, :, j] \
            .reshape(b, h, w, nh * p * 2).astype(jnp.float32)
        aw_ij = weights[:, qoffs[qi]:qoffs[qi + 1]] \
            .reshape(b, h, w, nh, nl, p)[:, :, :, :, j] \
            .reshape(b, h, w, nh * p).astype(jnp.float32)
        return loc_ij, aw_ij

    d_val_parts = []
    for j, (hj, wj) in enumerate(spatial_shapes):
        wjp = _round_up(wj, 8)
        if hj * wjp * c * 4 <= DENSE_BWD_V_LIMIT_BYTES:
            # coarse level: dense full-level reduction over query tiles
            acc = jnp.zeros((b, hj, wjp, c), jnp.float32)
            for qi, i in enumerate(qlv):
                h, w = spatial_shapes[i]
                loc_ij, aw_ij = _lvl_slices(qi, j)
                g_i = g[:, qoffs[qi]:qoffs[qi + 1]].reshape(b, h, w, c) \
                    .astype(vdtype)
                tile = (min(TILE_H, h), min(TILE_W, w))
                dv = _encoder_bwd_v_dense_pallas(
                    g_i, loc_ij, aw_ij, (h, w), (hj, wj), nh, hd, p,
                    tile, interpret)
                acc = acc + dv
            d_val_parts.append(
                acc[:, :, :wj].reshape(b, splits[j], nh, hd))
            continue
        # fine level: windowed value-centric kernel (sane geometry there)
        meta_by_q = []
        for qi, i in enumerate(qlv):
            h, w = spatial_shapes[i]
            wp = _round_up(w, 8)
            # level-j lane slice: (..., nh, nl, p, 2) -> (..., nh, p, 2);
            # loc and aw packed into one 128-lane buffer (Mosaic HBM DMA
            # slices must be whole (1,128) lane tiles — see kernel doc)
            loc_ij, aw_ij = _lvl_slices(qi, j)
            meta_ij = jnp.concatenate(
                [loc_ij, aw_ij,
                 jnp.zeros(loc_ij.shape[:3] + (128 - nh * p * 3,),
                           jnp.float32)], axis=-1)
            if wp > w:
                meta_ij = jnp.pad(
                    meta_ij, ((0, 0), (0, 0), (0, wp - w), (0, 0)))
            meta_by_q.append(meta_ij)
        dv = _encoder_level_bwd_v_pallas(
            g_levels, meta_by_q, (hj, wj),
            [spatial_shapes[i] for i in qlv],
            nh, hd, p, halo, interpret)
        d_val_parts.append(dv.reshape(b, splits[j], nh, hd))
    d_value = jnp.concatenate(d_val_parts, axis=1).astype(value.dtype)

    return d_value, d_locations.astype(locations.dtype), \
        d_weights.astype(weights.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _encoder_pallas_diff(value, spatial_shapes, query_levels, locations,
                         weights):
    """Pallas forward with a blocked Pallas backward (both no-gather)."""
    return ms_deform_attn_encoder_pallas(value, spatial_shapes, locations,
                                         weights,
                                         query_levels=query_levels)


def _encoder_pallas_fwd(value, spatial_shapes, query_levels, locations,
                        weights):
    out = ms_deform_attn_encoder_pallas(value, spatial_shapes, locations,
                                        weights,
                                        query_levels=query_levels)
    return out, (value, locations, weights)


def _encoder_pallas_bwd(spatial_shapes, query_levels, res, g):
    value, locations, weights = res
    return ms_deform_attn_encoder_bwd_pallas(value, spatial_shapes,
                                             locations, weights, g,
                                             query_levels=query_levels)


_encoder_pallas_diff.defvjp(_encoder_pallas_fwd, _encoder_pallas_bwd)


# Grid-query levels with at most this many tokens are routed to the dense
# one-hot XLA core instead of the Pallas kernel. Each Pallas-handled query
# level instantiates its own Mosaic kernels (fwd + bwd_lw + a bwd_v
# contribution per value level); the 4-scale train step's aggregate Mosaic
# compile memory OOM-killed the remote compile helper, and its 4th level
# (the /64 "dowsample1" extra — 13x13 = 169 tokens at 800 px) carries ~1%
# of the queries. Routing such levels through the one-hot core (exact for
# arbitrary offsets, differentiable through XLA) brings the kernel count
# back to the 3-scale module that compiles, at negligible FLOPs: the
# (Q_coarse, sum HW) selection matrices stay tiny when Q_coarse <= QMAX.
#
# Default 0 (= all grid-query levels on Pallas): with QMAX=256 the 4-scale
# INFERENCE forward — hybrid subset Pallas kernels + the coarse one-hot
# core co-resident in one program — reproducibly crashed the v5e worker
# ("TPU worker process crashed... kernel fault"), while the SAME shapes
# pass standalone in both the all-Pallas form (bench_msdeform --levels 4),
# the hybrid form jitted alone (fine+coarse, coarse-first level order),
# and the full model in all-Pallas form. The fault needs the hybrid AND
# the surrounding model graph; it is a Mosaic/XLA co-residency bug we
# cannot introspect through the tunneled compile helper. The 169-token
# /64 level costs Pallas ~nothing at inference; for TRAIN compile size
# the nn.scan'd encoder (one trace) is the fix, with this knob kept as an
# env escape hatch (VIST_MSDEFORM_ONEHOT_QMAX=256 restores the hybrid).
ONEHOT_QMAX = int(_os.environ.get("VIST_MSDEFORM_ONEHOT_QMAX", "0"))
# The hybrid path deterministically kills the TPU worker inside the full
# model (one-command repro: docs/PERF.md "hybrid dispatch crash" —
# VIST_MSDEFORM_ONEHOT_QMAX=256 python bench.py --model maskdino
# --backbone r50 --encoder deformable --iters 2). Keep it available as a
# diagnostic, but refuse to run unless explicitly double-opted-in
# (VERDICT r4 #7).
if ONEHOT_QMAX > 0 and _os.environ.get("VIST_ALLOW_HYBRID") != "1":
    raise RuntimeError(
        "VIST_MSDEFORM_ONEHOT_QMAX>0 enables the hybrid Pallas+one-hot "
        "dispatch, which reproducibly crashes the TPU worker inside the "
        "full model (see docs/PERF.md 'hybrid dispatch crash' for the "
        "repro). Set VIST_ALLOW_HYBRID=1 as well if you really mean to "
        "run the diagnostic.")


def fused_ms_deform_attn(value: jnp.ndarray,
                         spatial_shapes: Sequence[Tuple[int, int]],
                         locations: jnp.ndarray,
                         weights: jnp.ndarray) -> jnp.ndarray:
    """DeformCoreFn entry point (models/deform_attn.MSDeformAttn.core_fn).

    Dispatch: grid-aligned encoder queries -> blocked Pallas kernel on TPU
    (differentiable via the blocked Pallas backward), except query LEVELS
    of <= ONEHOT_QMAX tokens, which ride the one-hot XLA core (see
    ONEHOT_QMAX above); free queries (the MaskDINO decoder's ~300-400 box
    queries) -> the dense one-hot XLA core (exact for arbitrary offsets,
    differentiable through XLA, no element-serial gathers); grid queries
    on CPU -> the jnp gather core (the one-hot selection matrix is
    (Q, sum HW) dense — unaffordable at encoder Q == sum HW).
    """
    from vision_instance_seg_tpu.models.deform_attn import (
        ms_deform_attn_core_jnp, ms_deform_attn_core_onehot)

    splits = [h * w for h, w in spatial_shapes]
    sumhw = sum(splits)
    on_tpu = jax.default_backend() == "tpu"
    if locations.shape[1] != sumhw:
        return ms_deform_attn_core_onehot(value, spatial_shapes, locations,
                                          weights)
    if not on_tpu:
        return ms_deform_attn_core_jnp(value, spatial_shapes, locations,
                                       weights)
    shapes = tuple(map(tuple, spatial_shapes))
    fine = tuple(i for i, s in enumerate(splits) if s > ONEHOT_QMAX)
    if len(fine) == len(shapes):
        return _encoder_pallas_diff(value, shapes, None, locations, weights)
    if not fine:
        return ms_deform_attn_core_onehot(value, spatial_shapes, locations,
                                          weights)
    offs = np.cumsum([0] + splits)
    fset = set(fine)
    take = lambda arr, idxs: jnp.concatenate(
        [arr[:, offs[i]:offs[i + 1]] for i in idxs], axis=1)
    coarse = tuple(i for i in range(len(shapes)) if i not in fset)
    out_fine = _encoder_pallas_diff(
        value, shapes, fine, take(locations, fine), take(weights, fine))
    out_coarse = ms_deform_attn_core_onehot(
        value, spatial_shapes, take(locations, coarse),
        take(weights, coarse))
    # reassemble in level order
    foffs = np.cumsum([0] + [splits[i] for i in fine])
    coffs = np.cumsum([0] + [splits[i] for i in coarse])
    fpos = {i: k for k, i in enumerate(fine)}
    cpos = {i: k for k, i in enumerate(coarse)}
    parts = []
    for i in range(len(shapes)):
        if i in fset:
            k = fpos[i]
            parts.append(out_fine[:, foffs[k]:foffs[k + 1]])
        else:
            k = cpos[i]
            parts.append(out_coarse[:, coffs[k]:coffs[k + 1]])
    return jnp.concatenate(parts, axis=1)


# Halo contract enforcement: MSDeformAttn reads this attribute and clamps
# grid-query sampling offsets to +-DEFAULT_HALO px of the sampled level
# before calling the core, so every sample provably lands inside the
# kernel's halo windows — kernel output is then bit-equal in structure to
# the jnp core ON THE SAME clamped locations, for arbitrary (including
# imported/trained) offset weights. tests/test_msdeform_kernel.py
# quantifies the unclamped beyond-halo deviation and pins the clamped
# equivalence.
fused_ms_deform_attn.offset_clamp = float(DEFAULT_HALO)
