"""Exact pruned correlative matching — the fast frontend hot kernel.

TPU redesign of ScanMatcherRealTimeCorrelative::OptimizePose
(scan_matcher_real_time_correlative.cpp:50-145). The reference prunes the
(theta, dx, dy) sweep with a windowed-max coarse map and a running score
maximum. The TPU formulation below exploits two measured v5e facts:

 * The gather unit is THROUGHPUT-bound on spatial locality, not index
   count: random single-element lookups cost ~7-12 cycles each, but
   clusters of nearby elements (a beam's 5x5 window, a beam's cost kernel)
   stream at ~0.2-0.3 cycles/element through one flat ``jnp.take`` with
   row-major clustered indices. Every map read below is therefore lowered
   to flat takes with per-beam clustered index blocks — never
   ``vmap(dynamic_slice)`` (~8 cycles/index standalone, ~150 for big
   slices, and 100x worse inside loop bodies).
 * Work must still shrink: scoring all NT thetas costs NT x NB x WXY
   elements. Thetas are tiled into groups of ``group`` consecutive steps;
   one lookup per (group, beam) into a centered windowed-max map (radius
   ``win + group // 2``) upper-bounds every (theta-in-group, dx, dy)
   candidate score, because one theta step displaces a beam endpoint by at
   most one cell (chord equation,
   scan_matcher_real_time_correlative.cpp:156-175). Only the top
   ``keep_groups`` groups are scored finely.

The kernel reports a per-query ``exact`` flag: true iff every unrefined
group's bound is <= max(best fine score, score threshold) — the same
exactness argument as the reference's running-max prune. Callers fall back
to the brute-force matcher for inexact queries, so the combined result
ALWAYS equals brute force up to score ties.

The cost/covariance tail evaluates the reference's central-difference
scheme (cost_function_greedy_endpoint.cpp:114-171) with all 7 pose
evaluations' kernel lookups batched into one clustered flat take.

All per-map state (padded fine map, windowed-max bound map) lives in a
:class:`CorrelativeContext` computed once per map and shared by every match
against it (the reference equivalently caches precomputed coarse maps,
loop_detector_real_time_correlative.cpp:51-63).

:func:`correlative_match_many` scores a whole batch of queries against one
map in ONE device dispatch — the deployment shape of both the frontend
(pipelined keyframes) and the loop-closure candidate fan-out — which also
amortizes the ~0.7 ms per-dispatch host overhead.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from my_lidar_graph_slam_tpu.ops import grid as gridops
from my_lidar_graph_slam_tpu.ops import matchers
from my_lidar_graph_slam_tpu.ops import pyramid as pyrops
from my_lidar_graph_slam_tpu.utils import se2


class CorrelativeContext(NamedTuple):
    """Per-map precomputed search state (shared across queries)."""

    padded: jnp.ndarray    # fine map zero-padded by pad on all sides
    maxmap: jnp.ndarray    # centered windowed max, radius win + group // 2
    value_map: jnp.ndarray  # original fine map


# Padding of ``ctx.padded`` on each side, in units of max(win_x, win_y):
# 2x the window radius for fine-window reads plus slack for the cost
# kernel's perturbed poses is folded into one static pad factor below.
_COST_PAD = 32  # cells; covers the cost tail's perturbed-pose excursions


def _centered_max(value_map, radius: int):
    """M with M[c + radius] = max(value_map[c - radius .. c + radius]).

    Built from a low-side pad of 2*radius and a forward window of
    2*radius + 1 (:func:`pyramid.windowed_max` zero-pads the high side),
    so out-of-range reads are 0 exactly when the whole centered window
    misses the map.
    """
    shifted = jnp.pad(value_map, ((2 * radius, 0), (2 * radius, 0)))
    return pyrops.windowed_max(shifted, 2 * radius + 1)


@functools.partial(jax.jit,
                   static_argnames=("win_x", "win_y", "group"))
def make_context(value_map, win_x: int, win_y: int,
                 group: int = 5) -> CorrelativeContext:
    """Build the per-map search context."""
    win = max(win_x, win_y)
    pad = 2 * win + _COST_PAD
    padded = jnp.pad(value_map, ((pad, pad), (pad, pad)))
    return CorrelativeContext(
        padded=padded,
        maxmap=_centered_max(value_map, win + group // 2),
        value_map=value_map)


def _hit_cells(grid, x, y, theta, ranges, angles):
    """Hit cells for per-query theta candidates.

    ``x``/``y``: f32[Q]; ``theta``: f32[Q, N]; ``ranges``/``angles``:
    f32[Q, NB]. Returns int32 (ix, iy) of shape [Q, N, NB].
    """
    wa = theta[..., None] + angles[:, None, :]
    hx = x[:, None, None] + ranges[:, None, :] * jnp.cos(wa)
    hy = y[:, None, None] + ranges[:, None, :] * jnp.sin(wa)
    ox = grid.origin[0]
    oy = grid.origin[1]
    ix = jnp.floor((hx - ox) / grid.resolution).astype(jnp.int32)
    iy = jnp.floor((hy - oy) / grid.resolution).astype(jnp.int32)
    return ix, iy


def _take_padded(padded, pad: int, w: int, h: int, iy, ix):
    """Flat clustered take of map cells by RAW map indices.

    ``padded`` is the map zero-padded by ``pad`` on all sides; indices
    within [-pad, dim + pad) read through it (0 outside the map); indices
    beyond that are clamped into the outer zero ring, still reading 0.
    """
    hp = h + 2 * pad
    wp = w + 2 * pad
    y = jnp.clip(iy + pad, 0, hp - 1)
    x = jnp.clip(ix + pad, 0, wp - 1)
    return jnp.take(padded.reshape(-1), y * wp + x)


@functools.partial(
    jax.jit,
    static_argnames=("win_x", "win_y", "win_theta_max", "group",
                     "keep_groups", "cost_type", "num_total_beams",
                     "greedy_params"))
def correlative_match_many(ctx: CorrelativeContext,
                           grid: gridops.GridMap,
                           initial_poses,
                           ranges, angles, valid,
                           scan_min_range, scan_max_range,
                           rel_sensor_poses,
                           scan_range_max,
                           range_theta,
                           usable_range_min, usable_range_max,
                           normalized_score_threshold,
                           win_x: int, win_y: int, win_theta_max: int,
                           group: int = 5,
                           keep_groups: int = 8,
                           cost_type: str = "greedy_endpoint",
                           num_total_beams: int = 0,
                           greedy_params: tuple = ()):
    """Batch of Q pruned correlative matches against one map, one dispatch.

    ``initial_poses``/``rel_sensor_poses``: f32[Q, 3]; ``ranges``/``angles``:
    f32[Q, NB]; ``valid``: bool[Q, NB]; ``scan_min_range``/``scan_max_range``:
    f32[Q]. ``group`` must be odd. Returns :class:`PrunedBatchResult`.
    """
    assert group % 2 == 1
    q, nb = ranges.shape
    n_total = num_total_beams or nb
    h, w = ctx.value_map.shape
    win = max(win_x, win_y)
    pad = 2 * win + _COST_PAD
    radius = win + group // 2

    sensor_poses = jax.vmap(se2.compound)(initial_poses, rel_sensor_poses)
    sx_, sy_, st_ = (sensor_poses[:, 0], sensor_poses[:, 1],
                     sensor_poses[:, 2])

    max_range = jnp.minimum(
        jnp.max(jnp.where(valid, ranges, -jnp.inf), axis=-1),
        scan_range_max)                                        # [Q]
    step_xy = grid.resolution
    step_t = matchers.search_step_theta(grid.resolution, max_range)  # [Q]
    win_theta_act = jnp.ceil(0.5 * range_theta / step_t).astype(jnp.int32)

    proj_mask = valid & (ranges < scan_range_max)
    wgt = proj_mask.astype(ctx.value_map.dtype)                # [Q, NB]

    nt = 2 * win_theta_max + 1
    ng = -(-nt // group)
    half = group // 2
    neg_inf = jnp.asarray(-jnp.inf, jnp.float32)

    def theta_of(t_idx):
        return st_[:, None] + t_idx.astype(jnp.float32) * step_t[:, None]

    # ---- Bound level: theta groups ------------------------------------
    t_start = jnp.arange(ng) * group - win_theta_max           # [NG]
    t_c = jnp.broadcast_to(t_start + half, (q, ng))
    ixc, iyc = _hit_cells(grid, sx_, sy_, theta_of(t_c), ranges, angles)
    mh, mw = ctx.maxmap.shape
    ok = (ixc + radius >= 0) & (ixc + radius < mw) & \
         (iyc + radius >= 0) & (iyc + radius < mh)
    bix = jnp.clip(ixc + radius, 0, mw - 1)
    biy = jnp.clip(iyc + radius, 0, mh - 1)
    bvals = jnp.where(
        ok, jnp.take(ctx.maxmap.reshape(-1), biy * mw + bix), 0.0)
    ub = (bvals * wgt[:, None, :]).sum(axis=-1)                # [Q, NG]
    first = jnp.broadcast_to(t_start, (q, ng))
    live = (first <= win_theta_act[:, None]) & \
           (first + group - 1 >= -win_theta_act[:, None])
    ub = jnp.where(live, ub, neg_inf)

    top_val, top_idx = jax.lax.top_k(ub, keep_groups)          # [Q, K]

    # ---- Fine: full (dx, dy) window for every theta of kept groups ----
    t_f = (jnp.take(t_start, top_idx)[:, :, None] +
           jnp.arange(group)).reshape(q, keep_groups * group)  # [Q, KT]
    ixf, iyf = _hit_cells(grid, sx_, sy_, theta_of(t_f), ranges, angles)

    wyn = 2 * win_y + 1
    wxn = 2 * win_x + 1
    gy = iyf[..., None, None] + jnp.arange(-win_y, win_y + 1)[:, None]
    gx = ixf[..., None, None] + jnp.arange(-win_x, win_x + 1)[None, :]
    cells = _take_padded(ctx.padded, pad, w, h,
                         jnp.broadcast_to(gy, gy.shape[:-1] + (wxn,)),
                         jnp.broadcast_to(gx, gx.shape[:-2] + (wyn, wxn)))
    scores = (cells * wgt[:, None, :, None, None]).sum(axis=2)
    # [Q, KT, WY, WX]

    livef = (jnp.abs(t_f) <= win_theta_act[:, None]) & \
            (t_f <= win_theta_max) & \
            jnp.repeat(jnp.isfinite(top_val), group, axis=-1,
                       total_repeat_length=keep_groups * group)
    scores = jnp.where(livef[:, :, None, None], scores, neg_inf)

    flat = scores.reshape(q, -1)
    best = jnp.argmax(flat, axis=-1)
    best_score = jnp.take_along_axis(flat, best[:, None], -1)[:, 0]
    bt = jnp.take_along_axis(t_f, (best // (wyn * wxn))[:, None], -1)[:, 0]
    bdy = (best // wxn) % wyn - win_y
    bdx = best % wxn - win_x

    score_threshold = normalized_score_threshold * n_total
    floor = jnp.maximum(best_score, score_threshold)

    ub_rest = ub.at[jnp.arange(q)[:, None], top_idx].set(neg_inf)
    exact = jnp.max(ub_rest, axis=-1) <= floor

    pose_found = best_score > score_threshold
    best_sensor_poses = jnp.stack([
        sx_ + bdx.astype(jnp.float32) * step_xy,
        sy_ + bdy.astype(jnp.float32) * step_xy,
        st_ + bt.astype(jnp.float32) * step_t,
    ], axis=-1)                                                # [Q, 3]

    cost_mask = matchers._range_gate(
        valid, ranges, usable_range_min, usable_range_max,
        scan_min_range[:, None], scan_max_range[:, None])
    c, cov = _cost_cov_batch(
        ctx, grid, best_sensor_poses, ranges, angles,
        cost_mask.astype(ctx.value_map.dtype), cost_type, greedy_params)

    estimated_poses = jax.vmap(se2.move_backward)(best_sensor_poses,
                                                  rel_sensor_poses)
    summary = matchers.MatchSummary(
        pose_found=pose_found,
        normalized_cost=c / n_total,
        normalized_score=best_score / n_total,
        initial_pose=initial_poses,
        estimated_pose=estimated_poses,
        covariance=cov,
    )
    return PrunedBatchResult(summary=summary, exact=exact)


class PrunedBatchResult(NamedTuple):
    summary: matchers.MatchSummary  # batched [Q, ...]
    exact: jnp.ndarray              # bool[Q] — result provably == brute force


# ---------------------------------------------------------------------------
# Cost / covariance tail (clustered flat takes)
# ---------------------------------------------------------------------------


def _greedy_cost_all_poses(ctx, grid, poses, ranges, angles, beam_mask,
                           hit_and_missed_dist=0.075,
                           occupancy_threshold=0.1,
                           kernel_size: int = 1,
                           standard_deviation=1.0,
                           scaling_factor=0.05):
    """Greedy-endpoint cost for poses [Q, P, 3] in one clustered take.

    Identical math to :func:`cost.greedy_endpoint_cost`
    (cost_function_greedy_endpoint.cpp:32-110); the hit and missed kernel
    lookups of all P poses x NB beams go through one flat take (a beam's
    cells across poses stay within a ~2 * _COST_PAD cell neighborhood, so
    the take streams at cluster speed). Returns f32[Q, P].
    """
    res = grid.resolution
    variance = standard_deviation * standard_deviation
    k = kernel_size
    h, w = ctx.value_map.shape

    wa = poses[..., 2:3] + angles[:, None, :]                  # [Q, P, NB]
    cos_t = jnp.cos(wa)
    sin_t = jnp.sin(wa)
    hx = poses[..., 0:1] + ranges[:, None, :] * cos_t
    hy = poses[..., 1:2] + ranges[:, None, :] * sin_t
    mx = poses[..., 0:1] + (ranges[:, None, :] - hit_and_missed_dist) * cos_t
    my = poses[..., 1:2] + (ranges[:, None, :] - hit_and_missed_dist) * sin_t

    ox, oy = grid.origin[0], grid.origin[1]

    def cell(px, py):
        return (jnp.floor((px - ox) / res).astype(jnp.int32),
                jnp.floor((py - oy) / res).astype(jnp.int32))

    hix, hiy = cell(hx, hy)
    mix, miy = cell(mx, my)

    offs = jnp.arange(-k, k + 1)
    kx = offs[None, :]
    ky = offs[:, None]                                         # [K, K]

    actual_pad = (ctx.padded.shape[0] - h) // 2

    def kernel_vals(ix, iy):
        gy = iy[..., None, None] + ky
        gx = ix[..., None, None] + kx
        kk = offs.shape[0]
        return _take_padded(
            ctx.padded, actual_pad, w, h,
            jnp.broadcast_to(gy, gy.shape[:-1] + (kk,)),
            jnp.broadcast_to(gx, gx.shape[:-2] + (kk, kk)))    # [...,K,K]

    hit_vals = kernel_vals(hix, hiy)
    miss_vals = kernel_vals(mix, miy)

    known = (hit_vals != gridops.UNKNOWN) & (miss_vals != gridops.UNKNOWN)
    crossing = (hit_vals >= occupancy_threshold) & \
               (miss_vals <= occupancy_threshold)
    usable = known & crossing

    d2 = (kx.astype(jnp.float32) ** 2 + ky.astype(jnp.float32) ** 2) \
        * res * res
    d2_default = 2.0 * ((k + 1) * res) ** 2
    d2 = jnp.where(usable, jnp.broadcast_to(d2, usable.shape), d2_default)
    min_d2 = jnp.min(d2, axis=(-2, -1))                        # [Q, P, NB]

    per_beam = -jnp.exp(-0.5 * min_d2 / variance) * beam_mask[:, None, :]
    return per_beam.sum(axis=-1) * scaling_factor              # [Q, P]


def _cost_cov_batch(ctx, grid, best_poses, ranges, angles, cost_mask,
                    cost_type, greedy_params):
    """Cost at the winner + central-difference covariance, batched [Q]."""
    if cost_type == "square_error":
        from my_lidar_graph_slam_tpu.ops import cost as costops
        c, cov = jax.vmap(
            lambda p_, r_, a_, m_: (
                costops.square_error_cost(
                    ctx.value_map, grid, p_, r_, a_, m_),
                costops.square_error_covariance(
                    ctx.value_map, grid, p_, r_, a_, m_)))(
            best_poses, ranges, angles, cost_mask)
        return c, cov

    gp = dict(greedy_params)
    res = grid.resolution
    diff_ang = 1e-2
    deltas = jnp.asarray([
        [0.0, 0.0, 0.0],
        [res, 0.0, 0.0], [0.0, res, 0.0], [0.0, 0.0, diff_ang],
        [-res, 0.0, 0.0], [0.0, -res, 0.0], [0.0, 0.0, -diff_ang],
    ], jnp.float32)                                            # [7, 3]
    poses = best_poses[:, None, :] + deltas[None, :, :]        # [Q, 7, 3]
    costs = _greedy_cost_all_poses(
        ctx, grid, poses, ranges, angles, cost_mask, **gp)     # [Q, 7]
    steps = jnp.asarray([res, res, diff_ang], jnp.float32)
    grad = 0.5 * (costs[:, 1:4] - costs[:, 4:7]) / steps       # [Q, 3]
    cov = grad[:, :, None] * grad[:, None, :] + 0.01 * jnp.eye(3)
    return costs[:, 0], cov


# ---------------------------------------------------------------------------
# Host wrapper with brute-force fallback
# ---------------------------------------------------------------------------


def match_with_fallback(ctx, grid, brute_value_map, queries, *,
                        scan_range_max, range_theta,
                        usable_range_min, usable_range_max,
                        normalized_score_threshold,
                        win_x, win_y, win_theta_max,
                        num_total_beams, greedy_params,
                        cost_type="greedy_endpoint", **prune_kw):
    """Pruned batch + brute-force rerun of queries whose prune was inexact.

    ``queries``: dict of batched arrays (initial_poses, ranges, angles,
    valid, scan_min_range, scan_max_range, rel_sensor_poses). Returns
    (batched :class:`matchers.MatchSummary`, exact fraction). The result
    equals brute force on every query.
    """
    import numpy as np

    res = correlative_match_many(
        ctx, grid, queries["initial_poses"], queries["ranges"],
        queries["angles"], queries["valid"], queries["scan_min_range"],
        queries["scan_max_range"], queries["rel_sensor_poses"],
        jnp.asarray(scan_range_max, jnp.float32),
        jnp.asarray(range_theta, jnp.float32),
        jnp.asarray(usable_range_min, jnp.float32),
        jnp.asarray(usable_range_max, jnp.float32),
        jnp.asarray(normalized_score_threshold, jnp.float32),
        win_x=win_x, win_y=win_y, win_theta_max=win_theta_max,
        cost_type=cost_type, num_total_beams=num_total_beams,
        greedy_params=greedy_params, **prune_kw)

    exact = np.asarray(res.exact)
    if exact.all():
        return res.summary, 1.0

    summary = jax.tree_util.tree_map(np.asarray, res.summary)
    for i in np.flatnonzero(~exact):
        s = matchers.correlative_match(
            brute_value_map, grid,
            queries["initial_poses"][i], queries["ranges"][i],
            queries["angles"][i], queries["valid"][i],
            queries["scan_min_range"][i], queries["scan_max_range"][i],
            queries["rel_sensor_poses"][i],
            jnp.asarray(scan_range_max, jnp.float32),
            jnp.asarray(range_theta, jnp.float32),
            jnp.asarray(usable_range_min, jnp.float32),
            jnp.asarray(usable_range_max, jnp.float32),
            jnp.asarray(normalized_score_threshold, jnp.float32),
            win_x=win_x, win_y=win_y, win_theta_max=win_theta_max,
            cost_type=cost_type, num_total_beams=num_total_beams,
            greedy_params=greedy_params)
        s = jax.tree_util.tree_map(np.asarray, s)
        summary = jax.tree_util.tree_map(
            lambda full, one, i=i: _set_row(full, i, one), summary, s)
    return matchers.MatchSummary(*summary), float(exact.mean())


def _set_row(full, i, one):
    out = full.copy()
    out[i] = one
    return out
