"""Scan matchers: five interchangeable strategies as jitted TPU kernels.

Reference parity (scan_matcher.hpp:83-103 strategy interface):

 * :func:`correlative_match`   — ScanMatcherRealTimeCorrelative
   (scan_matcher_real_time_correlative.cpp:50-145). TPU redesign: instead of
   the low-resolution prune + refine loop, ALL (theta, dx, dy) candidates are
   scored in one batched window-gather kernel — brute force over the window
   is cheaper than branching on TPU and finds the identical argmax.
 * :func:`grid_search_match`   — ScanMatcherGridSearch
   (scan_matcher_grid_search.cpp:45-114), the exhaustive oracle.
 * :func:`branch_bound_match`  — ScanMatcherBranchBound
   (scan_matcher_branch_bound.cpp:47-163). TPU redesign: the sequential DFS
   with a running score bound becomes level-synchronous frontier evaluation
   with threshold pruning and top-K retention; per-level lower bounds from
   leaf-resolution scores tighten pruning the way the DFS's running max does.
 * :func:`hill_climbing_match` — ScanMatcherHillClimbing
   (scan_matcher_hill_climbing.cpp:26-109), as a ``lax.while_loop``.
 * :func:`linear_solver_match` — ScanMatcherLinearSolver (Gauss-Newton on
   the bicubic-smoothed map, scan_matcher_linear_solver.cpp:88-148).

All matchers return a :class:`MatchSummary` mirroring ScanMatchingSummary
(scan_matcher.hpp:47-77): estimated pose is the ROBOT pose in the world
frame (``MoveBackward`` of the best sensor pose), covariance is world-frame.

The search-step theta is data dependent (it shrinks as the scan's max range
grows, scan_matcher_real_time_correlative.cpp:156-175), so the theta window
size is data dependent too; kernels take a STATIC upper bound
(``win_theta_max``, from :func:`static_max_theta_window`) and mask
out-of-window candidates, keeping shapes static under jit.

``greedy_params`` is passed as a static tuple of (name, value) pairs so the
kernel-size parameter stays a Python int at trace time.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from my_lidar_graph_slam_tpu.ops import cost as costops
from my_lidar_graph_slam_tpu.ops import grid as gridops
from my_lidar_graph_slam_tpu.ops import scoring
from my_lidar_graph_slam_tpu.utils import se2


class MatchSummary(NamedTuple):
    pose_found: jnp.ndarray       # bool[]
    normalized_cost: jnp.ndarray  # f32[]
    normalized_score: jnp.ndarray  # f32[] best score / total beams
    initial_pose: jnp.ndarray     # f32[3] robot pose
    estimated_pose: jnp.ndarray   # f32[3] robot pose
    covariance: jnp.ndarray       # f32[3, 3] world frame
    # Exactness signal (branch_bound_match only): number of live frontier
    # nodes dropped by the per-level top-k across all levels. The
    # reference DFS is exact (scan_matcher_branch_bound.cpp:81-139); a
    # nonzero count means the batched search MAY have pruned the true
    # optimum and the caller should retry with a larger frontier_cap.
    frontier_overflow: jnp.ndarray = 0  # i32[]


def _cost_and_covariance(cost_type, value_map, grid, best_sensor_pose,
                         ranges, angles, cost_mask, greedy_params):
    gp = dict(greedy_params)
    if cost_type == "square_error":
        c = costops.square_error_cost(
            value_map, grid, best_sensor_pose, ranges, angles, cost_mask)
        cov = costops.square_error_covariance(
            value_map, grid, best_sensor_pose, ranges, angles, cost_mask)
    else:
        # Fused path: one evaluation computes cost + the 7-pose central-
        # difference covariance with deduplicated reads (86 vs 126 map
        # gathers per beam at k=1 — the gather-rate-bound tail of every
        # device match, see greedy_endpoint_cost_and_covariance_fused).
        c, cov = costops.greedy_endpoint_cost_and_covariance_fused(
            value_map, grid, best_sensor_pose, ranges, angles, cost_mask,
            **gp)
    return c, cov


def search_step_theta(resolution, max_range):
    """Angular step from the cosine law: acos(1 - res^2 / (2 r^2))
    (scan_matcher_real_time_correlative.cpp:156-175)."""
    t = resolution / max_range
    return jnp.arccos(1.0 - 0.5 * t * t)


def static_max_theta_window(resolution: float, scan_range_max: float,
                            range_theta: float) -> int:
    """Static upper bound for the theta half-window: the step is smallest
    when the scan's max range equals ``scan_range_max``."""
    t = resolution / scan_range_max
    step = math.acos(1.0 - 0.5 * t * t)
    return int(math.ceil(0.5 * range_theta / step))


def _range_gate(valid, ranges, usable_range_min, usable_range_max,
                scan_min_range, scan_max_range):
    """Combined usable-range/scan-range beam gate
    (score_function_pixel_accurate.cpp:27-41)."""
    min_r = jnp.maximum(usable_range_min, scan_min_range)
    max_r = jnp.minimum(usable_range_max, scan_max_range)
    return valid & (ranges > min_r) & (ranges < max_r)


# ---------------------------------------------------------------------------
# Real-time correlative matcher
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("win_x", "win_y", "win_theta_max", "cost_type",
                     "num_total_beams", "greedy_params"))
def correlative_match(value_map,
                      grid: gridops.GridMap,
                      initial_pose,
                      ranges, angles, valid,
                      scan_min_range, scan_max_range,
                      rel_sensor_pose,
                      scan_range_max,
                      range_theta,
                      usable_range_min, usable_range_max,
                      normalized_score_threshold,
                      win_x: int, win_y: int, win_theta_max: int,
                      cost_type: str = "greedy_endpoint",
                      num_total_beams: int = 0,
                      greedy_params: tuple = ()) -> MatchSummary:
    """Correlative matching over the full (theta, dx, dy) window.

    ``win_x``/``win_y``: static half-window in cells
    (= ceil(0.5 * SearchRangeX / resolution), both steps equal the map
    resolution, scan_matcher_real_time_correlative.cpp:66-74).
    """
    nb = ranges.shape[-1]
    n_total = num_total_beams or nb

    sensor_pose = se2.compound(initial_pose, rel_sensor_pose)

    # Data-dependent search steps; max range over ALL recorded beams clamped
    # by ScanRangeMax (scan_matcher_real_time_correlative.cpp:163-172).
    max_range = jnp.minimum(
        jnp.max(jnp.where(valid, ranges, -jnp.inf)), scan_range_max)
    step_xy = grid.resolution
    step_t = search_step_theta(grid.resolution, max_range)
    win_theta_act = jnp.ceil(0.5 * range_theta / step_t).astype(jnp.int32)

    # Beam gate for projection: only r >= ScanRangeMax is excluded
    # (scan_matcher_real_time_correlative.cpp:189-193).
    proj_mask = valid & (ranges < scan_range_max)

    t_idx = jnp.arange(-win_theta_max, win_theta_max + 1)        # [NT]
    theta_mask = jnp.abs(t_idx) <= win_theta_act
    cand_theta = sensor_pose[2] + t_idx.astype(jnp.float32) * step_t
    cand_poses = jnp.stack([
        jnp.broadcast_to(sensor_pose[0], cand_theta.shape),
        jnp.broadcast_to(sensor_pose[1], cand_theta.shape),
        cand_theta], axis=-1)                                    # [NT, 3]

    ix, iy = scoring.hit_cells(grid, cand_poses, ranges, angles)  # [NT, NB]
    scores = scoring.window_scores(
        value_map, ix, iy,
        jnp.broadcast_to(proj_mask, ix.shape).astype(value_map.dtype),
        win_x, win_y)                                            # [NT, WX, WY]
    scores = jnp.where(theta_mask[:, None, None], scores, -jnp.inf)

    score_threshold = normalized_score_threshold * n_total
    flat = scores.reshape(-1)
    best = jnp.argmax(flat)
    score_max = flat[best]
    nt, wx, wy = scores.shape
    bt = best // (wx * wy)
    bx = (best // wy) % wx - win_x
    by = best % wy - win_y

    pose_found = score_max > score_threshold
    best_sensor_pose = jnp.stack([
        sensor_pose[0] + bx.astype(jnp.float32) * step_xy,
        sensor_pose[1] + by.astype(jnp.float32) * step_xy,
        sensor_pose[2] + t_idx[bt].astype(jnp.float32) * step_t,
    ])

    cost_mask = _range_gate(valid, ranges, usable_range_min,
                            usable_range_max, scan_min_range, scan_max_range)
    c, cov = _cost_and_covariance(
        cost_type, value_map, grid, best_sensor_pose, ranges, angles,
        cost_mask.astype(value_map.dtype), greedy_params)

    estimated_pose = se2.move_backward(best_sensor_pose, rel_sensor_pose)
    return MatchSummary(
        pose_found=pose_found,
        normalized_cost=c / n_total,
        normalized_score=score_max / n_total,
        initial_pose=initial_pose,
        estimated_pose=estimated_pose,
        covariance=cov,
    )


# ---------------------------------------------------------------------------
# Batched correlative matcher (one dispatch for Q queries)
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("win_x", "win_y", "win_theta_max", "theta_chunk",
                     "cost_type", "greedy_params"))
def correlative_match_batch(value_map,
                            grid: gridops.GridMap,
                            initial_poses,
                            ranges, angles, valid,
                            scan_min_range, scan_max_range,
                            rel_sensor_poses,
                            scan_range_max,
                            range_theta,
                            usable_range_min, usable_range_max,
                            normalized_score_threshold,
                            num_total_beams,
                            win_x: int, win_y: int, win_theta_max: int,
                            theta_chunk: int = 16,
                            cost_type: str = "greedy_endpoint",
                            greedy_params: tuple = ()) -> MatchSummary:
    """Q correlative matches against one map in ONE device dispatch.

    Identical math and argmax tie-breaking to :func:`correlative_match`
    (scan_matcher_real_time_correlative.cpp:50-145) applied per query —
    exact by construction, no pruning, no fallback. The win over per-query
    dispatch is architectural: one program amortizes the per-dispatch host
    overhead and keeps the device busy end to end, and the (theta, beam)
    window reads go through one big batched patch gather per theta chunk
    (the TPU gather unit is throughput-bound on the *number of dispatched
    gather ops*, not on index count).

    ``initial_poses``/``rel_sensor_poses``: f32[Q, 3]; ``ranges``/``angles``:
    f32[Q, NB]; ``valid``: bool[Q, NB]; ``scan_min_range``/``scan_max_range``
    /``num_total_beams``: f32[Q]. The theta sweep is evaluated in
    ``theta_chunk``-sized chunks under ``lax.scan`` so peak memory stays
    ~Q * theta_chunk * NB * window floats. Returns a batched
    :class:`MatchSummary` (leading axis Q).
    """
    q, nb = ranges.shape
    n_total = jnp.asarray(num_total_beams, jnp.float32)

    sensor_poses = jax.vmap(se2.compound)(initial_poses, rel_sensor_poses)
    sx_ = sensor_poses[:, 0]
    sy_ = sensor_poses[:, 1]
    st_ = sensor_poses[:, 2]

    max_range = jnp.minimum(
        jnp.max(jnp.where(valid, ranges, -jnp.inf), axis=-1),
        scan_range_max)                                          # [Q]
    step_xy = grid.resolution
    step_t = search_step_theta(grid.resolution, max_range)       # [Q]
    win_theta_act = jnp.ceil(0.5 * range_theta / step_t).astype(jnp.int32)

    proj_mask = valid & (ranges < scan_range_max)
    wgt = proj_mask.astype(value_map.dtype)                      # [Q, NB]

    h, w = value_map.shape
    wxn = 2 * win_x + 1
    wyn = 2 * win_y + 1
    ncand = wxn * wyn

    nt = 2 * win_theta_max + 1
    nchunks = -(-nt // theta_chunk)
    ntp = nchunks * theta_chunk
    t_all = (jnp.arange(ntp) - win_theta_max).reshape(
        nchunks, theta_chunk)                                    # [NC, TC]

    def chunk_scores(t_idx):
        """Scores [Q, TC, WX, WY] for one chunk of theta lattice indices.

        Window reads go through scoring.window_scores' flat-take scheme
        (one scalar take per window cell — the fast TPU gather path).
        """
        theta = st_[:, None] + \
            t_idx[None, :].astype(jnp.float32) * step_t[:, None]
        wa = theta[..., None] + angles[:, None, :]               # [Q,TC,NB]
        hx = sx_[:, None, None] + ranges[:, None, :] * jnp.cos(wa)
        hy = sy_[:, None, None] + ranges[:, None, :] * jnp.sin(wa)
        ix = jnp.floor(
            (hx - grid.origin[0]) / grid.resolution).astype(jnp.int32)
        iy = jnp.floor(
            (hy - grid.origin[1]) / grid.resolution).astype(jnp.int32)
        scores = scoring.window_scores(
            value_map, ix, iy,
            jnp.broadcast_to(wgt[:, None, :], ix.shape).astype(
                value_map.dtype),
            win_x, win_y)                                        # [Q,TC,WX,WY]
        live = (jnp.abs(t_idx)[None, :] <= win_theta_act[:, None]) & \
               (t_idx <= win_theta_max)[None, :]
        return jnp.where(live[:, :, None, None], scores, -jnp.inf)

    def body(carry, t_idx):
        best_s, best_r, base = carry
        sc = chunk_scores(t_idx).reshape(q, -1)
        loc = jnp.argmax(sc, axis=-1).astype(jnp.int32)
        val = jnp.take_along_axis(sc, loc[:, None], -1)[:, 0]
        # Strict > keeps the EARLIEST maximum in (theta, dx, dy) order,
        # matching jnp.argmax over the full array (and the reference's
        # update-on-strictly-greater loop).
        better = val > best_s
        return (jnp.where(better, val, best_s),
                jnp.where(better, base + loc, best_r),
                base + sc.shape[1]), None

    init = (jnp.full((q,), -jnp.inf, jnp.float32),
            jnp.zeros((q,), jnp.int32),
            jnp.asarray(0, jnp.int32))
    (best_score, best_rank, _), _ = jax.lax.scan(body, init, t_all)

    bt = best_rank // ncand - win_theta_max
    bx = (best_rank // wyn) % wxn - win_x
    by = best_rank % wyn - win_y

    score_threshold = normalized_score_threshold * n_total
    pose_found = best_score > score_threshold
    best_sensor_poses = jnp.stack([
        sx_ + bx.astype(jnp.float32) * step_xy,
        sy_ + by.astype(jnp.float32) * step_xy,
        st_ + bt.astype(jnp.float32) * step_t,
    ], axis=-1)                                                  # [Q, 3]

    cost_mask = _range_gate(
        valid, ranges, usable_range_min, usable_range_max,
        scan_min_range[:, None], scan_max_range[:, None])

    c, cov = jax.vmap(
        lambda p_, r_, a_, m_: _cost_and_covariance(
            cost_type, value_map, grid, p_, r_, a_, m_, greedy_params))(
        best_sensor_poses, ranges, angles,
        cost_mask.astype(value_map.dtype))

    estimated_poses = jax.vmap(se2.move_backward)(best_sensor_poses,
                                                  rel_sensor_poses)
    return MatchSummary(
        pose_found=pose_found,
        normalized_cost=c / n_total,
        normalized_score=best_score / n_total,
        initial_pose=initial_poses,
        estimated_pose=estimated_poses,
        covariance=cov,
        frontier_overflow=jnp.zeros((q,), jnp.int32),
    )


# ---------------------------------------------------------------------------
# Pruned correlative matcher (Olson bound-and-refine, flat-take kernels)
# ---------------------------------------------------------------------------


def _take2d(flat, pad, wp, hp, iy, ix, level_offset=0):
    """Flat take of padded-map cells by RAW map indices (clamped).

    ``flat`` is a zero-padded map (or stack of maps) flattened; indices
    that fall outside the padded frame clamp into the zero ring and read 0,
    which matches the Unknown-sentinel semantics exactly.
    """
    y = jnp.clip(iy + pad, 0, hp - 1)
    x = jnp.clip(ix + pad, 0, wp - 1)
    return jnp.take(flat, level_offset + y * wp + x)


@functools.partial(jax.jit, static_argnames=("win_x", "win_y", "halos"))
def make_bound_stack(value_map, win_x: int, win_y: int,
                     halos: tuple = (0, 1, 2, 3, 4, 5)):
    """Stack of centered windowed-max bound maps, one per theta halo.

    ``stack[l][c] = max over |d| <= (win + halos[l]) of value_map[c + d]``
    (separable two-pass max). Level 0 (halo 0) bounds a single theta's
    full (dx, dy) window — the reference's low-resolution coarse map
    (scan_matcher_real_time_correlative.cpp:88-116); higher levels
    additionally absorb the endpoint drift of a whole theta GROUP (one
    theta step moves a beam endpoint by at most one cell, chord equation
    :156-175, so a group of half-width g*step at range r drifts at most
    ceil(g*step*r/res) + 1 cells).
    """
    win = max(win_x, win_y)

    def wmax(m, radius):
        k = 2 * radius + 1
        m = jax.lax.reduce_window(m, 0.0, jax.lax.max, (1, k), (1, 1),
                                  "SAME")
        return jax.lax.reduce_window(m, 0.0, jax.lax.max, (k, 1), (1, 1),
                                     "SAME")

    return jnp.stack([wmax(value_map, win + h) for h in halos])


@functools.partial(
    jax.jit,
    static_argnames=("win_x", "win_y", "win_theta_max", "group",
                     "top_groups", "top_thetas", "cost_type",
                     "greedy_params"))
def correlative_match_pruned_batch(value_map,
                                   bound_stack,
                                   grid: gridops.GridMap,
                                   initial_poses,
                                   ranges, angles, valid,
                                   scan_min_range, scan_max_range,
                                   rel_sensor_poses,
                                   scan_range_max,
                                   range_theta,
                                   usable_range_min, usable_range_max,
                                   normalized_score_threshold,
                                   num_total_beams,
                                   win_x: int, win_y: int,
                                   win_theta_max: int,
                                   group: int = 7,
                                   top_groups: int = 8,
                                   top_thetas: int = 16,
                                   cost_type: str = "greedy_endpoint",
                                   greedy_params: tuple = ()):
    """Q pruned correlative matches in one dispatch, with exactness flag.

    TPU redesign of the reference's coarse-to-fine prune
    (scan_matcher_real_time_correlative.cpp:50-145), shaped by the
    measured v5e reality that EVERY map access costs one ~10 ns scalar
    gather regardless of clustering — so the design minimizes the TOTAL
    NUMBER of map reads, not FLOPs:

      stage 1  one read per (theta GROUP, beam) into a halo-dilated
               windowed-max map (group drift absorbed by the halo level,
               chosen per beam from its range) -> group upper bounds;
      stage 2  one read per (theta, beam) into the halo-0 bound map for
               the ``top_groups`` best groups -> per-theta upper bounds;
      stage 3  exact (2*win+1)^2 window scores (one read per window cell
               per beam) for the ``top_thetas`` best thetas; argmax with
               the reference's (theta, dx, dy) first-max tie order.

    The result for query q is PROVABLY equal to the brute-force argmax iff
    ``exact[q]``: every unexpanded group's and unrefined theta's upper
    bound is strictly below the best exact score (callers re-run inexact
    queries through :func:`correlative_match_batch`).

    Returns ``(MatchSummary with leading axis Q, exact bool[Q])``.
    """
    q, nb = ranges.shape
    n_total = jnp.asarray(num_total_beams, jnp.float32)
    halos = (0, 1, 2, 3, 4, 5)
    n_levels = bound_stack.shape[0]
    # Soundness of the stage-1 upper bound requires the halo stack to cover
    # the worst-case endpoint drift of a theta GROUP: the per-beam level is
    # drift = floor(group//2 * r * step_t / res) + 2 clipped to
    # n_levels - 1, and the chord step gives r * step_t / res <= 1 at max
    # range, so the worst drift is group//2 + 2, which must not exceed the
    # largest halo (len(halos) - 1). A larger `group` silently yields
    # INVALID bounds and a lying `exact` flag — refuse it statically
    # (group=7 -> 3 + 2 = 5 = max halo, the designed operating point).
    assert group // 2 + 2 <= len(halos) - 1, \
        f"group={group} exceeds the halo stack ({len(halos)} levels); " \
        "enlarge make_bound_stack halos or shrink group"
    assert n_levels >= len(halos), \
        "bound_stack was built with fewer halo levels than the matcher " \
        "assumes (make_bound_stack default halos=(0..5))"

    sensor_poses = jax.vmap(se2.compound)(initial_poses, rel_sensor_poses)
    sx_ = sensor_poses[:, 0]
    sy_ = sensor_poses[:, 1]
    st_ = sensor_poses[:, 2]

    max_range = jnp.minimum(
        jnp.max(jnp.where(valid, ranges, -jnp.inf), axis=-1),
        scan_range_max)                                          # [Q]
    res = grid.resolution
    step_t = search_step_theta(res, max_range)                   # [Q]
    win_theta_act = jnp.ceil(0.5 * range_theta / step_t).astype(jnp.int32)

    proj_mask = valid & (ranges < scan_range_max)
    wgt = proj_mask.astype(value_map.dtype)                      # [Q, NB]

    h, w = value_map.shape
    wxn = 2 * win_x + 1
    wyn = 2 * win_y + 1
    ncand = wxn * wyn

    # Padded flats (zero ring -> clamped OOB reads return Unknown 0).
    pad = max(win_x, win_y) + max(halos) + 2
    vp = jnp.pad(value_map, pad)
    bp = jnp.pad(bound_stack, ((0, 0), (pad, pad), (pad, pad)))
    hp = h + 2 * pad
    wp = w + 2 * pad
    v_flat = vp.reshape(-1)
    b_flat = bp.reshape(-1)

    # Angle-addition index math: phi[q, t, b] = (st + a_b) + t * step_t.
    c0 = jnp.cos(st_[:, None] + angles)                          # [Q, NB]
    s0 = jnp.sin(st_[:, None] + angles)
    ox = grid.origin[0]
    oy = grid.origin[1]

    def hit_cells_at(t_idx):
        """(ix, iy) int32[Q, T, NB] for per-query theta lattice indices
        ``t_idx`` int32[Q, T]."""
        dt = t_idx.astype(jnp.float32) * step_t[:, None]         # [Q, T]
        ct = jnp.cos(dt)[:, :, None]
        st2 = jnp.sin(dt)[:, :, None]
        cos_phi = c0[:, None, :] * ct - s0[:, None, :] * st2
        sin_phi = s0[:, None, :] * ct + c0[:, None, :] * st2
        hx = sx_[:, None, None] + ranges[:, None, :] * cos_phi
        hy = sy_[:, None, None] + ranges[:, None, :] * sin_phi
        ix = jnp.floor((hx - ox) / res).astype(jnp.int32)
        iy = jnp.floor((hy - oy) / res).astype(jnp.int32)
        return ix, iy

    neg_inf = jnp.float32(-jnp.inf)

    # ---- Stage 1: theta-group bounds --------------------------------------
    half = group // 2
    ng = -(-(2 * win_theta_max + 1) // group)
    # Small theta windows have fewer groups/thetas than the requested
    # expansion budgets; clamp (static ints, resolved at trace time).
    top_groups = min(top_groups, ng)
    top_thetas = min(top_thetas, top_groups * group)
    g_start = jnp.arange(ng) * group - win_theta_max             # [NG]
    g_center = jnp.broadcast_to(g_start + half, (q, ng))

    # Per-beam halo level: endpoint drift over +-half theta steps.
    drift = jnp.floor(half * ranges * step_t[:, None] / res) + 2.0
    lvl = jnp.clip(drift, 1, n_levels - 1).astype(jnp.int32)     # [Q, NB]
    lvl_off = lvl * (hp * wp)

    ixc, iyc = hit_cells_at(g_center)                            # [Q,NG,NB]
    bvals = _take2d(b_flat, pad, wp, hp, iyc, ixc,
                    level_offset=lvl_off[:, None, :])
    bound_g = (bvals * wgt[:, None, :]).sum(-1)                  # [Q, NG]
    g_live = (g_start[None, :] <= win_theta_act[:, None]) & \
             (g_start[None, :] + group - 1 >= -win_theta_act[:, None])
    bound_g = jnp.where(g_live, bound_g, neg_inf)

    # ---- Stage 2: per-theta bounds inside the best groups -----------------
    top_g_val, top_g = jax.lax.top_k(bound_g, top_groups)        # [Q, TG]
    t2 = (jnp.take(g_start, top_g)[:, :, None] +
          jnp.arange(group)).reshape(q, top_groups * group)      # [Q, TT]
    ix2, iy2 = hit_cells_at(t2)
    b0 = _take2d(b_flat, pad, wp, hp, iy2, ix2)                  # level 0
    bound_t = (b0 * wgt[:, None, :]).sum(-1)                     # [Q, TT]
    t_live = (jnp.abs(t2) <= win_theta_act[:, None]) & \
             (t2 <= win_theta_max) & (t2 >= -win_theta_max) & \
             jnp.repeat(jnp.isfinite(top_g_val), group, axis=-1,
                        total_repeat_length=top_groups * group)
    bound_t = jnp.where(t_live, bound_t, neg_inf)

    # ---- Stage 3: exact windows for the best thetas ------------------------
    top_t_val, top_t_idx = jax.lax.top_k(bound_t, top_thetas)    # [Q, K]
    t3 = jnp.take_along_axis(t2, top_t_idx, axis=-1)             # [Q, K]
    t3_live = jnp.take_along_axis(t_live, top_t_idx, axis=-1)
    ix3, iy3 = hit_cells_at(t3)                                  # [Q,K,NB]

    dy = jnp.arange(-win_y, win_y + 1)
    dx = jnp.arange(-win_x, win_x + 1)
    gy = iy3[..., None, None] + dy[:, None]                      # [Q,K,NB,wy,1]
    gx = ix3[..., None, None] + dx[None, :]                      # [Q,K,NB,1,wx]
    cells = _take2d(v_flat, pad, wp, hp, gy, gx)                 # [Q,K,NB,wy,wx]
    scores = jnp.einsum("qkbyx,qb->qkyx", cells, wgt)            # [Q,K,wy,wx]
    scores = jnp.where(t3_live[:, :, None, None], scores, neg_inf)

    # Argmax with the reference's first-max-in-(theta, dx, dy) tie order:
    # candidate rank = t3 * ncand + dx_i * wyn + dy_i, smallest rank wins
    # among equal scores (scan_matcher_real_time_correlative.cpp:98-118).
    sc_flat = jnp.swapaxes(scores, -1, -2).reshape(q, -1)        # [Q,K*wx*wy]
    rank_t = (t3 + win_theta_max)[:, :, None] * ncand + \
        jnp.arange(ncand)[None, None, :]                         # [Q,K,ncand]
    rank = rank_t.reshape(q, -1)
    best_score = jnp.max(sc_flat, axis=-1)                       # [Q]
    is_best = sc_flat == best_score[:, None]
    best_rank = jnp.min(jnp.where(is_best, rank, jnp.int32(2 ** 30)),
                        axis=-1)
    bt = best_rank // ncand - win_theta_max
    bxi = (best_rank % ncand) // wyn
    byi = best_rank % wyn

    # ---- Exactness certificate ---------------------------------------------
    # Strict inequality: an unexplored candidate tied with the best could
    # precede it in the reference's tie order.
    ub_g_rest = bound_g.at[jnp.arange(q)[:, None], top_g].set(neg_inf)
    ub_t_rest = bound_t.at[
        jnp.arange(q)[:, None], top_t_idx].set(neg_inf)
    exact = (jnp.max(ub_g_rest, axis=-1) < best_score) & \
            (jnp.max(ub_t_rest, axis=-1) < best_score) & \
            jnp.isfinite(best_score)

    # ---- Summary ------------------------------------------------------------
    score_threshold = normalized_score_threshold * n_total
    pose_found = best_score > score_threshold
    best_sensor_poses = jnp.stack([
        sx_ + (bxi - win_x).astype(jnp.float32) * res,
        sy_ + (byi - win_y).astype(jnp.float32) * res,
        st_ + bt.astype(jnp.float32) * step_t,
    ], axis=-1)                                                  # [Q, 3]

    cost_mask = _range_gate(
        valid, ranges, usable_range_min, usable_range_max,
        scan_min_range[:, None], scan_max_range[:, None])
    c, cov = jax.vmap(
        lambda p_, r_, a_, m_: _cost_and_covariance(
            cost_type, value_map, grid, p_, r_, a_, m_, greedy_params))(
        best_sensor_poses, ranges, angles,
        cost_mask.astype(value_map.dtype))

    estimated_poses = jax.vmap(se2.move_backward)(best_sensor_poses,
                                                  rel_sensor_poses)
    summary = MatchSummary(
        pose_found=pose_found,
        normalized_cost=c / n_total,
        normalized_score=best_score / n_total,
        initial_pose=initial_poses,
        estimated_pose=estimated_poses,
        covariance=cov,
        frontier_overflow=jnp.zeros((q,), jnp.int32),
    )
    return summary, exact


# ---------------------------------------------------------------------------
# Exhaustive grid search matcher
# ---------------------------------------------------------------------------


def _grid_search_core(value_map,
                      grid: gridops.GridMap,
                      initial_pose,
                      ranges, angles, valid,
                      scan_min_range, scan_max_range,
                      rel_sensor_pose,
                      usable_range_min, usable_range_max,
                      normalized_score_threshold,
                      step_x, step_y, step_t,
                      n_total,
                      nx: int, ny: int, nt: int,
                      cost_type: str,
                      greedy_params: tuple) -> MatchSummary:
    """Single-query exhaustive lattice search; ``n_total`` traced so the
    batched wrapper can vmap over it."""
    sensor_pose = se2.compound(initial_pose, rel_sensor_pose)
    score_mask = _range_gate(valid, ranges, usable_range_min,
                             usable_range_max, scan_min_range, scan_max_range)

    dy = (jnp.arange(ny) - ny // 2).astype(jnp.float32) * step_y
    dx = (jnp.arange(nx) - nx // 2).astype(jnp.float32) * step_x
    dt = (jnp.arange(nt) - nt // 2).astype(jnp.float32) * step_t

    cand = jnp.stack([
        jnp.broadcast_to(sensor_pose[0] + dx[None, :, None], (ny, nx, nt)),
        jnp.broadcast_to(sensor_pose[1] + dy[:, None, None], (ny, nx, nt)),
        jnp.broadcast_to(sensor_pose[2] + dt[None, None, :], (ny, nx, nt)),
    ], axis=-1)

    summary = scoring.score_poses(
        value_map, grid, cand, ranges, angles, score_mask, n_total)
    flat = summary.score.reshape(-1)
    best = jnp.argmax(flat)
    score_max = flat[best]
    best_pose = cand.reshape(-1, 3)[best]

    score_threshold = normalized_score_threshold * n_total
    pose_found = score_max > score_threshold

    c, cov = _cost_and_covariance(
        cost_type, value_map, grid, best_pose, ranges, angles,
        score_mask.astype(value_map.dtype), greedy_params)

    estimated_pose = se2.move_backward(best_pose, rel_sensor_pose)
    return MatchSummary(
        pose_found=pose_found,
        normalized_cost=c / n_total,
        normalized_score=score_max / n_total,
        initial_pose=initial_pose,
        estimated_pose=estimated_pose,
        covariance=cov,
    )


@functools.partial(
    jax.jit,
    static_argnames=("nx", "ny", "nt", "cost_type", "num_total_beams",
                     "greedy_params"))
def grid_search_match(value_map,
                      grid: gridops.GridMap,
                      initial_pose,
                      ranges, angles, valid,
                      scan_min_range, scan_max_range,
                      rel_sensor_pose,
                      usable_range_min, usable_range_max,
                      normalized_score_threshold,
                      step_x, step_y, step_t,
                      nx: int, ny: int, nt: int,
                      cost_type: str = "greedy_endpoint",
                      num_total_beams: int = 0,
                      greedy_params: tuple = ()) -> MatchSummary:
    """Exhaustive search over a (dy, dx, dt) lattice
    (scan_matcher_grid_search.cpp:45-114).

    ``nx``/``ny``/``nt``: static counts per axis; offsets are
    ``(i - n // 2) * step``. Candidate ordering matches the reference loops
    (dy outer, dx middle, dt inner) so argmax tie-breaking agrees.
    """
    nb = ranges.shape[-1]
    n_total = jnp.asarray(num_total_beams or nb, jnp.float32)
    return _grid_search_core(
        value_map, grid, initial_pose, ranges, angles, valid,
        scan_min_range, scan_max_range, rel_sensor_pose,
        usable_range_min, usable_range_max, normalized_score_threshold,
        step_x, step_y, step_t, n_total, nx, ny, nt,
        cost_type, greedy_params)


@functools.partial(
    jax.jit,
    static_argnames=("nx", "ny", "nt", "cost_type", "greedy_params"))
def grid_search_match_batch(value_map,
                            grid: gridops.GridMap,
                            initial_poses,
                            ranges, angles, valid,
                            scan_min_range, scan_max_range,
                            rel_sensor_poses,
                            usable_range_min, usable_range_max,
                            normalized_score_threshold,
                            step_x, step_y, step_t,
                            num_total_beams,
                            nx: int, ny: int, nt: int,
                            cost_type: str = "greedy_endpoint",
                            greedy_params: tuple = ()) -> MatchSummary:
    """Q exhaustive lattice searches against one map in ONE dispatch.

    vmap of :func:`_grid_search_core` over the query axis — used by the
    grid-search loop detector, whose per-node loop cost a ~37 ms device
    round trip per node (loop_detector_grid_search.cpp:62-89 shape).
    ``num_total_beams``: f32[Q].
    """
    return jax.vmap(
        lambda p, r, a, v, mn, mx, rel, n: _grid_search_core(
            value_map, grid, p, r, a, v, mn, mx, rel,
            usable_range_min, usable_range_max,
            normalized_score_threshold, step_x, step_y, step_t, n,
            nx, ny, nt, cost_type, greedy_params))(
        initial_poses, ranges, angles, valid, scan_min_range,
        scan_max_range, rel_sensor_poses,
        jnp.asarray(num_total_beams, jnp.float32))


# ---------------------------------------------------------------------------
# Branch-and-bound matcher
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("node_height_max", "win_x", "win_y", "win_theta_max",
                     "frontier_cap", "cost_type", "num_total_beams",
                     "greedy_params"))
def branch_bound_match(pyramid,
                       grid: gridops.GridMap,
                       initial_pose,
                       ranges, angles, valid,
                       scan_min_range, scan_max_range,
                       rel_sensor_pose,
                       scan_range_max,
                       range_theta,
                       usable_range_min, usable_range_max,
                       normalized_score_threshold,
                       node_height_max: int,
                       win_x: int, win_y: int, win_theta_max: int,
                       frontier_cap: int = 4096,
                       cost_type: str = "greedy_endpoint",
                       num_total_beams: int = 0,
                       greedy_params: tuple = ()) -> MatchSummary:
    """Level-synchronous branch-and-bound over the map pyramid.

    ``pyramid``: f32[node_height_max + 1, H, W] from
    :func:`my_lidar_graph_slam_tpu.ops.pyramid.build_pyramid` — level h at a
    cell bounds the max fine score over the 2^h x 2^h block starting there
    (grid_map_builder.cpp:471-536), which makes coarse scores valid upper
    bounds (scan_matcher_branch_bound.cpp:92-139).

    Redesign of the DFS: each level evaluates the whole frontier as one
    batched score, prunes by (a) the score threshold and (b) the best
    leaf-level lower bound seen so far (each node's origin-corner score at
    level 0 is a valid lower bound for that node's subtree max), then keeps
    at most ``frontier_cap // 4`` nodes by upper bound and splits each into
    4 children (scan_matcher_branch_bound.cpp:122-138). Like the reference,
    children are NOT clipped to the search window, so coverage extends to
    the end of the coarse lattice block.
    """
    nb = ranges.shape[-1]
    n_total = num_total_beams or nb

    sensor_pose = se2.compound(initial_pose, rel_sensor_pose)

    max_range = jnp.minimum(
        jnp.max(jnp.where(valid, ranges, -jnp.inf)), scan_range_max)
    step_xy = grid.resolution
    step_t = search_step_theta(grid.resolution, max_range)
    win_theta_act = jnp.ceil(0.5 * range_theta / step_t).astype(jnp.int32)

    score_mask = _range_gate(valid, ranges, usable_range_min,
                             usable_range_max, scan_min_range, scan_max_range)
    score_threshold = normalized_score_threshold * n_total

    # Initial frontier: x/y on the 2^H lattice covering [-win, +win], all
    # thetas within the static bound (scan_matcher_branch_bound.cpp:81-88).
    win_size_max = 1 << node_height_max
    xs0 = jnp.arange(-win_x, win_x + 1, win_size_max)
    ys0 = jnp.arange(-win_y, win_y + 1, win_size_max)
    ts0 = jnp.arange(-win_theta_max, win_theta_max + 1)

    gx, gy, gt = jnp.meshgrid(xs0, ys0, ts0, indexing="ij")
    fx = gx.reshape(-1)
    fy = gy.reshape(-1)
    ft = gt.reshape(-1)
    alive0 = jnp.abs(ft) <= win_theta_act

    n0 = fx.shape[0]
    cap = max(frontier_cap, n0)
    alive = alive0

    def node_poses(xs, ys, ts):
        return jnp.stack([
            sensor_pose[0] + xs.astype(jnp.float32) * step_xy,
            sensor_pose[1] + ys.astype(jnp.float32) * step_xy,
            sensor_pose[2] + ts.astype(jnp.float32) * step_t,
        ], axis=-1)

    def eval_level(level_map, xs, ys, ts, mask):
        poses = node_poses(xs, ys, ts)
        s = scoring.score_poses(
            level_map, grid, poses, ranges, angles, score_mask, n_total)
        return jnp.where(mask, s.score, -jnp.inf)

    best_score = jnp.asarray(score_threshold, jnp.float32)
    best_node = jnp.zeros((3,), jnp.int32)
    found = jnp.asarray(False)
    overflow = jnp.asarray(0, jnp.int32)

    # Python loop over levels: node_height_max is static and small (<= 6).
    # Frontier arrays are sized EXACTLY per level (n0, 4*n0, ... capped at
    # `cap`) — early levels are small, so the map gathers (the dominant
    # cost: one scalar read per (node, beam) per bound, ~10 ns each on
    # v5e) track the true frontier size instead of always paying `cap`.
    for h in range(node_height_max, -1, -1):
        ub = eval_level(pyramid[h], fx, fy, ft, alive)      # upper bounds
        if h > 0:
            lb = eval_level(pyramid[0], fx, fy, ft, alive)  # corner lower bnd
            best_lb = jnp.maximum(
                jnp.max(lb), jnp.asarray(score_threshold, jnp.float32))
            keep = alive & (ub > best_lb) & (ub > score_threshold)
            size = fx.shape[0]
            kquota = min(size, cap // 4)
            keep_count = keep.sum().astype(jnp.int32)
            # Exactness accounting: live nodes beyond the quota are
            # dropped even though their upper bound exceeds the best known
            # lower bound — the reference DFS would have expanded them
            # (scan_matcher_branch_bound.cpp:122-138).
            overflow = overflow + jnp.maximum(keep_count - kquota, 0)
            if kquota == size:
                # Everything fits: split in place, no selection pass.
                sel_ok = keep
                sx, sy, st = fx, fy, ft
            else:
                # Compact the live nodes to the front (O(n) cumsum +
                # scatter). In the exact regime (overflow == 0) this is
                # equivalent to the former top-k-by-upper-bound selection
                # — the quota is not binding, so BOTH keep exactly the
                # live set — while costing far less than a 4096-wide sort
                # (measured: the sort dominated the whole matcher).
                pos = jnp.cumsum(keep.astype(jnp.int32)) - 1
                slot = jnp.where(keep & (pos < kquota), pos, kquota)
                order = jnp.zeros((kquota + 1,), jnp.int32).at[slot].set(
                    jnp.arange(size, dtype=jnp.int32))[:kquota]
                sel_ok = jnp.arange(kquota) < jnp.minimum(keep_count,
                                                          kquota)
                sx = jnp.take(fx, order)
                sy = jnp.take(fy, order)
                st = jnp.take(ft, order)
            w = 1 << (h - 1)
            child_dx = jnp.asarray([0, w, 0, w], jnp.int32)
            child_dy = jnp.asarray([0, 0, w, w], jnp.int32)
            kq = sx.shape[0]
            fx = (sx[:, None] + child_dx[None, :]).reshape(-1)
            fy = (sy[:, None] + child_dy[None, :]).reshape(-1)
            ft = jnp.broadcast_to(st[:, None], (kq, 4)).reshape(-1)
            alive = jnp.broadcast_to(
                sel_ok[:, None], (kq, 4)).reshape(-1)
        else:
            leaf_best = jnp.argmax(ub)
            leaf_score = ub[leaf_best]
            improved = leaf_score > best_score
            best_score = jnp.where(improved, leaf_score, best_score)
            best_node = jnp.where(
                improved,
                jnp.stack([fx[leaf_best], fy[leaf_best], ft[leaf_best]]),
                best_node)
            found = found | improved

    best_sensor_pose = jnp.where(
        found,
        node_poses(best_node[0], best_node[1], best_node[2]),
        sensor_pose)

    c, cov = _cost_and_covariance(
        cost_type, pyramid[0], grid, best_sensor_pose, ranges, angles,
        score_mask.astype(pyramid.dtype), greedy_params)

    estimated_pose = se2.move_backward(best_sensor_pose, rel_sensor_pose)
    return MatchSummary(
        pose_found=found,
        normalized_cost=c / n_total,
        normalized_score=best_score / n_total,
        initial_pose=initial_pose,
        estimated_pose=estimated_pose,
        covariance=cov,
        frontier_overflow=overflow,
    )


@functools.partial(
    jax.jit,
    static_argnames=("node_height_max", "win_x", "win_y", "win_theta_max",
                     "frontier_cap", "cost_type", "greedy_params"))
def branch_bound_match_batch(pyramid,
                             grid: gridops.GridMap,
                             initial_poses,
                             ranges, angles, valid,
                             scan_min_range, scan_max_range,
                             rel_sensor_poses,
                             num_total_beams,
                             scan_range_max,
                             range_theta,
                             usable_range_min, usable_range_max,
                             normalized_score_threshold,
                             node_height_max: int,
                             win_x: int, win_y: int, win_theta_max: int,
                             frontier_cap: int = 4096,
                             cost_type: str = "greedy_endpoint",
                             greedy_params: tuple = ()) -> MatchSummary:
    """K branch-and-bound matches against one pyramid in ONE dispatch.

    Single-device batched form of the loop detector's candidate loop
    (loop_detector_branch_bound.cpp:62-89): the reference matches each
    candidate node sequentially; on TPU one vmapped program matches them
    all, amortizing the per-dispatch host round trip (~37 ms through the
    tunnel) that dominates the sequential path. Results are identical to
    per-node :func:`branch_bound_match` calls.

    ``initial_poses``: f32[K, 3]; scan tensors are [K, NB]; per-node
    scalars (incl. ``num_total_beams``, the reference's normalization
    divisor which varies per scan) are f32[K]. ``num_total_beams`` is
    traced, so the matcher runs un-normalized (n_total=1) with the
    threshold pre-scaled, exactly like
    ``distributed.branch_bound_fanout``.
    """
    def match_one(p, r1, a1, v1, mn1, mx1, rel1, nt1):
        s = branch_bound_match(
            pyramid, grid, p, r1, a1, v1, mn1, mx1, rel1,
            scan_range_max, range_theta, usable_range_min, usable_range_max,
            normalized_score_threshold * nt1,
            node_height_max=node_height_max,
            win_x=win_x, win_y=win_y, win_theta_max=win_theta_max,
            frontier_cap=frontier_cap,
            cost_type=cost_type,
            num_total_beams=1,
            greedy_params=greedy_params)
        return s._replace(
            normalized_cost=s.normalized_cost / nt1,
            normalized_score=s.normalized_score / nt1)

    return jax.vmap(match_one)(
        initial_poses, ranges, angles, valid,
        jnp.asarray(scan_min_range, jnp.float32),
        jnp.asarray(scan_max_range, jnp.float32),
        rel_sensor_poses,
        jnp.asarray(num_total_beams, jnp.float32))


# ---------------------------------------------------------------------------
# Hill climbing matcher
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("max_iterations", "max_refinements", "cost_type",
                     "num_total_beams", "greedy_params"))
def hill_climbing_match(value_map,
                        grid: gridops.GridMap,
                        initial_pose,
                        ranges, angles, valid,
                        scan_min_range, scan_max_range,
                        rel_sensor_pose,
                        usable_range_min, usable_range_max,
                        linear_step=0.1, angular_step=0.1,
                        max_iterations: int = 100,
                        max_refinements: int = 5,
                        cost_type: str = "greedy_endpoint",
                        num_total_beams: int = 0,
                        greedy_params: tuple = ()) -> MatchSummary:
    """Greedy six-direction descent with step halving
    (scan_matcher_hill_climbing.cpp:26-109)."""
    nb = ranges.shape[-1]
    n_total = num_total_beams or nb

    sensor_pose = se2.compound(initial_pose, rel_sensor_pose)
    cost_mask = _range_gate(
        valid, ranges, usable_range_min, usable_range_max,
        scan_min_range, scan_max_range).astype(value_map.dtype)
    gp = dict(greedy_params)

    def cost_fn(poses):
        if cost_type == "square_error":
            return costops.square_error_cost(
                value_map, grid, poses, ranges, angles, cost_mask)
        return costops.greedy_endpoint_cost(
            value_map, grid, poses, ranges, angles, cost_mask, **gp)

    moves = jnp.asarray([
        [1.0, 0.0, 0.0], [-1.0, 0.0, 0.0],
        [0.0, 1.0, 0.0], [0.0, -1.0, 0.0],
        [0.0, 0.0, 1.0], [0.0, 0.0, -1.0],
    ])

    init = dict(
        best_pose=sensor_pose,
        best_cost=cost_fn(sensor_pose),
        lin=jnp.asarray(linear_step, jnp.float32),
        ang=jnp.asarray(angular_step, jnp.float32),
        refinements=jnp.asarray(0, jnp.int32),
        iters=jnp.asarray(0, jnp.int32),
        updated=jnp.asarray(True),
    )

    def cond(s):
        return ((s["updated"]) | (s["refinements"] < max_refinements)) & \
               (s["iters"] < max_iterations)

    def body(s):
        scale = jnp.stack([s["lin"], s["lin"], s["ang"]])
        cand = s["best_pose"][None, :] + moves * scale[None, :]
        costs = cost_fn(cand)
        local_best = jnp.argmin(costs)
        local_cost = costs[local_best]
        improved = local_cost < s["best_cost"]
        return dict(
            best_pose=jnp.where(improved, cand[local_best], s["best_pose"]),
            best_cost=jnp.where(improved, local_cost, s["best_cost"]),
            lin=jnp.where(improved, s["lin"], s["lin"] * 0.5),
            ang=jnp.where(improved, s["ang"], s["ang"] * 0.5),
            refinements=jnp.where(improved, s["refinements"],
                                  s["refinements"] + 1),
            iters=s["iters"] + 1,
            updated=improved,
        )

    final = jax.lax.while_loop(cond, body, init)
    best_sensor_pose = final["best_pose"]

    _, cov = _cost_and_covariance(
        cost_type, value_map, grid, best_sensor_pose, ranges, angles,
        cost_mask, greedy_params)

    estimated_pose = se2.move_backward(best_sensor_pose, rel_sensor_pose)
    return MatchSummary(
        pose_found=jnp.asarray(True),
        normalized_cost=final["best_cost"] / n_total,
        normalized_score=jnp.asarray(0.0, jnp.float32),
        initial_pose=initial_pose,
        estimated_pose=estimated_pose,
        covariance=cov,
    )


# ---------------------------------------------------------------------------
# Gauss-Newton (linear solver) matcher
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("max_iterations", "num_total_beams"))
def linear_solver_match(value_map,
                        grid: gridops.GridMap,
                        initial_pose,
                        ranges, angles, valid,
                        scan_min_range, scan_max_range,
                        rel_sensor_pose,
                        usable_range_min, usable_range_max,
                        translation_regularizer=1e-3,
                        rotation_regularizer=1e-3,
                        convergence_threshold=1e-3,
                        max_iterations: int = 100,
                        num_total_beams: int = 0) -> MatchSummary:
    """Iterative Gauss-Newton on the bicubic-smoothed map
    (scan_matcher_linear_solver.cpp:38-148)."""
    nb = ranges.shape[-1]
    n_total = num_total_beams or nb

    sensor_pose = se2.compound(initial_pose, rel_sensor_pose)
    mask = _range_gate(
        valid, ranges, usable_range_min, usable_range_max,
        scan_min_range, scan_max_range).astype(value_map.dtype)

    def gn_step(pose):
        world_angle = pose[2] + angles
        cos_t = jnp.cos(world_angle)
        sin_t = jnp.sin(world_angle)
        hx = pose[0] + ranges * cos_t
        hy = pose[1] + ranges * sin_t
        pts = jnp.stack([hx, hy], axis=-1)
        fx, fy = gridops.world_to_cell_float(grid, pts)
        sm = costops.smoothed_value(value_map, fx, fy)
        resid = (1.0 - sm) * mask

        g = costops.map_gradient(value_map, grid, pts)        # [NB, 2]
        g_theta = -ranges * sin_t * g[..., 0] + ranges * cos_t * g[..., 1]
        jac = jnp.stack([g[..., 0], g[..., 1], g_theta], axis=-1)
        jac = jac * mask[:, None]

        vec_b = (resid[:, None] * jac).sum(axis=0)
        mat_h = jnp.einsum("ni,nj->ij", jac, jac, precision="highest")
        mat_h = mat_h + jnp.diag(jnp.asarray([
            translation_regularizer, translation_regularizer,
            rotation_regularizer]))
        delta = jnp.linalg.solve(mat_h, vec_b)
        return pose + delta

    def se_cost(pose):
        return costops.square_error_cost(
            value_map, grid, pose, ranges, angles, mask)

    init = dict(
        pose=sensor_pose,
        cost=jnp.asarray(jnp.inf, jnp.float32),
        iters=jnp.asarray(0, jnp.int32),
        done=jnp.asarray(False),
    )

    def cond(s):
        return ~s["done"]

    def body(s):
        pose = gn_step(s["pose"])
        c = se_cost(pose)
        iters = s["iters"] + 1
        done = (iters >= max_iterations) | \
               (jnp.abs(s["cost"] - c) < convergence_threshold)
        return dict(pose=pose, cost=c, iters=iters, done=done)

    final = jax.lax.while_loop(cond, body, init)
    best_sensor_pose = final["pose"]

    cov = costops.square_error_covariance(
        value_map, grid, best_sensor_pose, ranges, angles, mask)
    estimated_pose = se2.move_backward(best_sensor_pose, rel_sensor_pose)
    return MatchSummary(
        pose_found=jnp.asarray(True),
        normalized_cost=final["cost"] / n_total,
        normalized_score=jnp.asarray(0.0, jnp.float32),
        initial_pose=initial_pose,
        estimated_pose=estimated_pose,
        covariance=cov,
    )
