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


def _cost_and_covariance(cost_type, value_map, grid, best_sensor_pose,
                         ranges, angles, cost_mask, greedy_params):
    gp = dict(greedy_params)
    if cost_type == "square_error":
        c = costops.square_error_cost(
            value_map, grid, best_sensor_pose, ranges, angles, cost_mask)
        cov = costops.square_error_covariance(
            value_map, grid, best_sensor_pose, ranges, angles, cost_mask)
    else:
        c = costops.greedy_endpoint_cost(
            value_map, grid, best_sensor_pose, ranges, angles, cost_mask,
            **gp)
        cov = costops.greedy_endpoint_covariance(
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
# Exhaustive grid search matcher
# ---------------------------------------------------------------------------


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
    n_total = num_total_beams or nb

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
    pad = cap - n0
    fx = jnp.pad(fx, (0, pad))
    fy = jnp.pad(fy, (0, pad))
    ft = jnp.pad(ft, (0, pad))
    alive = jnp.pad(alive0, (0, pad))

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

    # Python loop over levels: node_height_max is static and small (<= 6).
    for h in range(node_height_max, -1, -1):
        ub = eval_level(pyramid[h], fx, fy, ft, alive)      # upper bounds
        if h > 0:
            lb = eval_level(pyramid[0], fx, fy, ft, alive)  # corner lower bnd
            best_lb = jnp.maximum(
                jnp.max(lb), jnp.asarray(score_threshold, jnp.float32))
            keep = alive & (ub > best_lb) & (ub > score_threshold)
            kquota = cap // 4
            scores_masked = jnp.where(keep, ub, -jnp.inf)
            order = jnp.argsort(-scores_masked)[:kquota]
            sel_ok = jnp.take(keep, order)
            sx = jnp.take(fx, order)
            sy = jnp.take(fy, order)
            st = jnp.take(ft, order)
            w = 1 << (h - 1)
            child_dx = jnp.asarray([0, w, 0, w], jnp.int32)
            child_dy = jnp.asarray([0, 0, w, w], jnp.int32)
            fx = (sx[:, None] + child_dx[None, :]).reshape(-1)
            fy = (sy[:, None] + child_dy[None, :]).reshape(-1)
            ft = jnp.broadcast_to(st[:, None], (kquota, 4)).reshape(-1)
            alive = jnp.broadcast_to(
                sel_ok[:, None], (kquota, 4)).reshape(-1)
            if 4 * kquota < cap:
                short = cap - 4 * kquota
                fx = jnp.pad(fx, (0, short))
                fy = jnp.pad(fy, (0, short))
                ft = jnp.pad(ft, (0, short))
                alive = jnp.pad(alive, (0, short))
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
    )


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
