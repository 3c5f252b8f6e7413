"""Two-stage (coarse -> fine) correlative matching for wide windows.

The loop-closure correlative detector searches a +-2.5 m x +-0.5 rad window
(launcher_settings_default.json:102-126) — too many candidates to brute
force at full resolution. The reference prunes with a windowed-max coarse
map and refines winning blocks sequentially
(scan_matcher_real_time_correlative.cpp:88-116); the TPU redesign keeps the
same two levels but evaluates each level as one batched gather:

 1. score every (theta, coarse-block) candidate on the windowed-max map
    (valid upper bounds of the fine scores inside the block);
 2. take the top-M blocks and score all fine candidates inside them;
    the argmax over refined candidates is the answer.

This matches the reference result whenever the winning fine candidate's
block is among the top-M coarse blocks — with M in the hundreds this covers
everything the reference's running-max prune would visit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from my_lidar_graph_slam_tpu.ops import grid as gridops
from my_lidar_graph_slam_tpu.ops import matchers, pyramid as pyrops
from my_lidar_graph_slam_tpu.ops import scoring
from my_lidar_graph_slam_tpu.utils import se2


def coarse_map_for(builder, lm, low_resolution: int):
    """Windowed-max coarse map for a local map, cached on the LocalMap.

    Mirrors the single-coarse-map precompute of
    loop_detector_real_time_correlative.cpp:51-63.
    """
    cache = getattr(lm, "_coarse_cache", None)
    if cache is None or cache[0] != low_resolution:
        coarse = pyrops.windowed_max(gridops.values(lm.grid), low_resolution)
        lm._coarse_cache = (low_resolution, coarse)
        cache = lm._coarse_cache
    return cache[1]


def _two_stage_one(coarse_map, fine_map, grid, initial_pose,
                   ranges, angles, valid,
                   scan_min_range, scan_max_range, rel_sensor_pose,
                   scan_range_max, range_theta,
                   usable_range_min, usable_range_max,
                   normalized_score_threshold,
                   n_total,
                   low_resolution: int,
                   win_x: int, win_y: int, win_theta_max: int,
                   refine_blocks: int,
                   cost_type: str,
                   greedy_params: tuple):
    """Single-query two-stage match; ``n_total`` traced so the batched
    wrapper can vmap over the query axis."""

    sensor_pose = se2.compound(initial_pose, rel_sensor_pose)
    max_range = jnp.minimum(
        jnp.max(jnp.where(valid, ranges, -jnp.inf)), scan_range_max)
    step_xy = grid.resolution
    step_t = matchers.search_step_theta(grid.resolution, max_range)
    win_theta_act = jnp.ceil(0.5 * range_theta / step_t).astype(jnp.int32)

    proj_mask = valid & (ranges < scan_range_max)

    t_idx = jnp.arange(-win_theta_max, win_theta_max + 1)
    theta_mask = jnp.abs(t_idx) <= win_theta_act
    cand_poses = jnp.stack([
        jnp.broadcast_to(sensor_pose[0], t_idx.shape),
        jnp.broadcast_to(sensor_pose[1], t_idx.shape),
        sensor_pose[2] + t_idx.astype(jnp.float32) * step_t], axis=-1)
    ix, iy = scoring.hit_cells(grid, cand_poses, ranges, angles)  # [NT, NB]

    # Stage 1: strided coarse lattice. Offsets step by low_resolution
    # (scan_matcher_real_time_correlative.cpp:98-99).
    offs_x = jnp.arange(-win_x, win_x + 1, low_resolution)
    offs_y = jnp.arange(-win_y, win_y + 1, low_resolution)
    nxc = offs_x.shape[0]
    nyc = offs_y.shape[0]
    wgt = proj_mask.astype(fine_map.dtype)

    def coarse_scores_for_theta(args):
        ixt, iyt = args                                  # [NB]
        gx = ixt[:, None, None] + offs_x[None, :, None]  # [NB, nxc, 1]
        gy = iyt[:, None, None] + offs_y[None, None, :]  # [NB, 1, nyc]
        vals = gridops.lookup(coarse_map, gx, gy)        # [NB, nxc, nyc]
        return (vals * wgt[:, None, None]).sum(axis=0)   # [nxc, nyc]

    coarse_scores = jax.lax.map(coarse_scores_for_theta, (ix, iy),
                                batch_size=8)            # [NT, nxc, nyc]
    coarse_scores = jnp.where(
        theta_mask[:, None, None], coarse_scores, -jnp.inf)

    # Stage 2: refine the top-M blocks on the fine map.
    flat = coarse_scores.reshape(-1)
    m = refine_blocks
    # m+1 values: the (m+1)-th largest coarse bound is the tightest upper
    # bound on everything left UNREFINED — the exactness certificate.
    top_scores_p1, top_idx_p1 = jax.lax.top_k(flat, m + 1)
    top_scores = top_scores_p1[:m]
    top_idx = top_idx_p1[:m]
    unrefined_ub = top_scores_p1[m]
    bt = top_idx // (nxc * nyc)
    bx = offs_x[(top_idx // nyc) % nxc]
    by = offs_y[top_idx % nyc]
    block_alive = jnp.isfinite(top_scores)

    fine_dx = jnp.arange(low_resolution)
    fine_dy = jnp.arange(low_resolution)

    def refine_block(args):
        t, x0, y0, alive = args
        ixt = ix[t]                                       # [NB]
        iyt = iy[t]
        gx = ixt[:, None, None] + x0 + fine_dx[None, :, None]
        gy = iyt[:, None, None] + y0 + fine_dy[None, None, :]
        vals = gridops.lookup(fine_map, gx, gy)
        s = (vals * wgt[:, None, None]).sum(axis=0)       # [LR, LR]
        return jnp.where(alive, s, -jnp.inf)

    fine_scores = jax.lax.map(
        refine_block, (bt, bx, by, block_alive), batch_size=64)  # [M, LR, LR]

    score_threshold = normalized_score_threshold * n_total
    flat_fine = fine_scores.reshape(-1)
    best = jnp.argmax(flat_fine)
    score_max = flat_fine[best]
    bi = best // (low_resolution * low_resolution)
    bdx = (best // low_resolution) % low_resolution
    bdy = best % low_resolution
    best_t = bt[bi]
    best_x = bx[bi] + bdx
    best_y = by[bi] + bdy

    pose_found = score_max > score_threshold
    best_sensor_pose = jnp.stack([
        sensor_pose[0] + best_x.astype(jnp.float32) * step_xy,
        sensor_pose[1] + best_y.astype(jnp.float32) * step_xy,
        sensor_pose[2] + t_idx[best_t].astype(jnp.float32) * step_t,
    ])

    min_r = jnp.maximum(usable_range_min, scan_min_range)
    max_r = jnp.minimum(usable_range_max, scan_max_range)
    cost_mask = (valid & (ranges > min_r) & (ranges < max_r)).astype(
        fine_map.dtype)
    c, cov = matchers._cost_and_covariance(
        cost_type, fine_map, grid, best_sensor_pose, ranges, angles,
        cost_mask, greedy_params)

    # Exactness certificate (same contract as
    # matchers.correlative_match_pruned_batch): the refined argmax equals
    # the full-window argmax iff every unrefined block's coarse upper
    # bound is STRICTLY below the best refined score (a tie could precede
    # it in the reference's scan order). -inf means nothing was left out.
    exact = ((score_max > unrefined_ub) | ~jnp.isfinite(unrefined_ub)) & \
        jnp.isfinite(score_max)

    estimated_pose = se2.move_backward(best_sensor_pose, rel_sensor_pose)
    return matchers.MatchSummary(
        pose_found=pose_found,
        normalized_cost=c / n_total,
        normalized_score=score_max / n_total,
        initial_pose=initial_pose,
        estimated_pose=estimated_pose,
        covariance=cov,
    ), exact


@functools.partial(
    jax.jit,
    static_argnames=("low_resolution", "win_x", "win_y", "win_theta_max",
                     "refine_blocks", "cost_type", "num_total_beams",
                     "greedy_params"))
def _two_stage_core(coarse_map, fine_map, grid, initial_pose,
                    ranges, angles, valid,
                    scan_min_range, scan_max_range, rel_sensor_pose,
                    scan_range_max, range_theta,
                    usable_range_min, usable_range_max,
                    normalized_score_threshold,
                    low_resolution: int,
                    win_x: int, win_y: int, win_theta_max: int,
                    refine_blocks: int,
                    cost_type: str = "greedy_endpoint",
                    num_total_beams: int = 0,
                    greedy_params: tuple = ()):
    n_total = jnp.asarray(num_total_beams or ranges.shape[-1], jnp.float32)
    return _two_stage_one(
        coarse_map, fine_map, grid, initial_pose, ranges, angles, valid,
        scan_min_range, scan_max_range, rel_sensor_pose, scan_range_max,
        range_theta, usable_range_min, usable_range_max,
        normalized_score_threshold, n_total, low_resolution,
        win_x, win_y, win_theta_max, refine_blocks, cost_type,
        greedy_params)


@functools.partial(
    jax.jit,
    static_argnames=("low_resolution", "win_x", "win_y", "win_theta_max",
                     "refine_blocks", "cost_type", "greedy_params"))
def _two_stage_core_batch(coarse_map, fine_map, grid, initial_poses,
                          ranges, angles, valid,
                          scan_min_range, scan_max_range, rel_sensor_poses,
                          scan_range_max, range_theta,
                          usable_range_min, usable_range_max,
                          normalized_score_threshold,
                          num_total_beams,
                          low_resolution: int,
                          win_x: int, win_y: int, win_theta_max: int,
                          refine_blocks: int,
                          cost_type: str = "greedy_endpoint",
                          greedy_params: tuple = ()):
    """Q two-stage matches against one map in ONE dispatch (vmap over the
    query axis) — used by the correlative loop detector, whose per-node
    loop cost a ~37 ms round trip per node. ``num_total_beams``: f32[Q].
    Returns (MatchSummary[Q, ...], exact bool[Q])."""
    return jax.vmap(
        lambda p, r, a, v, mn, mx, rel, n: _two_stage_one(
            coarse_map, fine_map, grid, p, r, a, v, mn, mx, rel,
            scan_range_max, range_theta, usable_range_min,
            usable_range_max, normalized_score_threshold, n,
            low_resolution, win_x, win_y, win_theta_max, refine_blocks,
            cost_type, greedy_params))(
        initial_poses, ranges, angles, valid, scan_min_range,
        scan_max_range, rel_sensor_poses,
        jnp.asarray(num_total_beams, jnp.float32))


def two_stage_match_batch(coarse_map, fine_map, grid, initial_poses, *,
                          low_resolution, range_x, range_y, range_theta,
                          scan_range_max, usable_range_min,
                          usable_range_max, score_threshold, refine_blocks,
                          num_total_beams, greedy_params, scan_store,
                          scan_ids, max_escalations: int = 2):
    """Batched host wrapper with certificate escalation.

    All Q nodes run in one dispatch; when any query's exactness
    certificate fails, the WHOLE batch re-runs at 4x the refine budget
    (still one dispatch — recompiles are bounded by max_escalations
    distinct budgets). Returns ``(MatchSummary[Q, ...], exact bool[Q])``.
    """
    res = float(grid.resolution)
    win_x = int(np.ceil(0.5 * range_x / res))
    win_y = int(np.ceil(0.5 * range_y / res))
    win_t = matchers.static_max_theta_window(res, scan_range_max,
                                             range_theta)
    nxc = len(range(-win_x, win_x + 1, low_resolution))
    nyc = len(range(-win_y, win_y + 1, low_resolution))
    n_blocks = (2 * win_t + 1) * nxc * nyc

    ids = np.asarray(scan_ids)
    args = (jnp.asarray(np.asarray(initial_poses), jnp.float32),
            jnp.asarray(scan_store.ranges[ids]),
            jnp.asarray(scan_store.angles[ids]),
            jnp.asarray(scan_store.valid[ids]),
            jnp.asarray(scan_store.min_range[ids]),
            jnp.asarray(scan_store.max_range[ids]),
            jnp.asarray(scan_store.rel_sensor_pose[ids]),
            jnp.asarray(scan_range_max, jnp.float32),
            jnp.asarray(range_theta, jnp.float32),
            jnp.asarray(usable_range_min, jnp.float32),
            jnp.asarray(usable_range_max, jnp.float32),
            jnp.asarray(score_threshold, jnp.float32),
            jnp.asarray(np.maximum(scan_store.raw_beams[ids], 1),
                        jnp.float32))

    m = refine_blocks
    for _ in range(max_escalations + 1):
        summary, exact = _two_stage_core_batch(
            coarse_map, fine_map, grid, *args,
            low_resolution=low_resolution,
            win_x=win_x, win_y=win_y, win_theta_max=win_t,
            refine_blocks=min(m, n_blocks - 1),
            greedy_params=greedy_params)
        exact_np = np.asarray(exact)
        if exact_np.all() or m >= n_blocks - 1:
            return summary, np.asarray(exact_np | (m >= n_blocks - 1))
        m = m * 4
    return summary, np.asarray(exact)


def two_stage_match(coarse_map, fine_map, grid, initial_pose, *,
                    low_resolution, range_x, range_y, range_theta,
                    scan_range_max, usable_range_min, usable_range_max,
                    score_threshold, refine_blocks, num_total_beams,
                    greedy_params, scan_store, scan_id,
                    max_escalations: int = 2):
    """Host wrapper: static window sizing + scan tensor plumbing.

    The refined result carries an exactness certificate; when it fails
    (the winning block was not among the top-M coarse blocks), the match
    re-runs with 4x the refine budget, up to ``max_escalations`` times —
    so the returned summary always equals the full-window argmax unless
    the escalation budget is exhausted (returns the best found plus
    ``exact=False``). Returns ``(MatchSummary, exact: bool)``.
    """
    res = float(grid.resolution)
    win_x = int(np.ceil(0.5 * range_x / res))
    win_y = int(np.ceil(0.5 * range_y / res))
    win_t = matchers.static_max_theta_window(res, scan_range_max,
                                             range_theta)
    # The coarse lattice has a finite candidate count; clamp the budget.
    nxc = len(range(-win_x, win_x + 1, low_resolution))
    nyc = len(range(-win_y, win_y + 1, low_resolution))
    n_blocks = (2 * win_t + 1) * nxc * nyc

    m = refine_blocks
    for _ in range(max_escalations + 1):
        summary, exact = _two_stage_core(
            coarse_map, fine_map, grid,
            jnp.asarray(initial_pose, jnp.float32),
            jnp.asarray(scan_store.ranges[scan_id]),
            jnp.asarray(scan_store.angles[scan_id]),
            jnp.asarray(scan_store.valid[scan_id]),
            jnp.asarray(scan_store.min_range[scan_id]),
            jnp.asarray(scan_store.max_range[scan_id]),
            jnp.asarray(scan_store.rel_sensor_pose[scan_id]),
            jnp.asarray(scan_range_max, jnp.float32),
            jnp.asarray(range_theta, jnp.float32),
            jnp.asarray(usable_range_min, jnp.float32),
            jnp.asarray(usable_range_max, jnp.float32),
            jnp.asarray(score_threshold, jnp.float32),
            low_resolution=low_resolution,
            win_x=win_x, win_y=win_y, win_theta_max=win_t,
            refine_blocks=min(m, n_blocks - 1),
            num_total_beams=num_total_beams,
            greedy_params=greedy_params)
        if bool(exact) or m >= n_blocks - 1:
            return summary, bool(exact) or m >= n_blocks - 1
        m = m * 4
    return summary, False
