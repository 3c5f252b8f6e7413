"""Correlative matcher on the gather-free Pallas MXU kernel.

``correlative_match_mxu_batch`` is a drop-in alternative to
``matchers.correlative_match_batch`` (the brute-force full-window sweep of
ScanMatcherRealTimeCorrelative, scan_matcher_real_time_correlative.cpp:
50-145): identical candidate lattice, identical (theta, dx, dy) first-max
tie order, identical cost/covariance — but the window scores come from
:func:`ops.pallas.correlate_mxu.window_scores_mxu`, which extracts map
values with one-hot matmuls on the MXU instead of scalar gathers. Measured
on v5e, the scalar-gather path is issue-rate bound at ~100 M map reads/s
(one CPU core's worth — BASELINE.md "device primitive physics"); the MXU
formulation's FLOPs are ~9 MF per (query, theta-chunk, beam) step, which
the 128x128 systolic array sustains at far beyond the gather rate.

Exact by construction (no pruning, no certificate needed): every candidate
in the window is scored, so the argmax equals the brute-force oracle's.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from my_lidar_graph_slam_tpu.ops import grid as gridops
from my_lidar_graph_slam_tpu.ops import matchers
from my_lidar_graph_slam_tpu.ops.pallas import correlate_mxu as cm
from my_lidar_graph_slam_tpu.utils import se2


def make_tiles(value_map) -> cm.MxuTiles:
    """Precompute the overlapped VMEM tile array for one map (once per
    map, like the reference's coarse-map precompute)."""
    return cm.make_mxu_tiles(value_map)


_KW = 3  # kernel window radius used for wide-window block assembly


def supported(win_x: int, win_y: int) -> bool:
    """Any window is supported: windows wider than the kernel's tile
    budget are assembled from 7x7 blocks (see window_scores_mxu_wide)."""
    return cm.theta_chunk_supported(min(win_x, _KW), min(win_y, _KW))


def window_scores_mxu_wide(tiles: cm.MxuTiles, ix, iy, beam_weight,
                           win_x: int, win_y: int,
                           theta_chunk=None,
                           q_chunk: int = 16,
                           interpret: bool = False,
                           mxu_dtype=jnp.float32,
                           map_idx=None,
                           map_tile_rows: int = 0):
    """Full (2*win_x+1) x (2*win_y+1) window scores for ANY window size.

    The Pallas kernel's tile-overlap budget caps its window at 7x7
    offsets; larger windows (e.g. the loop detector's +-2 m = 41 cells)
    are brute-forced as a grid of 7x7 BLOCKS: shifting the base hit cells
    by a constant block offset preserves the per-chunk arc-drift bound,
    so every block is just another kernel run. Cost is linear in window
    area with the kernel's tiny per-step constant (~0.33 us marginal on
    v5e) — this is what replaces branch-and-bound pruning on the TPU,
    where data-dependent control flow costs more than the brute FLOPs.
    """
    if win_x <= _KW and win_y <= _KW:
        return cm.window_scores_mxu(tiles, ix, iy, beam_weight,
                                    win_x, win_y, theta_chunk=theta_chunk,
                                    q_chunk=q_chunk, interpret=interpret,
                                    mxu_dtype=mxu_dtype,
                                    map_idx=map_idx,
                                    map_tile_rows=map_tile_rows)
    kw = 2 * _KW + 1
    wxn = 2 * win_x + 1
    wyn = 2 * win_y + 1
    nbx = -(-wxn // kw)
    nby = -(-wyn // kw)
    q, nt, nb = ix.shape

    # Fold the window blocks into the QUERY axis so the whole wide sweep
    # is a handful of big kernel launches instead of nbx*nby small ones
    # (each launch costs ~8 ms of fixed overhead on v5e — at 36 blocks
    # that fixed cost dominated the sweep).
    offs = [(-win_x + _KW + kw * kx, -win_y + _KW + kw * ky)
            for kx in range(nbx) for ky in range(nby)]
    ixb = jnp.concatenate([ix + cx for cx, _ in offs], axis=0)
    iyb = jnp.concatenate([iy + cy for _, cy in offs], axis=0)
    wb = jnp.tile(beam_weight, (nbx * nby, 1))
    mib = None if map_idx is None else jnp.tile(map_idx, nbx * nby)
    qc = min(max(q_chunk, 1) * nbx * nby, ixb.shape[0], 128)
    s = cm.window_scores_mxu(
        tiles, ixb, iyb, wb, _KW, _KW,
        theta_chunk=theta_chunk, q_chunk=qc,
        interpret=interpret, mxu_dtype=mxu_dtype,
        map_idx=mib, map_tile_rows=map_tile_rows)      # [B*Q, NT, 7, 7]
    s = s.reshape(nbx, nby, q, nt, kw, kw)
    # Assemble: block (kx, ky) holds offsets (cx + d, cy + e).
    s = jnp.transpose(s, (2, 3, 0, 4, 1, 5)).reshape(
        q, nt, nbx * kw, nby * kw)
    return s[..., :wxn, :wyn]


def wide_padding_ratio(q: int, nt: int, nb: int, win_x: int, win_y: int,
                       theta_chunk=None,
                       q_chunk: int = 16) -> float:
    """Fraction of EXTRA kernel work done on padding for a wide-window
    sweep (VERDICT r3 weak #7): the folded (block x query) axis pads to a
    q_chunk multiple and the theta axis to a theta_chunk multiple; padded
    rows/lanes run full grid steps that score nothing. 0.0 = no waste."""
    if win_x <= _KW and win_y <= _KW:
        nq = q
        tc = (cm.auto_theta_chunk(nt, win_x, win_y)
              if theta_chunk is None else theta_chunk)
        qc = min(q_chunk, q)
    else:
        kw = 2 * _KW + 1
        nq = q * (-(-(2 * win_x + 1) // kw)) * (-(-(2 * win_y + 1) // kw))
        tc = (cm.auto_theta_chunk(nt, _KW, _KW)
              if theta_chunk is None else theta_chunk)
        qc = min(max(q_chunk, 1) * (nq // max(q, 1)), nq, 128)
    nch = -(-nt // tc)
    # SMEM clamp replicated from window_scores_mxu.
    qc = max(1, min(qc, 700_000 // (nb * (4 * nch + 4))))
    qp = -(-nq // qc) * qc
    useful = q * nt * nb if win_x <= _KW and win_y <= _KW else nq * nt * nb
    total = qp * (nch * tc) * nb
    return round(total / useful - 1.0, 4)


@functools.partial(
    jax.jit,
    static_argnames=("win_x", "win_y", "win_theta_max", "theta_chunk",
                     "q_chunk", "cost_type", "greedy_params", "interpret",
                     "score_gate", "mxu_dtype", "cost_kernel_ok"))
def correlative_match_mxu_batch(value_map,
                                tiles: cm.MxuTiles,
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
                                theta_chunk=None,
                                q_chunk: int = 16,
                                cost_type: str = "greedy_endpoint",
                                greedy_params: tuple = (),
                                interpret: bool = False,
                                score_gate: str = "correlative",
                                mxu_dtype=jnp.float32,
                                cost_kernel_ok: bool = True
                                ) -> matchers.MatchSummary:
    """Q full-window correlative matches in ONE dispatch, gather-free.

    Arguments mirror :func:`matchers.correlative_match_batch`; ``tiles``
    must be ``make_tiles(gridops.values(grid))`` for the same map
    (precomputed once per map, excluded from steady-state cost like the
    reference's coarse map). ``value_map`` is still needed for the final
    cost/covariance evaluation at the single best pose (a handful of
    gathers — negligible).

    ``score_gate`` selects the beam gate used for SCORING:

    * ``"correlative"`` — only ``r >= scan_range_max`` beams are excluded
      (ScanMatcherRealTimeCorrelative's projection gate,
      scan_matcher_real_time_correlative.cpp:189-193). Use for the
      frontend matcher.
    * ``"pixel_accurate"`` — the usable-range/per-scan-range gate of
      ScorePixelAccurate (score_function_pixel_accurate.cpp:27-41), the
      gate the BB matcher scores with — use when standing in for
      ``branch_bound_match_batch`` (the loop detector). Beams at or
      beyond ``scan_range_max`` are additionally excluded regardless of
      the usable bounds: the theta lattice step guarantees <= 1 cell of
      endpoint drift only up to ``scan_range_max``, so longer beams would
      break the kernel's tile-overlap contract (the reference would score
      them only under a degenerate ``usable_range_max > scan_range_max``
      config).
    """
    return _match_one_map(
        value_map, tiles, grid, initial_poses, ranges, angles, valid,
        scan_min_range, scan_max_range, rel_sensor_poses, scan_range_max,
        range_theta, usable_range_min, usable_range_max,
        normalized_score_threshold, num_total_beams,
        win_x, win_y, win_theta_max, theta_chunk, q_chunk,
        cost_type, greedy_params, interpret, score_gate, mxu_dtype,
        cost_kernel_ok)


def _match_one_map(value_map, tiles, grid, initial_poses, ranges, angles,
                   valid, scan_min_range, scan_max_range, rel_sensor_poses,
                   scan_range_max, range_theta, usable_range_min,
                   usable_range_max, normalized_score_threshold,
                   num_total_beams, win_x, win_y, win_theta_max,
                   theta_chunk, q_chunk, cost_type, greedy_params,
                   interpret, score_gate,
                   mxu_dtype=jnp.float32,
                   cost_kernel_ok: bool = True) -> matchers.MatchSummary:
    q, nb = ranges.shape
    n_total = jnp.asarray(num_total_beams, jnp.float32)

    sensor_poses = jax.vmap(se2.compound)(initial_poses, rel_sensor_poses)
    sx_ = sensor_poses[:, 0]
    sy_ = sensor_poses[:, 1]
    st_ = sensor_poses[:, 2]

    max_range = jnp.minimum(
        jnp.max(jnp.where(valid, ranges, -jnp.inf), axis=-1),
        scan_range_max)                                          # [Q]
    res = grid.resolution
    step_t = matchers.search_step_theta(res, max_range)          # [Q]
    win_theta_act = jnp.ceil(0.5 * range_theta / step_t).astype(jnp.int32)

    if score_gate == "pixel_accurate":
        proj_mask = matchers._range_gate(
            valid, ranges, usable_range_min, usable_range_max,
            scan_min_range[:, None], scan_max_range[:, None]) & \
            (ranges < scan_range_max)
    else:
        proj_mask = valid & (ranges < scan_range_max)
    wgt = proj_mask.astype(jnp.float32)                          # [Q, NB]

    nt = 2 * win_theta_max + 1
    t_idx = jnp.arange(nt) - win_theta_max                       # [NT]

    # Hit cells for the full ORDERED theta lattice (the ordering is what
    # bounds per-chunk endpoint drift to <= 1 cell per step — the chord
    # step moves an endpoint at most one cell,
    # scan_matcher_real_time_correlative.cpp:156-175).
    c0 = jnp.cos(st_[:, None] + angles)                          # [Q, NB]
    s0 = jnp.sin(st_[:, None] + angles)
    dt = t_idx[None, :].astype(jnp.float32) * step_t[:, None]    # [Q, NT]
    ct = jnp.cos(dt)[:, :, None]
    st2 = jnp.sin(dt)[:, :, None]
    cos_phi = c0[:, None, :] * ct - s0[:, None, :] * st2
    sin_phi = s0[:, None, :] * ct + c0[:, None, :] * st2
    hx = sx_[:, None, None] + ranges[:, None, :] * cos_phi
    hy = sy_[:, None, None] + ranges[:, None, :] * sin_phi
    ix = jnp.floor((hx - grid.origin[0]) / res).astype(jnp.int32)
    iy = jnp.floor((hy - grid.origin[1]) / res).astype(jnp.int32)

    scores = window_scores_mxu_wide(
        tiles, ix, iy, wgt, win_x, win_y,
        theta_chunk=theta_chunk, q_chunk=q_chunk,
        interpret=interpret, mxu_dtype=mxu_dtype)     # [Q, NT, WXN, WYN]
    live = jnp.abs(t_idx)[None, :] <= win_theta_act[:, None]
    scores = jnp.where(live[:, :, None, None], scores, -jnp.inf)

    # First maximum in (theta, dx, dy) order == reference loop order
    # (scan_matcher_real_time_correlative.cpp:98-118).
    wxn = 2 * win_x + 1
    wyn = 2 * win_y + 1
    flat = scores.reshape(q, -1)
    best = jnp.argmax(flat, axis=-1)
    best_score = jnp.take_along_axis(flat, best[:, None], -1)[:, 0]
    bt = best // (wxn * wyn) - win_theta_max
    bx = (best // wyn) % wxn - win_x
    by = best % wyn - win_y

    score_threshold = normalized_score_threshold * n_total
    pose_found = best_score > score_threshold
    best_sensor_poses = jnp.stack([
        sx_ + bx.astype(jnp.float32) * res,
        sy_ + by.astype(jnp.float32) * res,
        st_ + bt.astype(jnp.float32) * step_t,
    ], axis=-1)                                                  # [Q, 3]

    cost_mask = matchers._range_gate(
        valid, ranges, usable_range_min, usable_range_max,
        scan_min_range[:, None], scan_max_range[:, None])
    gp = dict(greedy_params)
    if cost_type == "greedy_endpoint" and gp.get("kernel_size", 1) == 1 \
            and cost_kernel_ok:
        # Gather-free cost + covariance on the MXU (the per-match tail
        # was ~180 us/query of scalar gathers even after read dedup —
        # see ops/pallas/greedy_cost_mxu.py). The 32-row cost tiles are
        # built inside this dispatch, like the correlation tiles.
        from my_lidar_graph_slam_tpu.ops.pallas import greedy_cost_mxu
        ctiles = greedy_cost_mxu.make_cost_tiles(value_map)
        c, cov = greedy_cost_mxu.greedy_cost_cov_mxu(
            ctiles, grid.origin, best_sensor_poses, ranges, angles,
            cost_mask.astype(jnp.float32),
            resolution=grid.resolution,
            hit_and_missed_dist=gp.get("hit_and_missed_dist", 0.075),
            occupancy_threshold=gp.get("occupancy_threshold", 0.1),
            standard_deviation=gp.get("standard_deviation", 1.0),
            scaling_factor=gp.get("scaling_factor", 0.05),
            interpret=interpret)
    else:
        c, cov = jax.vmap(
            lambda p_, r_, a_, m_: matchers._cost_and_covariance(
                cost_type, value_map, grid, p_, r_, a_, m_,
                greedy_params))(
            best_sensor_poses, ranges, angles,
            cost_mask.astype(value_map.dtype))

    estimated_poses = jax.vmap(se2.move_backward)(best_sensor_poses,
                                                  rel_sensor_poses)
    return matchers.MatchSummary(
        pose_found=pose_found,
        normalized_cost=c / n_total,
        normalized_score=best_score / n_total,
        initial_pose=initial_poses,
        estimated_pose=estimated_poses,
        covariance=cov,
        frontier_overflow=jnp.zeros((q,), jnp.int32),
    )


@functools.partial(
    jax.jit,
    static_argnames=("win_x", "win_y", "win_theta_max", "theta_chunk",
                     "q_chunk", "cost_type", "greedy_params", "interpret",
                     "score_gate", "mxu_dtype", "cost_kernel_ok"))
def correlative_match_mxu_multi(value_maps,
                                tiles_stack,
                                origins,
                                resolution,
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
                                theta_chunk=None,
                                q_chunk: int = 16,
                                cost_type: str = "greedy_endpoint",
                                greedy_params: tuple = (),
                                interpret: bool = False,
                                score_gate: str = "pixel_accurate",
                                mxu_dtype=jnp.float32,
                                cost_kernel_ok: bool = True
                                ) -> matchers.MatchSummary:
    """M candidate maps x K nodes matched in ONE device dispatch — and,
    on the production path, ONE kernel launch set.

    Multi-candidate loop detection (VERDICT r3 item 7 / r4 weak #5): the
    reference's detector dispatched once per candidate map
    (loop_detector_branch_bound.cpp:38-89). Stacked same-shape local
    maps (``value_maps`` f32[M, H, W], ``tiles_stack``
    f32[M, NTY, NTX, 128, 128] from the per-map caches, ``origins``
    f32[M, 2]; scan arguments [M, K, ...]) run as one jitted program,
    and the (map, node) axes FOLD into the kernels' query axis: the M
    tile arrays concatenate along the tile-row axis and per-query
    ``map_idx`` offsets select each query's own map's tiles (see
    ``correlate_mxu.window_scores_mxu`` map folding) — so M candidates
    cost one correlation + one cost launch set instead of M each.
    Returns a MatchSummary with leading axes [M, K].

    The fold requires the Pallas cost kernel's envelope
    (``cost_kernel_ok`` and kernel_size==1, the launcher default);
    other configs fall back to the per-map-program path.
    """
    m, kq, nb = ranges.shape
    gp = dict(greedy_params)
    folded_ok = (cost_type == "greedy_endpoint"
                 and gp.get("kernel_size", 1) == 1 and cost_kernel_ok)
    if not folded_ok:
        outs = []
        for k in range(m):
            grid = gridops.GridMap(value_maps[k], value_maps[k] > 0.0,
                                   origins[k], resolution)
            outs.append(_match_one_map(
                value_maps[k], cm.MxuTiles(tiles_stack[k]), grid,
                initial_poses[k], ranges[k], angles[k], valid[k],
                scan_min_range[k], scan_max_range[k], rel_sensor_poses[k],
                scan_range_max, range_theta, usable_range_min,
                usable_range_max, normalized_score_threshold,
                num_total_beams[k], win_x, win_y, win_theta_max,
                theta_chunk, q_chunk, cost_type, greedy_params, interpret,
                score_gate, mxu_dtype, cost_kernel_ok))
        return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *outs)

    q = m * kq

    def fold(x):
        return x.reshape((q,) + x.shape[2:])

    ip = fold(initial_poses)
    rg, an, vd = fold(ranges), fold(angles), fold(valid)
    smin, smax = fold(scan_min_range), fold(scan_max_range)
    rel = fold(rel_sensor_poses)
    n_total = fold(jnp.asarray(num_total_beams, jnp.float32))
    org_q = jnp.repeat(origins, kq, axis=0)                  # [Q, 2]
    map_q = jnp.repeat(jnp.arange(m, dtype=jnp.int32), kq)   # [Q]
    res = jnp.asarray(resolution, jnp.float32)

    sensor_poses = jax.vmap(se2.compound)(ip, rel)
    sx_, sy_, st_ = (sensor_poses[:, 0], sensor_poses[:, 1],
                     sensor_poses[:, 2])
    max_range = jnp.minimum(
        jnp.max(jnp.where(vd, rg, -jnp.inf), axis=-1), scan_range_max)
    step_t = matchers.search_step_theta(res, max_range)
    win_theta_act = jnp.ceil(0.5 * range_theta / step_t).astype(jnp.int32)

    if score_gate == "pixel_accurate":
        proj_mask = matchers._range_gate(
            vd, rg, usable_range_min, usable_range_max,
            smin[:, None], smax[:, None]) & (rg < scan_range_max)
    else:
        proj_mask = vd & (rg < scan_range_max)
    wgt = proj_mask.astype(jnp.float32)

    nt = 2 * win_theta_max + 1
    t_idx = jnp.arange(nt) - win_theta_max
    c0 = jnp.cos(st_[:, None] + an)
    s0 = jnp.sin(st_[:, None] + an)
    dt = t_idx[None, :].astype(jnp.float32) * step_t[:, None]
    ct = jnp.cos(dt)[:, :, None]
    st2 = jnp.sin(dt)[:, :, None]
    cos_phi = c0[:, None, :] * ct - s0[:, None, :] * st2
    sin_phi = s0[:, None, :] * ct + c0[:, None, :] * st2
    hx = sx_[:, None, None] + rg[:, None, :] * cos_phi
    hy = sy_[:, None, None] + rg[:, None, :] * sin_phi
    ix = jnp.floor((hx - org_q[:, 0][:, None, None]) / res)
    iy = jnp.floor((hy - org_q[:, 1][:, None, None]) / res)

    tiles_cat = cm.MxuTiles(
        tiles_stack.reshape((-1,) + tiles_stack.shape[2:]))
    scores = window_scores_mxu_wide(
        tiles_cat, ix.astype(jnp.int32), iy.astype(jnp.int32), wgt,
        win_x, win_y, theta_chunk=theta_chunk, q_chunk=q_chunk,
        interpret=interpret, mxu_dtype=mxu_dtype,
        map_idx=map_q, map_tile_rows=tiles_stack.shape[1])
    live = jnp.abs(t_idx)[None, :] <= win_theta_act[:, None]
    scores = jnp.where(live[:, :, None, None], scores, -jnp.inf)

    wxn = 2 * win_x + 1
    wyn = 2 * win_y + 1
    flat = scores.reshape(q, -1)
    best = jnp.argmax(flat, axis=-1)
    best_score = jnp.take_along_axis(flat, best[:, None], -1)[:, 0]
    bt = best // (wxn * wyn) - win_theta_max
    bx = (best // wyn) % wxn - win_x
    by = best % wyn - win_y

    pose_found = best_score > normalized_score_threshold * n_total
    best_sensor_poses = jnp.stack([
        sx_ + bx.astype(jnp.float32) * res,
        sy_ + by.astype(jnp.float32) * res,
        st_ + bt.astype(jnp.float32) * step_t,
    ], axis=-1)

    cost_mask = matchers._range_gate(
        vd, rg, usable_range_min, usable_range_max,
        smin[:, None], smax[:, None])
    from my_lidar_graph_slam_tpu.ops.pallas import greedy_cost_mxu
    h, w = value_maps.shape[1], value_maps.shape[2]
    ctiles_all = jax.vmap(
        lambda v: greedy_cost_mxu._make_cost_tiles(v, h, w))(value_maps)
    ctiles_cat = greedy_cost_mxu.CostTiles(
        ctiles_all.reshape((-1,) + ctiles_all.shape[2:]))
    c, cov = greedy_cost_mxu.greedy_cost_cov_mxu(
        ctiles_cat, org_q, best_sensor_poses, rg, an,
        cost_mask.astype(jnp.float32),
        resolution=res,
        hit_and_missed_dist=gp.get("hit_and_missed_dist", 0.075),
        occupancy_threshold=gp.get("occupancy_threshold", 0.1),
        standard_deviation=gp.get("standard_deviation", 1.0),
        scaling_factor=gp.get("scaling_factor", 0.05),
        interpret=interpret,
        map_idx=map_q, map_tile_rows=ctiles_all.shape[1])

    estimated_poses = jax.vmap(se2.move_backward)(best_sensor_poses, rel)
    summary = matchers.MatchSummary(
        pose_found=pose_found,
        normalized_cost=c / n_total,
        normalized_score=best_score / n_total,
        initial_pose=ip,
        estimated_pose=estimated_poses,
        covariance=cov,
        frontier_overflow=jnp.zeros((q,), jnp.int32),
    )
    return jax.tree_util.tree_map(
        lambda x: x.reshape((m, kq) + x.shape[1:]), summary)
