"""Vectorized ray-cast scatter update of log-odds submaps.

TPU-native replacement for the per-beam Bresenham update loop
(grid_map_builder.cpp:167-186 and util.hpp:257-303): all beams of a scan are
traced simultaneously with a driving-axis DDA whose per-step cells match
Bresenham's (the driving axis advances exactly one cell per step; the
secondary axis is the rounded line midpoint), and all (beam, step) cell
contributions are applied as one masked scatter-add of log-odds increments.

The odds-product update commutes in log space (see ops/grid.py), so the
scatter-add over all beams reproduces the reference's sequential per-cell
updates; cells crossed by several beams receive one contribution per beam,
exactly as in the reference.

Beam filtering matches ``ComputeBoundingBoxAndScanPoints``
(grid_map_builder.cpp:363-379): beams outside ``(min_range, max_range)``
produce neither hit nor miss updates.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from my_lidar_graph_slam_tpu.ops import grid as gridops
from my_lidar_graph_slam_tpu.utils import se2


def trace_cells(grid, sensor_pose, ranges, angles, valid,
                usable_range_min, usable_range_max, max_steps: int):
    """Shared Bresenham-equivalent cell walk for all update policies.

    Returns ``(miss_flat, miss_ok, hit_flat, hit_ok)`` — flattened cell
    indices + in-map masks for the miss cells along each beam and the hit
    cells (grid_map_builder.cpp:145-186, util.hpp:257-303).
    """
    h, w = grid.shape
    use = valid & (ranges > usable_range_min) & (ranges < usable_range_max)

    world_angle = sensor_pose[2] + angles
    hit_x = sensor_pose[0] + ranges * jnp.cos(world_angle)
    hit_y = sensor_pose[1] + ranges * jnp.sin(world_angle)
    hit_pts = jnp.stack([hit_x, hit_y], axis=-1)

    hix, hiy = gridops.world_to_cell(grid, hit_pts)          # [NB]
    six, siy = gridops.world_to_cell(grid, sensor_pose[:2])  # scalars

    # Driving-axis DDA == Bresenham cell walk (util.hpp:257-303). The
    # reference visits max(|dx|,|dy|)+1 cells including the sensor cell and
    # pops the hit cell, leaving n = max(|dx|,|dy|) miss cells.
    dx = hix - six
    dy = hiy - siy
    n_steps = jnp.maximum(jnp.abs(dx), jnp.abs(dy))          # [NB]
    n_safe = jnp.maximum(n_steps, 1)

    steps = jnp.arange(max_steps, dtype=jnp.int32)           # [S]
    frac = steps[None, :].astype(jnp.float32) / n_safe[:, None].astype(
        jnp.float32)                                         # [NB, S]
    miss_ix = six + jnp.round(frac * dx[:, None].astype(jnp.float32)
                              ).astype(jnp.int32)
    miss_iy = siy + jnp.round(frac * dy[:, None].astype(jnp.float32)
                              ).astype(jnp.int32)
    miss_mask = use[:, None] & (steps[None, :] < n_steps[:, None])

    # Flattened masked scatter-add; out-of-bounds cells are dropped.
    def flat_ok(ix, iy, mask):
        ok = mask & (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
        flat = jnp.clip(iy, 0, h - 1) * w + jnp.clip(ix, 0, w - 1)
        return flat.reshape(-1), ok.reshape(-1)

    miss_flat, miss_ok = flat_ok(miss_ix, miss_iy, miss_mask)
    hit_flat, hit_ok = flat_ok(hix, hiy, use)
    return miss_flat, miss_ok, hit_flat, hit_ok


@functools.partial(jax.jit, static_argnames=("max_steps",))
def integrate_scan(grid: gridops.GridMap,
                   sensor_pose,
                   ranges,
                   angles,
                   valid,
                   usable_range_min,
                   usable_range_max,
                   prob_hit=0.6,
                   prob_miss=0.45,
                   max_steps: int = 448) -> gridops.GridMap:
    """Integrate one scan into the map (grid_map_builder.cpp:145-186).

    ``sensor_pose``: f32[3] world sensor pose. ``ranges``/``angles``/``valid``:
    f32[NB]/f32[NB]/bool[NB]. ``usable_range_min/max``: effective range gate,
    already combined with the scan's own limits by the caller
    (``max(UsableRangeMin, scan.min_range)`` etc., grid_map_builder.cpp:357-361).
    ``max_steps``: static cap on Bresenham steps per beam
    (>= usable_range_max / resolution).
    """
    h, w = grid.shape
    miss_flat, miss_ok, hit_flat, hit_ok = trace_cells(
        grid, sensor_pose, ranges, angles, valid,
        usable_range_min, usable_range_max, max_steps)

    lo_miss = gridops.logit(jnp.asarray(prob_miss, jnp.float32))
    lo_hit = gridops.logit(jnp.asarray(prob_hit, jnp.float32))

    log_odds = grid.log_odds.reshape(-1)
    log_odds = log_odds.at[miss_flat].add(
        jnp.where(miss_ok, lo_miss, 0.0), mode="drop")
    log_odds = log_odds.at[hit_flat].add(
        jnp.where(hit_ok, lo_hit, 0.0), mode="drop")

    observed = grid.observed.reshape(-1)
    observed = observed.at[miss_flat].max(miss_ok, mode="drop")
    observed = observed.at[hit_flat].max(hit_ok, mode="drop")

    # Per-scan clamp approximating the per-update clamp
    # (binary_bayes_grid_cell.hpp:90-99).
    log_odds = jnp.clip(log_odds, -gridops.LOG_ODDS_MAX, gridops.LOG_ODDS_MAX)

    return grid._replace(
        log_odds=log_odds.reshape(h, w), observed=observed.reshape(h, w))


@functools.partial(jax.jit, static_argnames=("max_steps",))
def integrate_scan_counting(grid: gridops.CountingGridMap,
                            sensor_pose,
                            ranges,
                            angles,
                            valid,
                            usable_range_min,
                            usable_range_max,
                            max_steps: int = 448
                            ) -> gridops.CountingGridMap:
    """Integrate one scan under the hit/miss-ratio cell policy
    (counting_grid_cell.hpp:15-85): hit cells get (hits+1, counts+1), miss
    cells get (counts+1); value = hits / counts."""
    h, w = grid.shape
    miss_flat, miss_ok, hit_flat, hit_ok = trace_cells(
        grid, sensor_pose, ranges, angles, valid,
        usable_range_min, usable_range_max, max_steps)

    counts = grid.counts.reshape(-1)
    counts = counts.at[miss_flat].add(
        jnp.where(miss_ok, 1.0, 0.0), mode="drop")
    counts = counts.at[hit_flat].add(
        jnp.where(hit_ok, 1.0, 0.0), mode="drop")
    hits = grid.hits.reshape(-1)
    hits = hits.at[hit_flat].add(jnp.where(hit_ok, 1.0, 0.0), mode="drop")
    return grid._replace(hits=hits.reshape(h, w),
                         counts=counts.reshape(h, w))


@functools.partial(jax.jit, static_argnames=("max_steps",))
def integrate_scans(grid: gridops.GridMap,
                    node_poses,
                    scan_ranges,
                    scan_angles,
                    scan_valid,
                    rel_sensor_poses,
                    usable_range_min,
                    usable_range_max,
                    scan_active=None,
                    prob_hit=0.6,
                    prob_miss=0.45,
                    max_steps: int = 448) -> gridops.GridMap:
    """Rebuild/extend a map from a batch of scans, in node order.

    Mirrors ``ConstructMapFromScans`` (grid_map_builder.cpp:227-332) but as a
    single jitted program: a ``lax.scan`` over K scans, each applying the
    batched ray-cast scatter. ``node_poses``: f32[K, 3] robot poses;
    ``rel_sensor_poses``: f32[K, 3]; ``usable_range_min/max``: f32[K];
    ``scan_active``: bool[K] rows that actually hold scans (for padding).
    """
    k = node_poses.shape[0]
    if scan_active is None:
        scan_active = jnp.ones((k,), bool)

    sensor_poses = se2.compound(node_poses, rel_sensor_poses)

    def body(g, xs):
        pose, r, a, v, rmin, rmax, active = xs
        g2 = integrate_scan(g, pose, r, a, v & active, rmin, rmax,
                            prob_hit=prob_hit, prob_miss=prob_miss,
                            max_steps=max_steps)
        return g2, None

    grid, _ = jax.lax.scan(
        body, grid,
        (sensor_poses, scan_ranges, scan_angles, scan_valid,
         usable_range_min, usable_range_max, scan_active))
    return grid
