"""Match cost functions and Laplace-approximation covariances.

Batched reimplementations of the reference cost functions:

 * Greedy endpoint (cost_function_greedy_endpoint.cpp:32-171): per-beam
   kernel search for the nearest surface-crossing cell, cost
   ``-sum exp(-d^2 / 2 sigma^2)`` scaled.  NOTE the launcher swaps the last
   two constructor arguments (header order scalingFactor, standardDeviation
   at cost_function_greedy_endpoint.hpp:20-26 vs slam_launcher.cpp:70-72),
   so with the default JSON the *effective* parameters are sigma = 1.0 m and
   scale = 0.05 — we replicate the behavior as configured, which our config
   layer applies by default.

 * Square error on a bicubic-smoothed map (cost_function_square_error.cpp:
   21-58, 276-346), with the reference's finite-difference map gradient
   (:303-346 kernel; ComputeMapGradient :172-229).

Covariances follow the reference exactly: outer product of a
central-difference cost gradient plus a 0.01 diagonal ridge
(cost_function_greedy_endpoint.cpp:147-171, cost_function_square_error.cpp:
112-135). It is a crude Laplace approximation, but it is what shapes the
reference's edge information matrices, so parity requires it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from my_lidar_graph_slam_tpu.ops import grid as gridops


# ---------------------------------------------------------------------------
# Greedy endpoint cost
# ---------------------------------------------------------------------------


def greedy_endpoint_cost(value_map, grid: gridops.GridMap, sensor_poses,
                         ranges, angles, beam_mask,
                         hit_and_missed_dist=0.075,
                         occupancy_threshold=0.1,
                         kernel_size: int = 1,
                         standard_deviation=1.0,
                         scaling_factor=0.05):
    """Greedy-endpoint cost for sensor poses ``[..., 3]`` -> ``[...]``.

    ``beam_mask``: bool[NB], the usable-range gate
    (cost_function_greedy_endpoint.cpp:46-50).
    """
    variance = standard_deviation * standard_deviation
    res = grid.resolution

    world_angle = sensor_poses[..., 2:3] + angles
    cos_t = jnp.cos(world_angle)
    sin_t = jnp.sin(world_angle)
    hx = sensor_poses[..., 0:1] + ranges * cos_t
    hy = sensor_poses[..., 1:2] + ranges * sin_t
    mx = sensor_poses[..., 0:1] + (ranges - hit_and_missed_dist) * cos_t
    my = sensor_poses[..., 1:2] + (ranges - hit_and_missed_dist) * sin_t

    hix, hiy = gridops.world_to_cell(grid, jnp.stack([hx, hy], -1))
    mix, miy = gridops.world_to_cell(grid, jnp.stack([mx, my], -1))

    k = kernel_size
    offs = jnp.arange(-k, k + 1)
    kx = offs[None, :]
    ky = offs[:, None]                                       # [K, K]

    def kernel_vals(ix, iy):
        # [..., NB] -> [..., NB, K, K]
        return gridops.lookup(
            value_map,
            ix[..., None, None] + kx, iy[..., None, None] + ky)

    hit_vals = kernel_vals(hix, hiy)
    miss_vals = kernel_vals(mix, miy)

    known = (hit_vals != gridops.UNKNOWN) & (miss_vals != gridops.UNKNOWN)
    crossing = (hit_vals >= occupancy_threshold) & \
               (miss_vals <= occupancy_threshold)
    usable = known & crossing

    # Squared distance hitPointIdx -> kernel cell, in meters
    # (grid_map.hpp:895-902).
    d2 = (kx.astype(jnp.float32) ** 2 + ky.astype(jnp.float32) ** 2) \
        * res * res
    d2_default = 2.0 * ((k + 1) * res) ** 2
    d2 = jnp.where(usable, jnp.broadcast_to(d2, usable.shape), d2_default)
    min_d2 = jnp.min(d2, axis=(-2, -1))                      # [..., NB]

    per_beam = -jnp.exp(-0.5 * min_d2 / variance) * beam_mask
    return per_beam.sum(axis=-1) * scaling_factor


def greedy_endpoint_cost_and_covariance_fused(
        value_map, grid: gridops.GridMap, sensor_pose, ranges, angles,
        beam_mask, hit_and_missed_dist=0.075, occupancy_threshold=0.1,
        kernel_size: int = 1, standard_deviation=1.0, scaling_factor=0.05):
    """Cost + Laplace covariance with deduplicated map reads.

    Matches ``greedy_endpoint_cost`` + ``greedy_endpoint_covariance``
    (cost_function_greedy_endpoint.cpp:32-171) but exploits that the
    central-difference x/y pose perturbations are EXACTLY the map
    resolution: shifting the pose by ``+-res`` shifts every hit/missed
    cell index by exactly one cell, so the five axis-aligned pose
    evaluations (base, +-x, +-y) read from one extended
    ``(2k+3) x (2k+3)`` patch around the base cells instead of five
    separate ``(2k+1)^2`` kernels. Reads per beam drop from
    ``7 * 2 * (2k+1)^2`` to ``2 * (2k+3)^2 + 2 * 2 * (2k+1)^2``
    (k=1: 126 -> 86); on v5e the tail is gather-rate bound, so the
    saving is proportional (measured: 284 -> ~190 us/query at Q=1024).

    Numerics note: the shifted-pose cells are computed as integer shifts
    of the base cell (``floor(u) + 1``) rather than ``floor`` of a
    re-derived world coordinate (``floor(u + 1ulp-rounded 1.0)``); the
    two can differ only when a beam endpoint lies within 1 ulp of a cell
    boundary — measure-zero for real data, and well inside the f32-vs-
    double tolerance the ATE parity bound already absorbs.

    ``sensor_pose``: f32[3]. Returns ``(cost[], covariance[3, 3])``.
    """
    res = grid.resolution
    variance = standard_deviation * standard_deviation
    k = kernel_size
    diff_ang = 1e-2
    d2_default = 2.0 * ((k + 1) * res) ** 2

    # Base + theta-perturbed world angles (x/y pose shifts keep the angle).
    thetas = jnp.stack([sensor_pose[2], sensor_pose[2] + diff_ang,
                        sensor_pose[2] - diff_ang])            # [3]
    wa = thetas[:, None] + angles[None, :]                     # [3, NB]
    cos_t = jnp.cos(wa)
    sin_t = jnp.sin(wa)
    hx = sensor_pose[0] + ranges[None, :] * cos_t              # [3, NB]
    hy = sensor_pose[1] + ranges[None, :] * sin_t
    mx = sensor_pose[0] + (ranges[None, :] - hit_and_missed_dist) * cos_t
    my = sensor_pose[1] + (ranges[None, :] - hit_and_missed_dist) * sin_t
    hix, hiy = gridops.world_to_cell(grid, jnp.stack([hx, hy], -1))
    mix, miy = gridops.world_to_cell(grid, jnp.stack([mx, my], -1))

    # Extended (2k+3)^2 patches around the BASE hit/missed cells cover the
    # base and all four +-res-shifted poses' (2k+1)^2 kernels.
    ext = jnp.arange(-k - 1, k + 2)
    ex = ext[None, :]
    ey = ext[:, None]                                          # [E, E]

    def patch_vals(ix, iy):
        return gridops.lookup(value_map,
                              ix[..., None, None] + ex,
                              iy[..., None, None] + ey)        # [..., E, E]

    hv_ext = patch_vals(hix[0], hiy[0])                        # [NB, E, E]
    mv_ext = patch_vals(mix[0], miy[0])
    usable_ext = (hv_ext != gridops.UNKNOWN) & \
        (mv_ext != gridops.UNKNOWN) & \
        (hv_ext >= occupancy_threshold) & \
        (mv_ext <= occupancy_threshold)                        # [NB, E, E]

    offs = jnp.arange(-k, k + 1)
    d2 = (offs[None, :].astype(jnp.float32) ** 2 +
          offs[:, None].astype(jnp.float32) ** 2) * res * res  # [K, K]

    kk = 2 * k + 1

    def min_d2_from_ext(sy, sx):
        """min_d2 for the pose shifted by (sx, sy) cells, from the
        extended usable flags (shift +1 recenters into the patch)."""
        u = usable_ext[..., sy + 1:sy + 1 + kk, sx + 1:sx + 1 + kk]
        dd = jnp.where(u, jnp.broadcast_to(d2, u.shape), d2_default)
        return jnp.min(dd, axis=(-2, -1))                      # [NB]

    # Theta poses: rotated endpoints need their own (2k+1)^2 reads.
    def kernel_vals_k(ix, iy):
        return gridops.lookup(value_map,
                              ix[..., None, None] + offs[None, :],
                              iy[..., None, None] + offs[:, None])

    def min_d2_direct(p):
        hv = kernel_vals_k(hix[p], hiy[p])
        mv = kernel_vals_k(mix[p], miy[p])
        u = (hv != gridops.UNKNOWN) & (mv != gridops.UNKNOWN) & \
            (hv >= occupancy_threshold) & (mv <= occupancy_threshold)
        dd = jnp.where(u, jnp.broadcast_to(d2, u.shape), d2_default)
        return jnp.min(dd, axis=(-2, -1))

    # Order matches greedy_endpoint_covariance's deltas:
    # [base, +x, +y, +theta, -x, -y, -theta].
    min_d2 = jnp.stack([
        min_d2_from_ext(0, 0),
        min_d2_from_ext(0, 1),
        min_d2_from_ext(1, 0),
        min_d2_direct(1),
        min_d2_from_ext(0, -1),
        min_d2_from_ext(-1, 0),
        min_d2_direct(2),
    ])                                                         # [7, NB]

    per_beam = -jnp.exp(-0.5 * min_d2 / variance) * beam_mask[None, :]
    costs = per_beam.sum(axis=-1) * scaling_factor             # [7]

    steps = jnp.stack([res, res, jnp.full((), diff_ang)])
    grad = 0.5 * (costs[1:4] - costs[4:7]) / steps
    cov = jnp.outer(grad, grad) + 0.01 * jnp.eye(3)
    return costs[0], cov


def greedy_endpoint_covariance(value_map, grid, sensor_pose, ranges, angles,
                               beam_mask, **params):
    """Covariance at the optimum (cost_function_greedy_endpoint.cpp:114-171).

    Central differences with steps (resolution, resolution, 1e-2); covariance
    = grad grad^T + 0.01 I.
    """
    res = grid.resolution
    diff_ang = 1e-2
    deltas = jnp.stack([
        jnp.stack([res, 0.0 * res, 0.0 * res]),
        jnp.stack([0.0 * res, res, 0.0 * res]),
        jnp.stack([0.0 * res, 0.0 * res, jnp.full((), diff_ang)]),
    ])                                                        # [3, 3]
    poses = jnp.concatenate([sensor_pose + deltas,
                             sensor_pose - deltas], axis=0)   # [6, 3]
    costs = greedy_endpoint_cost(
        value_map, grid, poses, ranges, angles, beam_mask, **params)
    steps = jnp.stack([res, res, jnp.full((), diff_ang)])
    grad = 0.5 * (costs[:3] - costs[3:]) / steps
    cov = jnp.outer(grad, grad) + 0.01 * jnp.eye(3)
    return cov


# ---------------------------------------------------------------------------
# Bicubic smoothed map + square error cost
# ---------------------------------------------------------------------------


def _bicubic_kernel(t):
    """The reference's interpolation kernel h(t)
    (cost_function_square_error.cpp:281-295)."""
    at = jnp.abs(t)
    near = at ** 3 - 2.0 * at ** 2 + 1.0
    far = -at ** 3 + 5.0 * at ** 2 - 8.0 * at + 4.0
    return jnp.where(at <= 1.0, near, jnp.where(at <= 2.0, far, 0.0))


def smoothed_value(value_map, fx, fy):
    """Bicubic-interpolated map value at fractional cell indices ``[...]``.

    Mirrors ComputeSmoothedValue (cost_function_square_error.cpp:276-346):
    sample the 4x4 integer neighborhood (floor-1 .. floor+2), clamp indices
    to the map edge (out-of-bounds reads repeat the border cell), unknown
    reads 0, result clamped to [0, 1].
    """
    h, w = value_map.shape
    floor_x = jnp.floor(fx)
    floor_y = jnp.floor(fy)
    tx = fx - floor_x
    ty = fy - floor_y

    # Kernel weights at distances (1+t, t, 1-t, 2-t).
    def weights(t):
        return jnp.stack([
            _bicubic_kernel(1.0 + t),
            _bicubic_kernel(t),
            _bicubic_kernel(1.0 - t),
            _bicubic_kernel(2.0 - t),
        ], axis=-1)                                          # [..., 4]

    wx = weights(tx)
    wy = weights(ty)

    base_x = floor_x.astype(jnp.int32)
    base_y = floor_y.astype(jnp.int32)
    offs = jnp.arange(-1, 3)
    sample_x = jnp.clip(base_x[..., None] + offs, 0, w - 1)   # [..., 4]
    sample_y = jnp.clip(base_y[..., None] + offs, 0, h - 1)
    # [..., 4(x), 4(y)] via a flat take (the fast TPU gather path).
    vals = jnp.take(value_map.reshape(-1),
                    sample_y[..., None, :] * w + sample_x[..., :, None])

    out = jnp.einsum("...i,...ij,...j->...", wx, vals, wy,
                     precision="highest")
    return jnp.clip(out, 0.0, 1.0)


def square_error_cost(value_map, grid: gridops.GridMap, sensor_poses,
                      ranges, angles, beam_mask):
    """Sum of (1 - smoothed(hit))^2 (cost_function_square_error.cpp:21-58)."""
    world_angle = sensor_poses[..., 2:3] + angles
    hx = sensor_poses[..., 0:1] + ranges * jnp.cos(world_angle)
    hy = sensor_poses[..., 1:2] + ranges * jnp.sin(world_angle)
    fx, fy = gridops.world_to_cell_float(grid, jnp.stack([hx, hy], -1))
    sm = smoothed_value(value_map, fx, fy)
    err = (1.0 - sm) ** 2 * beam_mask
    return err.sum(axis=-1)


def map_gradient(value_map, grid: gridops.GridMap, points):
    """Finite-difference gradient of the smoothed map wrt world position.

    Mirrors ComputeMapGradient (cost_function_square_error.cpp:172-199):
    central differences of half-step 0.05 cell on the fractional index.
    ``points``: f32[..., 2]. Returns f32[..., 2] (d/dx, d/dy).
    """
    delta_idx = 0.1
    fx, fy = gridops.world_to_cell_float(grid, points)
    half = delta_idx / 2.0
    gx = (smoothed_value(value_map, fx + half, fy)
          - smoothed_value(value_map, fx - half, fy))
    gy = (smoothed_value(value_map, fx, fy + half)
          - smoothed_value(value_map, fx, fy - half))
    delta_dist = grid.resolution * delta_idx
    return jnp.stack([gx, gy], axis=-1) / delta_dist


def square_error_gradient(value_map, grid, sensor_pose, ranges, angles,
                          beam_mask):
    """Cost gradient wrt the sensor pose
    (cost_function_square_error.cpp:61-108)."""
    world_angle = sensor_pose[..., 2:3] + angles
    cos_t = jnp.cos(world_angle)
    sin_t = jnp.sin(world_angle)
    hx = sensor_pose[..., 0:1] + ranges * cos_t
    hy = sensor_pose[..., 1:2] + ranges * sin_t
    pts = jnp.stack([hx, hy], axis=-1)

    fx, fy = gridops.world_to_cell_float(grid, pts)
    sm = smoothed_value(value_map, fx, fy)
    err = (1.0 - sm) * beam_mask

    g = map_gradient(value_map, grid, pts)                    # [..., NB, 2]
    # Chain rule through the hit point (cost_function_square_error.cpp:203-229).
    g_theta = -ranges * sin_t * g[..., 0] + ranges * cos_t * g[..., 1]
    grad = jnp.stack([
        (2.0 * err * -g[..., 0]).sum(-1),
        (2.0 * err * -g[..., 1]).sum(-1),
        (2.0 * err * -g_theta).sum(-1),
    ], axis=-1)
    return grad


def square_error_covariance(value_map, grid, sensor_pose, ranges, angles,
                            beam_mask):
    """grad grad^T + 0.01 I (cost_function_square_error.cpp:112-135)."""
    grad = square_error_gradient(
        value_map, grid, sensor_pose, ranges, angles, beam_mask)
    return jnp.outer(grad, grad) + 0.01 * jnp.eye(3)
