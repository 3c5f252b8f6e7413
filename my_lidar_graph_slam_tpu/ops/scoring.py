"""Batched scan-vs-map scoring kernels.

The shared data-parallel core of every scan matcher: score all
(pose-candidate, beam) pairs as one gather + reduce instead of the
reference's per-beam scalar loops (score_function_pixel_accurate.cpp:37-59,
scan_matcher_real_time_correlative.cpp:207-224).

Two entry points:

 * :func:`score_poses` — pixel-accurate score of arbitrary candidate sensor
   poses (used by grid-search and branch-and-bound matchers).
 * :func:`window_scores` — scores over a dense (dx, dy) translation window
   shared by all beams of a rotated scan (used by the correlative matcher);
   implemented as a batched patch gather so each (theta, beam) costs one
   gather of the whole window.

Score semantics (score_function_pixel_accurate.cpp:19-76): the score adds the
occupancy value at each hit cell; unknown and out-of-bounds cells contribute
0 (the Unknown sentinel).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from my_lidar_graph_slam_tpu.ops import grid as gridops


class ScoreSummary(NamedTuple):
    """Mirror of ScoreFunction::Summary (score_function.hpp:29-37)."""

    score: jnp.ndarray             # [...] sum of occupancy values
    normalized_score: jnp.ndarray  # [...] score / num_total_beams
    match_rate: jnp.ndarray        # [...] known cells / num_total_beams


def hit_cells(grid: gridops.GridMap, sensor_poses, ranges, angles):
    """Cell indices of beam endpoints for candidate sensor poses.

    ``sensor_poses``: f32[..., 3]; ``ranges``/``angles``: f32[NB].
    Returns int32 ``(ix, iy)`` of shape [..., NB].
    """
    world_angle = sensor_poses[..., 2:3] + angles
    hx = sensor_poses[..., 0:1] + ranges * jnp.cos(world_angle)
    hy = sensor_poses[..., 1:2] + ranges * jnp.sin(world_angle)
    return gridops.world_to_cell(grid, jnp.stack([hx, hy], axis=-1))


def score_poses(value_map, grid: gridops.GridMap, sensor_poses,
                ranges, angles, beam_mask, num_total_beams) -> ScoreSummary:
    """Pixel-accurate score for candidate poses ``[..., 3]``.

    ``beam_mask``: bool[NB] beams inside the usable range gate.
    ``num_total_beams``: normalization divisor — the reference normalizes by
    the TOTAL beam count, not the valid count
    (score_function_pixel_accurate.cpp:62-63).
    """
    ix, iy = hit_cells(grid, sensor_poses, ranges, angles)
    vals = gridops.lookup(value_map, ix, iy)         # [..., NB]
    vals = vals * beam_mask
    score = vals.sum(axis=-1)
    known = ((vals != gridops.UNKNOWN) & beam_mask).sum(axis=-1)
    denom = jnp.asarray(num_total_beams, jnp.float32)
    return ScoreSummary(score, score / denom,
                        known.astype(jnp.float32) / denom)


def window_scores(value_map, ix, iy, beam_weight, win_x: int, win_y: int):
    """Scores over all integer offsets (dx, dy) in a centered window.

    ``ix``/``iy``: int32[..., NB] base hit-cell indices; ``beam_weight``:
    f32[..., NB] (0 for gated-out beams). Returns f32[..., WX, WY] with
    WX = 2*win_x + 1, scores[..., a, b] = score at offset
    (dx = a - win_x, dy = b - win_y), matching the (x outer, y inner)
    iteration of the reference (scan_matcher_real_time_correlative.cpp:98-115).

    Implemented as one flat scalar take per window cell over a zero-padded
    map (see the inline comment for the measured device rates that force
    this choice). Out-of-map cells read 0 (Unknown), matching
    ``GridMap::Value(idx, unknown)``.
    """
    h, w = value_map.shape
    wx = 2 * win_x + 1
    wy = 2 * win_y + 1
    # One flat scalar take per window cell. TPU gathers are issue-rate
    # bound (~100 M indices/s on v5e, measured — independent of index
    # clustering or slice size), and a sliced/vmapped-dynamic-slice gather
    # costs ~2.8 us PER SLICE (serial scalar-core path), so per-cell flat
    # takes are ~300x faster than per-window patch slices here.
    #
    # Out-of-map cells must read 0 (the Unknown sentinel,
    # score_function_pixel_accurate.cpp:51-53): pad the map by the window
    # radius with zeros and clamp indices into the padded frame — beams
    # whose window lies entirely outside land in the zero ring.
    pad_y = win_y + 1
    pad_x = win_x + 1
    padded = jnp.pad(value_map, ((pad_y, pad_y), (pad_x, pad_x)))
    hp = h + 2 * pad_y
    wp = w + 2 * pad_x
    flat = padded.reshape(-1)

    dy = jnp.arange(-win_y, win_y + 1)
    dx = jnp.arange(-win_x, win_x + 1)
    gy = jnp.clip(iy[..., None, None] + dy[:, None] + pad_y, 0, hp - 1)
    gx = jnp.clip(ix[..., None, None] + dx[None, :] + pad_x, 0, wp - 1)
    # Any out-of-map cell clamps into the zero ring (pad >= 1 on every
    # side), so the clamped read itself returns the Unknown 0 — no mask
    # needed, and the semantics exactly match the masked lookup.
    vals = jnp.take(flat, gy * wp + gx)                    # [..., NB, wy, wx]
    scores = (vals * beam_weight[..., None, None]).sum(axis=-3)
    return jnp.swapaxes(scores, -1, -2)                    # [..., wx, wy]
