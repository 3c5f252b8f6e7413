"""Occupancy grid map as a fixed-size dense log-odds tensor.

TPU-native replacement for the reference's patch-paged growing ``GridMap``
(grid_map.hpp:22-1019) + ``BinaryBayesGridCell`` (binary_bayes_grid_cell.hpp:
17-119). Design:

 * The map is a dense ``f32[H, W]`` log-odds field plus an ``observed`` mask
   and a world-frame origin. The patch pager exists only to make a growing
   sparse map cheap on CPU; on TPU a fixed-size dense tensor with an origin
   offset is both simpler and faster. Out-of-bounds reads return the Unknown
   sentinel, exactly like unallocated patches (grid_map_patch.hpp:181).

 * The binary Bayes odds-product update (binary_bayes_grid_cell.hpp:75-92)
   commutes in log-odds space: ``v' = odds^-1(odds(v) * odds(p))`` is
   ``L' = L + logit(p)``. The reference's "first observation assigns the
   probability directly" rule is the same update applied to the implicit
   prior 0.5 (``logit(0.5) = 0``), so a plain scatter-add of logit
   contributions reproduces it, with the ``observed`` mask standing in for
   the ``Unknown = 0`` sentinel (grid_cell.hpp:10-44).

 * The reference clamps to ``[1e-3, 1 - 1e-3]`` after every single cell
   update; we clamp the log-odds field once per integrated scan, which is
   identical until a cell saturates (>= 35 same-sign updates) and differs
   by at most the within-one-scan overshoot afterwards.

Cell indexing is ``[iy, ix]`` (row = y), with ``origin`` at the bottom-left
corner of cell ``(0, 0)``, mirroring ``WorldCoordinateToGridCellIndex``
(grid_map.hpp:779-790).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

# logit(1 - 1e-3): the clamp bound from binary_bayes_grid_cell.hpp:50-52.
PROB_MIN = 1e-3
LOG_ODDS_MAX = float(np.log((1.0 - PROB_MIN) / PROB_MIN))
UNKNOWN = 0.0  # Unknown occupancy sentinel (grid_cell.hpp:33).


class GridMap(NamedTuple):
    """Dense occupancy submap. A pytree; all fields are arrays.

    ``log_odds``: f32[H, W] accumulated log-odds (0 where unobserved).
    ``observed``: bool[H, W] whether the cell was ever updated.
    ``origin``:   f32[2] world (x, y) of the bottom-left corner of cell (0,0).
    ``resolution``: f32[] cell size in meters.
    """

    log_odds: jnp.ndarray
    observed: jnp.ndarray
    origin: jnp.ndarray
    resolution: jnp.ndarray

    @property
    def shape(self):
        return self.log_odds.shape


def empty(height: int, width: int, resolution: float,
          center: np.ndarray | None = None,
          dtype=jnp.float32) -> GridMap:
    """Create an empty map centered on ``center`` (world frame)."""
    if center is None:
        center = np.zeros((2,), np.float32)
    center = np.asarray(center, np.float32)
    origin = center - 0.5 * resolution * np.array([width, height], np.float32)
    return GridMap(
        log_odds=jnp.zeros((height, width), dtype),
        observed=jnp.zeros((height, width), bool),
        origin=jnp.asarray(origin, jnp.float32),
        resolution=jnp.asarray(resolution, jnp.float32),
    )


def values(grid: GridMap) -> jnp.ndarray:
    """Occupancy probabilities with Unknown=0 sentinel (grid_map.hpp:806)."""
    prob = jnp.clip(
        jax_sigmoid(grid.log_odds), PROB_MIN, 1.0 - PROB_MIN)
    return jnp.where(grid.observed, prob, UNKNOWN)


def jax_sigmoid(x):
    # jax.nn.sigmoid without importing jax.nn at module scope.
    return 1.0 / (1.0 + jnp.exp(-x))


def logit(p):
    return jnp.log(p) - jnp.log1p(-p)


def world_to_cell(grid: GridMap, points):
    """World (x, y) -> integer cell (ix, iy) (grid_map.hpp:779-790).

    ``points``: f32[..., 2]. Returns int32 ``(ix, iy)`` arrays.
    """
    rel = (points - grid.origin) / grid.resolution
    idx = jnp.floor(rel).astype(jnp.int32)
    return idx[..., 0], idx[..., 1]


def world_to_cell_float(grid: GridMap, points):
    """World -> fractional cell index (grid_map.hpp:793-803)."""
    rel = (points - grid.origin) / grid.resolution
    return rel[..., 0], rel[..., 1]


def cell_to_world(grid: GridMap, ix, iy):
    """Cell index -> world coords of the cell's bottom-left corner."""
    x = grid.origin[0] + grid.resolution * ix
    y = grid.origin[1] + grid.resolution * iy
    return x, y


def in_bounds(grid: GridMap, ix, iy):
    h, w = grid.shape
    return (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)


class CountingGridMap(NamedTuple):
    """Hit/miss-ratio occupancy submap — the CountingGridCell policy
    (counting_grid_cell.hpp:15-85): value = hits / (hits + misses), Unknown
    until first observation. An alternative cell strategy to the
    binary-Bayes :class:`GridMap`; like the reference's, it is a complete
    usable policy that the default launcher does not instantiate
    (the reference launcher also only builds BinaryBayesGridCell maps).
    """

    hits: jnp.ndarray      # f32[H, W] hit observations per cell
    counts: jnp.ndarray    # f32[H, W] total observations per cell
    origin: jnp.ndarray    # f32[2]
    resolution: jnp.ndarray  # f32[]

    @property
    def shape(self):
        return self.hits.shape


def counting_empty(height: int, width: int, resolution: float,
                   center: np.ndarray | None = None) -> CountingGridMap:
    if center is None:
        center = np.zeros((2,), np.float32)
    center = np.asarray(center, np.float32)
    origin = center - 0.5 * resolution * np.array([width, height], np.float32)
    return CountingGridMap(
        hits=jnp.zeros((height, width), jnp.float32),
        counts=jnp.zeros((height, width), jnp.float32),
        origin=jnp.asarray(origin, jnp.float32),
        resolution=jnp.asarray(resolution, jnp.float32),
    )


def counting_values(grid: CountingGridMap) -> jnp.ndarray:
    """Occupancy = hits / observations; Unknown=0 where never observed
    (counting_grid_cell.hpp:60-77)."""
    return jnp.where(grid.counts > 0,
                     grid.hits / jnp.maximum(grid.counts, 1.0), UNKNOWN)


def lookup(value_map: jnp.ndarray, ix, iy, default=UNKNOWN):
    """Masked map read: out-of-bounds returns ``default``.

    Mirrors ``GridMap::Value(idx, defaultVal)`` semantics used throughout the
    scoring loops (score_function_pixel_accurate.cpp:49).

    Implemented as a FLAT 1-D take: on TPU a flat scalar gather issues at
    ~100 M indices/s, while 2-D advanced indexing can lower to the serial
    sliced-gather path (~0.35 M slices/s measured on v5e).
    """
    h, w = value_map.shape[-2:]
    assert value_map.ndim == 2, "lookup expects a single 2-D map"
    ok = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
    ixc = jnp.clip(ix, 0, w - 1)
    iyc = jnp.clip(iy, 0, h - 1)
    vals = jnp.take(value_map.reshape(-1), iyc * w + ixc)
    return jnp.where(ok, vals, default)
