"""Coarse map pyramids via windowed max.

TPU-native replacement for the two-pass sliding-window-max precomputation
(grid_map_builder.cpp:403-536, util.hpp:199-253): each pyramid level ``h``
stores, at full resolution, the max of the ``2^h x 2^h`` block of cells
*beginning* at each cell (forward-looking window), with the Unknown=0
sentinel participating as the value 0 — exactly the semantics of
``PrecomputeGridMap`` given that ``SlidingWindowMax`` zero-pads past the map
edge and unknown cells read as 0.

Implemented as ``lax.reduce_window`` max with stride 1, which XLA lowers to
the same separable row/column passes the reference hand-codes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("window",))
def windowed_max(value_map: jnp.ndarray, window: int) -> jnp.ndarray:
    """Forward-looking ``window x window`` max at every cell (stride 1).

    Cells within ``window-1`` of the far edges see zero padding, matching the
    reference's zero-padded sliding window (util.hpp:204-252).
    """
    if window == 1:
        return value_map
    return jax.lax.reduce_window(
        value_map,
        init_value=jnp.asarray(0.0, value_map.dtype),
        computation=jax.lax.max,
        window_dimensions=(window, window),
        window_strides=(1, 1),
        padding=((0, window - 1), (0, window - 1)),
    )


@functools.partial(jax.jit, static_argnames=("height_max",))
def build_pyramid(value_map: jnp.ndarray, height_max: int) -> jnp.ndarray:
    """Stack of levels 0..height_max, level h = windowed max of ``2^h``.

    Mirrors ``PrecomputeGridMaps`` (grid_map_builder.cpp:471-495). Returns
    f32[height_max + 1, H, W]. Each level is computed from the previous by a
    ``2 x 2`` max of cells offset by ``2^(h-1)`` (doubling trick), so the
    total work is O(levels * H * W).
    """
    levels = [value_map]
    cur = value_map
    for h in range(1, height_max + 1):
        off = 1 << (h - 1)
        shifted_x = jnp.pad(cur, ((0, 0), (0, off)))[:, off:]
        row = jnp.maximum(cur, shifted_x)
        shifted_y = jnp.pad(row, ((0, off), (0, 0)))[off:, :]
        cur = jnp.maximum(row, shifted_y)
        levels.append(cur)
    return jnp.stack(levels, axis=0)
