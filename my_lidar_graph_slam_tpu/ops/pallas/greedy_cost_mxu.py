"""Greedy-endpoint cost + covariance on the MXU (Pallas TPU kernel).

The per-match tail — the greedy-endpoint cost and its 7-pose central-
difference Laplace covariance (cost_function_greedy_endpoint.cpp:32-171)
— is gather-rate bound on v5e: even after read deduplication
(``cost.greedy_endpoint_cost_and_covariance_fused``) it issues ~86
scalar map reads per beam at ~100 M reads/s, ~180 us of every 1024-query
dispatch. This kernel removes the gathers the same way the correlation
kernel does: per-beam cells are extracted from VMEM-resident map tiles
with one-hot matmuls and iota-mask reductions, and the min-distance /
exp / beam-sum pipeline runs in-register.

Key design points:

* **32-row tiles** (``make_cost_tiles``): the read set of one beam spans
  at most ~15 cells vertically (theta excursion ``r * 1e-2 / res`` +
  the extended kernel patch + the hit/missed separation), so a 32-row x
  128-lane tile with 16/64 strides suffices — and the one-hot extraction
  matmul contracts K=32 instead of K=128, quartering the MXU work per
  beam relative to reusing the correlation tiles.
* **Lane layout** (static, per beam): lanes 0-24 hold the extended
  (2k+3)^2 patch around the BASE hit/missed cells (which covers the
  base and all four +-resolution x/y pose shifts — the same exact-shift
  dedup as the fused host path), lanes 25-33 and 34-42 the +-theta
  poses' (2k+1)^2 kernels. One extraction per endpoint (hit, missed)
  yields every value all 7 pose evaluations need.
* **Class-count matmul**: ``min_d2`` over a (2k+1)^2 kernel takes one of
  ``(k+1)^2 + 1`` distinct values; for each distance class a static 0/1
  matrix maps usable-flag lanes to pose lanes, so one ``(1, 128) x
  (128, 3*128)`` matmul counts usable cells per (class, pose), and the
  exp term is a max over class constants — no data-dependent control
  flow, no cross-lane shuffles.

Only ``kernel_size == 1`` is compiled (the launcher default and the
reference's effective config); other sizes fall back to the fused host
path. Exactness: identical read set and semantics as the fused path —
parity is bound by f32 summation order only.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from my_lidar_graph_slam_tpu.ops.pallas import correlate_mxu as cm

CTILE_Y = 32        # cost-tile rows
CSTRIDE_Y = 16      # row stride: any <=17-row extent fits one tile
CTILE_X = 128
CSTRIDE_X = 64
PAD_RING = cm.PAD_RING
LANE = 128

# Static lane layout for kernel_size=1 (see module docstring).
_EXT = 5                       # extended patch side (2k+3)
_N_EXT = _EXT * _EXT           # 25
_N_TH = 9                      # per-theta-pose kernel cells
N_LANES = _N_EXT + 2 * _N_TH   # 43
_POSE_SHIFTS = [(0, 0), (1, 0), (0, 1), None, (-1, 0), (0, -1), None]
_THETA_POSE = {3: 0, 6: 1}     # pose idx -> theta block


class CostTiles(NamedTuple):
    """Overlapped 32x128 tiling of a padded value map (see module doc)."""

    tiles: jnp.ndarray


@functools.partial(jax.jit, static_argnames=("h", "w"))
def _make_cost_tiles(value_map, h: int, w: int):
    nty = -(-(h + 2 * PAD_RING - CTILE_Y) // CSTRIDE_Y) + 1
    ntx = -(-(w + 2 * PAD_RING - CTILE_X) // CSTRIDE_X) + 1
    hc = (nty - 1) * CSTRIDE_Y + CTILE_Y
    wc = (ntx - 1) * CSTRIDE_X + CTILE_X
    vp = jnp.pad(value_map,
                 ((PAD_RING, hc - h - PAD_RING),
                  (PAD_RING, wc - w - PAD_RING)))
    ys = (jnp.arange(nty) * CSTRIDE_Y)[:, None] + jnp.arange(CTILE_Y)
    rows = vp[ys.reshape(-1)].reshape(nty, CTILE_Y, wc)
    xs = (jnp.arange(ntx) * CSTRIDE_X)[:, None] + jnp.arange(CTILE_X)
    tiles = rows[:, :, xs.reshape(-1)].reshape(nty, CTILE_Y, ntx, CTILE_X)
    return jnp.transpose(tiles, (0, 2, 1, 3))


def make_cost_tiles(value_map) -> CostTiles:
    """Precompute the cost-tile array for one map (same total memory as
    the correlation tiles: 2x row coverage at 1/4 the row size)."""
    h, w = value_map.shape
    return CostTiles(_make_cost_tiles(value_map, h, w))


# Guaranteed tile coverage of a worst-aligned row extent: the per-beam
# tile id is min_row // CSTRIDE_Y, so the tile start is at most
# CSTRIDE_Y - 1 rows above min_row and covers min_row + (CTILE_Y -
# CSTRIDE_Y) onward — any extent of up to CTILE_Y - CSTRIDE_Y + 1 rows
# fits regardless of alignment.
ENVELOPE_ROWS = CTILE_Y - CSTRIDE_Y + 1   # 17


def cost_rows_needed(resolution: float, usable_range_max: float,
                     hit_and_missed_dist: float = 0.075,
                     kernel_size: int = 1) -> int:
    """Worst-case row extent of one beam's read set (both endpoints,
    all 7 poses), in cells.

    Components: the +-1e-2 rad theta poses displace an endpoint by up to
    ``r * 1e-2 / res`` cells in opposite directions (+1 for floor
    rounding), each carrying a ``(2k+1)^2`` kernel; the base cells carry
    the extended ``(2k+3)^2`` patch; the missed endpoint sits up to
    ``hit_and_missed_dist / res`` cells (+1 floor slack) from the hit
    endpoint. Default config (20 m, 0.05 m, k=1): 16 rows.
    """
    import math
    v = math.ceil(usable_range_max * 1e-2 / resolution) + 1
    half = max(kernel_size + 1, v + kernel_size)
    sep = math.ceil(hit_and_missed_dist / resolution) + 1
    return 2 * half + sep + 1


def envelope_ok(resolution: float, usable_range_max: float,
                hit_and_missed_dist: float = 0.075,
                kernel_size: int = 1) -> bool:
    """True when the Pallas cost kernel's single-tile-per-beam contract
    holds for this config. When False the caller must use the host path
    (``cost.greedy_endpoint_cost_and_covariance_fused``): out-of-tile
    one-hot rows silently read 0 (Unknown) and would bias cost and
    covariance with no error raised."""
    return kernel_size == 1 and cost_rows_needed(
        resolution, usable_range_max, hit_and_missed_dist,
        kernel_size) <= ENVELOPE_ROWS


def _selector_matrix() -> np.ndarray:
    """Static (128, 3*128) class-count selector: G[l, c*128 + p] = 1 iff
    usable-flag lane l maps to distance class c for pose p (k=1)."""
    g = np.zeros((LANE, 3 * LANE), np.float32)
    for p, shift in enumerate(_POSE_SHIFTS):
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                c = dx * dx + dy * dy
                if shift is not None:
                    sx, sy = shift
                    lane = (dy + sy + 2) * _EXT + (dx + sx + 2)
                else:
                    lane = _N_EXT + _THETA_POSE[p] * _N_TH + \
                        (dy + 1) * 3 + (dx + 1)
                g[lane, c * LANE + p] = 1.0
    return g


def _kernel(nb, bb, thr, tid_ref, w_ref, e_ref, *refs):
    """One (query, beam-block) step: BB beams' 7-pose cost contributions.

    Follows the Mosaic layout rules documented in correlate_mxu._kernel_bb
    (flat SMEM prefetch, lane-0 slices, transposed orientation). The
    exp distance-class constants arrive as an SMEM prefetch array
    (``e_ref``: [e0, e1, e2, e_default]) because the map resolution they
    derive from is a traced value at the call sites.
    """
    tile_refs = refs[:bb]
    pkh_ref, pkm_ref, g_ref, out_ref = \
        refs[bb], refs[bb + 1], refs[bb + 2], refs[bb + 3]
    qi = pl.program_id(0)
    bi = pl.program_id(1)
    e0 = e_ref[0]
    e1 = e_ref[1]
    e2 = e_ref[2]
    ed = e_ref[3]

    gcat = g_ref[:]                                  # (128, 384) f32
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1)
    pose_mask = (lane_i < 7).astype(jnp.float32)

    acc = jnp.zeros((1, LANE), jnp.float32)
    for j in range(bb):
        tile = tile_refs[j][0, 0]                    # (32, 128)
        beam_w = w_ref[qi * nb + bi * bb + j]

        def extract(pk_ref):
            pk = pk_ref[0, j, 0]                     # (1, 128) i32
            y = pk // CTILE_X
            x = pk % CTILE_X
            suby = jax.lax.broadcasted_iota(jnp.int32, (CTILE_Y, LANE), 0)
            ohy = jnp.where(suby == y, 1.0, 0.0)     # (32, 128)
            a = jax.lax.dot_general(
                tile, ohy, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # (128 x, 128 l)
            subx = jax.lax.broadcasted_iota(jnp.int32, (CTILE_X, LANE), 0)
            return jnp.sum(jnp.where(subx == x, a, 0.0),
                           axis=0, keepdims=True)    # (1, 128)

        hv = extract(pkh_ref)
        mv = extract(pkm_ref)
        usable = jnp.where(
            (hv != 0.0) & (hv >= thr) & (mv != 0.0) & (mv <= thr),
            1.0, 0.0)                                # (1, 128)
        counts = jax.lax.dot_general(
            usable, gcat, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)      # (1, 384)
        c0 = counts[:, 0:LANE]
        c1 = counts[:, LANE:2 * LANE]
        c2 = counts[:, 2 * LANE:3 * LANE]
        v = jnp.maximum(
            jnp.maximum(jnp.where(c0 > 0.5, e0, 0.0),
                        jnp.where(c1 > 0.5, e1, 0.0)),
            jnp.maximum(jnp.where(c2 > 0.5, e2, 0.0),
                        jnp.full((1, LANE), ed)))
        acc = acc + v * pose_mask * beam_w

    pad = jnp.concatenate([acc, jnp.zeros((7, LANE), jnp.float32)], axis=0)

    @pl.when(bi == 0)
    def _():
        out_ref[0] = pad

    @pl.when(bi > 0)
    def _():
        out_ref[0] = out_ref[0] + pad


@functools.partial(
    jax.jit,
    static_argnames=("hit_and_missed_dist",
                     "occupancy_threshold", "standard_deviation",
                     "scaling_factor", "q_chunk", "interpret",
                     "map_tile_rows"))
def greedy_cost_cov_mxu(tiles: CostTiles, origin, sensor_poses,
                        ranges, angles, beam_mask,
                        resolution,
                        hit_and_missed_dist: float = 0.075,
                        occupancy_threshold: float = 0.1,
                        standard_deviation: float = 1.0,
                        scaling_factor: float = 0.05,
                        q_chunk: int = 256,
                        interpret: bool = False,
                        map_idx=None,
                        map_tile_rows: int = 0):
    """Batched cost + covariance, gather-free (kernel_size=1 only).

    ``sensor_poses`` f32[Q, 3], ``ranges``/``angles``/``beam_mask``
    f32[Q, NB]. Returns ``(cost[Q], cov[Q, 3, 3])`` matching
    ``cost.greedy_endpoint_cost_and_covariance_fused`` up to f32
    summation order.

    ``origin`` may be f32[2] (one map) or f32[Q, 2] (per-query maps);
    with ``map_idx``/``map_tile_rows`` the concatenated-tile map folding
    of :func:`correlate_mxu.window_scores_mxu` applies here too.
    """
    res = jnp.asarray(resolution, jnp.float32)
    variance = standard_deviation * standard_deviation
    diff_ang = 1e-2
    d2_default = 2.0 * (2.0 * res) ** 2
    q, nb = ranges.shape
    bb = next(b for b in (8, 4, 2, 1) if nb % b == 0)

    origin = jnp.asarray(origin, jnp.float32)
    if origin.ndim == 1:
        origin = jnp.broadcast_to(origin[None, :], (q, 2))

    nty, ntx = tiles.tiles.shape[0], tiles.tiles.shape[1]
    if map_idx is not None:
        assert map_tile_rows > 0 and nty % map_tile_rows == 0
        nty = map_tile_rows
    hc = (nty - 1) * CSTRIDE_Y + CTILE_Y
    wc = (ntx - 1) * CSTRIDE_X + CTILE_X

    # --- XLA-side cell prep (identical math to the fused host path) ----
    thetas = jnp.stack([sensor_poses[:, 2],
                        sensor_poses[:, 2] + diff_ang,
                        sensor_poses[:, 2] - diff_ang], axis=1)  # [Q, 3]
    wa = thetas[:, :, None] + angles[:, None, :]                 # [Q,3,NB]
    cos_t = jnp.cos(wa)
    sin_t = jnp.sin(wa)
    hx = sensor_poses[:, 0, None, None] + ranges[:, None, :] * cos_t
    hy = sensor_poses[:, 1, None, None] + ranges[:, None, :] * sin_t
    mx = sensor_poses[:, 0, None, None] + \
        (ranges[:, None, :] - hit_and_missed_dist) * cos_t
    my = sensor_poses[:, 1, None, None] + \
        (ranges[:, None, :] - hit_and_missed_dist) * sin_t

    def cells(px, py):
        ox = origin[:, 0][:, None, None]
        oy = origin[:, 1][:, None, None]
        ix = jnp.floor((px - ox) / res).astype(jnp.int32)
        iy = jnp.floor((py - oy) / res).astype(jnp.int32)
        return ix, iy

    hix, hiy = cells(hx, hy)                                     # [Q,3,NB]
    mix, miy = cells(mx, my)

    # Lane cell offsets (k=1): 25 extended-patch + 2 x 9 theta lanes.
    ext_dx = np.tile(np.arange(-2, 3), _EXT)
    ext_dy = np.repeat(np.arange(-2, 3), _EXT)
    th_dx = np.tile(np.arange(-1, 2), 3)
    th_dy = np.repeat(np.arange(-1, 2), 3)

    def lane_cells(ix3, iy3):
        """[Q, 3, NB] base cells -> [Q, NB, N_LANES] lane cells."""
        bx = ix3[:, 0, :, None] + ext_dx[None, None, :]
        by = iy3[:, 0, :, None] + ext_dy[None, None, :]
        tx = jnp.concatenate(
            [ix3[:, 1, :, None] + th_dx[None, None, :],
             ix3[:, 2, :, None] + th_dx[None, None, :]], axis=-1)
        ty = jnp.concatenate(
            [iy3[:, 1, :, None] + th_dy[None, None, :],
             iy3[:, 2, :, None] + th_dy[None, None, :]], axis=-1)
        return jnp.concatenate([bx, tx], -1), \
            jnp.concatenate([by, ty], -1)

    hx_l, hy_l = lane_cells(hix, hiy)            # [Q, NB, 43]
    mx_l, my_l = lane_cells(mix, miy)

    # Padded-frame coords; off-map clamps into the zero ring (Unknown).
    def to_frame(v, hi):
        return jnp.clip(v + PAD_RING, 0, hi - 1)

    hy_f, my_f = to_frame(hy_l, hc), to_frame(my_l, hc)
    hx_f, mx_f = to_frame(hx_l, wc), to_frame(mx_l, wc)

    # One shared tile per beam covering both endpoints' lanes.
    min_y = jnp.minimum(hy_f.min(-1), my_f.min(-1))              # [Q, NB]
    min_x = jnp.minimum(hx_f.min(-1), mx_f.min(-1))
    tidy = jnp.clip(min_y // CSTRIDE_Y, 0, nty - 1).astype(jnp.int32)
    tidx = jnp.clip(min_x // CSTRIDE_X, 0, ntx - 1).astype(jnp.int32)

    q_chunk = max(1, min(q_chunk, q))
    qp = -(-q // q_chunk) * q_chunk
    if qp != q:
        pad_q = ((0, qp - q), (0, 0), (0, 0))
        hy_f = jnp.pad(hy_f, pad_q, mode="edge")
        hx_f = jnp.pad(hx_f, pad_q, mode="edge")
        my_f = jnp.pad(my_f, pad_q, mode="edge")
        mx_f = jnp.pad(mx_f, pad_q, mode="edge")
        tidy = jnp.pad(tidy, ((0, qp - q), (0, 0)), mode="edge")
        tidx = jnp.pad(tidx, ((0, qp - q), (0, 0)), mode="edge")
        beam_mask = jnp.pad(beam_mask, ((0, qp - q), (0, 0)))

    def pack(yf, xf):
        loc_y = yf - (tidy * CSTRIDE_Y)[:, :, None]
        loc_x = xf - (tidx * CSTRIDE_X)[:, :, None]
        pk = (loc_y * CTILE_X + loc_x).astype(jnp.int32)
        pk = jnp.pad(pk, ((0, 0), (0, 0), (0, LANE - N_LANES)))
        return pk[:, :, None, :]                     # [QP, NB, 1, 128]

    pk_h = pack(hy_f, hx_f)
    pk_m = pack(my_f, mx_f)
    tid = (tidy * ntx + tidx).reshape(qp, -1)        # [QP, NB]
    if map_idx is not None:
        mi = jnp.pad(jnp.asarray(map_idx, jnp.int32), (0, qp - q),
                     mode="edge")
        tid = tid + (mi * (map_tile_rows * ntx))[:, None]

    e_flat = jnp.stack([
        jnp.ones((), jnp.float32),
        jnp.exp(-0.5 * res * res / variance),
        jnp.exp(-1.0 * res * res / variance),
        jnp.exp(-0.5 * d2_default / variance),
    ])
    gcat = jnp.asarray(_selector_matrix())

    def tile_index_map(j):
        return lambda qi, bi, t, w, e: (t[qi * nb + bi * bb + j] // ntx,
                                        t[qi * nb + bi * bb + j] % ntx,
                                        0, 0)

    tile_specs = [pl.BlockSpec((1, 1, CTILE_Y, CTILE_X), tile_index_map(j),
                               memory_space=pltpu.VMEM)
                  for j in range(bb)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(q_chunk, nb // bb),
        in_specs=(tile_specs + [
            pl.BlockSpec((1, bb, 1, LANE),
                         lambda qi, bi, t, w, e: (qi, bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bb, 1, LANE),
                         lambda qi, bi, t, w, e: (qi, bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((LANE, 3 * LANE),
                         lambda qi, bi, t, w, e: (0, 0),
                         memory_space=pltpu.VMEM)]),
        out_specs=pl.BlockSpec((1, 8, LANE),
                               lambda qi, bi, t, w, e: (qi, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    call = pl.pallas_call(
        functools.partial(_kernel, nb, bb, occupancy_threshold),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((q_chunk, 8, LANE), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )

    outs = []
    for c0 in range(0, qp, q_chunk):
        s = slice(c0, c0 + q_chunk)
        outs.append(call(tid[s].reshape(-1),
                         beam_mask[s].astype(jnp.float32).reshape(-1),
                         e_flat,
                         *([tiles.tiles] * bb), pk_h[s], pk_m[s], gcat))
    raw = jnp.concatenate(outs, axis=0)[:q, 0, :7]   # [Q, 7]

    costs = -raw * scaling_factor                    # [Q, 7]
    steps = jnp.stack([res, res, jnp.full((), diff_ang)])
    grad = 0.5 * (costs[:, 1:4] - costs[:, 4:7]) / steps[None, :]
    cov = grad[:, :, None] * grad[:, None, :] + \
        0.01 * jnp.eye(3)[None, :, :]
    return costs[:, 0], cov
