"""Brute-force correlative window scoring on the MXU (Pallas TPU kernel).

The correlative matcher's hot loop (reference:
scan_matcher_real_time_correlative.cpp:50-145) evaluates
``score[t, dx, dy] = sum_b w_b * M[iy(t, b) + dy, ix(t, b) + dx]`` over a
full (theta, dx, dy) window — an irregular gather workload. Measured on
v5e, XLA's scalar-gather path services ~100 M map reads/s, which caps any
take-based implementation at roughly one CPU core's throughput (see
BASELINE.md "device primitive physics").

This kernel removes the scalar gathers entirely:

* The map is pre-tiled into overlapping 128x128 VMEM-sized tiles with a
  64-cell stride (:func:`make_mxu_tiles`). Consecutive theta candidates
  move a beam endpoint by at most one cell (the search step is the
  chord-equation step, scan_matcher_real_time_correlative.cpp:156-175),
  so the arc swept by one beam across a <=56-theta chunk — plus the
  (dx, dy) window — always fits inside a single 128x128 tile.
* A scalar-prefetch grid over (query, beam) DMAs the per-(beam, chunk)
  tiles into VMEM; per-theta map rows are extracted with a one-hot
  matmul on the MXU, and the (dx, dy) window values with VPU iota
  masks — zero data-dependent gathers anywhere.
* Scores accumulate over beams in a VMEM block (the beam axis is the
  innermost grid dimension), one f32 add per candidate per beam, matching
  the summation semantics of ``scoring.window_scores``.

Out-of-map reads return the Unknown sentinel 0 exactly as
``GridMap::Value(idx, unknown)`` does (score_function_pixel_accurate.cpp:
51-53): the tile frame carries a zero ring, far-outside endpoints clamp
into it, and window offsets that fall off a tile produce all-zero one-hot
rows (which read as 0).
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128          # tile side (sublane/lane aligned)
STRIDE = 64         # overlap stride: any <=65-cell extent fits one tile
PAD_RING = 8        # zero ring so near-edge windows read Unknown 0
LANE = 128          # lane-tile width: per-chunk index arrays pad to this
DEF_THETA_CHUNK = 56


class MxuTiles(NamedTuple):
    """Overlapped 128x128 tiling of a padded value map.

    ``tiles``: f32[NTY, NTX, 128, 128], tile (ty, tx) = padded map rows
    [ty*64, ty*64+128) x cols [tx*64, tx*64+128). ``tiles[..., 0:PAD_RING]``
    rows/cols along the map border are the zero (Unknown) ring.
    """
    tiles: jnp.ndarray


@functools.partial(jax.jit, static_argnames=("h", "w"))
def _make_tiles(value_map, h: int, w: int):
    nty = -(-(h + 2 * PAD_RING - TILE) // STRIDE) + 1
    ntx = -(-(w + 2 * PAD_RING - TILE) // STRIDE) + 1
    hc = (nty - 1) * STRIDE + TILE
    wc = (ntx - 1) * STRIDE + TILE
    vp = jnp.pad(value_map,
                 ((PAD_RING, hc - h - PAD_RING),
                  (PAD_RING, wc - w - PAD_RING)))
    ys = (jnp.arange(nty) * STRIDE)[:, None] + jnp.arange(TILE)  # [NTY,128]
    rows = vp[ys.reshape(-1)].reshape(nty, TILE, wc)
    xs = (jnp.arange(ntx) * STRIDE)[:, None] + jnp.arange(TILE)
    tiles = rows[:, :, xs.reshape(-1)].reshape(nty, TILE, ntx, TILE)
    return jnp.transpose(tiles, (0, 2, 1, 3))


def make_mxu_tiles(value_map) -> MxuTiles:
    """Precompute the overlapped tile array for one map (done once per
    map, like the reference's coarse-map precompute)."""
    h, w = value_map.shape
    return MxuTiles(_make_tiles(value_map, h, w))


def _kernel_bb(tc, wxn, wyn, nb, bb, mxu_dtype, tid_ref, w_ref, *refs):
    """One (query, chunk, beam-block) step: BB beams x TC thetas x window.

    Mosaic/v5e layout rules this kernel obeys (each cost a real debugging
    session on hardware; CPU interpret mode accepts violations):

    * The theta-chunk axis lives in the GRID (not a Python loop over lane
      slices): Mosaic v5e rejects broadcasts of vectors whose lane offset
      is non-zero ("Invalid input layout"), so every in-kernel slice must
      start at lane 0 — one chunk per grid step guarantees that.
    * The scalar-prefetch operands (tile ids, beam weights) are FLAT 1-D
      arrays: SMEM pads a multi-dim array's last dimension to 128 lanes,
      which blows a [QC, NB, NCH] int32 array from 46 KB to 1.5 MB — past
      the 1 MB SMEM ("Allocation would exceed memory ... space=smem").
      ``w_ref`` is f32[QC*NB] indexed ``qi*nb + bi*bb + j`` (a (1, 1)-
      blocked tensor operand is likewise rejected by Mosaic's block
      rules; prefetch refs are exempt).
    * Transposed orientation throughout — per-theta coordinates along
      LANES, map y/x along SUBLANES — so no in-kernel transposes.
    * Tile ids are PACKED (tidy * ntx + tidx) into one flat i32 array —
      halving the SMEM prefetch footprint doubles the q_chunk the 1 MB
      SMEM admits, which halves kernel launches at large Q (each launch
      carries ~8 ms fixed overhead); the index maps unpack with // and %.

    Beam-blocking (round 4): the measured per-grid-step FIXED cost on v5e
    is ~0.30 us (grid machinery, out-block read-modify-write, DMA
    descriptor setup) — at one beam per step that floor was 54% of total
    kernel time (229 of 422 us/query at Q=1024, NCH=4, NB=192). Each step
    now consumes ``bb`` beams: ``bb`` tile BlockSpecs DMA the per-beam
    tiles, the per-beam contributions accumulate in a register, and the
    out block is touched once — dividing the floor by ``bb`` (measured:
    431 -> 243 us/query at bb=8; saturated by the remaining per-beam
    compute above bb=8).
    """
    tile_refs = refs[:bb]
    iyl_ref, ixl_ref, out_ref = refs[bb], refs[bb + 1], refs[bb + 2]
    qi = pl.program_id(0)
    bi = pl.program_id(2)
    rows = tc * wyn

    acc = jnp.zeros((8, rows), jnp.float32)
    for j in range(bb):
        tile = tile_refs[j][0, 0]                     # (128, 128) f32
        iyl = iyl_ref[0, j, 0]                        # (1, LANE) int32
        ixl = ixl_ref[0, j, 0]
        beam_w = w_ref[qi * nb + bi * bb + j]

        y_ch = iyl[:, :tc]                            # (1, TC), lane off 0
        x_ch = ixl[:, :tc]

        # One-hot rows (transposed): OHY[y, r] = (y == iyl[r % TC] + dy).
        sub = jax.lax.broadcasted_iota(jnp.int32, (TILE, tc), 0)
        ohy = jnp.concatenate(
            [jnp.where(sub == y_ch + dy, 1.0, 0.0).astype(mxu_dtype)
             for dy in range(-(wyn // 2), wyn // 2 + 1)],
            axis=1)                                   # (128, TC*WYN)
        # A[x, r] = sum_y tile[y, x] * OHY[y, r] — row extraction on MXU.
        # mxu_dtype=bfloat16 rounds only the tile values (<= 2^-9
        # relative; the one-hot operand is exact in bf16) with f32
        # accumulation — measured on v5e it buys nothing (the kernel is
        # step-overhead/VPU bound, not matmul bound), so float32 stays
        # the default exact path.
        a = jax.lax.dot_general(
            tile.astype(mxu_dtype), ohy, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)       # (128, TC*WYN)

        sub2 = jax.lax.broadcasted_iota(jnp.int32, (TILE, rows), 0)
        x_rep = jnp.concatenate([x_ch] * wyn, axis=1)  # (1, TC*WYN)
        cols = [jnp.sum(jnp.where(sub2 == x_rep + dx, a, 0.0),
                        axis=0, keepdims=True)        # (1, TC*WYN)
                for dx in range(-(wxn // 2), wxn // 2 + 1)]
        if wxn < 8:
            cols.append(jnp.zeros((8 - wxn, rows), jnp.float32))
        acc = acc + jnp.concatenate(cols, axis=0) * beam_w

    @pl.when(bi == 0)
    def _():
        out_ref[0, 0] = acc

    @pl.when(bi > 0)
    def _():
        out_ref[0, 0] = out_ref[0, 0] + acc


def max_theta_chunk(win_x: int, win_y: int) -> int:
    """Largest chunk the tile-overlap budget admits at this window."""
    return (TILE - STRIDE + 1) - (2 * max(win_x, win_y) + 1)


def auto_theta_chunk(nt: int, win_x: int, win_y: int) -> int:
    """Chunk size minimizing the padded theta lattice ``nch * tc``.

    Kernel work is proportional to the padded lattice (each grid step scores
    ``tc`` thetas and there are ``ceil(nt / tc)`` chunk steps), so the
    fixed DEF_THETA_CHUNK=56 wastes up to 11% at NT=201 (4 x 56 = 224
    slots); picking the smallest tc that still needs the same number of
    chunks (tc = ceil(nt / nch_min)) pads at most nch - 1 slots."""
    tc_max = max_theta_chunk(win_x, win_y)
    nch = -(-nt // tc_max)
    return -(-nt // nch)


@functools.partial(
    jax.jit,
    static_argnames=("win_x", "win_y", "theta_chunk", "q_chunk",
                     "interpret", "mxu_dtype", "map_tile_rows"))
def window_scores_mxu(tiles: MxuTiles, ix, iy, beam_weight,
                      win_x: int, win_y: int,
                      theta_chunk=None,
                      q_chunk: int = 16,
                      interpret: bool = False,
                      mxu_dtype=jnp.float32,
                      map_idx=None,
                      map_tile_rows: int = 0):
    """Scores over all (theta, dx, dy) candidates, gather-free.

    ``ix``/``iy``: int32[Q, NT, NB] base hit cells in RAW map coordinates
    (same convention as :func:`scoring.window_scores`); the theta axis must
    be an ordered chord-step lattice so that any ``theta_chunk``
    consecutive thetas move a weighted beam endpoint by at most
    ``theta_chunk`` cells (guaranteed when the step comes from
    :func:`matchers.search_step_theta` — one cell per step at max range).
    ``beam_weight``: f32[Q, NB]; zero-weight beams may violate the drift
    bound freely (their tiles clamp and their contribution is zero).

    Returns f32[Q, NT, 2*win_x+1, 2*win_y+1] equal (up to f32 summation
    order) to ``scoring.window_scores(value_map, ix, iy, w, win_x, win_y)``.

    **Map folding** (``map_idx``/``map_tile_rows``): M same-shape maps'
    tile arrays concatenated along axis 0 can serve all their queries in
    ONE launch set — per-query coordinates stay in the OWN map's frame
    and ``map_idx`` (i32[Q]) offsets each query's tile ids by
    ``map_idx * map_tile_rows * NTX`` (``map_tile_rows`` = one map's
    NTY). The kernel itself is unchanged; only the prefetch values and
    the tile array's leading dimension grow.
    """
    assert win_x <= 3 and win_y <= 3
    q, nt, nb = ix.shape
    tc = (auto_theta_chunk(nt, win_x, win_y) if theta_chunk is None
          else theta_chunk)
    assert tc + 2 * max(win_x, win_y) + 1 <= TILE - STRIDE + 1, \
        "theta chunk arc + window must fit the tile overlap budget"
    # Beams per grid step (see _kernel_bb): largest power of two <= 8
    # dividing NB. Production beam counts are 64-multiples, so bb=8.
    bb = next(b for b in (8, 4, 2, 1) if nb % b == 0)
    nty, ntx = tiles.tiles.shape[0], tiles.tiles.shape[1]
    if map_idx is not None:
        assert map_tile_rows > 0 and nty % map_tile_rows == 0
        nty = map_tile_rows           # per-map tile grid for clamping
    hc = (nty - 1) * STRIDE + TILE
    wc = (ntx - 1) * STRIDE + TILE
    nch = -(-nt // tc)
    ntp = nch * tc
    wxn = 2 * win_x + 1
    wyn = 2 * win_y + 1
    rows = tc * wyn

    # SMEM budget: the scalar-prefetch operands (one PACKED tile-id i32
    # flat of q_chunk*NB*NCH, plus the q_chunk*NB f32 weights) must fit
    # the 1 MB SMEM alongside control state. Clamp q_chunk automatically.
    smem_budget = 700_000
    qc_lim = max(1, smem_budget // (nb * (4 * nch + 4)))
    # Clamp by Q too: padding a Q=1 frontend match out to a 16-query
    # chunk ran 16x the useful kernel work per keyframe.
    q_chunk = max(1, min(q_chunk, qc_lim, q))

    qp = -(-q // q_chunk) * q_chunk
    if ntp != nt or qp != q:
        ix = jnp.pad(ix, ((0, qp - q), (0, ntp - nt), (0, 0)), mode="edge")
        iy = jnp.pad(iy, ((0, qp - q), (0, ntp - nt), (0, 0)), mode="edge")
        beam_weight = jnp.pad(beam_weight, ((0, qp - q), (0, 0)),
                              mode="edge")

    # Padded-frame coordinates, clamped into the tile frame (far-outside
    # endpoints land in the zero ring -> read Unknown 0).
    iyp = jnp.clip(iy + PAD_RING, 0, hc - 1)
    ixp = jnp.clip(ix + PAD_RING, 0, wc - 1)

    # Tile choice per (query, beam, chunk): cover the chunk's arc bbox.
    iy4 = iyp.reshape(qp, nch, tc, -1)
    ix4 = ixp.reshape(qp, nch, tc, -1)
    tidy = jnp.clip((iy4.min(axis=2) - win_y) // STRIDE, 0, nty - 1)
    tidx = jnp.clip((ix4.min(axis=2) - win_x) // STRIDE, 0, ntx - 1)
    tidy = tidy.astype(jnp.int32)                    # [QP, NCH, NB]
    tidx = tidx.astype(jnp.int32)

    # Tile-local coordinates, laid out [QP, NB, NCH, 1, LANE]: each chunk's
    # TC indices are padded out to a full 128-lane tile, and the chunk axis
    # is a GRID dimension, so every in-kernel slice starts at lane 0 (see
    # _kernel_bb). The trailing (1, LANE) block spans the array's last two
    # dims — a Mosaic block-shape requirement — and is lane-contiguous.
    def chunk_pad(v4, tid):
        loc = v4 - (tid * STRIDE)[:, :, None, :]     # [QP, NCH, TC, NB]
        loc = jnp.pad(loc, ((0, 0), (0, 0), (0, LANE - tc), (0, 0)))
        loc = jnp.transpose(loc, (0, 3, 1, 2))       # [QP, NB, NCH, LANE]
        return loc.astype(jnp.int32)[:, :, :, None, :]

    iyl = chunk_pad(iy4, tidy)
    ixl = chunk_pad(ix4, tidx)
    # Flat PACKED [QP * NB * NCH] prefetch layout (see _kernel_bb doc).
    tid = jnp.transpose(tidy * ntx + tidx, (0, 2, 1)).reshape(qp, -1)
    if map_idx is not None:
        mi = jnp.pad(jnp.asarray(map_idx, jnp.int32), (0, qp - q),
                     mode="edge")
        tid = tid + (mi * (map_tile_rows * ntx))[:, None]

    # One tile BlockSpec per beam of the block; index maps bind j.
    def tile_index_map(j):
        return lambda qi, ch, bi, t, w: (
            t[(qi * nb + bi * bb + j) * nch + ch] // ntx,
            t[(qi * nb + bi * bb + j) * nch + ch] % ntx, 0, 0)

    tile_specs = [pl.BlockSpec((1, 1, TILE, TILE), tile_index_map(j),
                               memory_space=pltpu.VMEM)
                  for j in range(bb)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(q_chunk, nch, nb // bb),
        in_specs=(tile_specs + [
            pl.BlockSpec((1, bb, 1, 1, LANE),
                         lambda qi, ch, bi, t, w: (qi, bi, ch, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bb, 1, 1, LANE),
                         lambda qi, ch, bi, t, w: (qi, bi, ch, 0, 0),
                         memory_space=pltpu.VMEM)]),
        out_specs=pl.BlockSpec(
            (1, 1, 8, rows), lambda qi, ch, bi, t, w: (qi, ch, 0, 0),
            memory_space=pltpu.VMEM),
    )
    call = pl.pallas_call(
        functools.partial(_kernel_bb, tc, wxn, wyn, nb, bb, mxu_dtype),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((q_chunk, nch, 8, rows),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
        interpret=interpret,
    )

    outs = []
    for c0 in range(0, qp, q_chunk):
        s = slice(c0, c0 + q_chunk)
        outs.append(call(tid[s].reshape(-1),
                         beam_weight[s].astype(jnp.float32).reshape(-1),
                         *([tiles.tiles] * bb), iyl[s], ixl[s]))
    raw = jnp.concatenate(outs, axis=0)              # [QP, NCH, 8, TC*WYN]

    # Decode: lane r of chunk ch is (dyi, tci) = dyi*TC + tci; sublane is
    # dxi (first WXN rows). -> [Q, NT, WXN, WYN].
    sc = raw.reshape(qp, nch, 8, wyn, tc)
    sc = jnp.transpose(sc, (0, 1, 4, 2, 3))          # [QP, NCH, TC, 8, WYN]
    sc = sc.reshape(qp, ntp, 8, wyn)[:q, :nt, :wxn, :]
    return sc


def theta_chunk_supported(win_x: int, win_y: int,
                          tc: int = DEF_THETA_CHUNK) -> bool:
    """Whether (win_x, win_y) fits the tile overlap budget at chunk tc."""
    return (win_x <= 3 and win_y <= 3 and
            tc + 2 * max(win_x, win_y) + 1 <= TILE - STRIDE + 1)


def available() -> bool:
    """True when the current default backend can run the Mosaic kernel."""
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False
