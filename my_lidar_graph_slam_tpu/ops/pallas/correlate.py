"""Pallas correlation kernel: windowed scan-to-map scoring.

Computes ``scores[t, dy, dx] = sum_b M[iy[t,b] + dy, ix[t,b] + dx]`` for all
theta candidates and a (2*win+1)^2 offset window — the inner loop of
correlative matching (scan_matcher_real_time_correlative.cpp:207-224) — with
the occupancy map resident in VMEM.

Design notes (see /opt/skills/guides/pallas_guide.md):

 * The map (<= ~8 MB f32) is a single full VMEM block shared by all
   programs; the per-(theta, beam) tile starts are packed into ONE int32
   SMEM array (``y << 16 | x``), whole-array mapped (SMEM blocks must be
   unblocked or tile-aligned).
 * Each grid program handles one theta; the beam loop accumulates one
   dynamically-offset ``(8, 128)`` map tile per beam into a VMEM scratch
   accumulator. The dynamic start re-aligns sublanes/lanes so lane 0 of
   the accumulator is offset dx = -win_x and sublane 0 is dy = -win_y; the
   caller slices the [WY, WX] corner.
 * Gated/out-of-map beams need no weight array: their packed start points
   at the map's zero padding, so their tile contributes nothing.

``window_scores_pallas`` is a drop-in replacement for
``scoring.window_scores`` (same [NT, WX, WY] output, dx-major).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _correlate_kernel(packed_ref, map_ref, out_ref, acc_ref):
    nb = packed_ref.shape[1]
    t = pl.program_id(0)

    acc_ref[...] = jnp.zeros_like(acc_ref)

    def body(b, _):
        v = packed_ref[t, b]
        y0 = v >> 16
        x0 = v & 0xFFFF
        acc_ref[...] += map_ref[pl.ds(y0, 8), pl.ds(x0, 128)]
        return 0

    jax.lax.fori_loop(0, nb, body, 0)
    out_ref[...] = acc_ref[...][None]


@functools.partial(jax.jit, static_argnames=("win_x", "win_y"))
def window_scores_pallas(value_map, ix, iy, beam_weight,
                         win_x: int, win_y: int):
    """Drop-in Pallas replacement for ``scoring.window_scores``.

    ``value_map``: f32[H, W]; ``ix``/``iy``: int32[NT, NB]; ``beam_weight``:
    f32[NT, NB] treated as a 0/1 gate (the correlative matcher's beam mask).
    Returns f32[NT, WX, WY] with WX = 2*win_x + 1 (dx-major, matching the
    XLA path).
    """
    h, w = value_map.shape
    nt, nb = ix.shape
    assert win_x <= 60 and win_y <= 3, "window must fit one (8,128) tile"

    # Pad: 2x window radius before (so starts are non-negative), tile
    # extent + one zero tile row/col block after (the dump zone for gated
    # beams); align to (8, 128).
    pad_lo_y, pad_lo_x = 2 * win_y, 2 * win_x
    pad_hi_y = 16
    pad_hi_x = 256
    padded = jnp.pad(value_map,
                     ((pad_lo_y, pad_hi_y), (pad_lo_x, pad_hi_x)))
    ph = h + pad_lo_y + pad_hi_y
    pw = w + pad_lo_x + pad_hi_x
    pw_al = ((pw + 127) // 128) * 128
    ph_al = ((ph + 7) // 8) * 8
    padded = jnp.pad(padded, ((0, ph_al - ph), (0, pw_al - pw)))

    # Zero-tile start for gated beams: the far padding corner.
    dump_y = ph_al - 8
    dump_x = pw_al - 128

    ok = (ix >= -win_x) & (ix <= w - 1 + win_x) & \
         (iy >= -win_y) & (iy <= h - 1 + win_y) & (beam_weight > 0)
    sx = jnp.where(ok, ix + win_x, dump_x).astype(jnp.int32)
    sy = jnp.where(ok, iy + win_y, dump_y).astype(jnp.int32)
    packed = (sy << 16) | sx

    out = pl.pallas_call(
        _correlate_kernel,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((ph_al, pw_al), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, 128), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nt, 8, 128), value_map.dtype),
        scratch_shapes=[pltpu.VMEM((8, 128), value_map.dtype)],
    )(packed, padded)

    wy = 2 * win_y + 1
    wx = 2 * win_x + 1
    scores = out[:, :wy, :wx]             # [NT, dy, dx]
    return jnp.swapaxes(scores, -1, -2)   # [NT, dx, dy]
