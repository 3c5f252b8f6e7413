"""Parity tests for the Pallas MXU correlation kernel (interpret mode).

The kernel (ops/pallas/correlate_mxu.py) must reproduce
``scoring.window_scores`` — the window-score oracle whose semantics mirror
the reference's correlative sweep (scan_matcher_real_time_correlative.cpp:
98-118) — for every supported window size, at map edges, and across theta
chunking boundaries. CPU interpret mode checks the kernel MATH; Mosaic
acceptance on real hardware is exercised by bench.py (the tunnel-only
compile path cannot run in CI).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from my_lidar_graph_slam_tpu.ops import scoring
from my_lidar_graph_slam_tpu.ops.pallas import correlate_mxu as cm


def _arc_indices(rng, q, nt, nb, h, w, margin):
    """Random per-theta index lattices with |step| <= 1 cell drift, the
    chord-step property the kernel's tile budget assumes."""
    base_ix = rng.integers(margin, w - margin, size=(q, 1, nb))
    base_iy = rng.integers(margin, h - margin, size=(q, 1, nb))
    ix = base_ix + np.cumsum(rng.integers(-1, 2, size=(q, nt, nb)), axis=1)
    iy = base_iy + np.cumsum(rng.integers(-1, 2, size=(q, nt, nb)), axis=1)
    return jnp.asarray(ix, jnp.int32), jnp.asarray(iy, jnp.int32)


@pytest.mark.parametrize("win", [1, 2, 3])
def test_window_scores_mxu_matches_oracle(win):
    rng = np.random.default_rng(0)
    h, w = 260, 300
    vm = jnp.asarray(rng.random((h, w)), jnp.float32)
    tiles = cm.make_mxu_tiles(vm)

    q, nt, nb = 3, 61, 23
    ix, iy = _arc_indices(rng, q, nt, nb, h, w, margin=40)
    wgt = jnp.asarray(rng.random((q, nb)), jnp.float32)

    ref = scoring.window_scores(
        vm, ix, iy, wgt[:, None, :] * jnp.ones((q, nt, nb)), win, win)
    got = cm.window_scores_mxu(tiles, ix, iy, wgt, win, win,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=1e-4)


def test_window_scores_mxu_edge_clamp_reads_unknown_zero():
    """Windows falling off the map must read the Unknown sentinel 0
    (score_function_pixel_accurate.cpp:51-53) exactly like the oracle."""
    rng = np.random.default_rng(1)
    h, w = 180, 150
    vm = jnp.asarray(rng.random((h, w)) + 0.5, jnp.float32)
    tiles = cm.make_mxu_tiles(vm)

    q, nt, nb = 2, 30, 8
    # Endpoints hugging (and crossing) every border.
    base = np.stack(np.meshgrid([-2, 1, h - 2, h + 3], [0, w - 1]),
                    axis=-1).reshape(-1, 2)[:nb]
    iy = np.broadcast_to(base[:, 0], (q, nt, nb)).copy()
    ix = np.broadcast_to(base[:, 1], (q, nt, nb)).copy()
    drift = np.cumsum(rng.integers(-1, 2, size=(q, nt, nb)), axis=1)
    iy = jnp.asarray(iy + drift, jnp.int32)
    ix = jnp.asarray(ix + drift, jnp.int32)
    wgt = jnp.ones((q, nb), jnp.float32)

    win = 2
    ref = scoring.window_scores(
        vm, ix, iy, jnp.ones((q, nt, nb), jnp.float32), win, win)
    got = cm.window_scores_mxu(tiles, ix, iy, wgt, win, win,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=1e-4)


def test_window_scores_mxu_chunk_boundaries():
    """NT not divisible by the chunk size pads with edge replication —
    the padded thetas must not corrupt real ones."""
    rng = np.random.default_rng(2)
    h, w = 200, 200
    vm = jnp.asarray(rng.random((h, w)), jnp.float32)
    tiles = cm.make_mxu_tiles(vm)

    q, nb = 2, 11
    for nt in (1, 7, 56, 57, 111):
        ix, iy = _arc_indices(rng, q, nt, nb, h, w, margin=30)
        wgt = jnp.asarray(rng.random((q, nb)), jnp.float32)
        ref = scoring.window_scores(
            vm, ix, iy, wgt[:, None, :] * jnp.ones((q, nt, nb)), 2, 2)
        got = cm.window_scores_mxu(tiles, ix, iy, wgt, 2, 2,
                                   interpret=True)
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=0, atol=1e-4)


def test_zero_weight_beams_do_not_contribute():
    rng = np.random.default_rng(3)
    h, w = 160, 160
    vm = jnp.asarray(rng.random((h, w)), jnp.float32)
    tiles = cm.make_mxu_tiles(vm)
    q, nt, nb = 1, 20, 6
    ix, iy = _arc_indices(rng, q, nt, nb, h, w, margin=20)
    wgt = np.ones((q, nb), np.float32)
    wgt[:, ::2] = 0.0
    # Zero-weight beams may even violate the drift bound: scatter them.
    ix = np.array(ix)
    ix[:, :, ::2] = rng.integers(0, w, size=ix[:, :, ::2].shape)
    ix = jnp.asarray(ix, jnp.int32)
    ref = scoring.window_scores(
        vm, ix, iy, jnp.asarray(wgt)[:, None, :] * jnp.ones((q, nt, nb)),
        2, 2)
    got = cm.window_scores_mxu(tiles, ix, iy, jnp.asarray(wgt), 2, 2,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=1e-4)
