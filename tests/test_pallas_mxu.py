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


def test_correlative_match_mxu_equals_brute_batch():
    """correlative_match_mxu_batch == correlative_match_batch on a real
    scene (identical lattice, tie order, cost/covariance)."""
    import jax.numpy as jnp
    from my_lidar_graph_slam_tpu.io import synth
    from my_lidar_graph_slam_tpu.ops import grid as gridops
    from my_lidar_graph_slam_tpu.ops import matchers, matchers_mxu, raycast

    res = 0.05
    segs = synth.default_world()
    beam = np.linspace(-np.pi / 2, np.pi / 2, 181)
    nbcap = 192
    g = gridops.empty(512, 512, res, center=np.zeros(2))
    rng = np.random.default_rng(0)

    def scan_at(p):
        r = synth.raycast_segments(p[:2], p[2] + beam, segs, 12.0)
        ranges = np.zeros(nbcap, np.float32)
        angles = np.zeros(nbcap, np.float32)
        valid = np.zeros(nbcap, bool)
        ranges[:181] = r
        angles[:181] = beam
        valid[:181] = True
        return ranges, angles, valid

    for i in range(3):
        p = np.concatenate([rng.uniform(-0.3, 0.3, 2),
                            rng.uniform(-0.2, 0.2, 1)])
        r, a, v = scan_at(p)
        g = raycast.integrate_scan(
            g, jnp.asarray(p, jnp.float32), jnp.asarray(r), jnp.asarray(a),
            jnp.asarray(v), 0.01, 12.0, max_steps=256)

    qn = 4
    ips, rs, as_, vs = [], [], [], []
    for i in range(qn):
        p = np.concatenate([rng.uniform(-0.15, 0.15, 2),
                            rng.uniform(-0.1, 0.1, 1)])
        r, a, v = scan_at(p)
        ips.append((p + rng.uniform(-0.05, 0.05, 3)).astype(np.float32))
        rs.append(r)
        as_.append(a)
        vs.append(v)

    vals = gridops.values(g)
    win = 2
    win_t = matchers.static_max_theta_window(res, 12.0, 0.3)
    args = (
        jnp.asarray(np.stack(rs)), jnp.asarray(np.stack(as_)),
        jnp.asarray(np.stack(vs)),
        jnp.zeros(qn, jnp.float32), jnp.full(qn, 12.0, jnp.float32),
        jnp.zeros((qn, 3), jnp.float32),
        jnp.asarray(12.0, jnp.float32), jnp.asarray(0.3, jnp.float32),
        jnp.asarray(0.01, jnp.float32), jnp.asarray(12.0, jnp.float32),
        jnp.asarray(0.0, jnp.float32),
        jnp.full(qn, 181.0, jnp.float32),
    )
    ip = jnp.asarray(np.stack(ips))

    brute = matchers.correlative_match_batch(
        vals, g, ip, *args, win_x=win, win_y=win, win_theta_max=win_t)
    tiles = matchers_mxu.make_tiles(vals)
    mxu = matchers_mxu.correlative_match_mxu_batch(
        vals, tiles, g, ip, *args, win_x=win, win_y=win,
        win_theta_max=win_t, interpret=True)

    np.testing.assert_array_equal(np.asarray(mxu.pose_found),
                                  np.asarray(brute.pose_found))
    np.testing.assert_allclose(np.asarray(mxu.estimated_pose),
                               np.asarray(brute.estimated_pose), atol=1e-5)
    np.testing.assert_allclose(np.asarray(mxu.normalized_score),
                               np.asarray(brute.normalized_score),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(mxu.covariance),
                               np.asarray(brute.covariance),
                               rtol=1e-3, atol=1e-6)


def test_wide_window_scores_match_oracle():
    """window_scores_mxu_wide (7x7-block assembly for big windows — the
    loop-detection path) == the window_scores oracle."""
    from my_lidar_graph_slam_tpu.ops import matchers_mxu
    rng = np.random.default_rng(5)
    h, w = 220, 240
    vm = jnp.asarray(rng.random((h, w)), jnp.float32)
    tiles = cm.make_mxu_tiles(vm)
    q, nt, nb = 2, 25, 9
    ix, iy = _arc_indices(rng, q, nt, nb, h, w, margin=45)
    wgt = jnp.asarray(rng.random((q, nb)), jnp.float32)
    for win in (5, 10):
        ref = scoring.window_scores(
            vm, ix, iy, wgt[:, None, :] * jnp.ones((q, nt, nb)), win, win)
        got = matchers_mxu.window_scores_mxu_wide(
            tiles, ix, iy, wgt, win, win, interpret=True)
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=0, atol=1e-4)


def test_window_scores_mxu_bf16_close_to_f32():
    """mxu_dtype=bfloat16 rounds only the tile values (the one-hot operand
    is exact in bf16), so scores deviate by <= NB * 2^-9 * max|v| with f32
    accumulation — and the argmax must agree on a workload with clear
    structure (separated score levels)."""
    rng = np.random.default_rng(7)
    h, w = 260, 300
    vm = jnp.asarray(rng.random((h, w)), jnp.float32)
    tiles = cm.make_mxu_tiles(vm)

    q, nt, nb = 2, 41, 31
    ix, iy = _arc_indices(rng, q, nt, nb, h, w, margin=40)
    wgt = jnp.asarray(rng.random((q, nb)), jnp.float32)

    f32 = np.asarray(cm.window_scores_mxu(tiles, ix, iy, wgt, 3, 3,
                                          interpret=True))
    bf16 = np.asarray(cm.window_scores_mxu(tiles, ix, iy, wgt, 3, 3,
                                           interpret=True,
                                           mxu_dtype=jnp.bfloat16))
    # Per-read relative rounding is <= 2^-9; the summed absolute error is
    # bounded by nb * 2^-9 (values and weights in [0, 1]).
    assert np.max(np.abs(bf16 - f32)) <= nb * 2.0 ** -9 + 1e-4


def test_auto_theta_chunk_minimizes_lattice():
    """auto_theta_chunk must keep the chunk count minimal and shrink the
    padded lattice vs the fixed default (11% of kernel work at NT=201)."""
    for nt in (1, 9, 56, 57, 201, 224, 400):
        for win in (1, 3):
            tc = cm.auto_theta_chunk(nt, win, win)
            assert cm.theta_chunk_supported(win, win, tc)
            nch = -(-nt // tc)
            tc_max = cm.max_theta_chunk(win, win)
            assert nch == -(-nt // tc_max)          # minimal chunk count
            assert nch * tc - nt < nch              # minimal padding
    assert cm.auto_theta_chunk(201, 2, 2) * \
        -(-201 // cm.auto_theta_chunk(201, 2, 2)) == 204


def test_greedy_cost_cov_mxu_matches_fused():
    """The Pallas cost+covariance kernel must reproduce the fused host
    path exactly (identical read set and semantics; f32 order only)."""
    from my_lidar_graph_slam_tpu.io import synth
    from my_lidar_graph_slam_tpu.ops import cost as costops
    from my_lidar_graph_slam_tpu.ops import grid as gridops, raycast
    from my_lidar_graph_slam_tpu.ops.pallas import greedy_cost_mxu as gc

    RES = 0.05
    NB = 192
    segs = synth.default_world()
    beam = np.linspace(-np.pi / 2, np.pi / 2, 181)
    g = gridops.empty(512, 512, RES, center=np.array([0.0, 0.0]))
    rng = np.random.default_rng(0)
    for i in range(3):
        p = np.array([0.0, 0.0, 0.3]) + np.concatenate(
            [rng.uniform(-0.3, 0.3, 2), rng.uniform(-0.2, 0.2, 1)])
        r = synth.raycast_segments(p[:2], p[2] + beam, segs, 20.0)
        ranges = np.zeros(NB, np.float32)
        angles = np.zeros(NB, np.float32)
        valid = np.zeros(NB, bool)
        ranges[:181] = r
        angles[:181] = beam
        valid[:181] = True
        g = raycast.integrate_scan(
            g, jnp.asarray(p, jnp.float32), jnp.asarray(ranges),
            jnp.asarray(angles), jnp.asarray(valid), 0.01, 20.0,
            max_steps=448)

    vals = gridops.values(g)
    tiles = gc.make_cost_tiles(vals)
    q = 4
    poses = np.zeros((q, 3), np.float32)
    R = np.zeros((q, NB), np.float32)
    A = np.zeros((q, NB), np.float32)
    M = np.zeros((q, NB), np.float32)
    for qi in range(q):
        p = np.array([0.0, 0.0, 0.3]) + np.concatenate(
            [rng.uniform(-0.2, 0.2, 2), rng.uniform(-0.15, 0.15, 1)])
        r = synth.raycast_segments(p[:2], p[2] + beam, segs, 20.0)
        poses[qi] = p
        R[qi, :181] = r + rng.normal(0, 0.01, r.shape)
        A[qi, :181] = beam
        M[qi, :181] = (r > 0.05) & (r < 19.0)

    c_k, cov_k = gc.greedy_cost_cov_mxu(
        tiles, g.origin, jnp.asarray(poses), jnp.asarray(R),
        jnp.asarray(A), jnp.asarray(M), resolution=RES, interpret=True)
    for qi in range(q):
        c_ref, cov_ref = costops.greedy_endpoint_cost_and_covariance_fused(
            vals, g, jnp.asarray(poses[qi]), jnp.asarray(R[qi]),
            jnp.asarray(A[qi]), jnp.asarray(M[qi]), kernel_size=1)
        np.testing.assert_allclose(np.asarray(c_k[qi]), np.asarray(c_ref),
                                   rtol=0, atol=1e-4)
        np.testing.assert_allclose(np.asarray(cov_k[qi]),
                                   np.asarray(cov_ref),
                                   rtol=1e-4, atol=1e-8)


def test_cost_kernel_envelope_guard():
    """ADVICE r4 (medium): the cost kernel's single-tile contract holds
    only while a beam's worst-case read set fits ENVELOPE_ROWS; configs
    past the envelope (longer usable range, finer resolution) must be
    rejected so callers fall back to the host path."""
    from my_lidar_graph_slam_tpu.models.scan_matchers import \
        CorrelativeMatcher
    from my_lidar_graph_slam_tpu.ops.pallas import greedy_cost_mxu as gc

    # Default launcher config fits (measured round 4 on hardware).
    assert gc.envelope_ok(0.05, 20.0, 0.075, 1)
    assert gc.cost_rows_needed(0.05, 20.0, 0.075, 1) == 16
    # Longer usable range overflows the 17-row coverage.
    assert not gc.envelope_ok(0.05, 40.0, 0.075, 1)
    # Finer resolution at the same range overflows too.
    assert not gc.envelope_ok(0.025, 20.0, 0.075, 1)
    # Non-default kernel size is host-path only regardless.
    assert not gc.envelope_ok(0.05, 20.0, 0.075, 2)

    # The matcher wrapper derives the flag from its own config.
    m = CorrelativeMatcher()
    assert m._cost_kernel_ok(0.05)
    m_long = CorrelativeMatcher(usable_range_max=40.0)
    assert not m_long._cost_kernel_ok(0.05)


def test_mxu_match_out_of_envelope_falls_back_to_host_cost():
    """cost_kernel_ok=False must route the cost/covariance stage to the
    host path and still produce a correct match (same argmax, host-path
    cost numbers)."""
    from my_lidar_graph_slam_tpu.io import synth
    from my_lidar_graph_slam_tpu.ops import grid as gridops, raycast
    from my_lidar_graph_slam_tpu.ops import matchers_mxu

    RES = 0.05
    NB = 192
    segs = synth.default_world()
    beam = np.linspace(-np.pi / 2, np.pi / 2, 181)
    g = gridops.empty(512, 512, RES, center=np.array([0.0, 0.0]))
    p0 = np.array([0.0, 0.0, 0.3])
    r = synth.raycast_segments(p0[:2], p0[2] + beam, segs, 20.0)
    ranges = np.zeros(NB, np.float32)
    angles = np.zeros(NB, np.float32)
    valid = np.zeros(NB, bool)
    ranges[:181] = r
    angles[:181] = beam
    valid[:181] = True
    g = raycast.integrate_scan(
        g, jnp.asarray(p0, jnp.float32), jnp.asarray(ranges),
        jnp.asarray(angles), jnp.asarray(valid), 0.01, 20.0, max_steps=448)

    vals = gridops.values(g)
    tiles = matchers_mxu.make_tiles(vals)
    args = dict(
        initial_poses=jnp.asarray(p0, jnp.float32)[None, :],
        ranges=jnp.asarray(ranges)[None], angles=jnp.asarray(angles)[None],
        valid=jnp.asarray(valid)[None],
        scan_min_range=jnp.asarray([0.01], jnp.float32),
        scan_max_range=jnp.asarray([20.0], jnp.float32),
        rel_sensor_poses=jnp.zeros((1, 3), jnp.float32),
        scan_range_max=jnp.asarray(20.0, jnp.float32),
        range_theta=jnp.asarray(0.25, jnp.float32),
        usable_range_min=jnp.asarray(0.01, jnp.float32),
        usable_range_max=jnp.asarray(20.0, jnp.float32),
        normalized_score_threshold=jnp.asarray(0.0, jnp.float32),
        num_total_beams=jnp.asarray([181.0], jnp.float32),
        win_x=2, win_y=2, win_theta_max=8, interpret=True)
    on = matchers_mxu.correlative_match_mxu_batch(
        vals, tiles, g, cost_kernel_ok=True, **args)
    off = matchers_mxu.correlative_match_mxu_batch(
        vals, tiles, g, cost_kernel_ok=False, **args)
    np.testing.assert_array_equal(np.asarray(on.estimated_pose),
                                  np.asarray(off.estimated_pose))
    np.testing.assert_allclose(np.asarray(on.normalized_cost),
                               np.asarray(off.normalized_cost),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(on.covariance),
                               np.asarray(off.covariance),
                               rtol=1e-4, atol=1e-7)
