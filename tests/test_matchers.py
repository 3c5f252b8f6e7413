"""Scan matcher tests: recovery of a known perturbation + oracle parity."""

import jax.numpy as jnp
import numpy as np
import pytest

from my_lidar_graph_slam_tpu.io import synth
from my_lidar_graph_slam_tpu.ops import grid as gridops
from my_lidar_graph_slam_tpu.ops import matchers, pyramid, raycast, scoring

RES = 0.05
NB = 256


def make_scene(pose=(0.0, 0.0, 0.3), n_scans=5):
    """Integrate a few simulated scans around ``pose`` into a small map."""
    segs = synth.default_world()
    beam_angles = np.linspace(-np.pi / 2, np.pi / 2, 181)
    g = gridops.empty(512, 512, RES, center=np.asarray(pose[:2]))
    rng = np.random.default_rng(0)
    poses = []
    for i in range(n_scans):
        p = np.asarray(pose, np.float64) + np.concatenate(
            [rng.uniform(-0.3, 0.3, 2), rng.uniform(-0.2, 0.2, 1)])
        poses.append(p)
    for p in poses:
        r = synth.raycast_segments(p[:2], p[2] + beam_angles, segs, 20.0)
        ranges = np.zeros(NB, np.float32)
        angles = np.zeros(NB, np.float32)
        valid = np.zeros(NB, bool)
        ranges[:181] = r
        angles[:181] = beam_angles
        valid[:181] = True
        g = raycast.integrate_scan(
            g, jnp.asarray(p, jnp.float32), jnp.asarray(ranges),
            jnp.asarray(angles), jnp.asarray(valid), 0.01, 20.0,
            max_steps=448)
    return g, segs, beam_angles


def make_query(segs, beam_angles, true_pose):
    r = synth.raycast_segments(
        np.asarray(true_pose)[:2], true_pose[2] + beam_angles, segs, 20.0)
    ranges = np.zeros(NB, np.float32)
    angles = np.zeros(NB, np.float32)
    valid = np.zeros(NB, bool)
    ranges[:181] = r
    angles[:181] = beam_angles
    valid[:181] = True
    return (jnp.asarray(ranges), jnp.asarray(angles), jnp.asarray(valid))


COMMON = dict(
    scan_min_range=jnp.asarray(0.0, jnp.float32),
    scan_max_range=jnp.asarray(20.0, jnp.float32),
    rel_sensor_pose=jnp.zeros(3),
    usable_range_min=jnp.asarray(0.01, jnp.float32),
    usable_range_max=jnp.asarray(20.0, jnp.float32),
)


@pytest.fixture(scope="module")
def scene():
    g, segs, beam_angles = make_scene()
    return g, segs, beam_angles, np.asarray(gridops.values(g))


def test_correlative_recovers_offset(scene):
    g, segs, beam_angles, vals = scene
    true_pose = np.array([0.12, -0.08, 0.36])
    init_pose = np.array([0.0, 0.0, 0.3])
    ranges, angles, valid = make_query(segs, beam_angles, true_pose)

    win_t = matchers.static_max_theta_window(RES, 20.0, 0.5)
    s = matchers.correlative_match(
        jnp.asarray(vals), g, jnp.asarray(init_pose, jnp.float32),
        ranges, angles, valid,
        scan_range_max=jnp.asarray(20.0, jnp.float32),
        range_theta=jnp.asarray(0.5, jnp.float32),
        normalized_score_threshold=jnp.asarray(0.0, jnp.float32),
        win_x=4, win_y=4, win_theta_max=win_t,
        num_total_beams=181,
        **COMMON)
    est = np.asarray(s.estimated_pose)
    assert bool(s.pose_found)
    assert abs(est[0] - true_pose[0]) < 2.5 * RES
    assert abs(est[1] - true_pose[1]) < 2.5 * RES
    assert abs(est[2] - true_pose[2]) < 0.02
    assert float(s.normalized_score) > 0.3
    cov = np.asarray(s.covariance)
    assert np.allclose(cov, cov.T, atol=1e-5)
    assert np.all(np.linalg.eigvalsh(cov) > 0)


def test_grid_search_recovers_offset(scene):
    g, segs, beam_angles, vals = scene
    true_pose = np.array([0.1, -0.05, 0.33])
    init_pose = np.array([0.0, 0.0, 0.3])
    ranges, angles, valid = make_query(segs, beam_angles, true_pose)

    s = matchers.grid_search_match(
        jnp.asarray(vals), g, jnp.asarray(init_pose, jnp.float32),
        ranges, angles, valid,
        normalized_score_threshold=jnp.asarray(0.0, jnp.float32),
        step_x=jnp.asarray(RES, jnp.float32),
        step_y=jnp.asarray(RES, jnp.float32),
        step_t=jnp.asarray(0.005, jnp.float32),
        nx=9, ny=9, nt=17,
        num_total_beams=181,
        **COMMON)
    est = np.asarray(s.estimated_pose)
    assert abs(est[0] - true_pose[0]) < 2.5 * RES
    assert abs(est[1] - true_pose[1]) < 2.5 * RES
    assert abs(est[2] - true_pose[2]) < 0.03


def test_branch_bound_matches_exhaustive(scene):
    """BB must find the same score as exhaustively scoring all leaves
    (the reference treats GridSearch as the exhaustive baseline for BB,
    scan_matcher_grid_search.cpp:45)."""
    g, segs, beam_angles, vals = scene
    true_pose = np.array([0.15, 0.1, 0.25])
    init_pose = np.array([0.0, 0.0, 0.3])
    ranges, angles, valid = make_query(segs, beam_angles, true_pose)

    pyr = pyramid.build_pyramid(jnp.asarray(vals), 4)
    win_t = matchers.static_max_theta_window(RES, 20.0, 0.25)
    s = matchers.branch_bound_match(
        pyr, g, jnp.asarray(init_pose, jnp.float32),
        ranges, angles, valid,
        scan_range_max=jnp.asarray(20.0, jnp.float32),
        range_theta=jnp.asarray(0.25, jnp.float32),
        normalized_score_threshold=jnp.asarray(0.1, jnp.float32),
        node_height_max=4, win_x=8, win_y=8, win_theta_max=win_t,
        frontier_cap=8192,
        num_total_beams=181,
        **COMMON)

    # Exhaustive oracle over the BB leaf lattice (same steps, same extent:
    # [-win, -win + 2^h * ceil(...)) per axis, unclipped like the reference).
    max_range = min(float(jnp.max(ranges)), 20.0)
    step_t = float(matchers.search_step_theta(RES, jnp.asarray(max_range)))
    win_theta_act = int(np.ceil(0.5 * 0.25 / step_t))
    xs = np.arange(-8, -8 + 16, 1)
    ts = np.arange(-win_theta_act, win_theta_act + 1)
    score_mask = np.asarray(valid) & (np.asarray(ranges) > 0.01) & \
        (np.asarray(ranges) < 20.0)
    best = -np.inf
    cand = []
    for t in ts:
        cand.append(np.stack([
            np.full((16, 16), init_pose[0]) +
            xs[:, None] * RES,
            np.full((16, 16), init_pose[1]) + xs[None, :] * RES,
            np.full((16, 16), init_pose[2] + t * step_t)], axis=-1))
    cand = np.stack(cand).reshape(-1, 3)
    summ = scoring.score_poses(
        jnp.asarray(vals), g, jnp.asarray(cand, jnp.float32),
        ranges, angles, jnp.asarray(score_mask), 181)
    best = float(jnp.max(summ.score))

    np.testing.assert_allclose(
        float(s.normalized_score) * 181, best, rtol=1e-4)


def test_hill_climbing_improves_cost(scene):
    g, segs, beam_angles, vals = scene
    true_pose = np.array([0.06, -0.04, 0.32])
    init_pose = np.array([0.0, 0.0, 0.3])
    ranges, angles, valid = make_query(segs, beam_angles, true_pose)

    s = matchers.hill_climbing_match(
        jnp.asarray(vals), g, jnp.asarray(init_pose, jnp.float32),
        ranges, angles, valid,
        cost_type="square_error",
        num_total_beams=181,
        **COMMON)
    est = np.asarray(s.estimated_pose)
    # Should move toward the true pose.
    assert np.linalg.norm(est[:2] - true_pose[:2]) < \
        np.linalg.norm(init_pose[:2] - true_pose[:2])


def test_linear_solver_refines(scene):
    g, segs, beam_angles, vals = scene
    true_pose = np.array([0.05, 0.03, 0.315])
    init_pose = np.array([0.0, 0.0, 0.3])
    ranges, angles, valid = make_query(segs, beam_angles, true_pose)

    s = matchers.linear_solver_match(
        jnp.asarray(vals), g, jnp.asarray(init_pose, jnp.float32),
        ranges, angles, valid,
        num_total_beams=181,
        **COMMON)
    est = np.asarray(s.estimated_pose)
    assert np.linalg.norm(est[:2] - true_pose[:2]) < 0.05
    assert abs(est[2] - true_pose[2]) < 0.03


def test_window_scores_vs_naive(scene):
    g, segs, beam_angles, vals = scene
    ranges, angles, valid = make_query(segs, beam_angles,
                                       np.array([0.0, 0.0, 0.3]))
    pose = jnp.asarray([0.02, 0.01, 0.31], jnp.float32)
    ix, iy = scoring.hit_cells(g, pose, ranges, angles)
    w = np.asarray(valid, np.float32)
    out = np.asarray(scoring.window_scores(
        jnp.asarray(vals), ix, iy, jnp.asarray(w), 2, 2))
    ixn, iyn = np.asarray(ix), np.asarray(iy)
    for a, dx in [(0, -2), (2, 0), (4, 2)]:
        for b, dy in [(0, -2), (3, 1)]:
            naive = 0.0
            for k in range(NB):
                if not w[k]:
                    continue
                x, y = ixn[k] + dx, iyn[k] + dy
                if 0 <= x < vals.shape[1] and 0 <= y < vals.shape[0]:
                    naive += vals[y, x]
            np.testing.assert_allclose(out[a, b], naive, rtol=1e-4)


def test_correlative_batch_matches_single(scene):
    """correlative_match_batch == correlative_match query-by-query (the
    single-dispatch batched kernel must be exact brute force, including the
    (theta, dx, dy) argmax tie-break order)."""
    g, segs, beam_angles, vals = scene
    init = np.array([0.0, 0.0, 0.3])
    win_t = matchers.static_max_theta_window(RES, 20.0, 0.5)
    rng = np.random.default_rng(7)
    q = 5
    true_poses = init + np.concatenate(
        [rng.uniform(-0.12, 0.12, (q, 2)), rng.uniform(-0.08, 0.08, (q, 1))],
        axis=1)
    qs = [make_query(segs, beam_angles, tp) for tp in true_poses]

    batch = dict(
        initial_poses=jnp.asarray(np.tile(init, (q, 1)), jnp.float32),
        ranges=jnp.stack([x[0] for x in qs]),
        angles=jnp.stack([x[1] for x in qs]),
        valid=jnp.stack([x[2] for x in qs]),
        scan_min_range=jnp.zeros(q, jnp.float32),
        scan_max_range=jnp.full(q, 20.0, jnp.float32),
        rel_sensor_poses=jnp.zeros((q, 3), jnp.float32),
    )
    out = matchers.correlative_match_batch(
        jnp.asarray(vals), g, batch["initial_poses"], batch["ranges"],
        batch["angles"], batch["valid"], batch["scan_min_range"],
        batch["scan_max_range"], batch["rel_sensor_poses"],
        jnp.asarray(20.0, jnp.float32),
        jnp.asarray(0.5, jnp.float32),
        jnp.asarray(0.01, jnp.float32),
        jnp.asarray(20.0, jnp.float32),
        jnp.asarray(0.0, jnp.float32),
        jnp.full(q, 181.0, jnp.float32),
        win_x=4, win_y=4, win_theta_max=win_t, theta_chunk=16)

    for i in range(q):
        s = matchers.correlative_match(
            jnp.asarray(vals), g, batch["initial_poses"][i],
            batch["ranges"][i], batch["angles"][i], batch["valid"][i],
            scan_range_max=jnp.asarray(20.0, jnp.float32),
            range_theta=jnp.asarray(0.5, jnp.float32),
            normalized_score_threshold=jnp.asarray(0.0, jnp.float32),
            win_x=4, win_y=4, win_theta_max=win_t,
            num_total_beams=181,
            **COMMON)
        np.testing.assert_allclose(
            np.asarray(out.estimated_pose[i]), np.asarray(s.estimated_pose),
            atol=1e-6)
        np.testing.assert_allclose(
            float(out.normalized_score[i]), float(s.normalized_score),
            rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(out.covariance[i]), np.asarray(s.covariance),
            rtol=1e-3, atol=1e-5)
        assert bool(out.pose_found[i]) == bool(s.pose_found)


def test_pruned_batch_matches_brute(scene):
    """The pruned bound-and-refine kernel must equal brute force on every
    query whose exactness certificate holds, and the CorrelativeMatcher
    fallback must make the combined result equal brute force always."""
    g, segs, beam_angles, vals = scene
    init = np.array([0.0, 0.0, 0.3])
    win_t = matchers.static_max_theta_window(RES, 20.0, 0.5)
    rng = np.random.default_rng(11)
    q = 6
    true_poses = init + np.concatenate(
        [rng.uniform(-0.1, 0.1, (q, 2)), rng.uniform(-0.06, 0.06, (q, 1))],
        axis=1)
    qs = [make_query(segs, beam_angles, tp) for tp in true_poses]

    kw = dict(
        scan_min_range=jnp.zeros(q, jnp.float32),
        scan_max_range=jnp.full(q, 20.0, jnp.float32),
        rel_sensor_poses=jnp.zeros((q, 3), jnp.float32),
    )
    poses = jnp.asarray(np.tile(init, (q, 1)), jnp.float32)
    ranges = jnp.stack([x[0] for x in qs])
    angles = jnp.stack([x[1] for x in qs])
    valid = jnp.stack([x[2] for x in qs])
    scalars = (jnp.asarray(20.0, jnp.float32), jnp.asarray(0.5, jnp.float32),
               jnp.asarray(0.01, jnp.float32), jnp.asarray(20.0, jnp.float32),
               jnp.asarray(0.0, jnp.float32),
               jnp.full(q, 181.0, jnp.float32))

    stack = matchers.make_bound_stack(jnp.asarray(vals), 4, 4)
    # Bound-map sanity: level 0 >= map everywhere, levels increase.
    assert np.all(np.asarray(stack[0]) >= vals - 1e-6)
    for lv in range(1, stack.shape[0]):
        assert np.all(np.asarray(stack[lv]) >= np.asarray(stack[lv - 1])
                      - 1e-6)

    summary, exact = matchers.correlative_match_pruned_batch(
        jnp.asarray(vals), stack, g, poses, ranges, angles, valid,
        kw["scan_min_range"], kw["scan_max_range"], kw["rel_sensor_poses"],
        *scalars, win_x=4, win_y=4, win_theta_max=win_t,
        top_groups=10, top_thetas=28)

    brute = matchers.correlative_match_batch(
        jnp.asarray(vals), g, poses, ranges, angles, valid,
        kw["scan_min_range"], kw["scan_max_range"], kw["rel_sensor_poses"],
        *scalars, win_x=4, win_y=4, win_theta_max=win_t)

    exact_np = np.asarray(exact)
    assert exact_np.any(), "certificate never fired on an easy scene"
    for i in range(q):
        if not exact_np[i]:
            continue
        np.testing.assert_allclose(
            np.asarray(summary.estimated_pose[i]),
            np.asarray(brute.estimated_pose[i]), atol=1e-6)
        np.testing.assert_allclose(
            float(summary.normalized_score[i]),
            float(brute.normalized_score[i]), rtol=1e-4)


def test_correlative_matcher_wrapper_equals_brute(scene):
    """CorrelativeMatcher.match_batch (pruned + fallback) == brute batch."""
    from my_lidar_graph_slam_tpu.models import map_builder as mb
    from my_lidar_graph_slam_tpu.models import scan_matchers as sm
    from my_lidar_graph_slam_tpu.sensor.data import RawScan

    g, segs, beam_angles, vals = scene
    store = mb.ScanStore(beam_capacity=NB)
    rng = np.random.default_rng(13)
    init = np.array([0.0, 0.0, 0.3])
    q = 5
    ids = []
    for i in range(q):
        tp = init + np.concatenate(
            [rng.uniform(-0.1, 0.1, 2), rng.uniform(-0.06, 0.06, 1)])
        r = synth.raycast_segments(tp[:2], tp[2] + beam_angles,
                                   synth.default_world(), 20.0)
        ids.append(store.append(RawScan(
            sensor_id="FLASER", timestamp=float(i),
            odom_pose=np.zeros(3), velocity=np.zeros(3),
            rel_sensor_pose=np.zeros(3, np.float32),
            min_range=0.0, max_range=20.0,
            min_angle=float(beam_angles[0]), max_angle=float(beam_angles[-1]),
            angles=beam_angles.astype(np.float32),
            ranges=r.astype(np.float32))))

    m = sm.CorrelativeMatcher(range_x=0.4, range_y=0.4, range_theta=0.5,
                              scan_range_max=20.0)
    batched = m.match_batch(g, store, ids, np.tile(init, (q, 1)))
    assert 0.0 <= m.last_exact_fraction <= 1.0

    win_t = matchers.static_max_theta_window(RES, 20.0, 0.5)
    brute = matchers.correlative_match_batch(
        gridops.values(g), g, jnp.asarray(np.tile(init, (q, 1)),
                                          jnp.float32),
        jnp.asarray(store.ranges[np.asarray(ids)]),
        jnp.asarray(store.angles[np.asarray(ids)]),
        jnp.asarray(store.valid[np.asarray(ids)]),
        jnp.asarray(store.min_range[np.asarray(ids)]),
        jnp.asarray(store.max_range[np.asarray(ids)]),
        jnp.asarray(store.rel_sensor_pose[np.asarray(ids)]),
        jnp.asarray(20.0, jnp.float32), jnp.asarray(0.5, jnp.float32),
        jnp.asarray(0.01, jnp.float32), jnp.asarray(20.0, jnp.float32),
        jnp.asarray(-1e30, jnp.float32),
        jnp.asarray(store.raw_beams[np.asarray(ids)], jnp.float32),
        win_x=4, win_y=4, win_theta_max=win_t,
        greedy_params=sm.DEFAULT_GREEDY_PARAMS)

    np.testing.assert_allclose(np.asarray(batched.estimated_pose),
                               np.asarray(brute.estimated_pose), atol=1e-6)
    np.testing.assert_allclose(np.asarray(batched.normalized_score),
                               np.asarray(brute.normalized_score),
                               rtol=1e-4)


def test_correlative_matcher_mxu_equals_brute(scene):
    """CorrelativeMatcher with the MXU kernel forced (interpret mode on
    CPU) == the brute batch oracle at the frontend's default window — the
    production TPU frontend path (round 4), scan_matcher_real_time
    _correlative.cpp:50-145 semantics."""
    from my_lidar_graph_slam_tpu.models import map_builder as mb
    from my_lidar_graph_slam_tpu.models import scan_matchers as sm
    from my_lidar_graph_slam_tpu.sensor.data import RawScan
    from my_lidar_graph_slam_tpu.utils.metrics import MetricManager

    g, segs, beam_angles, vals = scene
    store = mb.ScanStore(beam_capacity=NB)
    rng = np.random.default_rng(17)
    init = np.array([0.0, 0.0, 0.3])
    q = 4
    ids = []
    for i in range(q):
        tp = init + np.concatenate(
            [rng.uniform(-0.05, 0.05, 2), rng.uniform(-0.05, 0.05, 1)])
        r = synth.raycast_segments(tp[:2], tp[2] + beam_angles,
                                   synth.default_world(), 20.0)
        ids.append(store.append(RawScan(
            sensor_id="FLASER", timestamp=float(i),
            odom_pose=np.zeros(3), velocity=np.zeros(3),
            rel_sensor_pose=np.zeros(3, np.float32),
            min_range=0.0, max_range=20.0,
            min_angle=float(beam_angles[0]), max_angle=float(beam_angles[-1]),
            angles=beam_angles.astype(np.float32),
            ranges=r.astype(np.float32))))

    m = sm.CorrelativeMatcher(use_mxu=True, mxu_interpret=True)  # win = 2
    c0 = MetricManager.instance().counters("FrontendMxuMatches").value
    batched = m.match_batch(g, store, ids, np.tile(init, (q, 1)))
    single = m.match(g, store, ids[0], init)
    assert MetricManager.instance().counters(
        "FrontendMxuMatches").value == c0 + q + 1
    assert m.last_exact_fraction == 1.0

    win_t = matchers.static_max_theta_window(RES, 20.0, 0.5)
    idx = np.asarray(ids)
    brute = matchers.correlative_match_batch(
        gridops.values(g), g,
        jnp.asarray(np.tile(init, (q, 1)), jnp.float32),
        jnp.asarray(store.ranges[idx]), jnp.asarray(store.angles[idx]),
        jnp.asarray(store.valid[idx]), jnp.asarray(store.min_range[idx]),
        jnp.asarray(store.max_range[idx]),
        jnp.asarray(store.rel_sensor_pose[idx]),
        jnp.asarray(20.0, jnp.float32), jnp.asarray(0.5, jnp.float32),
        jnp.asarray(0.01, jnp.float32), jnp.asarray(20.0, jnp.float32),
        jnp.asarray(0.0, jnp.float32),
        jnp.asarray(store.raw_beams[idx], jnp.float32),
        win_x=2, win_y=2, win_theta_max=win_t,
        greedy_params=sm.DEFAULT_GREEDY_PARAMS)

    np.testing.assert_allclose(np.asarray(batched.estimated_pose),
                               np.asarray(brute.estimated_pose), atol=1e-5)
    np.testing.assert_allclose(np.asarray(batched.normalized_score),
                               np.asarray(brute.normalized_score), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(batched.covariance),
                               np.asarray(brute.covariance),
                               rtol=1e-3, atol=1e-6)
    np.testing.assert_allclose(np.asarray(single.estimated_pose),
                               np.asarray(brute.estimated_pose[0]),
                               atol=1e-5)
    assert bool(single.pose_found)


def test_branch_bound_batch_matches_single(scene):
    """branch_bound_match_batch (the one-dispatch loop-detection path,
    loop_detector_branch_bound.cpp:62-89) must equal per-node
    branch_bound_match calls, including per-node beam normalization."""
    g, segs, beam_angles, vals = scene
    init_poses = np.array([[0.0, 0.0, 0.3],
                           [0.1, -0.05, 0.25],
                           [-0.08, 0.1, 0.35],
                           [0.05, 0.02, 0.32]], np.float32)
    true_poses = init_poses + np.array([0.1, -0.06, 0.04], np.float32)
    scans = [make_query(segs, beam_angles, tp) for tp in true_poses]
    ranges = jnp.stack([s[0] for s in scans])
    angles = jnp.stack([s[1] for s in scans])
    valid = jnp.stack([s[2] for s in scans])
    k = len(scans)

    pyr = pyramid.build_pyramid(jnp.asarray(vals), 4)
    win_t = matchers.static_max_theta_window(RES, 20.0, 0.25)
    kw = dict(node_height_max=4, win_x=8, win_y=8, win_theta_max=win_t,
              frontier_cap=4096)

    batch = matchers.branch_bound_match_batch(
        pyr, g, jnp.asarray(init_poses),
        ranges, angles, valid,
        jnp.zeros(k, jnp.float32), jnp.full(k, 20.0, jnp.float32),
        jnp.zeros((k, 3), jnp.float32),
        jnp.full(k, 181.0, jnp.float32),
        scan_range_max=jnp.asarray(20.0, jnp.float32),
        range_theta=jnp.asarray(0.25, jnp.float32),
        usable_range_min=jnp.asarray(0.01, jnp.float32),
        usable_range_max=jnp.asarray(20.0, jnp.float32),
        normalized_score_threshold=jnp.asarray(0.1, jnp.float32),
        **kw)

    for i in range(k):
        one = matchers.branch_bound_match(
            pyr, g, jnp.asarray(init_poses[i]),
            ranges[i], angles[i], valid[i],
            scan_range_max=jnp.asarray(20.0, jnp.float32),
            range_theta=jnp.asarray(0.25, jnp.float32),
            normalized_score_threshold=jnp.asarray(0.1, jnp.float32),
            num_total_beams=181,
            **kw, **COMMON)
        assert bool(batch.pose_found[i]) == bool(one.pose_found)
        np.testing.assert_allclose(np.asarray(batch.estimated_pose[i]),
                                   np.asarray(one.estimated_pose),
                                   atol=1e-5)
        np.testing.assert_allclose(float(batch.normalized_score[i]),
                                   float(one.normalized_score), rtol=1e-5)


def test_frontend_threshold_rejects_garbage_scan(scene):
    """A scan that hits no known map cell scores 0 and must FAIL the match
    (the reference frontend passes double::min() as the threshold and
    asserts pose_found, lidar_graph_slam_frontend.cpp:109-110)."""
    g, segs, beam_angles, vals = scene
    # All beams invalid -> every candidate scores exactly 0.
    ranges = jnp.zeros(NB, jnp.float32)
    angles = jnp.zeros(NB, jnp.float32)
    valid = jnp.zeros(NB, bool)
    win_t = matchers.static_max_theta_window(RES, 20.0, 0.25)
    s = matchers.correlative_match(
        jnp.asarray(vals), g, jnp.asarray([0.0, 0.0, 0.3], jnp.float32),
        ranges, angles, valid,
        scan_range_max=jnp.asarray(20.0, jnp.float32),
        range_theta=jnp.asarray(0.25, jnp.float32),
        normalized_score_threshold=jnp.asarray(0.0, jnp.float32),
        win_x=2, win_y=2, win_theta_max=win_t,
        num_total_beams=181,
        **COMMON)
    assert not bool(s.pose_found)


def test_branch_bound_frontier_overflow_flag(scene):
    """With an adversarially tiny frontier_cap on a random (unprunable)
    map the top-k must drop live nodes and REPORT it; with a generous cap
    the count is zero (the search is then exact like the reference DFS)."""
    g, segs, beam_angles, vals = scene
    # Random map: coarse windowed-max bounds sit near the global max
    # everywhere, so threshold/lower-bound pruning cannot cut the
    # frontier and the top-k quota is the only limiter.
    rng = np.random.default_rng(7)
    noisy = jnp.asarray(rng.uniform(0.0, 1.0, np.asarray(vals).shape),
                        jnp.float32)
    ranges, angles, valid = make_query(segs, beam_angles,
                                       np.array([0.15, 0.1, 0.25]))
    pyr = pyramid.build_pyramid(noisy, 3)
    win_t = matchers.static_max_theta_window(RES, 20.0, 0.25)

    def run(cap):
        return matchers.branch_bound_match(
            pyr, g, jnp.asarray([0.0, 0.0, 0.3], jnp.float32),
            ranges, angles, valid,
            scan_range_max=jnp.asarray(20.0, jnp.float32),
            range_theta=jnp.asarray(0.25, jnp.float32),
            normalized_score_threshold=jnp.asarray(0.01, jnp.float32),
            node_height_max=3, win_x=16, win_y=16, win_theta_max=win_t,
            frontier_cap=cap, num_total_beams=181, **COMMON)

    tight = run(4)
    loose = run(65536)
    assert int(tight.frontier_overflow) > 0
    assert int(loose.frontier_overflow) == 0
    # The generous-cap search must score at least as well.
    assert float(loose.normalized_score) >= \
        float(tight.normalized_score) - 1e-6

    # Overflow-regime contract (round 4): the degraded result is still a
    # genuinely EVALUATED leaf — its reported score equals the score of
    # the returned pose, recomputed independently — not an unexpanded
    # bound. (The exhaustive paths — grid search / the MXU sweep — score
    # every leaf and so bound the degradation from above: that is the
    # loose-cap >= tight-cap assertion.)
    score_mask = np.asarray(valid) & (np.asarray(ranges) > 0.01) & \
        (np.asarray(ranges) < 20.0)
    resc = scoring.score_poses(
        noisy, g,
        jnp.asarray(np.asarray(tight.estimated_pose)[None], jnp.float32),
        ranges, angles, jnp.asarray(score_mask), 181)
    np.testing.assert_allclose(float(tight.normalized_score) * 181,
                               float(resc.score[0]), rtol=1e-4)


def test_fused_greedy_cost_cov_matches_naive(scene):
    """The read-deduplicated fused cost+covariance must reproduce the
    naive 7-pose evaluation (greedy_endpoint_cost + _covariance) exactly
    (identical reads modulo dedup; divergence possible only at 1-ulp
    floor boundaries, measure-zero for this data)."""
    from my_lidar_graph_slam_tpu.ops import cost as costops

    g, segs, beam_angles, vals = scene
    rng = np.random.default_rng(11)
    for trial in range(4):
        p = np.array([0.0, 0.0, 0.3]) + np.concatenate(
            [rng.uniform(-0.2, 0.2, 2), rng.uniform(-0.15, 0.15, 1)])
        r = synth.raycast_segments(p[:2], p[2] + beam_angles, segs, 20.0)
        ranges = np.zeros(NB, np.float32)
        angles = np.zeros(NB, np.float32)
        mask = np.zeros(NB, np.float32)
        ranges[:181] = r + rng.normal(0, 0.01, r.shape)
        angles[:181] = beam_angles
        mask[:181] = (r > 0.05) & (r < 19.0)
        pj = jnp.asarray(p, jnp.float32)
        rj, aj, mj = jnp.asarray(ranges), jnp.asarray(angles), \
            jnp.asarray(mask)
        for k in (1, 2):
            c_ref = costops.greedy_endpoint_cost(
                vals, g, pj, rj, aj, mj, kernel_size=k)
            cov_ref = costops.greedy_endpoint_covariance(
                vals, g, pj, rj, aj, mj, kernel_size=k)
            c_f, cov_f = costops.greedy_endpoint_cost_and_covariance_fused(
                vals, g, pj, rj, aj, mj, kernel_size=k)
            np.testing.assert_allclose(np.asarray(c_f), np.asarray(c_ref),
                                       rtol=0, atol=1e-6)
            np.testing.assert_allclose(np.asarray(cov_f),
                                       np.asarray(cov_ref),
                                       rtol=1e-5, atol=1e-7)


def test_fused_greedy_cost_cov_boundary_straddling(scene):
    """Deliberately boundary-straddling case (ADVICE r4): pose position
    and ranges quantized to exact cell multiples put beam endpoints ON
    floor boundaries, where the fused path's integer-shift derivation of
    the +-res poses' cells is most stressed. Axis-aligned beams (angle 0,
    +-pi/2, pi) keep the endpoints exactly on the lattice."""
    from my_lidar_graph_slam_tpu.ops import cost as costops

    g, segs, beam_angles, vals = scene
    res = float(g.resolution)
    n = 64
    ranges = np.zeros(NB, np.float32)
    angles = np.zeros(NB, np.float32)
    mask = np.zeros(NB, np.float32)
    # Exact cell-multiple ranges along the four axis directions.
    ranges[:n] = res * (20 + 3 * np.arange(n))
    angles[:n] = np.tile([0.0, np.pi / 2, np.pi, -np.pi / 2], n // 4)
    mask[:n] = 1.0
    for px, py in [(0.0, 0.0), (res * 4, -res * 7), (res * 0.5, res * 0.5)]:
        p = np.array([px, py, 0.0])
        pj = jnp.asarray(p, jnp.float32)
        rj, aj, mj = jnp.asarray(ranges), jnp.asarray(angles), \
            jnp.asarray(mask)
        c_ref = costops.greedy_endpoint_cost(
            vals, g, pj, rj, aj, mj, kernel_size=1)
        cov_ref = costops.greedy_endpoint_covariance(
            vals, g, pj, rj, aj, mj, kernel_size=1)
        c_f, cov_f = costops.greedy_endpoint_cost_and_covariance_fused(
            vals, g, pj, rj, aj, mj, kernel_size=1)
        np.testing.assert_allclose(np.asarray(c_f), np.asarray(c_ref),
                                   rtol=0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(cov_f), np.asarray(cov_ref),
                                   rtol=1e-5, atol=1e-7)
