"""End-to-end pipeline tests on synthetic worlds (scaled down for CPU CI)."""

import numpy as np
import pytest

from my_lidar_graph_slam_tpu.io import synth
from my_lidar_graph_slam_tpu.models import loop_closure as lc
from my_lidar_graph_slam_tpu.models import map_builder as mb
from my_lidar_graph_slam_tpu.models import optimizer_lm, slam
from my_lidar_graph_slam_tpu.models.pose_graph import PoseGraph
from my_lidar_graph_slam_tpu.models.preprocess import ScanInterpolator
from my_lidar_graph_slam_tpu.models.scan_matchers import CorrelativeMatcher
from my_lidar_graph_slam_tpu.ops import grid as gridops
from my_lidar_graph_slam_tpu.utils import se2


def build_slam(detector=None, resolution=0.05, local_size=640,
               latest_size=512, beam_capacity=512, travel_thresh=8.0,
               initial_pose=None):
    store = mb.ScanStore(beam_capacity=beam_capacity)
    builder = mb.GridMapBuilder(mb.MapBuilderConfig(
        resolution=resolution,
        local_map_size=local_size,
        latest_map_size=latest_size,
        travel_dist_threshold=travel_thresh,
        usable_range_max=12.0,
        max_ray_steps=256,
    ), store)
    graph_obj = PoseGraph()
    matcher = CorrelativeMatcher(scan_range_max=12.0, usable_range_max=12.0)
    fe_cfg = slam.FrontendConfig(loop_detection_interval=5)
    if initial_pose is not None:
        fe_cfg.initial_pose = np.asarray(initial_pose, np.float64)
    frontend = slam.Frontend(
        fe_cfg,
        matcher,
        interpolator=ScanInterpolator(dist_scans=0.1,
                                      dist_threshold_empty=0.25))
    backend = None
    if detector is not None:
        backend = slam.Backend(
            lc.LoopSearcherNearest(travel_dist_threshold=6.0,
                                   node_dist_max=3.0,
                                   num_candidate_nodes=2),
            detector,
            optimizer_lm.LMConfig(max_iterations=10))
    return slam.LidarGraphSlam(frontend, backend, builder, graph_obj)


def ate_rmse(est_poses, gt_poses):
    """Aligned (first-pose-anchored) translational RMSE."""
    err = est_poses[:, :2] - gt_poses[:, :2]
    return float(np.sqrt((err ** 2).sum(axis=1).mean()))


@pytest.fixture(scope="module")
def corridor_run():
    """Straight 8 m corridor run, no loop."""
    wps = synth.rotate_points(np.array([[-8.5, -5.0], [0.5, -5.0]]),
                              synth.WORLD_ROTATION)
    cfg = synth.SimConfig(step=0.25, max_range=12.0, seed=1)
    scans, gt = synth.simulate(waypoints=wps, config=cfg)
    return scans, gt


def test_frontend_odometry_only_slice(corridor_run):
    """Config 1 analog: correlative frontend, no loop closure."""
    scans, gt = corridor_run
    s = build_slam(detector=None, initial_pose=gt[0])

    processed_gt = []
    for scan, true_pose in zip(scans, gt):
        if s.process_scan(scan, scan.odom_pose):
            processed_gt.append(true_pose)
    processed_gt = np.asarray(processed_gt)

    n = s.graph.num_nodes
    assert n == len(processed_gt)
    est = s.graph.node_poses()

    # SLAM should beat raw odometry and keep ATE within a couple of cells.
    rmse = ate_rmse(est, processed_gt)
    assert rmse < 0.35, f"ATE too high: {rmse}"

    # The map contains occupied cells where walls are.
    vals = np.asarray(gridops.values(s.builder.latest_map))
    assert (vals > 0.6).sum() > 100


def test_map_builder_creates_local_maps(corridor_run):
    scans, gt = corridor_run
    s = build_slam(detector=None, travel_thresh=3.0)
    for scan in scans:
        s.process_scan(scan, scan.odom_pose)
    assert len(s.builder.local_maps) >= 2
    for lm_prev, lm_next in zip(s.builder.local_maps,
                                s.builder.local_maps[1:]):
        assert lm_prev.finished
        assert lm_prev.node_idx_max >= lm_prev.node_idx_min
        assert lm_next.node_idx_min == lm_prev.node_idx_max + 1
    assert not s.builder.local_maps[-1].finished
    assert s.builder.accum_travel_dist > 6.0


def test_loop_search_returns_candidate(corridor_run):
    """After enough travel, the searcher should find a nearby old node when
    the robot returns to its start."""
    wps = synth.rotate_points(
        np.array([[-8.5, -5.0], [-4.0, -5.0], [-8.5, -5.0]]),
        synth.WORLD_ROTATION)
    cfg = synth.SimConfig(step=0.25, max_range=12.0, seed=2)
    scans, gt = synth.simulate(waypoints=wps, config=cfg)
    s = build_slam(detector=lc.LoopDetectorEmpty(), travel_thresh=3.0)
    for scan in scans:
        s.process_scan(scan, scan.odom_pose)
    searcher = lc.LoopSearcherNearest(
        travel_dist_threshold=4.0, node_dist_max=3.0, num_candidate_nodes=2)
    cands = searcher.search(s.graph, s.builder)
    assert len(cands) == 1
    c = cands[0]
    assert c.local_map_idx == s.builder.local_maps[0].idx
    # Candidate window includes the latest node.
    assert s.graph.num_nodes - 1 in c.node_indices
    # The anchor node is spatially near the current pose.
    anchor = s.graph.poses[c.local_map_node_idx]
    cur = s.graph.latest_pose()
    assert np.hypot(*(anchor[:2] - cur[:2])) < 3.0

    # K>1 (extension): nearest node per distinct finished map, ordered by
    # distance; K=1 must stay exactly the reference single-candidate
    # result, and the K>1 head must equal it.
    multi = lc.LoopSearcherNearest(
        travel_dist_threshold=4.0, node_dist_max=8.0,
        num_candidate_nodes=2, num_candidate_maps=4)
    mcands = multi.search(s.graph, s.builder)
    assert len(mcands) >= 2
    assert mcands[0].local_map_idx == c.local_map_idx
    assert mcands[0].local_map_node_idx == c.local_map_node_idx
    maps_seen = [mc.local_map_idx for mc in mcands]
    assert len(set(maps_seen)) == len(maps_seen)  # distinct maps
    dists = [np.hypot(*(s.graph.poses[mc.local_map_node_idx][:2]
                        - cur[:2])) for mc in mcands]
    assert all(d < 8.0 for d in dists)
    assert dists == sorted(dists)


def test_loop_closure_improves_ate():
    """Config 3 analog: two laps, BB loop detection + LM optimization.

    Loop closure must fire and strictly improve the anchored ATE over the
    odometry-only frontend.
    """
    from my_lidar_graph_slam_tpu.models.loop_closure import (
        LoopDetectorBranchBound)

    wp1 = synth.loop_waypoints()
    wps = np.concatenate([wp1, wp1[1:]], axis=0)
    cfg = synth.SimConfig(step=0.25, max_range=12.0, seed=4)
    scans, gt = synth.simulate(waypoints=wps, config=cfg)

    def run(with_lc):
        det = LoopDetectorBranchBound(
            score_threshold=0.6, node_height_max=4, range_x=2.0,
            range_y=2.0, range_theta=0.5, scan_range_max=12.0,
            usable_range_max=12.0, frontier_cap=4096) if with_lc else None
        s = build_slam(detector=det, travel_thresh=8.0, initial_pose=gt[0])
        s.frontend.config.update_threshold_angle = 0.3
        pg = []
        for scan, tp in zip(scans, gt):
            if s.process_scan(scan, scan.odom_pose):
                pg.append(tp)
        return s, ate_rmse(s.graph.node_poses(), np.asarray(pg))

    s_lc, ate_lc = run(True)
    assert s_lc.backend.num_loop_closures >= 3
    assert s_lc.graph.num_edges > s_lc.graph.num_nodes - 1  # loop edges exist
    assert ate_lc < 0.3

    _, ate_none = run(False)
    assert ate_lc < ate_none


def test_mesh_backend_matches_sequential():
    """The mesh-sharded backend must equal the sequential one ON IDENTICAL
    INPUTS: at every backend pass of a config-3 run, the BB fan-out
    detector returns the same loop edges/poses as the sequential detector,
    and the edge-sharded solve matches the single-device solve. (Two
    independent closed-loop runs are NOT compared — a 1-ulp difference
    early on legitimately moves later borderline candidates.)"""
    from my_lidar_graph_slam_tpu.models import optimizer_lm as olm
    from my_lidar_graph_slam_tpu.models.loop_closure import (
        LoopDetectorBranchBound)
    from my_lidar_graph_slam_tpu.parallel import distributed
    from my_lidar_graph_slam_tpu.parallel import mesh as mesh_mod

    wp1 = synth.loop_waypoints()
    wps = np.concatenate([wp1, wp1[1:]], axis=0)
    cfg = synth.SimConfig(step=0.25, max_range=12.0, seed=4)
    scans, gt = synth.simulate(waypoints=wps, config=cfg)

    mesh = mesh_mod.make_mesh(8, axis="shard")
    det_seq = LoopDetectorBranchBound(
        score_threshold=0.6, node_height_max=4, range_x=2.0, range_y=2.0,
        range_theta=0.5, scan_range_max=12.0, usable_range_max=12.0,
        frontier_cap=4096)
    det_fan = LoopDetectorBranchBound(
        score_threshold=0.6, node_height_max=4, range_x=2.0, range_y=2.0,
        range_theta=0.5, scan_range_max=12.0, usable_range_max=12.0,
        frontier_cap=4096, mesh=mesh)

    s = build_slam(detector=det_seq, travel_thresh=8.0, initial_pose=gt[0])
    s.frontend.config.update_threshold_angle = 0.3

    checked = {"detect": 0, "solve": 0}
    orig_detect = det_seq.detect

    def spy(graph, builder, candidates):
        rs = orig_detect(graph, builder, candidates)
        rf = det_fan.detect(graph, builder, candidates)
        ks = {(r.start_node_idx, r.end_node_idx): r for r in rs}
        kf = {(r.start_node_idx, r.end_node_idx): r for r in rf}
        assert set(ks) == set(kf)
        for key in ks:
            np.testing.assert_allclose(ks[key].relative_pose,
                                       kf[key].relative_pose, atol=1e-3)
        checked["detect"] += 1
        if rs:
            # Same-input solver check: edge-sharded PCG == single device.
            snap = s.graph.snapshot(edge_cap=64 * (
                1 + s.graph.num_edges // 64))
            cfg_lm = olm.LMConfig(solver="cg", max_iterations=5,
                                  cg_max_iterations=48)
            r1 = olm.optimize(snap, cfg_lm)
            r2 = distributed.optimize_sharded(snap, cfg_lm, mesh,
                                              axis="shard")
            np.testing.assert_allclose(np.asarray(r1.poses),
                                       np.asarray(r2.poses), atol=1e-3)
            checked["solve"] += 1
        return rs

    det_seq.detect = spy
    for scan in scans:
        s.process_scan(scan, scan.odom_pose)
    assert s.backend.num_loop_closures >= 3
    assert checked["detect"] >= 3 and checked["solve"] >= 3


def _threaded_scene():
    from my_lidar_graph_slam_tpu.models.loop_closure import (
        LoopDetectorBranchBound)

    wp1 = synth.loop_waypoints()
    wps = np.concatenate([wp1, wp1[1:]], axis=0)
    cfg = synth.SimConfig(step=0.25, max_range=12.0, seed=4)
    scans, gt = synth.simulate(waypoints=wps, config=cfg)

    det = LoopDetectorBranchBound(
        score_threshold=0.6, node_height_max=4, range_x=2.0, range_y=2.0,
        range_theta=0.5, scan_range_max=12.0, usable_range_max=12.0,
        frontier_cap=4096)
    s = build_slam(detector=det, travel_thresh=8.0, initial_pose=gt[0])
    s._threaded = True
    s.frontend.config.update_threshold_angle = 0.3
    return s, scans, gt


def test_threaded_backend_runs_loop_closure():
    """The reference's two-thread mode (StartBackend, lidar_graph_slam.cpp:
    399-456) with DETERMINISTIC stepping: ``wait_for_backend`` after every
    scan makes each loop closure land at an exact process count, so the
    quality bound holds regardless of host load (round 3's free-running
    variant of this test was flaky: under a loaded host the worker skipped
    coalesced notifications, closures landed late, and the late
    single-shot solve left ATE at ~2 m — a legitimately timing-dependent
    quantity this test previously over-constrained)."""
    s, scans, gt = _threaded_scene()

    s.start_backend()
    pg = []
    for scan, tp in zip(scans, gt):
        if s.process_scan(scan, scan.odom_pose):
            pg.append(tp)
        s.wait_for_backend()
    s.stop_backend()
    assert s._backend_thread is None

    assert s.backend.num_loop_closures >= 1
    assert s.graph.num_edges > s.graph.num_nodes - 1
    assert ate_rmse(s.graph.node_poses(), np.asarray(pg)) < 0.5


def test_threaded_backend_free_running():
    """Free-running two-thread mode (no stepping): closures may land at
    load-dependent times, so only structural invariants are asserted —
    the worker joins cleanly, at least one closure lands (the stop-time
    drain pass guarantees a final complete-graph attempt), every pose is
    finite, and odometry edges stay chained."""
    s, scans, gt = _threaded_scene()

    s.start_backend()
    pg = []
    for scan, tp in zip(scans, gt):
        if s.process_scan(scan, scan.odom_pose):
            pg.append(tp)
    s.stop_backend()
    assert s._backend_thread is None

    assert s.backend.num_loop_closures >= 1
    assert s.graph.num_edges > s.graph.num_nodes - 1
    assert np.isfinite(s.graph.node_poses()).all()
    # Every odometry edge must connect adjacent nodes (torn appends would
    # break the chain).
    e = s.graph.num_edges
    odo = s.graph.edge_is_odom[:e]
    assert (s.graph.edge_j[:e][odo] == s.graph.edge_i[:e][odo] + 1).all()
