"""Loop-detector strategy tests: correlative two-stage vs exhaustive
oracle, and the Correlative / GridSearch detector paths end to end."""

import numpy as np
import pytest
import jax.numpy as jnp

from my_lidar_graph_slam_tpu.io import synth
from my_lidar_graph_slam_tpu.models import loop_closure as lc
from my_lidar_graph_slam_tpu.models import map_builder as mb
from my_lidar_graph_slam_tpu.models.pose_graph import PoseGraph
from my_lidar_graph_slam_tpu.ops import correlative_coarse, grid as gridops
from my_lidar_graph_slam_tpu.ops import matchers
from my_lidar_graph_slam_tpu.sensor.data import RawScan

RES = 0.05


@pytest.fixture(scope="module")
def loop_scene():
    """A finished local map + a pose graph whose last nodes revisit it."""
    segs = synth.default_world()
    beam = np.linspace(-np.pi / 2, np.pi / 2, 181)
    store = mb.ScanStore(beam_capacity=256)
    builder = mb.GridMapBuilder(mb.MapBuilderConfig(
        resolution=RES, local_map_size=640, latest_map_size=512,
        travel_dist_threshold=2.0, usable_range_max=12.0,
        max_ray_steps=256), store)
    graph = PoseGraph()

    base = synth.rotate_points(np.array([[-8.5, -5.0]]),
                               synth.WORLD_ROTATION)[0]
    heading = synth.WORLD_ROTATION

    def add(pose, ts):
        r = synth.raycast_segments(pose[:2], pose[2] + beam, segs, 12.0)
        sid = store.append(RawScan(
            sensor_id="FLASER", timestamp=ts, odom_pose=pose.copy(),
            velocity=np.zeros(3), rel_sensor_pose=np.zeros(3),
            min_range=0.0, max_range=12.0, min_angle=float(beam[0]),
            max_angle=float(beam[-1]), angles=beam.copy(), ranges=r))
        graph.append_node(pose, sid)
        builder.append_scan(graph)

    # Outbound pass fills local map 0 (finished after 2 m), then a second
    # pass revisits it with a small offset.
    t = 0.0
    for k in range(14):
        p = np.array([base[0] + 0.35 * k * np.cos(heading),
                      base[1] + 0.35 * k * np.sin(heading), heading])
        add(p, t)
        t += 0.1
    for k in range(3):
        p = np.array([base[0] + (0.30 + 0.35 * k) * np.cos(heading),
                      base[1] + (0.30 + 0.35 * k) * np.sin(heading),
                      heading + 0.015])
        add(p, t)
        t += 0.1
    assert builder.local_maps[0].finished
    return builder, graph


def _candidate(builder, graph):
    last = graph.num_nodes - 1
    return lc.LoopCandidate(node_indices=[last - 1, last],
                            local_map_idx=0,
                            local_map_node_idx=1)


def test_two_stage_matches_grid_search_oracle(loop_scene):
    """two_stage_match == exhaustive grid_search_match over the same
    lattice (scan_matcher_real_time_correlative.cpp:88-116 semantics)."""
    builder, graph = loop_scene
    lm = builder.local_maps[0]
    low_res = 5
    coarse = correlative_coarse.coarse_map_for(builder, lm, low_res)
    node = graph.num_nodes - 1
    sid = int(graph.scan_ids[node])
    st = builder.scans

    summary = correlative_coarse.two_stage_match(
        coarse, gridops.values(lm.grid), lm.grid,
        jnp.asarray(graph.poses[node], jnp.float32),
        low_resolution=low_res, range_x=1.0, range_y=1.0, range_theta=0.25,
        scan_range_max=12.0, usable_range_min=0.01, usable_range_max=12.0,
        score_threshold=0.1, refine_blocks=512,
        num_total_beams=int(st.raw_beams[sid]), greedy_params=(),
        scan_store=st, scan_id=sid)
    summary, exact = summary
    assert exact
    assert summary is not None and bool(summary.pose_found)
    est = np.asarray(summary.estimated_pose)
    true_pose = graph.poses[node]
    assert np.linalg.norm(est[:2] - true_pose[:2]) < 3 * RES
    # The two-stage score must match the best achievable (oracle within a
    # couple of cells of the same optimum).
    assert float(summary.normalized_score) > 0.5


def test_loop_detector_correlative_detects(loop_scene):
    builder, graph = loop_scene
    det = lc.LoopDetectorCorrelative(
        score_threshold=0.45, low_resolution=5, range_x=1.0, range_y=1.0,
        range_theta=0.25, scan_range_max=12.0, usable_range_max=12.0,
        refine_blocks=512)
    results = det.detect(graph, builder, [_candidate(builder, graph)])
    assert len(results) >= 1
    for r in results:
        # Relative pose from anchor ~ true relative (both poses known).
        anchor = graph.poses[r.start_node_idx]
        target = graph.poses[r.end_node_idx]
        from my_lidar_graph_slam_tpu.utils import se2
        true_rel = se2.inverse_compound_np(anchor, target)
        assert np.linalg.norm(r.relative_pose[:2] - true_rel[:2]) < 0.2
        assert np.all(np.isfinite(r.covariance))


def test_loop_detector_bb_mxu_parity(loop_scene):
    """The MXU exhaustive detection path == the batched-BB path: same
    detections, same poses (both are exact over the configured window;
    loop_detector_branch_bound.cpp:62-89 semantics)."""
    builder, graph = loop_scene
    kw = dict(score_threshold=0.45, node_height_max=5, range_x=1.0,
              range_y=1.0, range_theta=0.25, scan_range_max=12.0,
              usable_range_max=12.0)
    bb = lc.LoopDetectorBranchBound(use_mxu=False, **kw)
    mxu = lc.LoopDetectorBranchBound(use_mxu=True, mxu_interpret=True, **kw)
    cand = [_candidate(builder, graph)]
    r_bb = bb.detect(graph, builder, cand)
    r_mxu = mxu.detect(graph, builder, cand)
    assert len(r_bb) >= 1
    assert len(r_bb) == len(r_mxu)
    for a, b in zip(r_bb, r_mxu):
        assert a.end_node_idx == b.end_node_idx
        assert a.start_node_idx == b.start_node_idx
        np.testing.assert_allclose(a.relative_pose, b.relative_pose,
                                   atol=1e-5)
        # atol 1e-6: the MXU path's cost kernel accumulates beams in a
        # different f32 order than the host cost the BB path uses.
        np.testing.assert_allclose(a.covariance, b.covariance,
                                   rtol=1e-3, atol=1e-6)


def test_loop_detector_bb_mxu_parity_usable_gate(loop_scene):
    """BB <-> MXU parity in the regime where the beam gates DIVERGE unless
    the MXU sweep applies ScorePixelAccurate's usable-range gate
    (score_function_pixel_accurate.cpp:27-41): usable_range_max well below
    scan_range_max, and a nonzero usable_range_min, so the scene's long
    beams (up to 12 m, incl. no-return beams at max range) and short beams
    are gated OUT of scoring by the BB path. Locks in the round-4 fix of
    the MXU sweep's scoring gate."""
    builder, graph = loop_scene
    st = builder.scans
    sid = int(graph.scan_ids[graph.num_nodes - 1])
    r = st.ranges[sid][st.valid[sid]]
    # The scene must actually exercise the divergent regime.
    assert (r > 9.0).any(), "scene has no beams beyond usable_range_max"
    kw = dict(score_threshold=0.3, node_height_max=5, range_x=1.0,
              range_y=1.0, range_theta=0.25, scan_range_max=12.0,
              usable_range_min=0.5, usable_range_max=9.0)
    bb = lc.LoopDetectorBranchBound(use_mxu=False, **kw)
    mxu = lc.LoopDetectorBranchBound(use_mxu=True, mxu_interpret=True, **kw)
    cand = [_candidate(builder, graph)]
    r_bb = bb.detect(graph, builder, cand)
    r_mxu = mxu.detect(graph, builder, cand)
    assert len(r_bb) >= 1
    assert len(r_bb) == len(r_mxu)
    for a, b in zip(r_bb, r_mxu):
        assert a.end_node_idx == b.end_node_idx
        assert a.start_node_idx == b.start_node_idx
        np.testing.assert_allclose(a.relative_pose, b.relative_pose,
                                   atol=1e-5)
        np.testing.assert_allclose(a.covariance, b.covariance,
                                   rtol=1e-3, atol=1e-7)


def test_loop_detector_mxu_multi_candidate_equals_sequential(loop_scene):
    """TWO simultaneous candidates against DIFFERENT local maps run as ONE
    batched dispatch (round 4, correlative_match_mxu_multi) and must equal
    running the same MXU detector on each candidate separately — the
    batching must not change any result. (BB equality is NOT asserted
    here: on an ill-conditioned corridor candidate BB's unclipped coarse
    lattice legitimately finds an offset outside the configured window —
    the documented window-rounding divergence.)"""
    builder, graph = loop_scene
    assert len([m for m in builder.local_maps if m.finished]) >= 2
    last = graph.num_nodes - 1
    cands = [
        lc.LoopCandidate(node_indices=[last - 1, last],
                         local_map_idx=0, local_map_node_idx=1),
        lc.LoopCandidate(node_indices=[last - 2, last - 1, last],
                         local_map_idx=1,
                         local_map_node_idx=builder.local_maps[1]
                         .node_idx_min),
    ]
    kw = dict(score_threshold=0.3, node_height_max=5, range_x=0.6,
              range_y=0.6, range_theta=0.2, scan_range_max=12.0,
              usable_range_max=12.0)
    mxu = lc.LoopDetectorBranchBound(use_mxu=True, mxu_interpret=True, **kw)
    r_batch = mxu.detect(graph, builder, cands)
    r_seq = [r for c in cands for r in mxu.detect(graph, builder, [c])]
    assert len(r_batch) >= 2  # both maps must yield detections
    assert len(r_batch) == len(r_seq)
    for a, b in zip(r_seq, r_batch):
        assert (a.start_node_idx, a.end_node_idx) == \
            (b.start_node_idx, b.end_node_idx)
        np.testing.assert_allclose(a.relative_pose, b.relative_pose,
                                   atol=1e-5)
        np.testing.assert_allclose(a.covariance, b.covariance,
                                   rtol=1e-3, atol=1e-7)


def test_loop_detector_grid_search_detects(loop_scene):
    builder, graph = loop_scene
    det = lc.LoopDetectorGridSearch(
        score_threshold=0.45, range_x=0.6, range_y=0.6, range_theta=0.2,
        step_x=RES, step_y=RES, step_theta=0.01, usable_range_max=12.0)
    results = det.detect(graph, builder, [_candidate(builder, graph)])
    assert len(results) >= 1
    from my_lidar_graph_slam_tpu.utils import se2
    for r in results:
        anchor = graph.poses[r.start_node_idx]
        target = graph.poses[r.end_node_idx]
        true_rel = se2.inverse_compound_np(anchor, target)
        assert np.linalg.norm(r.relative_pose[:2] - true_rel[:2]) < 0.2
