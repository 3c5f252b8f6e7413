"""Sharded solver / fan-out tests on the faked 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from my_lidar_graph_slam_tpu.models import optimizer_lm
from my_lidar_graph_slam_tpu.parallel import distributed, mesh as mesh_mod
from tests.test_optimizer import make_noisy_loop


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_sharded_optimizer_matches_single_device():
    graph, gt = make_noisy_loop(n=24, drift=0.03, seed=0)
    arrays = graph.snapshot(edge_cap=64)  # 25 edges -> padded to 64 (8 | 64)
    cfg = optimizer_lm.LMConfig(solver="cg", max_iterations=15,
                                loss_name="Squared")

    res_single = optimizer_lm.optimize(arrays, cfg)
    m = mesh_mod.make_mesh(8, axis="shard")
    res_sharded = distributed.optimize_sharded(arrays, cfg, m, axis="shard")

    n = graph.num_nodes
    np.testing.assert_allclose(np.asarray(res_sharded.poses)[:n],
                               np.asarray(res_single.poses)[:n], atol=2e-3)
    np.testing.assert_allclose(float(res_sharded.total_error),
                               float(res_single.total_error), rtol=1e-2)


def test_sharded_branch_bound_fanout():
    import jax.numpy as jnp

    from my_lidar_graph_slam_tpu.io import synth
    from my_lidar_graph_slam_tpu.ops import grid as gridops
    from my_lidar_graph_slam_tpu.ops import matchers, pyramid, raycast

    res = 0.05
    segs = synth.default_world()
    beam = np.linspace(-np.pi / 2, np.pi / 2, 91)
    nb = 128

    def scan_arrays(p):
        r = synth.raycast_segments(p[:2], p[2] + beam, segs, 12.0)
        ranges = np.zeros(nb, np.float32)
        angles = np.zeros(nb, np.float32)
        valid = np.zeros(nb, bool)
        ranges[:91] = r
        angles[:91] = beam
        valid[:91] = True
        return ranges, angles, valid

    base = synth.rotate_points(np.array([[-7.0, -5.0]]),
                               synth.WORLD_ROTATION)[0]
    g = gridops.empty(256, 256, res, center=base)
    for k in range(4):
        p = np.array([base[0] + 0.2 * k, base[1], synth.WORLD_ROTATION])
        r, a, v = scan_arrays(p)
        g = raycast.integrate_scan(
            g, jnp.asarray(p, jnp.float32), jnp.asarray(r), jnp.asarray(a),
            jnp.asarray(v), 0.01, 12.0, max_steps=128)

    pyr = pyramid.build_pyramid(gridops.values(g), 3)

    # 8 candidate nodes (one per device), each at a slightly offset pose.
    k = 8
    poses = np.zeros((k, 3), np.float32)
    ranges = np.zeros((k, nb), np.float32)
    angles = np.zeros((k, nb), np.float32)
    valid = np.zeros((k, nb), bool)
    for i in range(k):
        p = np.array([base[0] + 0.1 * i, base[1] + 0.02 * i,
                      synth.WORLD_ROTATION])
        poses[i] = p
        r, a, v = scan_arrays(p)
        ranges[i], angles[i], valid[i] = r, a, v

    m = mesh_mod.make_mesh(8, axis="shard")
    win_t = matchers.static_max_theta_window(res, 12.0, 0.25)
    out = distributed.branch_bound_fanout(
        pyr, g, jnp.asarray(poses),
        jnp.asarray(ranges), jnp.asarray(angles), jnp.asarray(valid),
        jnp.zeros(k, jnp.float32), jnp.full((k,), 12.0, jnp.float32),
        jnp.zeros((k, 3), jnp.float32),
        jnp.full((k,), 91.0, jnp.float32),
        scan_range_max=12.0, range_theta=0.25,
        usable_range_min=0.01, usable_range_max=12.0,
        normalized_score_threshold=0.2,
        mesh=m, axis="shard",
        node_height_max=3, win_x=8, win_y=8, win_theta_max=win_t,
        frontier_cap=2048)

    found = np.asarray(out.pose_found)
    est = np.asarray(out.estimated_pose)
    assert found.shape == (k,)
    assert found.any()
    # Matched poses should stay near their (true) initial poses.
    for i in range(k):
        if found[i]:
            assert np.linalg.norm(est[i, :2] - poses[i, :2]) < 0.3

    # Single-device reference for the first candidate.
    import jax.numpy as jnp2
    ref = matchers.branch_bound_match(
        pyr, g, jnp2.asarray(poses[0]),
        jnp2.asarray(ranges[0]), jnp2.asarray(angles[0]),
        jnp2.asarray(valid[0]),
        jnp2.asarray(0.0, jnp2.float32), jnp2.asarray(12.0, jnp2.float32),
        jnp2.zeros(3),
        jnp2.asarray(12.0, jnp2.float32), jnp2.asarray(0.25, jnp2.float32),
        jnp2.asarray(0.01, jnp2.float32), jnp2.asarray(12.0, jnp2.float32),
        jnp2.asarray(0.2, jnp2.float32),
        node_height_max=3, win_x=8, win_y=8, win_theta_max=win_t,
        frontier_cap=2048, num_total_beams=91)
    if bool(ref.pose_found) and found[0]:
        np.testing.assert_allclose(est[0], np.asarray(ref.estimated_pose),
                                   atol=1e-4)


def test_optimize_sharded_nodes_matches_single_device():
    """Node-block-sharded LM == single-device LM on the same graph, with
    per-CG-step collective volume O(boundary) not O(N)."""
    from my_lidar_graph_slam_tpu.parallel import distributed, mesh as mesh_mod
    from my_lidar_graph_slam_tpu.models import optimizer_lm
    from tests.test_optimizer import make_noisy_loop

    graph, gt = make_noisy_loop(n=96, drift=0.02)
    arrays = graph.snapshot(node_cap=128, edge_cap=128)
    cfg = optimizer_lm.LMConfig(solver="cg", max_iterations=10,
                                cg_max_iterations=64,
                                preconditioner="chain")

    single = optimizer_lm.optimize(arrays, cfg)

    m = mesh_mod.make_mesh(8, axis="shard")
    sharded = distributed.partition_graph_by_nodes(arrays, 8)
    res = distributed.optimize_sharded_nodes(sharded, cfg, m, axis="shard")

    n = graph.num_nodes
    import numpy as np
    sp = np.asarray(single.poses)[:n]
    np_ = np.asarray(res.poses)[:n]
    np.testing.assert_allclose(np_[:, :2], sp[:, :2], atol=0.02)
    # Both recover the ground-truth ring.
    assert np.linalg.norm(np_[:, :2] - gt[:, :2], axis=1).max() < 0.3

    # Comm accounting: the boundary is tiny relative to a full-pose psum.
    bytes_step = distributed.psum_bytes_per_cg_step(sharded)
    assert bytes_step < 128 * 3 * 4  # << O(N) pose exchange
