"""Metrics, motion model, map export, checkpoint/resume tests."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from my_lidar_graph_slam_tpu.models import map_builder as mb
from my_lidar_graph_slam_tpu.models.motion_model import (
    AlphaCoefficients, MotionModelVelocity, StandardDeviations)
from my_lidar_graph_slam_tpu.models.pose_graph import PoseGraph
from my_lidar_graph_slam_tpu.io import map_io
from my_lidar_graph_slam_tpu.ops import grid as gridops
from my_lidar_graph_slam_tpu.sensor.data import RawScan
from my_lidar_graph_slam_tpu.utils import metrics


def test_metric_distribution_welford():
    d = metrics.Distribution("d")
    vals = [1.0, 2.0, 3.0, 4.0, 10.0]
    for v in vals:
        d.observe(v)
    assert np.isclose(d.mean, np.mean(vals))
    assert np.isclose(d.variance, np.var(vals))
    assert d.min == 1.0 and d.max == 10.0


def test_metric_histogram_buckets():
    h = metrics.Histogram.create_uniform("h", 0.0, 1.0, 0.25)
    for v in [-0.5, 0.1, 0.3, 0.9, 5.0]:
        h.observe(v)
    assert h.num_samples == 5
    assert h.counts[0] == 1       # below range
    assert h.counts[-1] == 1      # above range
    e = metrics.Histogram.create_exponential("e", 1.0, 3)
    for v in [0.5, 1.5, 3.0, 100.0]:
        e.observe(v)
    assert e.counts[0] == 1 and e.counts[-1] == 1


def test_metric_manager_json(tmp_path):
    metrics.MetricManager.reset_instance()
    m = metrics.MetricManager.instance()
    m.counters("scans").increment(5)
    m.gauges("nodes").set(42)
    m.distributions("match_time").observe(0.1)
    path = str(tmp_path / "metrics.json")
    m.save_json(path)
    data = json.load(open(path))
    assert data["Counters"]["scans"]["value"] == 5
    assert data["Gauges"]["nodes"]["value"] == 42
    metrics.MetricManager.reset_instance()


def test_motion_model_covariance_grows():
    mm = MotionModelVelocity(params=AlphaCoefficients())
    prev_pose = jnp.asarray([0.0, 0.0, 0.3])
    rel = jnp.asarray([0.5, 0.0, 0.1])
    cov0 = 1e-6 * jnp.eye(3)
    cov1 = mm.compute_covariance(prev_pose, rel, 0.1, cov0)
    c = np.asarray(cov1)
    assert np.all(np.linalg.eigvalsh(c) > 0)
    assert np.trace(c) > np.trace(np.asarray(cov0))
    # StandardDeviation parametrization also works.
    mm2 = MotionModelVelocity(params=StandardDeviations())
    c2 = np.asarray(mm2.compute_covariance(prev_pose, rel, 0.1, cov0))
    assert np.all(np.linalg.eigvalsh(c2) > 0)


def test_motion_model_sampling_statistics():
    mm = MotionModelVelocity(params=AlphaCoefficients(
        alpha_trans=0.01, alpha_angular=0.01))
    key = jax.random.PRNGKey(0)
    prev = jnp.asarray([1.0, 2.0, 0.5])
    rel = jnp.asarray([0.4, 0.0, 0.05])
    samples = mm.sample_poses(key, prev, rel, 0.1, 512)
    s = np.asarray(samples)
    assert s.shape == (512, 3)
    # Mean displacement along the heading ~ trans distance.
    disp = s[:, :2] - np.asarray(prev[:2])
    d = np.hypot(disp[:, 0], disp[:, 1]).mean()
    assert 0.3 < d < 0.5
    assert s[:, 2].std() > 0.0


def _mini_map():
    g = gridops.empty(64, 64, 0.05)
    lo = g.log_odds.at[30:34, 20:40].set(2.0)
    obs = g.observed.at[28:36, 18:42].set(True)
    return g._replace(log_odds=lo, observed=obs)


def test_map_export_and_metadata(tmp_path):
    g = _mini_map()
    poses = np.array([[0.0, 0.0, 0.0], [0.3, 0.1, 0.1]])
    out = str(tmp_path / "map")
    map_io.save_map(g, out, node_poses=poses, node_idx_max=1)
    assert os.path.exists(out + ".png")
    meta = json.load(open(out + ".json"))
    assert abs(meta["Map"]["Resolution"] - 0.05) < 1e-6
    assert meta["Map"]["WidthInGridCells"] > 0
    from PIL import Image
    img = np.asarray(Image.open(out + ".png"))
    assert img.ndim == 3
    # Occupied cells render dark, unknown gray 192.
    assert img.min() < 60


def test_pose_graph_json_roundtrip(tmp_path):
    graph = PoseGraph()
    scans = mb.ScanStore(beam_capacity=16)
    scan = RawScan("F", 1.5, np.zeros(3), np.zeros(3), np.zeros(3),
                   0.0, 20.0, -1.0, 1.0, np.linspace(-1, 1, 8),
                   np.ones(8))
    sid = scans.append(scan)
    graph.append_node(np.array([1.0, 2.0, 0.3]), sid)
    graph.append_node(np.array([1.5, 2.1, 0.4]), sid)
    graph.append_edge(0, 1, np.array([0.5, 0.1, 0.1]),
                      np.diag([10.0, 10.0, 40.0]))
    out = str(tmp_path / "pg")
    map_io.save_pose_graph(graph, scans, out)

    loaded = map_io.load_pose_graph(out + ".posegraph.json")
    assert loaded.num_nodes == 2
    assert loaded.num_edges == 1
    np.testing.assert_allclose(loaded.poses[1], [1.5, 2.1, 0.4], atol=1e-9)
    np.testing.assert_allclose(loaded.edge_info[0],
                               np.diag([10.0, 10.0, 40.0]), atol=1e-9)
    assert loaded.edge_is_odom[0]


def test_checkpoint_roundtrip(tmp_path):
    graph = PoseGraph()
    scans = mb.ScanStore(beam_capacity=32)
    rng = np.random.default_rng(0)
    for i in range(5):
        scan = RawScan("F", float(i), np.zeros(3), np.zeros(3), np.zeros(3),
                       0.0, 20.0, -1.0, 1.0,
                       np.linspace(-1, 1, 16), rng.uniform(1, 5, 16))
        sid = scans.append(scan)
        graph.append_node(rng.uniform(-1, 1, 3), sid)
        if i:
            graph.append_edge(i - 1, i, rng.uniform(-1, 1, 3), np.eye(3))
    path = str(tmp_path / "ckpt.npz")
    map_io.save_checkpoint(path, graph, scans)
    g2, s2 = map_io.load_checkpoint(path, beam_capacity=32)
    assert g2.num_nodes == 5 and g2.num_edges == 4
    np.testing.assert_allclose(g2.poses[:5], graph.poses[:5])
    np.testing.assert_allclose(s2.ranges[:5], scans.ranges[:5])
    assert s2.count == 5


def test_native_carmen_parser_parity(tmp_path):
    from my_lidar_graph_slam_tpu.io import carmen, synth
    cfg = synth.SimConfig(step=1.0)
    scans, _ = synth.simulate(config=cfg)
    path = str(tmp_path / "t.clf")
    synth.write_carmen_log(path, scans, max_range=cfg.max_range)
    fast = carmen.load_old_laser_fast(path)
    if fast is None:  # native lib not built on this machine
        import pytest
        pytest.skip("native tokenizer not built")
    py = [r for r in carmen.load(path) if isinstance(r, RawScan)]
    assert len(fast) == len(py)
    for a, b in zip(py[:3], fast[:3]):
        np.testing.assert_allclose(a.ranges, b.ranges, atol=1e-4)
        np.testing.assert_allclose(a.odom_pose, b.odom_pose, atol=1e-9)


def test_ate_alignment_and_association():
    from my_lidar_graph_slam_tpu.utils import ate

    rng = np.random.default_rng(0)
    t = np.linspace(0, 10, 101)
    gt = np.stack([np.cos(t), np.sin(t), t], axis=-1)
    # Estimated trajectory = gt rotated + translated + small noise,
    # sampled at a subset of times.
    ang = 0.7
    r = np.array([[np.cos(ang), -np.sin(ang)], [np.sin(ang), np.cos(ang)]])
    est_t = t[::3] + 0.01
    gt_sub = np.stack([np.cos(est_t), np.sin(est_t), est_t], axis=-1)
    est_xy = gt_sub[:, :2] @ r.T + np.array([5.0, -2.0]) + \
        rng.normal(0, 0.01, (len(est_t), 2))
    est = np.concatenate([est_xy, gt_sub[:, 2:]], axis=1)

    rmse = ate.ate_rmse(est, gt, est_times=est_t, gt_times=t)
    assert rmse < 0.05, rmse            # alignment removes the transform
    rmse_anchored = ate.ate_rmse(est, gt, est_times=est_t, gt_times=t,
                                 aligned=False)
    assert rmse_anchored > 1.0          # sanity: unaligned error is large
