"""Unit tests: scan interpolation/accumulation parity, counting cell
policy, local-map early split, scan-store truncation warning."""

import numpy as np
import jax.numpy as jnp

from my_lidar_graph_slam_tpu.models import map_builder as mb
from my_lidar_graph_slam_tpu.models.preprocess import (ScanAccumulator,
                                                       ScanInterpolator)
from my_lidar_graph_slam_tpu.ops import grid as gridops
from my_lidar_graph_slam_tpu.ops import raycast
from my_lidar_graph_slam_tpu.sensor.data import RawScan
from my_lidar_graph_slam_tpu.utils import se2


def make_scan(ranges, angles, odom=(0.0, 0.0, 0.0), ts=0.0,
              rel=(0.0, 0.0, 0.0)):
    ranges = np.asarray(ranges, np.float64)
    angles = np.asarray(angles, np.float64)
    return RawScan(
        sensor_id="FLASER", timestamp=ts,
        odom_pose=np.asarray(odom, np.float64), velocity=np.zeros(3),
        rel_sensor_pose=np.asarray(rel, np.float64),
        min_range=0.0, max_range=20.0,
        min_angle=float(angles[0]), max_angle=float(angles[-1]),
        angles=angles, ranges=ranges)


def test_interpolator_uniform_spacing_and_gap_behavior():
    """Points along a wall resample at ~dist_scans spacing; gaps >=
    dist_threshold_empty are left unfilled (scan_interpolator.cpp:39-68)."""
    # A straight wall at x=2: points every ~0.3 deg -> dense cartesian.
    a = np.linspace(-0.5, 0.5, 201)
    r = 2.0 / np.cos(a)
    scan = make_scan(r, a)
    out = ScanInterpolator(dist_scans=0.1, dist_threshold_empty=0.5)(scan)
    px = out.ranges * np.cos(out.angles)
    py = out.ranges * np.sin(out.angles)
    seg = np.hypot(np.diff(px), np.diff(py))
    # Uniform resampling: every emitted step close to dist_scans.
    assert np.all(seg < 0.2)
    assert np.median(seg) < 0.15
    # All resampled points still lie on the wall x = 2.
    np.testing.assert_allclose(px, 2.0, atol=1e-6)

    # Two clusters separated by a large gap: the gap must NOT be filled.
    a2 = np.concatenate([np.linspace(-0.5, -0.4, 20),
                         np.linspace(0.4, 0.5, 20)])
    r2 = np.full(40, 5.0)
    out2 = ScanInterpolator(dist_scans=0.1, dist_threshold_empty=0.5)(
        make_scan(r2, a2))
    px2 = out2.ranges * np.cos(out2.angles)
    py2 = out2.ranges * np.sin(out2.angles)
    seg2 = np.hypot(np.diff(px2), np.diff(py2))
    assert seg2.max() > 3.0  # the gap survives as one long segment


def test_accumulator_reprojects_into_latest_frame():
    """Re-projected previous-scan endpoints must coincide with their true
    world positions seen from the latest sensor pose
    (scan_accumulator.cpp:44-77)."""
    a = np.linspace(-1.0, 1.0, 11)
    r = np.full(11, 4.0)
    prev_odom = np.array([0.0, 0.0, 0.0])
    latest_odom = np.array([0.5, -0.2, 0.1])

    prev = make_scan(r, a, odom=prev_odom, ts=0.0)
    latest = make_scan(r[:5], a[:5], odom=latest_odom, ts=0.1)

    acc = ScanAccumulator(num_accumulated_scans=2)
    acc.append(prev)
    acc.append(latest)
    out = acc.concatenated()
    assert out.num_beams == latest.num_beams + prev.num_beams

    # World endpoints of the accumulated beams (sensor frame == odom frame).
    wx = latest_odom[0] + out.ranges * np.cos(latest_odom[2] + out.angles)
    wy = latest_odom[1] + out.ranges * np.sin(latest_odom[2] + out.angles)
    true_prev_x = prev_odom[0] + r * np.cos(prev_odom[2] + a)
    true_prev_y = prev_odom[1] + r * np.sin(prev_odom[2] + a)
    np.testing.assert_allclose(wx[5:], true_prev_x, atol=1e-9)
    np.testing.assert_allclose(wy[5:], true_prev_y, atol=1e-9)


def test_counting_cell_policy_matches_ratios():
    """CountingGridCell: value = hits / observations
    (counting_grid_cell.hpp:60-85)."""
    g = gridops.counting_empty(64, 64, 0.1)
    r = jnp.full(1, 2.0)
    a = jnp.zeros(1)
    v = jnp.ones(1, bool)
    # Same beam twice: hit cell observed twice as hit -> 1.0; the cells on
    # the ray observed twice as miss -> 0.0 (but counted).
    for _ in range(2):
        g = raycast.integrate_scan_counting(
            g, jnp.zeros(3), r, a, v, 0.01, 5.0, max_steps=64)
    import jax.numpy as jnp2
    hix, hiy = gridops.world_to_cell(
        g, jnp2.asarray([2.0, 0.0], jnp2.float32))
    hix, hiy = int(hix), int(hiy)
    vals = np.asarray(gridops.counting_values(g))
    counts = np.asarray(g.counts)
    assert vals[hiy, hix] == 1.0
    ray_cells = counts[hiy, hix - 15:hix - 1]
    assert np.all(ray_cells == 2.0)
    assert np.all(vals[hiy, hix - 15:hix - 1] == 0.0)
    # A longer beam through the old hit cell records a miss there,
    # diluting the ratio to 2/3.
    g = raycast.integrate_scan_counting(
        g, jnp.zeros(3), jnp.full(1, 3.0), a, v, 0.01, 5.0, max_steps=64)
    vals = np.asarray(gridops.counting_values(g))
    np.testing.assert_allclose(vals[hiy, hix], 2.0 / 3.0)


def test_local_map_early_split_preserves_beams():
    """A scan whose endpoints leave the current submap extent must trigger
    an early local-map split (the reference would Expand the paged map,
    grid_map.hpp:652-736) — no silent beam drops."""
    from my_lidar_graph_slam_tpu.models.pose_graph import PoseGraph
    from my_lidar_graph_slam_tpu.utils.metrics import MetricManager

    MetricManager.reset_instance()
    store = mb.ScanStore(beam_capacity=64)
    builder = mb.GridMapBuilder(mb.MapBuilderConfig(
        resolution=0.1, local_map_size=128,   # only 12.8 m wide!
        latest_map_size=128, travel_dist_threshold=1e9,  # never by travel
        usable_range_max=10.0, max_ray_steps=128), store)
    graph = PoseGraph()

    a = np.linspace(-0.3, 0.3, 11)
    r = np.full(11, 4.0)
    # March the robot forward until its scans leave the first submap.
    for k in range(12):
        pose = np.array([1.0 * k, 0.0, 0.0])
        sid = store.append(make_scan(r, a, odom=pose, ts=float(k)))
        graph.append_node(pose, sid)
        builder.append_scan(graph)

    assert len(builder.local_maps) >= 2, "early split never happened"
    splits = MetricManager.instance().counters("LocalMapEarlySplits").value
    assert splits >= 1
    # Every map's scans fit its extent: all hit cells observed.
    for lm in builder.local_maps:
        for node in range(lm.node_idx_min, lm.node_idx_max + 1):
            p = graph.poses[node]
            hx = p[0] + r * np.cos(a)
            hy = p[1] + r * np.sin(a)
            ix, iy = gridops.world_to_cell(
                lm.grid, jnp.asarray(np.stack([hx, hy], -1), jnp.float32))
            obs = np.asarray(lm.grid.observed)
            assert np.all(obs[np.asarray(iy), np.asarray(ix)])


def test_scan_store_truncation_warns_and_counts(capsys):
    from my_lidar_graph_slam_tpu.utils.metrics import MetricManager

    MetricManager.reset_instance()
    store = mb.ScanStore(beam_capacity=8)
    a = np.linspace(-1, 1, 20)
    store.append(make_scan(np.full(20, 2.0), a))
    captured = capsys.readouterr()
    assert "truncated" in captured.err
    assert MetricManager.instance().counters(
        "ScanStoreTruncatedBeams").value == 12
