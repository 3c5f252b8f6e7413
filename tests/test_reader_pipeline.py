"""Reader→pipeline seam: ROBOTLASER1 / RAWLASER1+ODOM logs through the
full launcher (VERDICT r4 missing #2).

The same simulated run is written in three CARMEN record families; the
full pipeline must produce the same trajectory from each — FLASER and
ROBOTLASER1 encode identical data (carmen_reader.cpp:239-316 vs 319-394),
and RAWLASER1+ODOM matches once the ``attach_odom`` extension stamps the
pose-less scans (the reference leaves RAWLASER odometry zero and ignores
ODOM records, slam_launcher.cpp:966-976).
"""

import numpy as np
import pytest

from my_lidar_graph_slam_tpu import launcher
from my_lidar_graph_slam_tpu.io import carmen, synth
from my_lidar_graph_slam_tpu.sensor.data import RawScan


@pytest.fixture(scope="module")
def sim():
    wps = synth.rotate_points(np.array([[-8.5, -5.0], [-2.5, -5.0]]),
                              synth.WORLD_ROTATION)
    cfg = synth.SimConfig(step=0.4, max_range=10.0, seed=7)
    scans, gt = synth.simulate(waypoints=wps, config=cfg)
    return scans, gt, cfg


def test_robotlaser_record_roundtrip(tmp_path, sim):
    scans, _, cfg = sim
    path = str(tmp_path / "rl.clf")
    synth.write_carmen_log(path, scans, max_range=cfg.max_range,
                           fmt="robotlaser")
    loaded = [r for r in carmen.load(path) if isinstance(r, RawScan)]
    assert len(loaded) == len(scans)
    np.testing.assert_allclose(loaded[0].ranges, scans[0].ranges, atol=2e-3)
    np.testing.assert_allclose(loaded[0].angles, scans[0].angles, atol=1e-6)
    np.testing.assert_allclose(loaded[0].odom_pose, scans[0].odom_pose,
                               atol=1e-5)
    np.testing.assert_allclose(loaded[0].rel_sensor_pose, np.zeros(3),
                               atol=1e-5)


def test_rawlaser_odom_records_roundtrip(tmp_path, sim):
    scans, _, cfg = sim
    path = str(tmp_path / "raw.clf")
    synth.write_carmen_log(path, scans, max_range=cfg.max_range,
                           fmt="rawlaser")
    records = carmen.load(path)
    loaded = [r for r in records if isinstance(r, RawScan)]
    odoms = [r for r in records if not isinstance(r, RawScan)]
    assert len(loaded) == len(scans)
    assert len(odoms) == len(scans)
    # Reference stance: RAWLASER scans carry NO pose.
    np.testing.assert_array_equal(loaded[0].odom_pose, np.zeros(3))
    np.testing.assert_allclose(odoms[0].pose, scans[0].odom_pose,
                               atol=1e-5)


def _run(tmp_path, log_path, name, attach_odom=False):
    out = str(tmp_path / name)
    stats = launcher.run(
        log_path, "configs/launcher_settings_default.json", out,
        threaded_backend=False, attach_odom=attach_odom)
    ckpt = np.load(out + ".ckpt.npz")
    return stats, ckpt["poses"]


def test_formats_drive_identical_pipelines(tmp_path, sim):
    """FLASER, ROBOTLASER1, and RAWLASER1+ODOM(+attach) logs of the same
    run must produce the same trajectory through the full launcher."""
    scans, _, cfg = sim
    paths = {}
    for fmt in ("flaser", "robotlaser", "rawlaser"):
        p = str(tmp_path / f"{fmt}.clf")
        synth.write_carmen_log(p, scans, max_range=cfg.max_range, fmt=fmt)
        paths[fmt] = p

    stats_f, poses_f = _run(tmp_path, paths["flaser"], "out_f")
    stats_r, poses_r = _run(tmp_path, paths["robotlaser"], "out_r")
    stats_w, poses_w = _run(tmp_path, paths["rawlaser"], "out_w",
                            attach_odom=True)

    assert stats_f["num_nodes"] == stats_r["num_nodes"] == \
        stats_w["num_nodes"]
    # The three formats round-trip ranges at the same %.3f precision and
    # poses at %.6f; trajectories agree to the odometry print precision.
    np.testing.assert_allclose(poses_r, poses_f, rtol=0, atol=1e-4)
    np.testing.assert_allclose(poses_w, poses_f, rtol=0, atol=1e-4)
