"""CARMEN reader and synthetic simulator tests."""

import numpy as np

from my_lidar_graph_slam_tpu.io import carmen, synth
from my_lidar_graph_slam_tpu.sensor.data import RawScan, pack_scans


def test_synth_roundtrip_through_carmen(tmp_path):
    cfg = synth.SimConfig(step=0.5)
    scans, true_poses = synth.simulate(config=cfg)
    path = str(tmp_path / "synth.clf")
    synth.write_carmen_log(path, scans, max_range=cfg.max_range)

    records = carmen.load(path)
    loaded = [r for r in records if isinstance(r, RawScan)]
    assert len(loaded) == len(scans)
    s0, l0 = scans[0], loaded[0]
    assert l0.num_beams == s0.num_beams
    np.testing.assert_allclose(l0.ranges, s0.ranges, atol=2e-3)
    np.testing.assert_allclose(l0.angles, s0.angles, atol=1e-6)
    np.testing.assert_allclose(l0.odom_pose, s0.odom_pose, atol=1e-5)
    # Sensor frame == robot frame in the simulator.
    np.testing.assert_allclose(l0.rel_sensor_pose, np.zeros(3), atol=1e-5)
    assert l0.max_range == cfg.max_range


def test_old_format_angle_guessing(tmp_path):
    """No PARAM lines: geometry guessed by beam count
    (carmen_reader.cpp:463-503)."""
    path = str(tmp_path / "old.clf")
    ranges = ["1.0"] * 181
    with open(path, "w") as f:
        f.write("FLASER 181 " + " ".join(ranges)
                + " 0 0 0 0 0 0 12.5 host 12.5\n")
    records = carmen.load(path)
    assert len(records) == 1
    scan = records[0]
    assert np.isclose(scan.min_angle, -np.pi / 2)
    assert np.isclose(scan.angles[1] - scan.angles[0], np.pi / 180.0)
    assert np.isclose(scan.max_angle, np.pi / 2)
    assert scan.max_range == 80.0
    assert scan.timestamp == 12.5


def test_odom_record():
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "o.clf")
        with open(path, "w") as f:
            f.write("ODOM 1.0 2.0 0.5 0.1 0.2 0.0 99.0 host 99.0\n")
        records = carmen.load(path)
    assert len(records) == 1
    odo = records[0]
    np.testing.assert_allclose(odo.pose, [1.0, 2.0, 0.5])
    assert odo.timestamp == 99.0


def test_simulated_ranges_hit_walls():
    cfg = synth.SimConfig(step=1.0, range_noise=0.0)
    scans, poses = synth.simulate(config=cfg)
    # Robot inside the world: most beams should return finite ranges.
    hit_frac = np.mean([np.mean(s.ranges < cfg.max_range) for s in scans])
    assert hit_frac > 0.8
    # Odometry drifts from truth over the loop.
    drift = np.linalg.norm(scans[-1].odom_pose[:2] - poses[-1][:2])
    assert drift > 0.05


def test_pack_scans_padding():
    cfg = synth.SimConfig(step=5.0)
    scans, _ = synth.simulate(config=cfg)
    batch = pack_scans(scans[:2], capacity=256)
    assert batch.ranges.shape == (2, 256)
    assert batch.valid[:, :181].all()
    assert not batch.valid[:, 181:].any()


def test_adversarial_odometry_profiles():
    """The bias/drift/slip odometry models (synth.ADVERSARIAL_PROFILES,
    round 4) must each degrade RAW odometry substantially versus the
    default idealized noise — otherwise the recorded per-profile ATE
    table measures nothing."""
    import numpy as np

    from my_lidar_graph_slam_tpu.io import synth

    def raw_odom_err(profile):
        cfg = synth.SimConfig(step=0.25, max_range=12.0, seed=4,
                              **(synth.ADVERSARIAL_PROFILES.get(profile)
                                 if profile else {}))
        scans, gt = synth.simulate(config=cfg)
        odom = np.stack([s.odom_pose for s in scans])
        return float(np.linalg.norm(odom[:, :2] - gt[:, :2], axis=1).max())

    base = raw_odom_err(None)
    for name in ("bias", "drift", "slip"):
        err = raw_odom_err(name)
        assert err > 1.5 * base, (name, err, base)
