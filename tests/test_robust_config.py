"""Robust launcher config (DCS + multi-candidate search) end-to-end.

BASELINE.md's round-4 robustness table measures the full-size aliased
intel world (Huber 6.86 m vs DCS+K3 0.35 m); this test pins the shipped
``launcher_settings_robust.json`` plumbing at CI scale: the config loads,
selects DCS and NumOfCandidateMaps=3, and a full launcher run on a
two-lap world closes loops and stays near ground truth.
"""

import numpy as np

from my_lidar_graph_slam_tpu import launcher
from my_lidar_graph_slam_tpu.utils import config as config_mod
from my_lidar_graph_slam_tpu.utils.metrics import MetricManager


def test_robust_config_selects_dcs_and_k3():
    cfg = config_mod.load("configs/launcher_settings_robust.json")
    s = config_mod.create_slam(cfg)
    assert s.backend.lm_config.loss_name == "DCS"
    assert s.backend.searcher.num_candidate_maps == 3
    # Everything else matches the default config.
    d = config_mod.load("configs/launcher_settings_default.json")
    sd = config_mod.create_slam(d)
    assert sd.backend.lm_config.loss_name == "Huber"
    assert s.frontend.config.loop_detection_interval == \
        sd.frontend.config.loop_detection_interval


def test_robust_config_end_to_end(tmp_path):
    """Two-lap default world through the full launcher with the robust
    config: loop closures fire and ATE stays within a few cells."""
    from my_lidar_graph_slam_tpu.io import synth

    wp1 = synth.loop_waypoints()
    wps = np.concatenate([wp1, wp1[1:]], axis=0)
    cfg = synth.SimConfig(step=0.4, max_range=12.0, seed=2)
    scans, gt = synth.simulate(waypoints=wps, config=cfg)
    log = str(tmp_path / "robust.clf")
    synth.write_carmen_log(log, scans, max_range=cfg.max_range)
    np.savez(str(tmp_path / "robust_gt.npz"), true_poses=gt,
             timestamps=np.array([s.timestamp for s in scans]))

    MetricManager._instance = None
    stats = launcher.run(
        log, "configs/launcher_settings_robust.json",
        str(tmp_path / "out"), threaded_backend=False,
        gt_path=str(tmp_path / "robust_gt.npz"))
    assert stats["num_loop_closures"] >= 3
    assert stats["ate_rmse_m"] < 0.3, stats
