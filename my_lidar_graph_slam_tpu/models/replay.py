"""Device-resident chunked replay frontend.

The online frontend (slam.Frontend / lidar_graph_slam_frontend.cpp:37-145)
pays one synchronous device round trip per keyframe for the match dispatch
and one for the map update — ~37 ms each through the axon tunnel, which
made the TPU end-to-end run SLOWER than the same Python on CPU (BASELINE
r4: 2.6-5.0 scans/s TPU vs 11.2 CPU on the 748-scan world). Replay mode
amortizes the round trip over K keyframes:

* The keyframe gate depends ONLY on odometry and timestamps
  (lidar_graph_slam_frontend.cpp:60-75 — travel/angle/elapsed thresholds
  over raw odometry), so the full keyframe schedule is precomputed on the
  host before any device work (:func:`precompute_keyframes`).

* Scan matching depends ONLY on the latest map (the last-N-keyframes
  window rebuilt from scratch each keyframe, grid_map_builder.cpp:196-207)
  and the previous matched pose — NOT on the local submaps. The
  sequential chain ``pose[t-1] -> latest map -> match -> pose[t]`` for K
  keyframes therefore runs as ONE ``lax.scan`` inside ONE dispatch
  (:func:`_replay_chunk`): each step rebuilds the window map on-device,
  builds the MXU tiles, and runs the gather-free Pallas sweep + cost/
  covariance — the exact per-keyframe program the online frontend
  dispatches, just without the host in the loop. Only the K poses +
  covariances transfer back.

* Local-map integration (grid_map_builder.cpp:48-59) commutes with
  matching, so it runs AFTER the chunk: split decisions walk the matched
  poses on the host with the exact per-scan semantics
  (``GridMapBuilder._update_local_maps``), and each local map's new scans
  integrate in one batched ``integrate_scans`` dispatch
  (:meth:`GridMapBuilder append_scans_chunk <my_lidar_graph_slam_tpu.models.map_builder.GridMapBuilder.append_scans_chunk>`).

* Backend cadence: notify points inside a chunk (every
  ``LoopDetectionInterval`` keyframes, lidar_graph_slam_frontend.cpp:
  130-133) collapse to one synchronous backend pass at the chunk
  boundary — the same coalescing the reference's condition variable
  performs when the worker is busy (lidar_graph_slam.cpp:447-456).

Chunked results equal per-scan results exactly up to f32 compilation-
order noise (pinned by tests/test_replay.py: chunk=K == chunk=1, and
replay == online Frontend on the same kernel).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from my_lidar_graph_slam_tpu.models import slam as slam_mod
from my_lidar_graph_slam_tpu.models.scan_matchers import CorrelativeMatcher
from my_lidar_graph_slam_tpu.ops import grid as gridops
from my_lidar_graph_slam_tpu.ops import raycast
from my_lidar_graph_slam_tpu.sensor.data import RawScan
from my_lidar_graph_slam_tpu.utils import se2


@dataclasses.dataclass
class Keyframe:
    """One precomputed keyframe: the processed scan + odometry context."""

    scan: RawScan                  # accumulated/interpolated scan
    odom_pose: np.ndarray          # raw odometry pose at this keyframe
    rel_from_update: np.ndarray    # odom delta since the previous keyframe
    notify: bool                   # backend notify fires at this keyframe


def precompute_keyframes(scan_records: List[RawScan], fe_config,
                         interpolator=None, accumulator=None
                         ) -> List[Keyframe]:
    """Replicate the frontend keyframe gate over the whole log.

    Exactly the gating state machine of ``slam.Frontend.process_scan``
    (lidar_graph_slam_frontend.cpp:43-75): accumulated travel distance /
    angle from raw odometry deltas plus elapsed time, reset at each
    update. Preprocessing (accumulator/interpolator) likewise depends
    only on raw scans, so the processed keyframe scans are materialized
    here too.
    """
    cfg = fe_config
    keyframes: List[Keyframe] = []
    last_odom = np.zeros(3)
    acc_dist = 0.0
    acc_angle = 0.0
    last_update_odom = np.zeros(3)
    last_update_time = 0.0
    count = 0
    for i, scan in enumerate(scan_records):
        odom = np.asarray(scan.odom_pose, np.float64)
        rel = (np.zeros(3) if i == 0 else
               se2.inverse_compound_np(last_odom, odom))
        last_odom = odom.copy()
        acc_dist += float(np.hypot(rel[0], rel[1]))
        acc_angle += abs(float(rel[2]))
        if accumulator is not None:
            accumulator.append(scan)
        elapsed = 0.0 if count == 0 else scan.timestamp - last_update_time
        update = (acc_dist >= cfg.update_threshold_travel_dist
                  or acc_angle >= cfg.update_threshold_angle
                  or elapsed >= cfg.update_threshold_time
                  or count == 0)
        if not update:
            continue
        s = (accumulator.concatenated()
             if accumulator is not None else scan)
        if interpolator is not None:
            s = interpolator(s)
        rel_from_update = (np.zeros(3) if count == 0 else
                           se2.inverse_compound_np(last_update_odom, odom))
        notify = (count > cfg.loop_detection_interval and
                  count % cfg.loop_detection_interval == 0)
        keyframes.append(Keyframe(
            scan=s, odom_pose=odom, rel_from_update=rel_from_update,
            notify=notify))
        count += 1
        acc_dist = 0.0
        acc_angle = 0.0
        last_update_odom = odom.copy()
        last_update_time = s.timestamp
    return keyframes


@functools.partial(
    jax.jit,
    static_argnames=("chunk", "window", "latest_size", "max_steps",
                     "win_x", "win_y", "win_theta_max", "cost_type",
                     "greedy_params", "interpret", "cost_kernel_ok"))
def _replay_chunk(w_poses, w_active, w_ranges, w_angles, w_valid,
                  w_rel, w_rmin, w_rmax,
                  rel_from_update, kf_min_range, kf_max_range, kf_beams,
                  resolution, prob_hit, prob_miss,
                  scan_range_max, range_theta,
                  m_usable_min, m_usable_max,
                  chunk: int, window: int, latest_size: int,
                  max_steps: int,
                  win_x: int, win_y: int, win_theta_max: int,
                  cost_type: str, greedy_params: tuple,
                  interpret: bool, cost_kernel_ok: bool):
    """K keyframes' match chain as one jitted ``lax.scan``.

    Row layout (W = ``window`` = NumOfScansForLatestMap, K = ``chunk``):
    arrays ``w_*`` have W + K rows — rows [0, W) are the last W pre-chunk
    keyframes (front-padded inactive when fewer exist; row W-1 is the
    most recent), row W+t is chunk keyframe t. Scan tensors for chunk
    rows are filled by the host; ``w_poses`` chunk rows are filled
    in-scan with the matched poses.

    Step t: (a) rebuild the latest map from window rows [t, t+W) centered
    at pose row W+t-1 (grid_map_builder.cpp:196-207 semantics), (b) build
    MXU tiles and run the fused correlative sweep + cost/covariance for
    keyframe t with initial pose ``compound(pose[W+t-1],
    rel_from_update[t])``, (c) write the matched pose into row W+t.
    Returns stacked per-keyframe [K, ...] outputs: estimated pose,
    covariance, normalized score/cost, pose_found.
    """
    from my_lidar_graph_slam_tpu.ops import matchers_mxu

    res = resolution

    def body(poses, t):
        prev_pose = jax.lax.dynamic_slice(poses, (window + t - 1, 0),
                                          (1, 3))[0]
        center = prev_pose[:2]
        origin = center - 0.5 * res * latest_size

        def win(a):
            return jax.lax.dynamic_slice(
                a, (t,) + (0,) * (a.ndim - 1),
                (window,) + a.shape[1:])

        latest = gridops.GridMap(
            jnp.zeros((latest_size, latest_size), jnp.float32),
            jnp.zeros((latest_size, latest_size), bool),
            origin, res)
        latest = raycast.integrate_scans(
            latest, win(poses), win(w_ranges), win(w_angles),
            win(w_valid), win(w_rel), win(w_rmin), win(w_rmax),
            scan_active=win(w_active), prob_hit=prob_hit,
            prob_miss=prob_miss, max_steps=max_steps)

        vals = gridops.values(latest)
        tiles = matchers_mxu.make_tiles(vals)
        init = se2.compound(prev_pose, rel_from_update[t])
        kf = window + t

        summary = matchers_mxu._match_one_map(
            vals, tiles, latest, init[None, :],
            jax.lax.dynamic_slice(w_ranges, (kf, 0),
                                  (1, w_ranges.shape[1])),
            jax.lax.dynamic_slice(w_angles, (kf, 0),
                                  (1, w_angles.shape[1])),
            jax.lax.dynamic_slice(w_valid, (kf, 0),
                                  (1, w_valid.shape[1])),
            kf_min_range[t][None], kf_max_range[t][None],
            jax.lax.dynamic_slice(w_rel, (kf, 0), (1, 3)),
            scan_range_max, range_theta, m_usable_min, m_usable_max,
            jnp.asarray(0.0, jnp.float32), kf_beams[t][None],
            win_x, win_y, win_theta_max, None, 16,
            cost_type, greedy_params, interpret, "correlative",
            jnp.float32, cost_kernel_ok)

        est = summary.estimated_pose[0]
        poses = jax.lax.dynamic_update_slice(poses, est[None, :], (kf, 0))
        ys = (est, summary.covariance[0], summary.normalized_score[0],
              summary.normalized_cost[0], summary.pose_found[0])
        return poses, ys

    _, (est, cov, score, cost, found) = jax.lax.scan(
        body, w_poses, jnp.arange(chunk, dtype=jnp.int32))
    return est, cov, score, cost, found


class ReplayRunner:
    """Drive a :class:`slam.LidarGraphSlam` through a log in chunks.

    Stand-in for the per-scan launcher loop (slam_launcher.cpp:980-1013):
    same SLAM object, same graph/builder/backend state afterwards, but
    the frontend device work runs ``chunk`` keyframes per dispatch.
    Requires the correlative frontend matcher (the launcher default);
    other matchers fall back to the per-scan path.
    """

    def __init__(self, slam_obj: slam_mod.LidarGraphSlam, chunk: int = 16,
                 interpret: Optional[bool] = None):
        self.slam = slam_obj
        self.chunk = int(chunk)
        m = slam_obj.frontend.matcher
        if not isinstance(m, CorrelativeMatcher):
            raise ValueError(
                "replay mode requires the RealTimeCorrelative frontend "
                f"matcher (got {type(m).__name__})")
        self.matcher = m
        self.interpret = (m.mxu_interpret if interpret is None
                          else bool(interpret))

    # -- chunk preparation ---------------------------------------------------

    def _window_arrays(self, kf_batch: List[Keyframe], scan_ids: np.ndarray,
                       nb: int):
        """Build the W+K row arrays for one chunk (see _replay_chunk)."""
        slam_obj = self.slam
        st = slam_obj.scans
        bcfg = slam_obj.builder.config
        w = bcfg.num_scans_for_latest_map
        k = self.chunk
        n_nodes = slam_obj.graph.num_nodes
        pre = min(w, n_nodes)
        pre_nodes = np.arange(n_nodes - pre, n_nodes)
        pre_ids = slam_obj.graph.scan_ids[pre_nodes].astype(np.int64)

        rows = w + k
        poses = np.zeros((rows, 3), np.float32)
        active = np.zeros((rows,), bool)
        ranges = np.zeros((rows, nb), np.float32)
        angles = np.zeros((rows, nb), np.float32)
        valid = np.zeros((rows, nb), bool)
        rel = np.zeros((rows, 3), np.float32)
        rmin = np.full((rows,), bcfg.usable_range_min, np.float32)
        rmax = np.full((rows,), bcfg.usable_range_max, np.float32)

        def fill(row, sid):
            ranges[row] = st.ranges[sid, :nb]
            angles[row] = st.angles[sid, :nb]
            valid[row] = st.valid[sid, :nb]
            rel[row] = st.rel_sensor_pose[sid]
            rmin[row] = max(bcfg.usable_range_min, float(st.min_range[sid]))
            rmax[row] = min(bcfg.usable_range_max, float(st.max_range[sid]))

        for j, (node, sid) in enumerate(zip(pre_nodes, pre_ids)):
            row = w - pre + j
            poses[row] = slam_obj.graph.poses[node]
            active[row] = True
            fill(row, int(sid))
        for t, sid in enumerate(scan_ids):
            row = w + t
            active[row] = t < len(kf_batch)
            if t < len(kf_batch):
                fill(row, int(sid))
        return poses, active, ranges, angles, valid, rel, rmin, rmax

    def _run_chunk(self, kf_batch: List[Keyframe]):
        """Dispatch one chunk; returns per-keyframe host results."""
        slam_obj = self.slam
        st = slam_obj.scans
        m = self.matcher
        bcfg = slam_obj.builder.config
        k = self.chunk

        scan_ids = np.array(
            [st.append(kf.scan) for kf in kf_batch], np.int64)
        pad_ids = np.concatenate(
            [scan_ids, np.zeros(k - len(kf_batch), np.int64)])

        # Beam and ray-step buckets over everything the chunk touches.
        w = bcfg.num_scans_for_latest_map
        n_nodes = slam_obj.graph.num_nodes
        pre_ids = slam_obj.graph.scan_ids[
            max(0, n_nodes - w):n_nodes].astype(np.int64)
        all_ids = np.concatenate([pre_ids, scan_ids])
        nb = st.beam_bucket()
        reach = min(bcfg.usable_range_max,
                    float(st.max_range[all_ids].max()))
        steps = int(-(-(reach / bcfg.resolution + 2) // 64) * 64)
        steps = min(steps, bcfg.max_ray_steps)

        (poses, active, ranges, angles, valid,
         rel, rmin, rmax) = self._window_arrays(kf_batch, pad_ids, nb)

        rel_upd = np.zeros((k, 3), np.float32)
        kmin = np.zeros((k,), np.float32)
        kmax = np.zeros((k,), np.float32)
        beams = np.ones((k,), np.float32)
        for t, kf in enumerate(kf_batch):
            rel_upd[t] = kf.rel_from_update
            sid = int(scan_ids[t])
            kmin[t] = st.min_range[sid]
            kmax[t] = st.max_range[sid]
            beams[t] = max(int(st.raw_beams[sid]), 1)

        win_x, win_y, win_t = m._window(bcfg.resolution)
        est, cov, score, cost, found = _replay_chunk(
            jnp.asarray(poses), jnp.asarray(active), jnp.asarray(ranges),
            jnp.asarray(angles), jnp.asarray(valid), jnp.asarray(rel),
            jnp.asarray(rmin), jnp.asarray(rmax),
            jnp.asarray(rel_upd), jnp.asarray(kmin), jnp.asarray(kmax),
            jnp.asarray(beams),
            jnp.asarray(bcfg.resolution, jnp.float32),
            jnp.asarray(bcfg.prob_hit, jnp.float32),
            jnp.asarray(bcfg.prob_miss, jnp.float32),
            jnp.asarray(m.scan_range_max, jnp.float32),
            jnp.asarray(m.range_theta, jnp.float32),
            jnp.asarray(m.usable_range_min, jnp.float32),
            jnp.asarray(m.usable_range_max, jnp.float32),
            chunk=k, window=w, latest_size=bcfg.latest_map_size,
            max_steps=steps, win_x=win_x, win_y=win_y, win_theta_max=win_t,
            cost_type=m.cost_type, greedy_params=m.greedy_params,
            interpret=self.interpret,
            cost_kernel_ok=m._cost_kernel_ok(bcfg.resolution))
        # ONE packed transfer for the whole chunk.
        out = np.asarray(jnp.concatenate([
            est, cov.reshape(k, 9), score[:, None], cost[:, None],
            found[:, None].astype(jnp.float32)], axis=1))
        m._count("FrontendMxuMatches", len(kf_batch))
        return scan_ids, out[:, 0:3], out[:, 3:12].reshape(k, 3, 3), \
            out[:, 14] > 0.5

    # -- top-level loop ------------------------------------------------------

    def run(self, scan_records: List[RawScan],
            progress_cb=None) -> int:
        """Process the whole log; returns the number of keyframes."""
        import time as _time

        from my_lidar_graph_slam_tpu.utils.metrics import MetricManager
        metrics = MetricManager.instance()

        slam_obj = self.slam
        fe = slam_obj.frontend
        t0 = _time.time()
        kfs = precompute_keyframes(
            scan_records, fe.config,
            interpolator=fe.interpolator, accumulator=fe.accumulator)
        if not kfs:
            return 0
        metrics.gauges("ReplayPrecomputeSeconds").set(_time.time() - t0)

        # Bootstrap: first keyframe at the initial pose
        # (lidar_graph_slam_frontend.cpp:86-90), then its map update —
        # the per-scan path, one-off.
        t0 = _time.time()
        slam_obj.append_first_node(fe.config.initial_pose, kfs[0].scan)
        slam_obj.update_grid_map()
        fe.process_count = 1
        metrics.gauges("ReplayBootstrapSeconds").set(_time.time() - t0)

        last_pass_node = 0
        i = 1
        while i < len(kfs):
            batch = kfs[i:i + self.chunk]
            t0 = _time.time()
            scan_ids, est, cov, found = self._run_chunk(batch)
            assert bool(np.all(found[:len(batch)])), \
                "scan matching failed in replay chunk"

            # Append nodes + odometry edges with the matched poses
            # (exactly what the per-scan frontend does,
            # slam.Frontend.process_scan).
            first_node = slam_obj.graph.num_nodes
            for t in range(len(batch)):
                latest_pose = slam_obj.graph.latest_pose()
                edge_rel = se2.inverse_compound_np(
                    latest_pose, est[t].astype(np.float64))
                slam_obj.append_odometry_node_and_edge(
                    int(scan_ids[t]), edge_rel, cov[t].astype(np.float64))

            # Batched local-map integration + one latest-map rebuild.
            slam_obj.builder.append_scans_chunk(
                slam_obj.graph, first_node, len(batch))
            metrics.distributions("FrontendChunkTime").observe(
                _time.time() - t0)
            metrics.counters("ReplayKeyframes").increment(len(batch))

            fe.process_count += len(batch)
            if any(kf.notify for kf in batch) and \
                    slam_obj.backend is not None:
                # Coalesced sync pass at the chunk boundary (the condvar
                # drop-while-busy semantics, lidar_graph_slam.cpp:447-456).
                # Every node appended since the LAST pass can trigger a
                # candidate, so mid-chunk revisits are not lost to the
                # coarser boundary sampling (search_window).
                t0 = _time.time()
                slam_obj.backend.run_once(
                    slam_obj,
                    window_nodes=range(last_pass_node + 1,
                                       slam_obj.graph.num_nodes))
                last_pass_node = slam_obj.graph.num_nodes - 1
                metrics.distributions("BackendPassTime").observe(
                    _time.time() - t0)
            if progress_cb is not None:
                progress_cb(fe.process_count)
            i += len(batch)
        return len(kfs)
