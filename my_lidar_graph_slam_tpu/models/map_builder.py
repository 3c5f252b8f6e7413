"""Submap management: local maps, latest map, rebuilds.

TPU-native redesign of GridMapBuilder (grid_map_builder.{hpp,cpp}): local
maps are fixed-size dense log-odds tensors centered at the robot pose at
creation time (replacing the growing patch-paged maps), the latest map is
rebuilt from the last N scans as one batched ray-cast program, and the
post-loop-closure rebuild of every local map reuses the same batched
integration kernel (grid_map_builder.cpp:62-80, 227-332).

Scan tensors for all pose-graph nodes live in a :class:`ScanStore` —
fixed-width (beam-capacity) host arrays handed to device programs in
statically bucketed batches so recompilation stays bounded.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from my_lidar_graph_slam_tpu.models.pose_graph import PoseGraph
from my_lidar_graph_slam_tpu.ops import grid as gridops
from my_lidar_graph_slam_tpu.ops import pyramid as pyrops
from my_lidar_graph_slam_tpu.ops import raycast
from my_lidar_graph_slam_tpu.sensor.data import RawScan
from my_lidar_graph_slam_tpu.utils import se2


def _bucket(n: int, minimum: int = 8) -> int:
    cap = minimum
    while cap < n:
        cap *= 2
    return cap


@functools.partial(jax.jit, static_argnames=("max_steps", "latest_size"))
def _fused_map_update(local_log_odds, local_observed, local_origin,
                      resolution,
                      new_sensor_pose, nr, na, nv, nrmin, nrmax,
                      latest_center, poses, rr, ra, rv, rrel, rrmin, rrmax,
                      ractive, prob_hit, prob_miss,
                      max_steps: int, latest_size: int):
    """One-dispatch frontend map step: integrate the newest scan into the
    current local map AND rebuild the latest map from the last N scans
    (grid_map_builder.cpp:48-59, 196-207 as a single fused program — each
    synchronous dispatch through the device tunnel costs ~37 ms, so the
    frontend batches all per-keyframe map work into one)."""
    local = gridops.GridMap(local_log_odds, local_observed, local_origin,
                            resolution)
    local = raycast.integrate_scan(
        local, new_sensor_pose, nr, na, nv, nrmin, nrmax,
        prob_hit=prob_hit, prob_miss=prob_miss, max_steps=max_steps)

    origin = latest_center - 0.5 * resolution * latest_size
    latest = gridops.GridMap(
        jnp.zeros((latest_size, latest_size), jnp.float32),
        jnp.zeros((latest_size, latest_size), bool),
        origin, resolution)
    latest = raycast.integrate_scans(
        latest, poses, rr, ra, rv, rrel, rrmin, rrmax,
        scan_active=ractive, prob_hit=prob_hit, prob_miss=prob_miss,
        max_steps=max_steps)
    return (local.log_odds, local.observed,
            latest.log_odds, latest.observed, origin)


@functools.partial(jax.jit, static_argnames=("size", "max_steps"))
def _rebuild_maps_batched(origins, resolution, poses, ranges, angles,
                          valid, rel, rmin, rmax, active,
                          prob_hit, prob_miss,
                          size: int, max_steps: int):
    """Rebuild M same-size local maps from scratch in ONE program.

    vmap of the per-map sequential ``integrate_scans`` chain — identical
    per-map results to M separate ``_construct_from_nodes`` calls, but
    one dispatch instead of M (each costs a ~37 ms round trip plus, in a
    fresh process, a multi-second executable load through the tunnel;
    post-closure rebuilds were the largest unattributed cost of the
    replay e2e runs). Batch axes: ``origins`` f32[M, 2]; scan tensors
    [M, K, ...]; ``active`` bool[M, K] masks ragged per-map node counts.
    """
    def one(origin, p, r, a, v, rl, mn, mx, act):
        g = gridops.GridMap(jnp.zeros((size, size), jnp.float32),
                            jnp.zeros((size, size), bool),
                            origin, resolution)
        g = raycast.integrate_scans(
            g, p, r, a, v, rl, mn, mx, scan_active=act,
            prob_hit=prob_hit, prob_miss=prob_miss, max_steps=max_steps)
        return g.log_odds, g.observed

    return jax.vmap(one)(origins, poses, ranges, angles, valid, rel,
                         rmin, rmax, active)


class ScanStore:
    """Fixed-width scan tensors for every pose-graph node."""

    def __init__(self, beam_capacity: int = 1024):
        self.beam_capacity = beam_capacity
        cap = 64
        self.ranges = np.zeros((cap, beam_capacity), np.float32)
        self.angles = np.zeros((cap, beam_capacity), np.float32)
        self.valid = np.zeros((cap, beam_capacity), bool)
        self.min_range = np.zeros((cap,), np.float32)
        self.max_range = np.zeros((cap,), np.float32)
        self.rel_sensor_pose = np.zeros((cap, 3), np.float32)
        self.raw_beams = np.zeros((cap,), np.int32)
        self.timestamps = np.zeros((cap,), np.float64)
        self.count = 0

    def _grow(self, need: int):
        cap = self.ranges.shape[0]
        if need <= cap:
            return
        new_cap = _bucket(need, 64)
        for name in ("ranges", "angles", "valid", "min_range", "max_range",
                     "rel_sensor_pose", "raw_beams", "timestamps"):
            arr = getattr(self, name)
            new = np.zeros((new_cap,) + arr.shape[1:], arr.dtype)
            new[:cap] = arr
            setattr(self, name, new)

    def append(self, scan: RawScan) -> int:
        idx = self.count
        self._grow(idx + 1)
        n = min(scan.num_beams, self.beam_capacity)
        if scan.num_beams > self.beam_capacity:
            # Never truncate silently: interpolated 360/401-beam scans at
            # fine spacing can exceed the capacity.
            import sys
            from my_lidar_graph_slam_tpu.utils.metrics import MetricManager
            MetricManager.instance().counters(
                "ScanStoreTruncatedBeams").increment(
                scan.num_beams - self.beam_capacity)
            print(f"WARNING: scan {idx} truncated from {scan.num_beams} to "
                  f"{self.beam_capacity} beams (raise beam_capacity)",
                  file=sys.stderr)
        self.ranges[idx, :n] = scan.ranges[:n]
        self.ranges[idx, n:] = 0.0
        self.angles[idx, :n] = scan.angles[:n]
        self.angles[idx, n:] = 0.0
        self.valid[idx, :n] = True
        self.valid[idx, n:] = False
        self.min_range[idx] = scan.min_range
        self.max_range[idx] = scan.max_range
        self.rel_sensor_pose[idx] = scan.rel_sensor_pose
        self.raw_beams[idx] = scan.num_beams
        self.timestamps[idx] = scan.timestamp
        self.count += 1
        return idx

    def beam_bucket(self) -> int:
        """Store-wide 64-aligned beam-width bucket.

        Device programs slice scan tensors to this width. Using the
        STORE-WIDE maximum (not the per-batch maximum) keeps the compiled
        shape set stable across a run — on the tunnel every new shape
        costs a multi-second per-process executable load (verify skill,
        round 5), which dwarfs the few percent of extra masked beam work.
        """
        n = max(int(self.raw_beams[:self.count].max()), 1) \
            if self.count else 1
        return min(int(-(-n // 64) * 64), self.beam_capacity)


@dataclasses.dataclass
class LocalMap:
    """Mirror of LocalMapInfo (grid_map_builder.hpp:31-109)."""

    idx: int
    grid: gridops.GridMap
    node_idx_min: int
    node_idx_max: int
    finished: bool = False
    pyramid: Optional[jnp.ndarray] = None  # cached coarse-map stack
    mxu_tiles: Optional[object] = None     # cached MXU tile array
    values: Optional[jnp.ndarray] = None   # cached occupancy values
    # Node poses the current grid contents were integrated at (one row per
    # node in [node_idx_min, node_idx_max]); lets after_loop_closure skip
    # rebuilding maps whose optimized poses barely moved.
    built_poses: Optional[np.ndarray] = None

    @property
    def precomputed(self) -> bool:
        return self.pyramid is not None


@dataclasses.dataclass
class MapBuilderConfig:
    resolution: float = 0.05
    local_map_size: int = 1536        # cells per side (dense submap tensor)
    latest_map_size: int = 1024
    num_scans_for_latest_map: int = 10
    travel_dist_threshold: float = 20.0   # new local map spacing (m)
    usable_range_min: float = 0.01
    usable_range_max: float = 20.0
    prob_hit: float = 0.6
    prob_miss: float = 0.45
    max_ray_steps: int = 448


class GridMapBuilder:
    """Owns the local maps and the latest map (grid_map_builder.cpp:20-95)."""

    def __init__(self, config: MapBuilderConfig, scan_store: ScanStore):
        self.config = config
        self.scans = scan_store
        self.local_maps: List[LocalMap] = []
        self.latest_map: Optional[gridops.GridMap] = None
        self.latest_scan_idx_min = 0
        self.latest_scan_idx_max = 0
        self.accum_travel_dist = 0.0
        self.travel_dist_last_local_map = 0.0
        self.last_robot_pose = np.zeros(3)

    # -- scan integration ----------------------------------------------------

    def append_scan(self, graph: PoseGraph) -> bool:
        """Integrate the latest node's scan (grid_map_builder.cpp:48-59).

        Returns True when a new local map was created. All device work for
        the keyframe (local-map integration + latest-map rebuild) runs as
        ONE fused dispatch.
        """
        created = self._update_local_maps(graph)
        self._fused_frontend_update(graph)
        return created

    def _fused_frontend_update(self, graph: PoseGraph):
        cfg = self.config
        st = self.scans
        node_idx = graph.num_nodes - 1
        robot_pose = graph.poses[node_idx]
        scan_id = int(graph.scan_ids[node_idx])
        lm = self.local_maps[-1]

        lo = max(0, node_idx - cfg.num_scans_for_latest_map + 1)
        hi = node_idx
        k = cfg.num_scans_for_latest_map
        m = hi - lo + 1
        ids = graph.scan_ids[lo:hi + 1].astype(np.int64)

        nb = st.beam_bucket()
        reach = min(cfg.usable_range_max, float(st.max_range[ids].max()))
        steps = int(-(-(reach / cfg.resolution + 2) // 64) * 64)
        steps = min(steps, cfg.max_ray_steps)

        poses = np.zeros((k, 3), np.float32)
        poses[:m] = graph.poses[lo:hi + 1]
        ranges = np.zeros((k, nb), np.float32)
        angles = np.zeros((k, nb), np.float32)
        valid = np.zeros((k, nb), bool)
        rel = np.zeros((k, 3), np.float32)
        rmin = np.full((k,), cfg.usable_range_min, np.float32)
        rmax = np.full((k,), cfg.usable_range_max, np.float32)
        active = np.zeros((k,), bool)
        ranges[:m] = st.ranges[ids][:, :nb]
        angles[:m] = st.angles[ids][:, :nb]
        valid[:m] = st.valid[ids][:, :nb]
        rel[:m] = st.rel_sensor_pose[ids]
        rmin[:m] = np.maximum(cfg.usable_range_min, st.min_range[ids])
        rmax[:m] = np.minimum(cfg.usable_range_max, st.max_range[ids])
        active[:m] = True

        sensor_pose = se2.compound_np(robot_pose,
                                      st.rel_sensor_pose[scan_id])
        (l_lo, l_ob, latest_lo, latest_ob, latest_origin) = \
            _fused_map_update(
                lm.grid.log_odds, lm.grid.observed, lm.grid.origin,
                lm.grid.resolution,
                jnp.asarray(sensor_pose, jnp.float32),
                jnp.asarray(st.ranges[scan_id, :nb]),
                jnp.asarray(st.angles[scan_id, :nb]),
                jnp.asarray(st.valid[scan_id, :nb]),
                jnp.asarray(max(cfg.usable_range_min,
                                float(st.min_range[scan_id])), jnp.float32),
                jnp.asarray(min(cfg.usable_range_max,
                                float(st.max_range[scan_id])), jnp.float32),
                jnp.asarray(robot_pose[:2], jnp.float32),
                jnp.asarray(poses), jnp.asarray(ranges),
                jnp.asarray(angles), jnp.asarray(valid), jnp.asarray(rel),
                jnp.asarray(rmin), jnp.asarray(rmax), jnp.asarray(active),
                jnp.asarray(cfg.prob_hit, jnp.float32),
                jnp.asarray(cfg.prob_miss, jnp.float32),
                max_steps=steps,
                latest_size=cfg.latest_map_size)

        lm.grid = gridops.GridMap(l_lo, l_ob, lm.grid.origin,
                                  lm.grid.resolution)
        lm.node_idx_max = node_idx
        lm.pyramid = None
        lm.mxu_tiles = None
        lm.values = None
        row = np.asarray(robot_pose, np.float64)[None, :]
        lm.built_poses = row if lm.built_poses is None else \
            np.concatenate([lm.built_poses, row])
        self.latest_map = gridops.GridMap(latest_lo, latest_ob,
                                          latest_origin,
                                          lm.grid.resolution)
        self.latest_scan_idx_min = lo
        self.latest_scan_idx_max = hi

    def _scan_fits(self, grid: gridops.GridMap, robot_pose,
                   scan_id: int, margin: float = 1.0) -> bool:
        """Does this scan's hit-point bounding box fit the submap extent?

        The reference grows a patch-paged map on demand with a 5 m margin
        (GridMap::Expand, grid_map.hpp:652-736). Dense fixed-size TPU
        tensors cannot grow without a recompile, so the TPU-native
        equivalent is to FINISH the current local map early and start a
        fresh one centered on the robot whenever a scan would write outside
        the extent — no beam is ever silently dropped.
        """
        cfg = self.config
        st = self.scans
        sensor_pose = se2.compound_np(robot_pose,
                                      st.rel_sensor_pose[scan_id])
        n = int(st.raw_beams[scan_id])
        r = st.ranges[scan_id, :n]
        keep = st.valid[scan_id, :n] & \
            (r > cfg.usable_range_min) & (r < cfg.usable_range_max)
        if not keep.any():
            return True
        a = sensor_pose[2] + st.angles[scan_id, :n][keep]
        hx = sensor_pose[0] + r[keep] * np.cos(a)
        hy = sensor_pose[1] + r[keep] * np.sin(a)
        origin = np.asarray(grid.origin)
        h, w = grid.shape
        res = float(grid.resolution)
        lo = origin + margin
        hi = origin + res * np.array([w, h]) - margin
        return bool(hx.min() >= lo[0] and hx.max() <= hi[0] and
                    hy.min() >= lo[1] and hy.max() <= hi[1] and
                    lo[0] <= sensor_pose[0] <= hi[0] and
                    lo[1] <= sensor_pose[1] <= hi[1])

    def _update_local_maps(self, graph: PoseGraph) -> bool:
        cfg = self.config
        node_idx = graph.num_nodes - 1
        robot_pose = graph.poses[node_idx]
        scan_id = int(graph.scan_ids[node_idx])

        if self.local_maps:
            rel = se2.inverse_compound_np(self.last_robot_pose, robot_pose)
            d = float(np.hypot(rel[0], rel[1]))
            self.accum_travel_dist += d
            self.travel_dist_last_local_map += d
        self.last_robot_pose = robot_pose.copy()

        create_new = (not self.local_maps) or \
            (self.travel_dist_last_local_map >= cfg.travel_dist_threshold)
        if not create_new and not self._scan_fits(
                self.local_maps[-1].grid, robot_pose, scan_id):
            # Expand-equivalent: split the local map early instead of
            # growing the dense tensor (grid_map.hpp:652-736).
            from my_lidar_graph_slam_tpu.utils.metrics import MetricManager
            MetricManager.instance().counters(
                "LocalMapEarlySplits").increment()
            create_new = True
        if create_new:
            if self.local_maps:
                self.local_maps[-1].finished = True
            g = gridops.empty(cfg.local_map_size, cfg.local_map_size,
                              cfg.resolution, center=robot_pose[:2])
            self.local_maps.append(LocalMap(
                idx=len(self.local_maps), grid=g,
                node_idx_min=node_idx, node_idx_max=node_idx))
            self.travel_dist_last_local_map = 0.0

        # Integration happens in _fused_frontend_update (one dispatch with
        # the latest-map rebuild); here only bookkeeping.
        return create_new

    def _update_latest_map(self, graph: PoseGraph):
        """Rebuild the last-N-scans map (grid_map_builder.cpp:196-207)."""
        cfg = self.config
        last = graph.num_nodes - 1
        self.latest_scan_idx_min = max(
            0, last - cfg.num_scans_for_latest_map + 1)
        self.latest_scan_idx_max = last
        center = graph.poses[last][:2]
        g = gridops.empty(cfg.latest_map_size, cfg.latest_map_size,
                          cfg.resolution, center=center)
        self.latest_map = self._construct_from_nodes(
            g, graph, self.latest_scan_idx_min, self.latest_scan_idx_max,
            batch=cfg.num_scans_for_latest_map)

    def _construct_from_nodes(self, grid, graph: PoseGraph,
                              idx_min: int, idx_max: int,
                              batch: Optional[int] = None):
        """Batched ConstructMapFromScans (grid_map_builder.cpp:227-332).

        Integrates nodes [idx_min, idx_max] in order, in statically-bucketed
        chunks so compiled program shapes stay bounded.
        """
        cfg = self.config
        st = self.scans
        count = idx_max - idx_min + 1
        k = batch or min(_bucket(count), 128)
        all_ids = graph.scan_ids[idx_min:idx_max + 1].astype(np.int64)
        # Beam-width and ray-step buckets: the scatter kernel's work is
        # beams x steps, and scans are front-packed, so slicing to the
        # smallest covering bucket cuts the per-rebuild cost ~4-5x versus
        # always using the full store capacity.
        nb = st.beam_bucket()
        reach = min(cfg.usable_range_max, float(st.max_range[all_ids].max()))
        steps = int(-(-(reach / cfg.resolution + 2) // 64) * 64)
        steps = min(steps, cfg.max_ray_steps)
        for chunk_start in range(idx_min, idx_max + 1, k):
            chunk_end = min(chunk_start + k, idx_max + 1)
            m = chunk_end - chunk_start
            ids = graph.scan_ids[chunk_start:chunk_end].astype(np.int64)
            poses = np.zeros((k, 3), np.float32)
            poses[:m] = graph.poses[chunk_start:chunk_end]
            ranges = np.zeros((k, nb), np.float32)
            angles = np.zeros((k, nb), np.float32)
            valid = np.zeros((k, nb), bool)
            rel = np.zeros((k, 3), np.float32)
            rmin = np.full((k,), cfg.usable_range_min, np.float32)
            rmax = np.full((k,), cfg.usable_range_max, np.float32)
            active = np.zeros((k,), bool)
            ranges[:m] = st.ranges[ids][:, :nb]
            angles[:m] = st.angles[ids][:, :nb]
            valid[:m] = st.valid[ids][:, :nb]
            rel[:m] = st.rel_sensor_pose[ids]
            rmin[:m] = np.maximum(cfg.usable_range_min, st.min_range[ids])
            rmax[:m] = np.minimum(cfg.usable_range_max, st.max_range[ids])
            active[:m] = True
            grid = raycast.integrate_scans(
                grid, jnp.asarray(poses), jnp.asarray(ranges),
                jnp.asarray(angles), jnp.asarray(valid), jnp.asarray(rel),
                jnp.asarray(rmin), jnp.asarray(rmax),
                scan_active=jnp.asarray(active),
                prob_hit=cfg.prob_hit, prob_miss=cfg.prob_miss,
                max_steps=steps)
        return grid

    def append_scans_chunk(self, graph: PoseGraph, first_node: int,
                           count: int):
        """Batched AppendScan for ``count`` new nodes (replay mode).

        Walks the new nodes in order applying the exact per-scan local-map
        bookkeeping (travel accumulation, travel-threshold and early-split
        decisions — ``_update_local_maps``), but groups consecutive nodes
        that land in the same local map and integrates each group with ONE
        ``integrate_scans`` dispatch, then rebuilds the latest map once at
        the final node — replacing ``count`` per-keyframe fused dispatches
        with ~2 (the ~37 ms tunnel round trip per dispatch dominated the
        TPU frontend, BASELINE r4).
        """
        cfg = self.config
        groups = []  # [(local_map, [consecutive node indices])]
        for node_idx in range(first_node, first_node + count):
            robot_pose = graph.poses[node_idx]
            scan_id = int(graph.scan_ids[node_idx])

            if self.local_maps:
                rel = se2.inverse_compound_np(self.last_robot_pose,
                                              robot_pose)
                d = float(np.hypot(rel[0], rel[1]))
                self.accum_travel_dist += d
                self.travel_dist_last_local_map += d
            self.last_robot_pose = robot_pose.copy()

            create_new = (not self.local_maps) or \
                (self.travel_dist_last_local_map >= cfg.travel_dist_threshold)
            if not create_new and not self._scan_fits(
                    self.local_maps[-1].grid, robot_pose, scan_id):
                from my_lidar_graph_slam_tpu.utils.metrics import \
                    MetricManager
                MetricManager.instance().counters(
                    "LocalMapEarlySplits").increment()
                create_new = True
            if create_new:
                if self.local_maps:
                    self.local_maps[-1].finished = True
                g = gridops.empty(cfg.local_map_size, cfg.local_map_size,
                                  cfg.resolution, center=robot_pose[:2])
                self.local_maps.append(LocalMap(
                    idx=len(self.local_maps), grid=g,
                    node_idx_min=node_idx, node_idx_max=node_idx))
                self.travel_dist_last_local_map = 0.0
            lm = self.local_maps[-1]
            if groups and groups[-1][0] is lm:
                groups[-1][1].append(node_idx)
            else:
                groups.append((lm, [node_idx]))
            lm.node_idx_max = node_idx
            row = np.asarray(robot_pose, np.float64)[None, :]
            lm.built_poses = row if lm.built_poses is None else \
                np.concatenate([lm.built_poses, row])
            lm.pyramid = None
            lm.mxu_tiles = None
            lm.values = None

        # One batched integration per (local map, node run) group. The
        # chunk bucket is FIXED at 16 so one compiled shape serves every
        # group size (a new shape costs a per-process executable load on
        # the tunnel — see the verify skill).
        for lm, nodes in groups:
            lm.grid = self._construct_from_nodes(
                lm.grid, graph, nodes[0], nodes[-1],
                batch=16 * (1 + (len(nodes) - 1) // 16))

        self._update_latest_map(graph)

    # -- loop closure --------------------------------------------------------

    def after_loop_closure(self, graph: PoseGraph):
        """Rebuild local maps + the latest map from optimized poses
        (grid_map_builder.cpp:62-80).

        TPU-native increment over the reference: a local map whose
        optimized node poses moved less than half a cell (and whose
        rotation sweeps hit points by less than half a cell at max range)
        is bit-for-bit unchanged by a rebuild, so it is SKIPPED — after
        most closures only the handful of maps near the loop actually
        move, and each skipped map saves a multi-dispatch device rebuild
        (the dominant post-closure cost through the ~37 ms dispatch
        tunnel). The reference rebuilds everything because its rebuilds
        were CPU-local and cheap.
        """
        cfg = self.config
        st = self.scans
        eps_t = 0.5 * cfg.resolution
        eps_a = 0.5 * cfg.resolution / max(cfg.usable_range_max, 1e-6)
        from my_lidar_graph_slam_tpu.utils.metrics import MetricManager
        metrics = MetricManager.instance()
        rebuild: List[LocalMap] = []
        for lm in self.local_maps:
            new_poses = graph.poses[lm.node_idx_min:lm.node_idx_max + 1]
            if lm.built_poses is not None and \
                    lm.built_poses.shape == new_poses.shape:
                dt = np.abs(new_poses[:, :2] - lm.built_poses[:, :2]).max()
                da = np.abs(se2.normalize_angle_np(
                    new_poses[:, 2] - lm.built_poses[:, 2])).max()
                if dt < eps_t and da < eps_a:
                    metrics.counters("LocalMapRebuildsSkipped").increment()
                    continue
            rebuild.append(lm)

        if rebuild:
            # ALL moved maps rebuilt in batched dispatches (the
            # reference rebuilds each sequentially on the CPU,
            # grid_map_builder.cpp:62-80 — cheap there, a round trip per
            # map here). M is FIXED at 4 per dispatch and K bucketed from
            # 64 so the compiled shape set stays tiny — on the tunnel
            # every distinct program shape costs a multi-second
            # per-process executable load (verify skill, round 5).
            mcap = 4
            kmax = max(lm.node_idx_max - lm.node_idx_min + 1
                       for lm in rebuild)
            k = _bucket(kmax, 64)
            all_ids = np.concatenate([
                graph.scan_ids[lm.node_idx_min:lm.node_idx_max + 1]
                for lm in rebuild]).astype(np.int64)
            nb = st.beam_bucket()
            reach = min(cfg.usable_range_max,
                        float(st.max_range[all_ids].max()))
            steps = int(-(-(reach / cfg.resolution + 2) // 64) * 64)
            steps = min(steps, cfg.max_ray_steps)

            for b0 in range(0, len(rebuild), mcap):
                batch = rebuild[b0:b0 + mcap]
                origins = np.zeros((mcap, 2), np.float32)
                poses = np.zeros((mcap, k, 3), np.float32)
                ranges = np.zeros((mcap, k, nb), np.float32)
                angles = np.zeros((mcap, k, nb), np.float32)
                valid = np.zeros((mcap, k, nb), bool)
                rel = np.zeros((mcap, k, 3), np.float32)
                rmin = np.full((mcap, k), cfg.usable_range_min, np.float32)
                rmax = np.full((mcap, k), cfg.usable_range_max, np.float32)
                active = np.zeros((mcap, k), bool)
                for i, lm in enumerate(batch):
                    lo_n, hi_n = lm.node_idx_min, lm.node_idx_max
                    m = hi_n - lo_n + 1
                    ids = graph.scan_ids[lo_n:hi_n + 1].astype(np.int64)
                    center = graph.poses[lo_n][:2]
                    origins[i] = center - 0.5 * cfg.resolution * \
                        cfg.local_map_size
                    poses[i, :m] = graph.poses[lo_n:hi_n + 1]
                    ranges[i, :m] = st.ranges[ids][:, :nb]
                    angles[i, :m] = st.angles[ids][:, :nb]
                    valid[i, :m] = st.valid[ids][:, :nb]
                    rel[i, :m] = st.rel_sensor_pose[ids]
                    rmin[i, :m] = np.maximum(cfg.usable_range_min,
                                             st.min_range[ids])
                    rmax[i, :m] = np.minimum(cfg.usable_range_max,
                                             st.max_range[ids])
                    active[i, :m] = True

                log_odds, observed = _rebuild_maps_batched(
                    jnp.asarray(origins),
                    jnp.asarray(cfg.resolution, jnp.float32),
                    jnp.asarray(poses), jnp.asarray(ranges),
                    jnp.asarray(angles), jnp.asarray(valid),
                    jnp.asarray(rel), jnp.asarray(rmin),
                    jnp.asarray(rmax), jnp.asarray(active),
                    jnp.asarray(cfg.prob_hit, jnp.float32),
                    jnp.asarray(cfg.prob_miss, jnp.float32),
                    size=cfg.local_map_size, max_steps=steps)
                for i, lm in enumerate(batch):
                    lm.grid = gridops.GridMap(
                        log_odds[i], observed[i],
                        jnp.asarray(origins[i]),
                        jnp.asarray(cfg.resolution, jnp.float32))
                    lm.pyramid = None
                    lm.mxu_tiles = None
                    lm.values = None
                    lm.built_poses = np.asarray(
                        graph.poses[lm.node_idx_min:lm.node_idx_max + 1],
                        np.float64).copy()
                    metrics.counters("LocalMapRebuilds").increment()
        self._update_latest_map(graph)
        self._update_accum_travel_dist(graph)

    def _update_accum_travel_dist(self, graph: PoseGraph):
        """Recompute total travel from node poses
        (grid_map_builder.cpp:210-224)."""
        poses = graph.node_poses()
        if len(poses) < 2:
            self.accum_travel_dist = 0.0
            return
        d = np.diff(poses[:, :2], axis=0)
        self.accum_travel_dist = float(np.hypot(d[:, 0], d[:, 1]).sum())

    # -- global map ----------------------------------------------------------

    def construct_global_map(self, graph: PoseGraph) -> gridops.GridMap:
        """Re-integrate every scan into one map sized to the trajectory
        bounding box (grid_map_builder.cpp:83-95)."""
        cfg = self.config
        st = self.scans
        n = graph.num_nodes
        poses = graph.node_poses()
        margin = cfg.usable_range_max + 1.0
        lo = poses[:, :2].min(axis=0) - margin
        hi = poses[:, :2].max(axis=0) + margin
        center = 0.5 * (lo + hi)
        size_m = float((hi - lo).max())
        cells = int(np.ceil(size_m / cfg.resolution))
        cells = min(_bucket(cells, 256), 4096)
        g = gridops.empty(cells, cells, cfg.resolution, center=center)
        return self._construct_from_nodes(g, graph, 0, n - 1)

    # -- pyramid cache -------------------------------------------------------

    def pyramid_for(self, lm: LocalMap, height_max: int) -> jnp.ndarray:
        """Lazily build + cache the coarse-map stack for loop detection
        (the mPrecomputedMaps cache, loop_detector_branch_bound.cpp:52-60)."""
        if lm.pyramid is None or lm.pyramid.shape[0] != height_max + 1:
            lm.pyramid = pyrops.build_pyramid(
                gridops.values(lm.grid), height_max)
        return lm.pyramid

    def values_for(self, lm: LocalMap):
        """Lazily compute + cache the occupancy-value tensor.

        ``gridops.values`` is an EAGER device program (sigmoid + where
        over the full map); recomputing it per detection pass cost a
        dispatch plus, in a fresh process, a one-off executable load."""
        if lm.values is None:
            lm.values = gridops.values(lm.grid)
        return lm.values

    def mxu_tiles_for(self, lm: LocalMap):
        """Lazily build + cache the overlapped MXU tile array for the
        gather-free loop-detection sweep (the Pallas analog of the
        pyramid cache above)."""
        if lm.mxu_tiles is None:
            from my_lidar_graph_slam_tpu.ops import matchers_mxu
            lm.mxu_tiles = matchers_mxu.make_tiles(self.values_for(lm))
        return lm.mxu_tiles
