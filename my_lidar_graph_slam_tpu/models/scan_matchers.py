"""Frontend scan-matcher strategy wrappers.

Thin host-side strategy objects over the jitted matcher kernels in
``ops/matchers.py``, mirroring the reference's factory-constructed matcher
polymorphism (slam_launcher.cpp:325-480, scan_matcher.hpp:83-103). Each
wrapper exposes ``match(grid, scan_store, scan_id, initial_pose)``.

Default greedy-endpoint parameters replicate the launcher's *effective*
configuration, including the swapped (scale, sigma) constructor arguments —
see ops/cost.py.

Frontend score threshold: the reference frontend calls the matcher overload
that passes ``std::numeric_limits<double>::min()`` — the smallest POSITIVE
double — as the normalized threshold (scan_matcher_real_time_correlative
.cpp:40-46), then asserts pose_found (lidar_graph_slam_frontend.cpp:
109-110). Scores are sums of non-negative occupancies, so the equivalent
here is threshold 0.0 with strict ``>``: a scan that hits no known cell
(score 0) fails the match exactly as the reference's assert would fire.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from my_lidar_graph_slam_tpu.ops import grid as gridops
from my_lidar_graph_slam_tpu.ops import matchers, pyramid as pyrops


def _set_row(full, i, one):
    out = full.copy()
    out[i] = one
    return out


def _pack_summary(summary, q):
    """Pack a MatchSummary into one [Q, 16] array so the host pays ONE
    transfer round trip per dispatch (~37 ms each through the tunnel)."""
    return jnp.concatenate([
        summary.estimated_pose,                            # 0:3
        summary.covariance.reshape(q, 9),                  # 3:12
        summary.normalized_score[:, None],                 # 12
        summary.normalized_cost[:, None],                  # 13
        summary.pose_found[:, None].astype(jnp.float32),   # 14
        jnp.ones((q, 1), jnp.float32),                     # 15: exact
    ], axis=1)


def _unpack_summary(packed, initial_poses):
    return matchers.MatchSummary(
        pose_found=packed[:, 14] > 0.5,
        normalized_cost=packed[:, 13],
        normalized_score=packed[:, 12],
        initial_pose=np.asarray(initial_poses, np.float32),
        estimated_pose=packed[:, 0:3],
        covariance=packed[:, 3:12].reshape(-1, 3, 3),
        frontier_overflow=np.zeros(packed.shape[0], np.int32),
    )


@functools.partial(
    jax.jit,
    static_argnames=("win_x", "win_y", "win_theta_max", "cost_type",
                     "greedy_params", "interpret", "cost_kernel_ok"))
def _fused_mxu_match(log_odds, observed, origin, resolution,
                     initial_poses, ranges, angles, valid,
                     scan_min_range, scan_max_range, rel_sensor_poses,
                     scan_range_max, range_theta,
                     usable_range_min, usable_range_max,
                     normalized_score_threshold, num_total_beams,
                     win_x: int, win_y: int, win_theta_max: int,
                     cost_type: str, greedy_params: tuple,
                     interpret: bool, cost_kernel_ok: bool = True):
    """One-dispatch gather-free frontend match: occupancy values + MXU
    tile build + full-window Pallas sweep fused into a single program.

    The latest map changes every keyframe, so the tile array cannot be
    cached like the loop detector's per-local-map tiles
    (map_builder.mxu_tiles_for) — fusing the tile build into the match
    dispatch keeps the frontend at ONE tunnel round trip per keyframe,
    same as the pruned path it replaces. Exact by construction (brute
    force over the window), so there is no certificate/fallback dispatch.
    """
    from my_lidar_graph_slam_tpu.ops import matchers_mxu

    grid = gridops.GridMap(log_odds, observed, origin, resolution)
    vals = gridops.values(grid)
    tiles = matchers_mxu.make_tiles(vals)
    summary = matchers_mxu.correlative_match_mxu_batch(
        vals, tiles, grid, initial_poses, ranges, angles, valid,
        scan_min_range, scan_max_range, rel_sensor_poses,
        scan_range_max, range_theta, usable_range_min, usable_range_max,
        normalized_score_threshold, num_total_beams,
        win_x=win_x, win_y=win_y, win_theta_max=win_theta_max,
        cost_type=cost_type, greedy_params=greedy_params,
        interpret=interpret, score_gate="correlative",
        cost_kernel_ok=cost_kernel_ok)
    return _pack_summary(summary, initial_poses.shape[0])


@functools.partial(
    jax.jit,
    static_argnames=("win_x", "win_y", "win_theta_max", "top_groups",
                     "top_thetas", "cost_type", "greedy_params"))
def _fused_pruned_match(log_odds, observed, origin, resolution,
                        initial_poses, ranges, angles, valid,
                        scan_min_range, scan_max_range, rel_sensor_poses,
                        scan_range_max, range_theta,
                        usable_range_min, usable_range_max,
                        normalized_score_threshold, num_total_beams,
                        win_x: int, win_y: int, win_theta_max: int,
                        top_groups: int, top_thetas: int,
                        cost_type: str, greedy_params: tuple):
    """One-dispatch frontend match step: occupancy values + bound stack +
    pruned match fused into a single program, with the whole result packed
    into one small array so the host pays ONE transfer round trip
    (the tunnel costs ~37 ms per synchronous dispatch — the frontend's
    dominant cost at SLAM rates)."""
    grid = gridops.GridMap(log_odds, observed, origin, resolution)
    vals = gridops.values(grid)
    stack = matchers.make_bound_stack(vals, win_x, win_y)
    summary, exact = matchers.correlative_match_pruned_batch(
        vals, stack, grid, initial_poses, ranges, angles, valid,
        scan_min_range, scan_max_range, rel_sensor_poses,
        scan_range_max, range_theta, usable_range_min, usable_range_max,
        normalized_score_threshold, num_total_beams,
        win_x=win_x, win_y=win_y, win_theta_max=win_theta_max,
        top_groups=top_groups, top_thetas=top_thetas,
        cost_type=cost_type, greedy_params=greedy_params)
    q = initial_poses.shape[0]
    packed = jnp.concatenate([
        summary.estimated_pose,                       # 0:3
        summary.covariance.reshape(q, 9),             # 3:12
        summary.normalized_score[:, None],            # 12
        summary.normalized_cost[:, None],             # 13
        summary.pose_found[:, None].astype(jnp.float32),   # 14
        exact[:, None].astype(jnp.float32),           # 15
    ], axis=1)
    return packed

# Effective defaults given launcher_settings_default.json:2-9 and the
# constructor-argument swap at slam_launcher.cpp:70-72.
DEFAULT_GREEDY_PARAMS = (
    ("hit_and_missed_dist", 0.075),
    ("occupancy_threshold", 0.1),
    ("kernel_size", 1),
    ("standard_deviation", 1.0),
    ("scaling_factor", 0.05),
)


def _scan_args(store, scan_id: int):
    return dict(
        ranges=jnp.asarray(store.ranges[scan_id]),
        angles=jnp.asarray(store.angles[scan_id]),
        valid=jnp.asarray(store.valid[scan_id]),
        scan_min_range=jnp.asarray(store.min_range[scan_id]),
        scan_max_range=jnp.asarray(store.max_range[scan_id]),
        rel_sensor_pose=jnp.asarray(store.rel_sensor_pose[scan_id]),
    )


@dataclasses.dataclass
class CorrelativeMatcher:
    """ScanMatcherRealTimeCorrelative config
    (launcher_settings_default.json:42-50).

    Both entry points dispatch a single-program batched kernel: ``match``
    runs one query as a Q=1 batch; ``match_batch`` scores many scans
    against one map in ONE device dispatch (the deployment shape of
    pipelined replay and of the loop-closure candidate fan-out).

    Kernel selection (``use_mxu``): ``None`` auto-selects the gather-free
    Pallas MXU full-window sweep (``ops/matchers_mxu``) whenever the
    backend can run it and the window fits the kernel budget — exact by
    construction, no certificate/fallback dispatch; otherwise (and on
    CPU) the pruned bound-and-refine gather path runs with brute-force
    re-runs of certificate misses. ``mxu_interpret`` forces the Pallas
    kernel's interpret mode (CPU tests). The per-match choice is recorded
    in the ``FrontendMxuMatches`` / ``FrontendPrunedMatches`` counters so
    a launcher run can prove which kernel served the frontend.
    """

    low_resolution: int = 5      # kept for config parity; the TPU kernel
    range_x: float = 0.2         # evaluates the full window directly
    range_y: float = 0.2
    range_theta: float = 0.5
    scan_range_max: float = 20.0
    usable_range_min: float = 0.01
    usable_range_max: float = 20.0
    theta_chunk: int = 16
    cost_type: str = "greedy_endpoint"
    greedy_params: tuple = DEFAULT_GREEDY_PARAMS
    last_exact_fraction: float = 1.0  # certificate hit rate of last batch
    use_mxu: object = None       # None = auto, True/False = force
    mxu_interpret: bool = False

    def _window(self, res: float):
        win_x = int(np.ceil(0.5 * self.range_x / res))
        win_y = int(np.ceil(0.5 * self.range_y / res))
        win_t = matchers.static_max_theta_window(
            res, self.scan_range_max, self.range_theta)
        return win_x, win_y, win_t

    def _mxu_enabled(self, win_x: int, win_y: int) -> bool:
        from my_lidar_graph_slam_tpu.ops import matchers_mxu
        from my_lidar_graph_slam_tpu.ops.pallas import correlate_mxu
        if not matchers_mxu.supported(win_x, win_y):
            return False
        if self.use_mxu is not None:
            return bool(self.use_mxu)
        if self.mxu_interpret:
            return True
        return correlate_mxu.available()

    def _count(self, name: str, n: int = 1):
        from my_lidar_graph_slam_tpu.utils.metrics import MetricManager
        MetricManager.instance().counters(name).increment(n)

    def _cost_kernel_ok(self, res: float) -> bool:
        """Pallas cost-kernel envelope guard (ADVICE r4): the 32-row tile
        covers any <=17-row read set; longer usable range or finer
        resolution overflows it SILENTLY, so such configs must use the
        host cost path."""
        from my_lidar_graph_slam_tpu.ops.pallas import greedy_cost_mxu
        gp = dict(self.greedy_params)
        return greedy_cost_mxu.envelope_ok(
            res, self.usable_range_max,
            gp.get("hit_and_missed_dist", 0.075),
            gp.get("kernel_size", 1))

    def _match_mxu(self, grid, store, scan_ids, initial_poses,
                   win_x, win_y, win_t) -> matchers.MatchSummary:
        """MXU path for any Q: ONE fused dispatch (values + tile build +
        Pallas sweep), ONE packed transfer; exact over the window."""
        ids = np.asarray(scan_ids)
        nb = store.beam_bucket()
        packed = np.asarray(_fused_mxu_match(
            grid.log_odds, grid.observed, grid.origin, grid.resolution,
            jnp.asarray(np.asarray(initial_poses), jnp.float32),
            jnp.asarray(store.ranges[ids][:, :nb]),
            jnp.asarray(store.angles[ids][:, :nb]),
            jnp.asarray(store.valid[ids][:, :nb]),
            jnp.asarray(store.min_range[ids]),
            jnp.asarray(store.max_range[ids]),
            jnp.asarray(store.rel_sensor_pose[ids]),
            jnp.asarray(self.scan_range_max, jnp.float32),
            jnp.asarray(self.range_theta, jnp.float32),
            jnp.asarray(self.usable_range_min, jnp.float32),
            jnp.asarray(self.usable_range_max, jnp.float32),
            jnp.asarray(0.0, jnp.float32),
            jnp.asarray(store.raw_beams[ids], jnp.float32),
            win_x=win_x, win_y=win_y, win_theta_max=win_t,
            cost_type=self.cost_type, greedy_params=self.greedy_params,
            interpret=self.mxu_interpret,
            cost_kernel_ok=self._cost_kernel_ok(float(grid.resolution))))
        self.last_exact_fraction = 1.0
        self._count("FrontendMxuMatches", len(ids))
        return _unpack_summary(packed, initial_poses)

    def match_async(self, grid: gridops.GridMap, store, scan_id: int,
                    initial_pose):
        """Dispatch a single-query MXU match WITHOUT blocking.

        Returns the packed [1, 16] device array with an async
        host-transfer already started; resolve with
        :meth:`resolve_async`. Only valid when the MXU path is enabled
        (the pipelined frontend's requirement)."""
        res = float(grid.resolution)
        win_x, win_y, win_t = self._window(res)
        assert self._mxu_enabled(win_x, win_y), \
            "async match requires the MXU kernel path"
        ids = np.asarray([scan_id])
        nb = store.beam_bucket()
        packed = _fused_mxu_match(
            grid.log_odds, grid.observed, grid.origin, grid.resolution,
            jnp.asarray(np.asarray(initial_pose, np.float32)[None, :]),
            jnp.asarray(store.ranges[ids][:, :nb]),
            jnp.asarray(store.angles[ids][:, :nb]),
            jnp.asarray(store.valid[ids][:, :nb]),
            jnp.asarray(store.min_range[ids]),
            jnp.asarray(store.max_range[ids]),
            jnp.asarray(store.rel_sensor_pose[ids]),
            jnp.asarray(self.scan_range_max, jnp.float32),
            jnp.asarray(self.range_theta, jnp.float32),
            jnp.asarray(self.usable_range_min, jnp.float32),
            jnp.asarray(self.usable_range_max, jnp.float32),
            jnp.asarray(0.0, jnp.float32),
            jnp.asarray(store.raw_beams[ids], jnp.float32),
            win_x=win_x, win_y=win_y, win_theta_max=win_t,
            cost_type=self.cost_type, greedy_params=self.greedy_params,
            interpret=self.mxu_interpret,
            cost_kernel_ok=self._cost_kernel_ok(res))
        try:
            packed.copy_to_host_async()
        except AttributeError:
            pass
        self._count("FrontendMxuMatches")
        return packed

    def resolve_async(self, packed, initial_pose) -> matchers.MatchSummary:
        """Block on an async match's transfer and unpack the summary."""
        out = _unpack_summary(
            np.asarray(packed),
            np.asarray(initial_pose, np.float32)[None, :])
        return matchers.MatchSummary(*(leaf[0] for leaf in out))

    def match(self, grid: gridops.GridMap, store, scan_id: int,
              initial_pose) -> matchers.MatchSummary:
        """Single-query frontend match: ONE fused device dispatch + ONE
        packed host transfer. MXU path when enabled; otherwise the pruned
        gather path, falling back to the brute batch kernel when the
        exactness certificate fails (rare)."""
        res = float(grid.resolution)
        win_x, win_y, win_t = self._window(res)
        if self._mxu_enabled(win_x, win_y):
            out = self._match_mxu(
                grid, store, [scan_id],
                np.asarray(initial_pose, np.float32)[None, :],
                win_x, win_y, win_t)
            return matchers.MatchSummary(*(leaf[0] for leaf in out))
        self._count("FrontendPrunedMatches")
        nb = store.beam_bucket()
        sid = slice(scan_id, scan_id + 1)

        packed = np.asarray(_fused_pruned_match(
            grid.log_odds, grid.observed, grid.origin, grid.resolution,
            jnp.asarray(np.asarray(initial_pose)[None, :], jnp.float32),
            jnp.asarray(store.ranges[sid, :nb]),
            jnp.asarray(store.angles[sid, :nb]),
            jnp.asarray(store.valid[sid, :nb]),
            jnp.asarray(store.min_range[sid]),
            jnp.asarray(store.max_range[sid]),
            jnp.asarray(store.rel_sensor_pose[sid]),
            jnp.asarray(self.scan_range_max, jnp.float32),
            jnp.asarray(self.range_theta, jnp.float32),
            jnp.asarray(self.usable_range_min, jnp.float32),
            jnp.asarray(self.usable_range_max, jnp.float32),
            jnp.asarray(0.0, jnp.float32),
            jnp.asarray(store.raw_beams[sid], jnp.float32),
            win_x=win_x, win_y=win_y, win_theta_max=win_t,
            top_groups=14, top_thetas=48,
            cost_type=self.cost_type,
            greedy_params=self.greedy_params))[0]

        exact = bool(packed[15] > 0.5)
        self.last_exact_fraction = 1.0 if exact else 0.0
        if not exact:
            batched = self.match_batch(grid, store, [scan_id],
                                       np.asarray(initial_pose)[None, :])
            return matchers.MatchSummary(
                *(leaf[0] for leaf in batched))
        return matchers.MatchSummary(
            pose_found=packed[14] > 0.5,
            normalized_cost=packed[13],
            normalized_score=packed[12],
            initial_pose=np.asarray(initial_pose, np.float32),
            estimated_pose=packed[0:3],
            covariance=packed[3:12].reshape(3, 3),
        )

    def match_batch(self, grid: gridops.GridMap, store, scan_ids,
                    initial_poses) -> matchers.MatchSummary:
        """Match Q scans against ``grid`` in one dispatch; returns a
        batched :class:`matchers.MatchSummary` (leading axis Q).

        Runs the pruned bound-and-refine kernel; queries whose exactness
        certificate fails (the unexplored upper bounds were not strictly
        below the found maximum) are re-run through the brute-force batch
        kernel, so the combined result always equals brute force.
        ``self.last_exact_fraction`` records the certificate hit rate.
        """
        res = float(grid.resolution)
        win_x, win_y, win_t = self._window(res)
        if self._mxu_enabled(win_x, win_y):
            return self._match_mxu(grid, store, scan_ids,
                                   np.asarray(initial_poses, np.float32),
                                   win_x, win_y, win_t)
        self._count("FrontendPrunedMatches", len(scan_ids))
        ids = np.asarray(scan_ids)
        vals = gridops.values(grid)

        # Beam-width bucket: scans are front-packed in the store, so the
        # kernels only need the first ceil(max_beams / 64) * 64 columns —
        # every map read costs one scalar gather, so width is throughput.
        nb = store.beam_bucket()

        args = dict(
            ranges=jnp.asarray(store.ranges[ids][:, :nb]),
            angles=jnp.asarray(store.angles[ids][:, :nb]),
            valid=jnp.asarray(store.valid[ids][:, :nb]),
            scan_min_range=jnp.asarray(store.min_range[ids]),
            scan_max_range=jnp.asarray(store.max_range[ids]),
            rel_sensor_poses=jnp.asarray(store.rel_sensor_pose[ids]),
            scan_range_max=jnp.asarray(self.scan_range_max, jnp.float32),
            range_theta=jnp.asarray(self.range_theta, jnp.float32),
            usable_range_min=jnp.asarray(self.usable_range_min,
                                         jnp.float32),
            usable_range_max=jnp.asarray(self.usable_range_max,
                                         jnp.float32),
            normalized_score_threshold=jnp.asarray(0.0, jnp.float32),
            num_total_beams=jnp.asarray(store.raw_beams[ids], jnp.float32),
        )
        poses = jnp.asarray(initial_poses, jnp.float32)

        bound_stack = matchers.make_bound_stack(vals, win_x, win_y)
        summary, exact = matchers.correlative_match_pruned_batch(
            vals, bound_stack, grid, poses, **args,
            win_x=win_x, win_y=win_y, win_theta_max=win_t,
            cost_type=self.cost_type, greedy_params=self.greedy_params)

        exact_np = np.asarray(exact)
        self.last_exact_fraction = float(exact_np.mean())
        if exact_np.all():
            return summary

        # Brute-force re-run of the inexact rows, padded to a power-of-two
        # bucket so recompiles stay bounded.
        bad = np.flatnonzero(~exact_np)
        bucket = 1
        while bucket < len(bad):
            bucket *= 2
        sel = np.resize(bad, bucket)
        brute = matchers.correlative_match_batch(
            vals, grid, poses[sel],
            args["ranges"][sel], args["angles"][sel], args["valid"][sel],
            args["scan_min_range"][sel], args["scan_max_range"][sel],
            args["rel_sensor_poses"][sel],
            args["scan_range_max"], args["range_theta"],
            args["usable_range_min"], args["usable_range_max"],
            args["normalized_score_threshold"],
            args["num_total_beams"][sel],
            win_x=win_x, win_y=win_y, win_theta_max=win_t,
            theta_chunk=self.theta_chunk,
            cost_type=self.cost_type, greedy_params=self.greedy_params)

        merged = jax.tree_util.tree_map(np.asarray, summary)
        brute_np = jax.tree_util.tree_map(np.asarray, brute)
        pos = {int(s): k for k, s in enumerate(sel)}
        for i in bad:
            k = pos[int(i)]
            merged = jax.tree_util.tree_map(
                lambda full, one, i=i, k=k: _set_row(full, i, one[k]),
                merged, brute_np)
        return matchers.MatchSummary(*merged)


@dataclasses.dataclass
class BranchBoundMatcher:
    """ScanMatcherBranchBound config (launcher_settings_default.json:132-141).

    As a frontend matcher it precomputes the pyramid per call, like
    ScanMatcherBranchBound::OptimizePose (scan_matcher_branch_bound.cpp:37-39).
    """

    node_height_max: int = 6
    range_x: float = 2.0
    range_y: float = 2.0
    range_theta: float = 1.0
    scan_range_max: float = 20.0
    usable_range_min: float = 0.01
    usable_range_max: float = 20.0
    frontier_cap: int = 4096
    cost_type: str = "greedy_endpoint"
    greedy_params: tuple = DEFAULT_GREEDY_PARAMS

    def match(self, grid, store, scan_id, initial_pose):
        res = float(grid.resolution)
        pyr = pyrops.build_pyramid(gridops.values(grid), self.node_height_max)
        win_x = int(np.ceil(0.5 * self.range_x / res))
        win_y = int(np.ceil(0.5 * self.range_y / res))
        win_t = matchers.static_max_theta_window(
            res, self.scan_range_max, self.range_theta)
        return matchers.branch_bound_match(
            pyr, grid, jnp.asarray(initial_pose, jnp.float32),
            scan_range_max=jnp.asarray(self.scan_range_max, jnp.float32),
            range_theta=jnp.asarray(self.range_theta, jnp.float32),
            usable_range_min=jnp.asarray(self.usable_range_min, jnp.float32),
            usable_range_max=jnp.asarray(self.usable_range_max, jnp.float32),
            normalized_score_threshold=jnp.asarray(0.0, jnp.float32),
            node_height_max=self.node_height_max,
            win_x=win_x, win_y=win_y, win_theta_max=win_t,
            frontier_cap=self.frontier_cap,
            cost_type=self.cost_type,
            num_total_beams=int(store.raw_beams[scan_id]),
            greedy_params=self.greedy_params,
            **_scan_args(store, scan_id))


@dataclasses.dataclass
class GridSearchMatcher:
    """ScanMatcherGridSearch config
    (launcher_settings_default.json:71-82)."""

    range_x: float = 2.0
    range_y: float = 2.0
    range_theta: float = 0.5
    step_x: float = 0.05
    step_y: float = 0.05
    step_theta: float = 0.005
    usable_range_min: float = 0.01
    usable_range_max: float = 20.0
    cost_type: str = "greedy_endpoint"
    greedy_params: tuple = DEFAULT_GREEDY_PARAMS

    def match(self, grid, store, scan_id, initial_pose):
        nx = 2 * int(np.floor(0.5 * self.range_x / self.step_x)) + 1
        ny = 2 * int(np.floor(0.5 * self.range_y / self.step_y)) + 1
        nt = 2 * int(np.floor(0.5 * self.range_theta / self.step_theta)) + 1
        return matchers.grid_search_match(
            gridops.values(grid), grid,
            jnp.asarray(initial_pose, jnp.float32),
            usable_range_min=jnp.asarray(self.usable_range_min, jnp.float32),
            usable_range_max=jnp.asarray(self.usable_range_max, jnp.float32),
            normalized_score_threshold=jnp.asarray(0.0, jnp.float32),
            step_x=jnp.asarray(self.step_x, jnp.float32),
            step_y=jnp.asarray(self.step_y, jnp.float32),
            step_t=jnp.asarray(self.step_theta, jnp.float32),
            nx=nx, ny=ny, nt=nt,
            cost_type=self.cost_type,
            num_total_beams=int(store.raw_beams[scan_id]),
            greedy_params=self.greedy_params,
            **_scan_args(store, scan_id))


@dataclasses.dataclass
class HillClimbingMatcher:
    """ScanMatcherHillClimbing config
    (launcher_settings_default.json:22-29)."""

    linear_step: float = 0.1
    angular_step: float = 0.1
    max_iterations: int = 100
    max_refinements: int = 5
    usable_range_min: float = 0.01
    usable_range_max: float = 20.0
    cost_type: str = "greedy_endpoint"
    greedy_params: tuple = DEFAULT_GREEDY_PARAMS

    def match(self, grid, store, scan_id, initial_pose):
        return matchers.hill_climbing_match(
            gridops.values(grid), grid,
            jnp.asarray(initial_pose, jnp.float32),
            usable_range_min=jnp.asarray(self.usable_range_min, jnp.float32),
            usable_range_max=jnp.asarray(self.usable_range_max, jnp.float32),
            linear_step=self.linear_step, angular_step=self.angular_step,
            max_iterations=self.max_iterations,
            max_refinements=self.max_refinements,
            cost_type=self.cost_type,
            num_total_beams=int(store.raw_beams[scan_id]),
            greedy_params=self.greedy_params,
            **_scan_args(store, scan_id))


@dataclasses.dataclass
class LinearSolverMatcher:
    """ScanMatcherLinearSolver config
    (launcher_settings_default.json:31-40)."""

    max_iterations: int = 100
    convergence_threshold: float = 1e-3
    usable_range_min: float = 0.01
    usable_range_max: float = 20.0
    translation_regularizer: float = 1e-3
    rotation_regularizer: float = 1e-3

    def match(self, grid, store, scan_id, initial_pose):
        return matchers.linear_solver_match(
            gridops.values(grid), grid,
            jnp.asarray(initial_pose, jnp.float32),
            usable_range_min=jnp.asarray(self.usable_range_min, jnp.float32),
            usable_range_max=jnp.asarray(self.usable_range_max, jnp.float32),
            translation_regularizer=self.translation_regularizer,
            rotation_regularizer=self.rotation_regularizer,
            convergence_threshold=self.convergence_threshold,
            max_iterations=self.max_iterations,
            num_total_beams=int(store.raw_beams[scan_id]),
            **_scan_args(store, scan_id))
