#!/usr/bin/env python
"""Generate a synthetic CARMEN log + ground truth.

Usage: python tools/make_synth_log.py <output_prefix> [--laps N]
       [--step M] [--max-range R] [--seed S]

Writes ``<prefix>.clf`` (old-format FLASER records) and ``<prefix>_gt.npz``
(true poses + timestamps).
"""

import argparse
import sys

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

from my_lidar_graph_slam_tpu.io import synth  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("prefix")
    p.add_argument("--laps", type=int, default=1)
    p.add_argument("--step", type=float, default=0.1)
    p.add_argument("--max-range", type=float, default=12.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--world",
                   choices=("default", "intel", "aces", "killian"),
                   default="default",
                   help="'intel' = multi-loop intel.clf-like floor; "
                        "'aces' = long-corridor building loop (BB frontend "
                        "workload); 'killian' = mit-killian-scale multi-"
                        "wing floor (thousands of scans, many submaps)")
    p.add_argument("--profile", choices=tuple(synth.ADVERSARIAL_PROFILES),
                   default=None,
                   help="adversarial odometry model (bias / drift / slip)")
    args = p.parse_args()

    if args.world == "intel":
        world = synth.intel_world()
        wps = synth.intel_waypoints(laps=args.laps)
    elif args.world == "aces":
        world = synth.aces_world()
        wps = synth.aces_waypoints(laps=args.laps)
    elif args.world == "killian":
        world = synth.killian_world()
        wps = synth.killian_waypoints(laps=args.laps)
    else:
        world = None
        wp1 = synth.loop_waypoints()
        wps = wp1
        for _ in range(args.laps - 1):
            wps = np.concatenate([wps, wp1[1:]], axis=0)

    extra = synth.ADVERSARIAL_PROFILES.get(args.profile, {}) \
        if args.profile else {}
    cfg = synth.SimConfig(step=args.step, max_range=args.max_range,
                          seed=args.seed, **extra)
    scans, gt = synth.simulate(world=world, waypoints=wps, config=cfg)
    synth.write_carmen_log(args.prefix + ".clf", scans,
                           max_range=cfg.max_range)
    np.savez(args.prefix + "_gt.npz", true_poses=gt,
             timestamps=np.array([s.timestamp for s in scans]))
    print(f"wrote {args.prefix}.clf ({len(scans)} scans) and "
          f"{args.prefix}_gt.npz")


if __name__ == "__main__":
    main()
