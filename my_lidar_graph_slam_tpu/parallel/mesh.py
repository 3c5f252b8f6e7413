"""Device mesh construction helpers.

The reference's only concurrency is a frontend/backend thread pair sharing
one mutex (lidar_graph_slam.cpp:399-456); the TPU framework's scaling axes
are instead data-parallel dimensions laid over a ``jax.sharding.Mesh``:

 * ``edges``  — pose-graph edges, sharded for the distributed CG solve;
 * ``cands``  — loop-closure candidate nodes, fanned out across chips.

On a single host the mesh spans the local devices; under ``jax.distributed``
initialization the same code spans hosts, with collectives riding ICI within
a slice and DCN across slices.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["Mesh", "NamedSharding", "P", "make_mesh"]


def make_mesh(n_devices: int | None = None, axis: str = "shard") -> Mesh:
    """A 1D mesh over the first ``n_devices`` devices."""
    devices = jax.devices()
    n = n_devices or len(devices)
    if n > len(devices):
        raise ValueError(
            f"requested {n} devices, only {len(devices)} available")
    return Mesh(np.asarray(devices[:n]), (axis,))
