"""Multi-host runtime: jax.distributed initialization + global-mesh helpers.

The reference is a single-process program (its only concurrency is the
2-thread frontend/backend split, lidar_graph_slam.cpp:399-456). The
TPU-native framework scales the backend across HOSTS (BASELINE config 5):
the frontend runs on process 0; loop-closure detection queries and the
edge-sharded pose-graph solve fan out over a mesh spanning every process's
devices, with collectives riding ICI within a slice and DCN across hosts.

The same code paths run under a CPU simulation (N processes x M virtual
CPU devices, the standard JAX multi-process test setup) — that is how
tests/test_multihost.py validates the cross-process programs without pod
hardware.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialize the jax.distributed runtime.

    With no arguments, reads the standard env vars (JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID) or the cloud auto-detection; safe to
    call once per process before any device use.
    """
    kwargs = {}
    if coordinator_address is None:
        coordinator_address = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes,
                      process_id=process_id)
    jax.distributed.initialize(**kwargs)


def global_mesh(axis: str = "shard") -> Mesh:
    """1-D mesh over every device of every process."""
    return Mesh(np.asarray(jax.devices()), (axis,))


def host_local_to_global(mesh: Mesh, spec: P, local_array: np.ndarray):
    """Assemble a global sharded jax.Array from per-process local shards.

    ``local_array`` is this process's slice along the sharded axis (equal
    split across processes, standard SPMD data feeding). Replicated inputs
    (``spec == P()``) must be identical on every process.
    """
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_process_local_data(sharding, local_array)


def fetch_global(tree):
    """Bring a (possibly multi-process-sharded) pytree fully to the host.

    ``np.asarray`` on an array spanning non-addressable devices raises;
    when more than one process participates, gather the global value with
    ``process_allgather`` instead. Single-process arrays (or plain numpy)
    pass straight through.
    """
    import numpy as np

    def fetch(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            from jax.experimental import multihost_utils
            return np.asarray(
                multihost_utils.process_allgather(x, tiled=True))
        return np.asarray(x)

    return jax.tree_util.tree_map(fetch, tree)


def replicate(mesh: Mesh, tree):
    """Put a pytree on every device, replicated."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)), tree)


def shard_edges_global(mesh: Mesh, axis: str, graph_arrays):
    """Distribute a GraphArrays snapshot for the cross-host edge-sharded
    solver: poses/node_mask replicated, edge arrays sharded over ``axis``.

    Every process passes the FULL host snapshot (the pose graph lives on
    the frontend host and is broadcast; edge capacity must divide by the
    global device count) and this returns global jax.Arrays suitable for
    ``distributed.optimize_sharded`` on the global mesh.
    """
    from my_lidar_graph_slam_tpu.models.pose_graph import GraphArrays

    nproc = jax.process_count()
    pid = jax.process_index()

    def place(x, spec):
        x = np.asarray(x)
        if spec == P(axis):
            per = x.shape[0] // nproc
            local = x[pid * per:(pid + 1) * per]
        else:
            local = x
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), local)

    return GraphArrays(
        poses=place(graph_arrays.poses, P()),
        node_mask=place(graph_arrays.node_mask, P()),
        edge_i=place(graph_arrays.edge_i, P(axis)),
        edge_j=place(graph_arrays.edge_j, P(axis)),
        edge_rel=place(graph_arrays.edge_rel, P(axis)),
        edge_info=place(graph_arrays.edge_info, P(axis)),
        edge_mask=place(graph_arrays.edge_mask, P(axis)),
    )
