"""Multi-chip distribution: device meshes, sharded solvers, fan-out."""
