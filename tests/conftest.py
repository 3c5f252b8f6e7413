"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding logic is validated on a
faked 8-device CPU platform, the standard JAX approach for testing pjit /
shard_map programs.
"""

import os

# Hard override: the environment presets JAX_PLATFORMS to the TPU platform
# and a sitecustomize hook imports jax before conftest runs, so the env var
# alone is not enough — set the config explicitly after import below.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_mlgs")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
