"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding tests use
`xla_force_host_platform_device_count` per the standard JAX recipe.
"""

import os

# Keep the accelerator (axon TPU) as the default compute backend when present,
# but always expose a CPU backend so sharding tests can build the virtual
# 8-device mesh via jax.devices("cpu").
_platforms = os.environ.get("JAX_PLATFORMS", "")
if _platforms and "cpu" not in _platforms:
    os.environ["JAX_PLATFORMS"] = _platforms + ",cpu"
else:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Persistent compilation cache: the limb-arithmetic graphs are large and
# compile-heavy; caching makes repeated test runs fast.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
