"""Test configuration: persistent compile cache + CPU backend for mesh tests.

`jax` is pre-imported by the environment before conftest runs, so plain
JAX_* environment variables are read too late — all JAX configuration here
must go through `jax.config.update`. XLA_FLAGS is still effective via
os.environ because backends initialize lazily (no jax.devices() call has
happened yet when conftest imports).
"""

import os

# Virtual 8-device CPU platform for sharding tests (must precede backend init).
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# Keep the accelerator (axon TPU) as the default compute backend when present,
# but always expose a CPU backend so sharding tests can build the virtual
# 8-device mesh via jax.devices("cpu"). The update must be unconditional:
# some environments register the accelerator from sitecustomize in a way that
# overrides JAX_PLATFORMS, so `JAX_PLATFORMS=cpu pytest` only works if we
# push the env value through jax.config ourselves.
_platforms = os.environ.get("JAX_PLATFORMS", "")
if not _platforms:
    jax.config.update("jax_platforms", "cpu")
elif "cpu" not in _platforms.split(","):
    jax.config.update("jax_platforms", _platforms + ",cpu")
else:
    jax.config.update("jax_platforms", _platforms)

# Persistent compilation cache: the limb-arithmetic graphs are large and
# compile-heavy; caching makes repeated test runs fast.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
