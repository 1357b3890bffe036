"""Test config: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding paths are exercised without TPUs via
``xla_force_host_platform_device_count`` (the JAX-native analogue of a fake
distributed backend; see SURVEY.md section 4e). The axon TPU plugin registers
itself at interpreter start and forces ``jax_platforms=axon``; we override it
back to CPU before any backend initialization. Set ``CBT_TEST_TPU=1`` to run
the suite on the real chip instead.
"""

import os

if not os.environ.get("CBT_TEST_TPU"):
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
    import jax

    jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: CPU-backend compiles of the
# scatter/gather-heavy graphs take minutes; cache them across test runs.
import jax as _jax  # noqa: E402

_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".cache", "jax_compilation")
os.makedirs(_cache_dir, exist_ok=True)
_jax.config.update("jax_compilation_cache_dir", _cache_dir)
_jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
try:
    _jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
except Exception:
    pass
