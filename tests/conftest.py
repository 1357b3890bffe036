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
from confidence_bootstrapping_tpu.runtime import enable_compilation_cache  # noqa: E402

enable_compilation_cache(os.path.join(os.path.dirname(__file__), "..", ".cache", "jax_compilation"))
