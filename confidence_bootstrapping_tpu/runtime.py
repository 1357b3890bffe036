"""Process-level runtime knobs (compilation cache, profiling helpers).

The reference has no compile step to cache (eager torch); under XLA the
scatter/gather-heavy score-model graphs take minutes to compile on the CPU
backend and ~20-40 s on TPU, so every CLI enables JAX's persistent
compilation cache: warm invocations of dock/train/infer skip compilation
entirely.
"""

from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Point JAX at a persistent on-disk compile cache. Returns the dir
    actually used, or None when the cache could not be enabled.

    Resolution order: explicit arg > $CBT_COMPILE_CACHE > ~/.cache/...
    Set CBT_COMPILE_CACHE=0 to disable.
    """
    env = os.environ.get("CBT_COMPILE_CACHE")
    if env == "0":
        return None
    cache_dir = cache_dir or env or os.path.expanduser("~/.cache/confidence_bootstrapping_tpu/jax")
    try:
        import jax

        # Scope the cache per backend: an AOT executable compiled for one
        # backend (or libtpu build) must never be replayed on another — a
        # stale TPU entry poisoning a CPU run fails with a libtpu version
        # mismatch instead of recompiling.
        try:
            backend = jax.default_backend()
        except Exception:
            backend = "unknown"
        cache_dir = os.path.join(cache_dir, backend)
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
        jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
        return cache_dir
    except Exception:
        return None
