"""Persistent XLA compilation cache.

The axon remote-compile service costs 2-7 minutes per distinct jitted program
(BENCH_r01: warm_s 328 s), and the reference-equivalent drivers (bench.py, the
CLI, scripts/tpu_validate.py) each pay it again in every fresh process. JAX's
persistent compilation cache serializes compiled executables to disk keyed on
(HLO, compile options, backend), so a second invocation of the same program
skips compilation entirely. The reference has no analog — Julia's precompile
cache plays this role there (SURVEY.md §2.2 packaging).
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.expanduser("~"), ".cache",
                            "raytracingweekend_jl_tpu", "xla")

_enabled = False


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    """Turn on JAX's persistent compilation cache (idempotent).

    ``RTW_COMPILATION_CACHE`` overrides the location; ``RTW_NO_CACHE=1``
    disables it (useful when benchmarking cold-compile time itself).
    Returns the cache directory (or "" when disabled).
    """
    global _enabled
    if os.environ.get("RTW_NO_CACHE"):
        return ""
    path = cache_dir or os.environ.get("RTW_COMPILATION_CACHE", _DEFAULT_DIR)
    os.makedirs(path, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    # Cache everything that took noticeable compile time; the default 1 s
    # floor would already include every render program, but the drivers also
    # re-run tiny helper jits worth keeping on this tunnel.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    _enabled = True
    return path
