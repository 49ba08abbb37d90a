"""Persistent XLA compilation cache for user-facing entry points.

Cold-compiling the fused 1080p programs takes minutes on this class of
remote TPU runtime (docs/performance.md "Compile times"); the reference
starts converting immediately because torch's kernels are precompiled
(nunif/utils/video.py:956).  The TPU equivalent is jax's persistent
compilation cache: with it enabled, the first run of a config pays the
compile once and every later run (same process or not) starts in
seconds.  ``tools/warmup_cache.py`` pre-installs the production configs
into the same cache.

Every CLI/server entry point calls ``enable_persistent_cache()`` first.
Cache location: ``$JAX_CACHE_DIR`` if set, else
``~/.cache/nunif_tpu/jax_cache`` (created 0700).
"""
from __future__ import annotations

import os

_enabled = False


def enable_persistent_cache(cache_dir: str | None = None) -> str:
    global _enabled
    import jax

    path = (cache_dir or os.environ.get("JAX_CACHE_DIR")
            or os.path.join(os.path.expanduser("~"), ".cache", "nunif_tpu",
                            "jax_cache"))
    if not _enabled:
        os.makedirs(path, mode=0o700, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # only persist compiles worth persisting; tiny programs recompile
        # faster than they deserialize
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
        _enabled = True
    return path
