"""Persistent XLA compilation cache.

First compiles of the 30kb-genome kernels take minutes (more through a
remote-compile transport); caching executables on disk makes repeat CLI
invocations start in seconds.  Called by every engine entry point.
Override the location with UVAIA_TPU_CACHE_DIR; disable with
UVAIA_TPU_CACHE_DIR=off.
"""

from __future__ import annotations

import os

_done = False


def enable() -> None:
    global _done
    if _done:
        return
    _done = True
    path = os.environ.get("UVAIA_TPU_CACHE_DIR")
    if path == "off":
        return
    if not path:
        path = os.path.join(os.path.expanduser("~"), ".cache",
                            "uvaia_tpu_xla")
    try:
        import jax
        if jax.default_backend() != "tpu":
            return   # CPU AOT artifacts are machine-specific; TPU-only
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # caching is best-effort
