"""Persistent XLA compilation cache.

Remote/accelerator compiles dominate cold-start latency (minutes per
unique shape through a tunneled backend); the persistent cache makes
every shape a one-time cost per machine.  Respects an existing
JAX_COMPILATION_CACHE_DIR; otherwise uses a per-user default.
"""

from __future__ import annotations

import logging
import os

log = logging.getLogger(__name__)

_DEFAULT_DIR = os.path.join(
    os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
    "sketch_rna_tpu",
    "jax_cache",
)


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    import jax

    path = cache_dir or os.environ.get("JAX_COMPILATION_CACHE_DIR") or _DEFAULT_DIR
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        log.info("persistent compilation cache at %s", path)
    except Exception as e:  # cache is an optimization, never fatal
        log.warning("could not enable compilation cache: %s", e)
