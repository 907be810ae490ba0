"""The ONE place the persistent XLA compile cache is wired.

Four entry points share the same cache convention (tests/conftest.py,
bench.py's section children, __graft_entry__'s flagship AOT child, and
tools/serve.py restarts); keeping the thresholds here stops them from
drifting apart. No jax import at module top — callers that must stay
jax-free until a child process (bench.py's parent) can import this module
safely and call :func:`wire` only where jax is wanted.
"""
from __future__ import annotations

import os

# below this compile time an entry is not worth the disk/IO
MIN_COMPILE_SECS = 0.5
MIN_ENTRY_BYTES = 0


def wire(cache_dir: str) -> None:
    """Point jax's persistent compilation cache at ``cache_dir``.

    Honors ``RSGNET_NO_COMPILE_CACHE=1`` (e.g. to measure true compile
    times). Safe to call more than once; later calls win.
    """
    if os.environ.get("RSGNET_NO_COMPILE_CACHE"):
        return
    import jax
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      MIN_COMPILE_SECS)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes",
                      MIN_ENTRY_BYTES)
