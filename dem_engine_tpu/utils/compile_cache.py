"""Persistent XLA compilation cache.

The tunneled TPU backend compiles remotely at 30-400s per program; the
persistent cache cuts warm re-runs to ~1s. Call enable() before building
engines (bench.py and __graft_entry__ do)."""

import os


def enable(path: str = None):
    import jax

    path = path or os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))),
        ".jax_cache",
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    try:
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
    return path
