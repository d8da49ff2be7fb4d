"""Plan caching — the FFTW "wisdom" analog (SURVEY.md §5 checkpoint/resume).

The reference's FFTW plans could be saved as wisdom files so later runs skip
planning.  The XLA equivalent is the persistent compilation cache: first use
of each (shape, dtype, mesh) transform compiles (the "planning" step — 20-60 s
per program on the axon relay); with the cache enabled, subsequent *processes*
reload the compiled executable in milliseconds.

    from mpifft4py_tpu.utils.cache import enable_wisdom_cache
    enable_wisdom_cache("~/.cache/mpifft4py_tpu")   # call before first jit
"""

from __future__ import annotations

import os


def enable_wisdom_cache(path: str = "~/.cache/mpifft4py_tpu") -> str:
    """Enable the persistent XLA compilation cache at ``path``.

    Must be called before the first compilation.  Returns the resolved path.
    """
    import jax

    path = os.path.expanduser(path)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # Cache every program, however small/fast-compiling.
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    return path
