"""Small shared utilities: compilation cache, logging, timers."""

from __future__ import annotations

import os
import time

_CACHE_ENABLED = False


def enable_compilation_cache(path: str | None = None) -> None:
    """Idempotently enable JAX's persistent compilation cache.

    Rank searches compile one program per (k, shape) combination; the cache
    amortizes that across fits and across processes.
    """
    global _CACHE_ENABLED
    if _CACHE_ENABLED or os.environ.get("SINGLET_TPU_NO_CACHE"):
        return
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        path or os.environ.get("SINGLET_TPU_CACHE_DIR", "/tmp/singlet_tpu_jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    _CACHE_ENABLED = True


class Timer:
    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *a):
        self.elapsed = time.perf_counter() - self.t0


def vprint(verbose: int, level: int, *args) -> None:
    if verbose >= level:
        print(*args, flush=True)


def is_scipy_sparse(A) -> bool:
    """True when A is a scipy sparse matrix (False when scipy is absent)."""
    try:
        import scipy.sparse as sp

        return sp.issparse(A)
    except ImportError:
        return False
