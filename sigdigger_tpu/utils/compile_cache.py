"""Persistent XLA compilation cache.

Each Pallas kernel compiles via the axon remote helper (~40-90 s per
unseen program); without a persistent cache every PROCESS pays that
again.  Enabling JAX's on-disk cache makes compiles cross-process:
verified for small programs on this backend (first call 0.53 s →
0.03 s in a fresh process), and the large Pallas programs do land in
the cache — though the axon remote path has been observed to still
spend minutes on some warm-cache runs (server-side state, not
controllable from here).  Kept because it never hurts, always helps
CPU/test runs, and bounds the best case; bench.py and the TPU scripts
call :func:`enable` before building kernels.
"""

from __future__ import annotations

import os

DEFAULT_DIR = os.path.expanduser("~/.cache/sigdigger_tpu_xla")


def enable(path: str | None = None) -> str | None:
    """Turn on the persistent compilation cache (idempotent).  TPU
    backends only: cached CPU AOT executables carry host machine
    features and XLA warns they can SIGILL on a mismatched host —
    and CPU compiles are cheap anyway.  Returns the cache dir, or
    None when skipped/refused."""
    import jax

    if jax.default_backend() not in ("tpu", "axon"):
        return None
    path = path or os.environ.get("SIGDIGGER_XLA_CACHE", DEFAULT_DIR)
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 0.5)
        return path
    except Exception:           # noqa: BLE001 — cache is best-effort
        return None
