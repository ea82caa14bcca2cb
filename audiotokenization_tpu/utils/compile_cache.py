"""Persistent XLA compilation cache.

On the tunneled axon TPU backend every compile goes through a remote-compile
HTTP round trip costing 20 s - 5 min; the jax persistent cache intercepts it
(verified by scripts/probe_compile_cache.py: 134.6 s first compile -> 0.3 s
on re-run). Every CLI entry point and benchmark calls
``enable_compile_cache()`` so repeated invocations of the same program
(extract runs, eval sweeps, bench reps) skip recompilation entirely.

Cache location: $ATT_JAX_CACHE or ~/.cache/audiotokenization_tpu/xla.
"""
from __future__ import annotations

import os
from pathlib import Path


def enable_compile_cache(path: str | None = None) -> str | None:
    import jax

    path = path or os.environ.get(
        "ATT_JAX_CACHE",
        str(Path.home() / ".cache" / "audiotokenization_tpu" / "xla"))
    if path in ("0", "off", "none"):
        return None
    try:
        Path(path).mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(path))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        return str(path)
    except Exception:
        return None  # older jax or read-only fs: run uncached
