"""Persistent XLA compilation cache for every CLI entry point.

Full-scale forwards compile in minutes (BENCH r02: 211 s; the axon tunnel
adds remote-compile latency), and the cost recurred at EVERY driver start
because nothing persisted executables. JAX's persistent cache keyed on the
HLO hash makes the second run of any unchanged program load from disk.

Off only when GEOFORMER_NO_COMPILE_CACHE=1 (or the backend refuses to
serialize executables, in which case JAX degrades to a no-op by itself).
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "geoformer_tpu", "xla"
)


def enable_compilation_cache(path: str | None = None) -> None:
    if os.environ.get("GEOFORMER_NO_COMPILE_CACHE") == "1":
        return
    path = path or os.environ.get("GEOFORMER_COMPILE_CACHE", _DEFAULT_DIR)
    try:
        import jax

        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache everything that took real compile time; tiny programs
        # recompile faster than they deserialize
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # backend without serialization support — cache stays off
