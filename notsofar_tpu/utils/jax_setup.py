"""Process-level JAX configuration for production runs.

XLA compilation of the fused session programs is expensive (minutes for
the Conformer-large engine); the persistent compilation cache amortizes it
to once per (program, shape-bucket) across processes and restarts.
Call `setup_jax()` early in every CLI entry point.
"""
import os

from notsofar_tpu.utils.logging_def import get_logger

_LOG = get_logger("jax_setup")

_DONE = False


def setup_jax(cache_dir: str = None):
    global _DONE
    if _DONE:
        return
    _DONE = True
    import jax
    cache_dir = cache_dir or os.environ.get(
        "NOTSOFAR_JAX_CACHE", os.path.expanduser("~/.cache/notsofar_jax"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _LOG.info(f"persistent XLA compilation cache: {cache_dir}")
    except Exception as e:  # cache is an optimization, never fatal
        _LOG.warning(f"compilation cache unavailable: {e}")
