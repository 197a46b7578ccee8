"""Persistent XLA compilation cache for the tunneled-TPU workflow.

The reference library has no compile step at all (NumPy); here every first
``fit`` at a new (shape, options) signature pays an XLA compile, and through
a remote-device tunnel that cold compile dominates real-world latency
(measured 206 s for the first animals fit vs 0.245 s warm —
``outputs/benchmark_suite_tpu.csv``).  JAX's persistent compilation cache
keeps compiled executables on local disk keyed by program fingerprint, so the
tax is paid once per machine instead of once per process.

Enable explicitly::

    from nbmf_mm_tpu.utils import enable_compilation_cache
    enable_compilation_cache()          # ~/.cache/nbmf_mm_tpu/xla

or implicitly by setting the ``NBMF_CACHE_DIR`` environment variable before
importing :mod:`nbmf_mm_tpu` (the package root calls
:func:`maybe_enable_compilation_cache` on import).  JAX's own
``JAX_COMPILATION_CACHE_DIR`` env var works too and takes precedence —
this helper only fills the config when nothing else set it.

Caveat (CPU backend): XLA:CPU AOT cache entries embed the *compile host's*
CPU feature set; on VMs that migrate between physical hosts, reloading a
stale CPU entry triggers loud machine-feature-mismatch warnings and can in
principle SIGILL.  TPU executables are keyed to the TPU target and are not
affected.  The bench/flagship harnesses therefore enable the cache only
when running on a TPU backend.
"""

from __future__ import annotations

import os
from typing import Optional

__all__ = ["enable_compilation_cache", "maybe_enable_compilation_cache"]

_DEFAULT_DIR = os.path.join("~", ".cache", "nbmf_mm_tpu", "xla")


def enable_compilation_cache(path: Optional[str] = None) -> str:
    """Point JAX's persistent compilation cache at ``path`` and lower the
    write thresholds so even sub-second kernels are cached (the default
    min-compile-time gate would skip most of this library's programs).

    ``path`` defaults to ``$NBMF_CACHE_DIR`` or ``~/.cache/nbmf_mm_tpu/xla``.
    Returns the resolved cache directory.
    """
    import jax

    path = os.path.expanduser(
        path or os.environ.get("NBMF_CACHE_DIR") or _DEFAULT_DIR
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # Cache everything: this library's programs are many small-to-medium
    # kernels; the tunnel's compile round-trip is expensive even for them.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return path


def maybe_enable_compilation_cache() -> Optional[str]:
    """Opt-in hook called on package import: enable the cache iff the user
    set ``NBMF_CACHE_DIR`` and no JAX cache dir is configured yet."""
    if not os.environ.get("NBMF_CACHE_DIR"):
        return None
    import jax

    if jax.config.jax_compilation_cache_dir:  # user already configured JAX
        return jax.config.jax_compilation_cache_dir
    return enable_compilation_cache()
