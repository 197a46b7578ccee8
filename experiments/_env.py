"""Platform forcing for experiment scripts.

The runtime environment may pre-import jax and point it at a TPU backend
(e.g. an axon sitecustomize that overrides ``JAX_PLATFORMS``), so env vars
alone do not stick — the platform must be forced through ``jax.config``
before any backend initializes.  Reproduction/validation scripts default to
CPU + float64 (the reference's numerical regime); pass ``--platform tpu`` /
set ``NBMF_PLATFORM=tpu`` for device runs (f32).
"""

from __future__ import annotations

import os


def force_platform(platform: str | None = None) -> str:
    """Force the JAX platform (default: ``NBMF_PLATFORM`` env or ``cpu``).

    ``cpu`` also enables x64 so parity checks run in float64.  Returns the
    platform chosen.  Must be called before any jax computation.
    """
    import jax

    platform = platform or os.environ.get("NBMF_PLATFORM", "cpu")
    if platform == "tpu":
        # Real chips may register under a plugin name (e.g. 'axon' for a
        # tunneled v5e) — try the canonical name first, then the plugin.
        last_err = None
        for cand in ("tpu", "axon"):
            os.environ["JAX_PLATFORMS"] = cand
            jax.config.update("jax_platforms", cand)
            try:
                jax.devices()
                return cand
            except RuntimeError as e:  # backend unavailable; try the next
                last_err = e
        raise RuntimeError(
            "no TPU-like backend (tpu or axon) is available"
        ) from last_err
    if platform != "default":
        os.environ["JAX_PLATFORMS"] = platform
        jax.config.update("jax_platforms", platform)
    if platform == "cpu":
        jax.config.update("jax_enable_x64", True)
    return platform
