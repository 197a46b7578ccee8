"""nbmf-mm-tpu: TPU-native mean-parameterized Bernoulli (binary) matrix
factorization via Majorization-Minimization.

A ground-up JAX/XLA/Pallas re-architecture of the capabilities of the
reference library ``siddC/nbmf_mm`` (P. Magron and C. Fevotte, "A
majorization-minimization algorithm for nonnegative binary matrix
factorization," IEEE Signal Processing Letters, 2022):

- the MM solver is a single compiled ``lax.while_loop`` running entirely
  on-device (:mod:`nbmf_mm_tpu.solver`);
- the hot sweep math lives in fused kernels (:mod:`nbmf_mm_tpu.ops`), with a
  Pallas fast path on TPU;
- ``n_init`` restarts are ``vmap``-batched and large factorizations shard
  across TPU meshes with GSPMD (:mod:`nbmf_mm_tpu.parallel`);
- the public scikit-learn-style API matches the reference exactly
  (:mod:`nbmf_mm_tpu.models`): ``NBMF``/``NBMFMM`` with
  ``fit/transform/fit_transform/inverse_transform/score/perplexity``, both
  orientations, masked completion, seeded reproducibility.

Public import surface mirrors the reference (``src/nbmf_mm/__init__.py:17``):
``NBMFMM``, ``NBMF``, ``nbmf_mm_solver`` — plus the richer :func:`solve`.
"""

import os as _os

if _os.environ.get("JAX_PLATFORMS"):
    # Honor an explicit JAX_PLATFORMS selection in jax.config as well: a
    # sitecustomize that pre-imports jax (e.g. to register a remote-TPU
    # PJRT plugin) can otherwise leave backend discovery probing dead
    # plugins — observed to HANG ~25 min when the plugin's relay is down,
    # even with JAX_PLATFORMS=cpu in the environment.  Same recipe as
    # conftest.py; a no-op in ordinary environments.
    import jax as _jax

    try:
        _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:  # pragma: no cover - unknown platform strings etc.
        pass

try:
    # Written by setuptools_scm at build time (version_file in
    # pyproject.toml); the committed copy is a dev fallback.
    from ._version import __version__
except ImportError:  # pragma: no cover
    __version__ = "0.0.0.dev0"
from .models.estimator import NBMF, NBMFMM
from .ops.packed import (
    PackedMatrix,
    pack_matrix,
    pack_matrix_chunked,
    pack_matrix_sparse,
)
from .solver.driver import SolverResult, nbmf_mm_solver, solve
from .utils.cache import maybe_enable_compilation_cache as _maybe_cache

# Opt-in persistent compilation cache (NBMF_CACHE_DIR env var): through a
# remote-device tunnel the first compile of a fit costs minutes; the cache
# cuts repeat cold starts to disk-read time (docs/performance.md).
_maybe_cache()

__all__ = [
    "NBMFMM",
    "NBMF",
    "nbmf_mm_solver",
    "solve",
    "SolverResult",
    "PackedMatrix",
    "pack_matrix",
    "pack_matrix_chunked",
    "pack_matrix_sparse",
    "__version__",
]
