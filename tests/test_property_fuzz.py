"""Hypothesis property fuzzing of the solver invariants.

Randomized shapes/ranks/hyperparameters/sparsity/masks; every draw must keep
the core guarantees: monotone descent (corrected mode), simplex and box
constraints, finite losses, len(losses) == n_iter.  Deadlines are disabled
(first trace per shape compiles).
"""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from nbmf_mm_tpu import solve


@st.composite
def problem(draw):
    m = draw(st.integers(4, 40))
    n = draw(st.integers(4, 40))
    k = draw(st.integers(1, 6))
    alpha = draw(st.floats(0.5, 3.0))
    beta = draw(st.floats(0.5, 3.0))
    p = draw(st.floats(0.05, 0.95))
    seed = draw(st.integers(0, 2**31 - 1))
    masked = draw(st.booleans())
    return m, n, k, alpha, beta, p, seed, masked


@given(problem())
@settings(max_examples=12, deadline=None, derandomize=True)
def test_solver_invariants_fuzz(args):
    m, n, k, alpha, beta, p, seed, masked = args
    rng = np.random.default_rng(seed)
    X = (rng.random((m, n)) < p).astype(float)
    mask = (rng.random((m, n)) < 0.9).astype(float) if masked else None
    r = solve(
        X, k, max_iter=25, tol=0.0, alpha=alpha, beta=beta,
        random_state=seed % 1000, mask=mask, mask_mode="corrected",
    )
    hist = np.asarray(r.losses)
    assert len(hist) == r.n_iter == 25
    assert np.all(np.isfinite(hist))
    assert np.all(np.diff(hist) <= 1e-10), f"ascent {np.diff(hist).max()}"
    np.testing.assert_allclose(r.W.sum(axis=1), 1.0, atol=1e-8)
    assert np.all((r.H > 0) & (r.H < 1))
    assert np.all(r.W >= 0)


@given(st.integers(0, 2**31 - 1), st.integers(1, 5))
@settings(max_examples=8, deadline=None, derandomize=True)
def test_duchi_projection_fuzz(seed, k):
    from nbmf_mm_tpu.ops.projection import project_columns_simplex_duchi

    rng = np.random.default_rng(seed)
    X = rng.normal(scale=rng.uniform(0.1, 10), size=(k, 17))
    P = np.asarray(project_columns_simplex_duchi(X))
    np.testing.assert_allclose(P.sum(axis=0), 1.0, atol=1e-8)
    assert np.all(P >= 0)
