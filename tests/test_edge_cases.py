"""Degenerate and boundary inputs: the solver must stay finite and keep its
constraints where the reference would (and degrade gracefully where the
reference crashes)."""

import numpy as np
import pytest

from nbmf_mm_tpu import NBMF, solve


def test_rank_one():
    X = (np.random.default_rng(0).random((30, 20)) < 0.4).astype(float)
    m = NBMF(n_components=1, max_iter=50, random_state=0).fit(X)
    np.testing.assert_allclose(m.W_, 1.0)  # 1-simplex rows are exactly 1
    assert np.all(np.isfinite(m.loss_curve_))
    assert np.all(np.diff(m.loss_curve_) <= 1e-12)


def test_rank_exceeds_dims():
    X = (np.random.default_rng(1).random((10, 8)) < 0.4).astype(float)
    m = NBMF(n_components=16, max_iter=30, random_state=0).fit(X)
    assert m.W_.shape == (10, 16)
    np.testing.assert_allclose(m.W_.sum(axis=1), 1.0, atol=1e-9)
    assert np.all(np.isfinite(m.loss_curve_))


@pytest.mark.parametrize("fill", [0.0, 1.0])
def test_constant_matrix(fill):
    X = np.full((20, 15), fill)
    m = NBMF(n_components=3, max_iter=50, random_state=0).fit(X)
    assert np.all(np.isfinite(m.loss_curve_))
    R = m.inverse_transform(m.W_)
    # reconstruction should approach the constant
    assert abs(R.mean() - fill) < 0.05


def test_continuous_values_in_unit_interval():
    """The reference accepts any X in [0,1], not just binary."""
    X = np.random.default_rng(2).random((40, 30))
    m = NBMF(n_components=4, max_iter=80, random_state=0).fit(X)
    assert np.all(np.diff(m.loss_curve_) <= 1e-12)


def test_single_row_and_column():
    X = (np.random.default_rng(3).random((1, 30)) < 0.4).astype(float)
    m = NBMF(n_components=2, max_iter=20, random_state=0).fit(X)
    assert m.W_.shape == (1, 2)
    Xc = X.T
    m2 = NBMF(n_components=2, max_iter=20, random_state=0).fit(Xc)
    assert m2.components_.shape == (2, 1)


def test_all_masked_out_column():
    """A fully-unobserved column must not produce NaNs."""
    X = (np.random.default_rng(4).random((30, 20)) < 0.4).astype(float)
    mask = np.ones_like(X)
    mask[:, 7] = 0.0
    r = solve(X, 3, max_iter=40, random_state=0, mask=mask)
    assert np.all(np.isfinite(r.W)) and np.all(np.isfinite(r.H))
    assert np.all(np.isfinite(r.losses))


def test_empty_mask_raises():
    """Pinned n_obs == 0 contract: an all-zero mask makes the per-entry
    objective undefined, so the solver raises a clear ValueError up front
    (the reference divides by zero silently, _solver.py:162)."""
    X = (np.random.default_rng(5).random((10, 8)) < 0.4).astype(float)
    mask = np.zeros_like(X)
    with pytest.raises(ValueError, match="no observed entries"):
        solve(X, 2, max_iter=5, random_state=0, mask=mask)
    # Same contract through the estimator path.
    with pytest.raises(ValueError, match="no observed entries"):
        NBMF(n_components=2, max_iter=5, random_state=0).fit(X, mask=mask)


def test_pallas_edge_shapes():
    """Tiny and prime-sized shapes through the padded Pallas path."""
    for shape in [(3, 5), (129, 257), (128, 128)]:
        X = (np.random.default_rng(6).random(shape) < 0.4).astype(float)
        a = solve(X, 2, max_iter=8, random_state=0, dtype="float32", backend="jnp")
        b = solve(
            X, 2, max_iter=8, random_state=0, dtype="float32",
            backend="pallas", pallas_interpret=True, block_m=64, block_n=64,
        )
        np.testing.assert_allclose(a.W, b.W, atol=3e-5, err_msg=str(shape))
