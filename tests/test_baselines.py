"""Paper comparison baselines: NBMF-EM (aspect-Bernoulli EM) and logistic PCA."""

import numpy as np
import pytest

from nbmf_mm_tpu.models import NBMFEM, LogisticPCA


def _toy(m=60, n=40, p=0.3, seed=0):
    return (np.random.default_rng(seed).random((m, n)) < p).astype(float)


class TestNBMFEM:
    def test_shapes_constraints_monotone(self):
        X = _toy()
        m = NBMFEM(n_components=4, max_iter=150, tol=1e-7, random_state=0).fit(X)
        assert m.W_.shape == (60, 4) and m.components_.shape == (4, 40)
        np.testing.assert_allclose(m.W_.sum(axis=1), 1.0, atol=1e-9)
        H = m.components_
        assert np.all((H > 0) & (H < 1))
        hist = np.asarray(m.loss_curve_)
        assert len(hist) == m.n_iter_
        # EM monotonically increases the likelihood => NLL non-increasing.
        assert np.all(np.diff(hist) <= 1e-12)

    def test_masked_monotone(self):
        X = _toy(seed=2)
        mask = (np.random.default_rng(3).random(X.shape) < 0.85).astype(float)
        m = NBMFEM(n_components=3, max_iter=100, random_state=0).fit(X, mask=mask)
        assert np.all(np.diff(m.loss_curve_) <= 1e-12)

    def test_reconstruction_beats_constant(self):
        X = _toy(seed=4)
        m = NBMFEM(n_components=5, max_iter=300, tol=1e-8, random_state=0).fit(X)
        R = m.reconstruction()
        eps = 1e-8
        nll = -(X * np.log(R + eps) + (1 - X) * np.log(1 - R + eps)).mean()
        p = X.mean()
        nll_const = -(p * np.log(p) + (1 - p) * np.log(1 - p))
        assert nll < nll_const

    def test_validation(self):
        with pytest.raises(ValueError, match="must be binary"):
            NBMFEM(n_components=3).fit(np.full((5, 5), 2.0))


class TestLogisticPCA:
    def test_fit_decreases_nll(self):
        X = _toy()
        m = LogisticPCA(n_components=4, max_iter=300, random_state=0).fit(X)
        hist = np.asarray(m.loss_curve_)
        assert hist[-1] < hist[0]
        # Adam is not monotone per-step; require net progress on each half.
        assert hist[-1] < hist[len(hist) // 2] < hist[0]

    def test_reconstruction_quality(self):
        X = _toy(seed=5)
        m = LogisticPCA(n_components=5, max_iter=500, random_state=0).fit(X)
        R = m.reconstruction()
        assert np.all((R >= 0) & (R <= 1))
        err = np.mean((R > 0.5).astype(float) != X)
        assert err < 0.25

    def test_masked_fit(self):
        X = _toy(seed=6)
        mask = (np.random.default_rng(7).random(X.shape) < 0.85).astype(float)
        m = LogisticPCA(n_components=3, max_iter=200, random_state=0).fit(X, mask=mask)
        assert np.isfinite(m.loss_)
