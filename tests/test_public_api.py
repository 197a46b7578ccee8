"""Public-API contract tests (mirror of the reference's test_public_api.py /
test_api_basic.py property categories, SURVEY.md §4)."""

import numpy as np
import pytest

from nbmf_mm_tpu import NBMF, NBMFMM


def _rand01(shape, seed=0):
    return np.random.default_rng(seed).random(shape)


class TestPublicAPI:
    def test_basic_fit(self):
        X = _rand01((100, 50))
        model = NBMF(n_components=10, max_iter=60)
        model.fit(X)
        assert model.W_.shape == (100, 10)
        assert model.components_.shape == (10, 50)

    def test_transform(self):
        model = NBMF(n_components=10, max_iter=60).fit(_rand01((100, 50)))
        W_test = model.transform(_rand01((20, 50), seed=1))
        assert W_test.shape == (20, 10)
        # rows renormalized to the simplex
        np.testing.assert_allclose(W_test.sum(axis=1), 1.0, rtol=1e-6)

    def test_fit_transform_equals_fit_W(self):
        X = _rand01((80, 40))
        model = NBMF(n_components=6, max_iter=60, random_state=0)
        W = model.fit_transform(X)
        assert W.shape == (80, 6)
        np.testing.assert_allclose(W, model.W_)

    def test_inverse_transform_bounds(self):
        X = _rand01((60, 30))
        model = NBMF(n_components=5, max_iter=60).fit(X)
        Xr = model.inverse_transform(model.W_)
        assert Xr.shape == X.shape
        assert np.all((Xr >= 0) & (Xr <= 1))

    def test_score_and_perplexity(self):
        X = _rand01((60, 30))
        model = NBMF(n_components=5, max_iter=60, random_state=0).fit(X)
        s = model.score(X)
        p = model.perplexity(X)
        assert isinstance(s, float) and np.isfinite(s)
        assert isinstance(p, float) and p >= 1.0

    def test_nbmfmm_alias(self):
        assert NBMFMM is NBMF or issubclass(NBMFMM, NBMF) or NBMF is NBMFMM
        model = NBMFMM(n_components=4, max_iter=30).fit(_rand01((40, 20)))
        assert hasattr(model, "W_") and hasattr(model, "components_")

    def test_orientations_constraints(self):
        X = _rand01((100, 50))

        m1 = NBMF(n_components=10, orientation="beta-dir", max_iter=80, random_state=0).fit(X)
        H1, W1 = m1.components_, m1.W_
        assert np.all((H1 >= 0) & (H1 <= 1))
        assert len(np.unique(H1)) > 10  # continuous Beta factor
        np.testing.assert_allclose(W1.sum(axis=1), 1.0, rtol=1e-5)

        m2 = NBMF(n_components=10, orientation="dir-beta", max_iter=80, random_state=0).fit(X)
        H2, W2 = m2.components_, m2.W_
        np.testing.assert_allclose(H2.sum(axis=0), 1.0, rtol=1e-5)
        assert np.all((W2 >= 0) & (W2 <= 1))
        assert len(np.unique(W2)) > 10

    def test_simplex_tight(self, tiny_clusters):
        m = NBMF(n_components=3, max_iter=50, random_state=0).fit(tiny_clusters)
        np.testing.assert_allclose(m.W_.sum(axis=1), 1.0, atol=1e-10)

    def test_sparse_input(self):
        sparse = pytest.importorskip("scipy.sparse")
        X = _rand01((60, 30))
        model = NBMF(n_components=5, max_iter=40).fit(sparse.csr_matrix(X))
        assert model.W_.shape == (60, 5)

    def test_sparse_mask(self):
        sparse = pytest.importorskip("scipy.sparse")
        X = _rand01((60, 30))
        mask = (_rand01((60, 30), seed=3) < 0.8).astype(float)
        model = NBMF(n_components=5, max_iter=40, random_state=0).fit(
            sparse.csr_matrix(X), mask=sparse.csr_matrix(mask)
        )
        assert model.W_.shape == (60, 5)

    def test_large_sparse_transform_warns(self, monkeypatch):
        # transform/score densify sparse input WHOLE by contract (the seeded
        # fold-in W0 draw spans the batch); above the size gate that must
        # never be silent (VERDICT r3 weak #4).
        sparse = pytest.importorskip("scipy.sparse")
        import warnings

        from nbmf_mm_tpu.utils import validation

        X = _rand01((60, 30))
        model = NBMF(n_components=5, max_iter=40, random_state=0).fit(X)
        Xs = sparse.csr_matrix((_rand01((20, 30), seed=5) < 0.3).astype(float))

        # Below the gate: silent.
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            model.transform(Xs)

        # Above the (patched-down) gate: one UserWarning naming FoldInServer,
        # from transform and from score alike.
        monkeypatch.setattr(validation, "SPARSE_DENSIFY_WARN_ENTRIES", 100)
        with pytest.warns(UserWarning, match="FoldInServer"):
            W = model.transform(Xs)
        assert W.shape == (20, 5)
        with pytest.warns(UserWarning, match="densifies sparse input whole"):
            s = model.score(Xs)
        assert np.isfinite(s)

    def test_masked_training_and_score(self):
        X = _rand01((80, 40))
        mask = _rand01((80, 40), seed=2) > 0.1
        model = NBMF(n_components=6, max_iter=60, random_state=0).fit(X, mask=mask)
        s = model.score(X, mask=mask)
        p = model.perplexity(X, mask=mask)
        assert np.isfinite(s)
        assert p >= 1.0

    def test_reproducibility_same_seed(self):
        X = _rand01((60, 30))
        m1 = NBMF(n_components=5, max_iter=50, random_state=42).fit(X)
        m2 = NBMF(n_components=5, max_iter=50, random_state=42).fit(X)
        np.testing.assert_allclose(m1.W_, m2.W_)
        np.testing.assert_array_equal(m1.components_, m2.components_)

    def test_different_seeds_differ(self):
        X = _rand01((60, 30))
        m1 = NBMF(n_components=5, max_iter=50, random_state=1).fit(X)
        m2 = NBMF(n_components=5, max_iter=50, random_state=2).fit(X)
        assert not np.allclose(m1.W_, m2.W_)

    def test_paper_default_orientation(self):
        X = _rand01((50, 30))
        model = NBMF(n_components=5, max_iter=60).fit(X)
        H, W = model.components_, model.W_
        assert np.all((H >= 0) & (H <= 1))
        assert len(np.unique(H)) > 10
        np.testing.assert_allclose(W.sum(axis=1), 1.0, rtol=1e-5)
