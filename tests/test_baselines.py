"""Paper comparison baselines: NBMF-EM and logPCA (logistic SVD).

Both algorithms were identified from the reference's stored artifacts
(`/root/reference/outputs/magron2022/` — see models/baselines.py module
docstring); the quality tests below compare our reproduction against those
artifacts on the committed animals split and skip when the artifacts are
absent.
"""

import os

import numpy as np
import pytest

from nbmf_mm_tpu.models import NBMFEM, LogisticPCA

DATA = os.path.join(os.path.dirname(__file__), "..", "data")
# Default: the vendored copy of the reference's stored artifacts
# (data/magron2022/), so the identification tests run in a standalone
# clone; NBMF_MAGRON_OUTPUTS still overrides.
REF_DIR = os.environ.get(
    "NBMF_MAGRON_OUTPUTS", os.path.join(DATA, "magron2022")
)


def _toy(m=60, n=40, p=0.3, seed=0):
    return (np.random.default_rng(seed).random((m, n)) < p).astype(float)


def _obs_nll(Y, P, mask):
    P = np.clip(P, 1e-12, 1 - 1e-12)
    ll = Y * np.log(P) + (1 - Y) * np.log(1 - P)
    return -np.sum(mask * ll) / mask.sum()


class TestNBMFEM:
    def test_shapes_and_ranges(self):
        X = _toy()
        m = NBMFEM(n_components=4, max_iter=150, tol=1e-7, random_state=0).fit(X)
        assert m.W_.shape == (60, 4) and m.components_.shape == (4, 40)
        assert np.all(m.W_ >= 0)
        H = m.components_
        assert np.all((H >= 0) & (H <= 1))
        hist = np.asarray(m.loss_curve_)
        assert len(hist) == m.n_iter_
        assert np.all(np.isfinite(hist))
        # loss_curve_[-1] is exactly the NLL of the returned pair (the
        # artifact loop structure: W updated, loss recorded, H stale).
        P = m.W_ @ m.components_
        np.testing.assert_allclose(hist[-1], _obs_nll(X, P, np.ones_like(X)),
                                   rtol=1e-6)

    def test_masked_stops_gracefully(self):
        """Masked EM may raise the observed NLL (the paper's own stored
        animals trace rises 0.612 -> 0.632); the signed stop must halt it."""
        X = _toy(seed=2)
        mask = (np.random.default_rng(3).random(X.shape) < 0.85).astype(float)
        m = NBMFEM(n_components=3, max_iter=100, random_state=0).fit(X, mask=mask)
        assert m.n_iter_ <= 100 and np.all(np.isfinite(m.loss_curve_))

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
    def test_fit_monotone_mm(self):
        """Unmasked logistic SVD is a true MM scheme: monotone NLL descent
        (except possibly the final recorded step, where the signed stop
        fires)."""
        X = _toy()
        m = LogisticPCA(n_components=4, max_iter=300, random_state=0).fit(X)
        hist = np.asarray(m.loss_curve_)
        assert np.all(np.diff(hist[:-1]) <= 1e-10)
        assert hist[-1] < hist[0]

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

    def test_loadings_orthonormal(self):
        """The MM step factors through a truncated SVD, so the loadings are
        orthonormal — the property that identified the algorithm in the
        stored artifacts (H^T H = I there)."""
        X = _toy(seed=8)
        m = LogisticPCA(n_components=3, max_iter=50, random_state=0).fit(X)
        B = m.components_.T  # (n, k)
        np.testing.assert_allclose(B.T @ B, np.eye(3), atol=1e-8)


@pytest.mark.skipif(
    not os.path.isdir(REF_DIR), reason="reference artifacts not available"
)
class TestArtifactQuality:
    """Reproduce the paper's 10-init test protocol on the committed animals
    split and compare with the stored artifact means (the VERDICT round-1
    quality gap: our previous baselines lost to the paper's by 2.4x)."""

    @pytest.fixture(scope="class")
    def animals(self):
        Y = np.load(os.path.join(DATA, "animals.npz"))["Y"].astype(float)
        s = np.load(os.path.join(DATA, "magron2022", "animals_split.npz"))
        return Y, s["train_mask"].astype(float), s["test_mask"].astype(float)

    def test_logpca_matches_artifact(self, animals):
        Y, tm, testm = animals
        ref = np.load(os.path.join(REF_DIR, "animals", "logPCA_test_init.npz"))
        ref_mean = float(ref["test_pplx"].mean())  # 0.6502
        tests = []
        for seed in range(10):
            m = LogisticPCA(n_components=2, max_iter=1000, tol=1e-5,
                            random_state=seed).fit(Y, mask=tm)
            tests.append(_obs_nll(Y, m.reconstruction(), testm))
        ours = float(np.mean(tests))
        assert abs(ours - ref_mean) / ref_mean < 0.02, (ours, ref_mean)

    def test_em_matches_artifact(self, animals):
        Y, tm, testm = animals
        ref = np.load(os.path.join(REF_DIR, "animals", "NBMF-EM_test_init.npz"))
        ref_mean = float(ref["test_pplx"].mean())  # 0.6921
        tests, iters = [], []
        for seed in range(10):
            m = NBMFEM(n_components=16, max_iter=500, tol=1e-5,
                       random_state=seed).fit(Y, mask=tm)
            tests.append(_obs_nll(Y, np.clip(m.W_ @ m.components_, 0, 1), testm))
            iters.append(m.n_iter_)
        ours = float(np.mean(tests))
        assert abs(ours - ref_mean) / ref_mean < 0.03, (ours, ref_mean)
        # the characteristic early stop (ref: 2 iterations on all 10 inits)
        assert max(iters) <= 5, iters
