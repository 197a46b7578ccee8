"""FoldInServer: shape-bucketed, precompiled fold-in for serving."""

import numpy as np
import pytest

from nbmf_mm_tpu import NBMF
from nbmf_mm_tpu.models.serving import FoldInServer


@pytest.fixture(scope="module")
def model():
    X = (np.random.default_rng(0).random((80, 40)) < 0.3).astype(float)
    return NBMF(n_components=4, max_iter=100, random_state=0).fit(X)


def test_fold_in_shapes_and_simplex(model):
    srv = FoldInServer(model, buckets=(8, 32))
    Xnew = (np.random.default_rng(1).random((5, 40)) < 0.3).astype(float)
    W, scores = srv.transform(Xnew)
    assert W.shape == (5, 4) and scores.shape == (5,)
    np.testing.assert_allclose(W.sum(axis=1), 1.0, atol=1e-6)
    assert np.all(np.isfinite(scores)) and np.all(scores <= 0)


def test_padding_does_not_change_real_rows(model):
    """Row-independence: the same rows give identical results whether they
    arrive alone-with-padding or alongside other rows (same bucket)."""
    srv = FoldInServer(model, buckets=(16,))
    rng = np.random.default_rng(2)
    X10 = (rng.random((10, 40)) < 0.3).astype(float)
    W10, s10 = srv.transform(X10)
    W3, s3 = srv.transform(X10[:3])
    np.testing.assert_allclose(W3, W10[:3], atol=1e-6)
    np.testing.assert_allclose(s3, s10[:3], atol=1e-6)


def test_chunking_beyond_top_bucket(model):
    srv = FoldInServer(model, buckets=(4, 8))
    Xnew = (np.random.default_rng(3).random((21, 40)) < 0.3).astype(float)
    W, s = srv.transform(Xnew)
    assert W.shape == (21, 4) and s.shape == (21,)


def test_masked_serving(model):
    srv = FoldInServer(model, buckets=(8,))
    rng = np.random.default_rng(4)
    Xnew = (rng.random((6, 40)) < 0.3).astype(float)
    mask = (rng.random((6, 40)) < 0.8).astype(float)
    W, s = srv.transform(Xnew, mask=mask)
    assert np.all(np.isfinite(s))
    np.testing.assert_allclose(W.sum(axis=1), 1.0, atol=1e-6)


def test_accepts_raw_H_and_warmup(model):
    srv = FoldInServer(model.components_, buckets=(8,)).warmup()
    Xnew = (np.random.default_rng(5).random((2, 40)) < 0.3).astype(float)
    W, _ = srv.transform(Xnew)
    assert W.shape == (2, 4)


def test_unfitted_estimator_rejected():
    with pytest.raises(ValueError, match="not fitted"):
        FoldInServer(NBMF(n_components=3))
