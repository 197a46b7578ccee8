"""Checkpoint/resume (SURVEY.md §5: first-class save/restore of
(W, H, loss history, iter, seed); warm start == resume)."""

import numpy as np

from nbmf_mm_tpu import NBMF
from nbmf_mm_tpu.utils import (
    load_checkpoint,
    load_model,
    resume_fit,
    save_checkpoint,
    save_model,
)


def _toy(m=40, n=30, p=0.3, seed=0):
    return (np.random.default_rng(seed).random((m, n)) < p).astype(float)


def test_checkpoint_roundtrip(tmp_path):
    path = tmp_path / "ckpt.npz"
    W = np.random.default_rng(0).random((10, 3))
    H = np.random.default_rng(1).random((3, 8))
    save_checkpoint(path, W, H, [1.0, 0.5], 2, seed=42, hyperparams={"alpha": 1.2})
    ckpt = load_checkpoint(path)
    np.testing.assert_array_equal(ckpt["W"], W)
    np.testing.assert_array_equal(ckpt["H"], H)
    assert ckpt["losses"] == [1.0, 0.5]
    assert ckpt["n_iter"] == 2
    assert ckpt["seed"] == 42
    assert ckpt["hyperparams"]["alpha"] == 1.2


def test_model_save_load_scores_identically(tmp_path):
    X = _toy()
    m = NBMF(n_components=3, max_iter=60, random_state=0).fit(X)
    path = tmp_path / "model.npz"
    save_model(path, m)
    m2 = load_model(path)
    np.testing.assert_array_equal(m2.W_, m.W_)
    np.testing.assert_array_equal(m2.components_, m.components_)
    assert m2.n_iter_ == m.n_iter_
    assert np.isclose(m2.score(X), m.score(X))


def test_resume_continues_descent(tmp_path):
    X = _toy(seed=2)
    partial_model = NBMF(n_components=3, max_iter=5, tol=1e-12, random_state=0).fit(X)
    path = tmp_path / "partial.npz"
    save_model(path, partial_model)
    resumed = resume_fit(path, X, max_iter=60)
    hist = np.asarray(resumed.loss_curve_)
    assert len(hist) == resumed.n_iter_
    assert len(hist) > 5
    # Resumed optimization keeps descending from the checkpointed state.
    assert np.all(np.diff(hist) <= 1e-12)
    assert hist[-1] <= hist[4]


def test_fit_checkpointed_segments(tmp_path):
    from nbmf_mm_tpu.utils.checkpoint import fit_checkpointed, load_checkpoint

    X = _toy(seed=9)
    path = tmp_path / "segmented.npz"
    model = NBMF(n_components=3, max_iter=60, tol=1e-12, random_state=0)
    fitted = fit_checkpointed(model, X, path, every=20)
    assert fitted.n_iter_ == 60
    assert len(fitted.loss_curve_) == 60
    hist = np.asarray(fitted.loss_curve_)
    assert np.all(np.diff(hist) <= 1e-10)  # continues descending across segments
    ckpt = load_checkpoint(path)
    assert ckpt["n_iter"] == 60
    # trajectory ~= uninterrupted fit
    ref = NBMF(n_components=3, max_iter=60, tol=1e-12, random_state=0).fit(X)
    np.testing.assert_allclose(hist, ref.loss_curve_, rtol=1e-8)


def test_fit_checkpointed_early_convergence(tmp_path):
    from nbmf_mm_tpu.utils.checkpoint import fit_checkpointed

    X = _toy(seed=10)
    model = NBMF(n_components=3, max_iter=500, tol=1e-3, random_state=0)
    fitted = fit_checkpointed(model, X, tmp_path / "c.npz", every=50)
    assert fitted.n_iter_ < 500
    assert len(fitted.loss_curve_) == fitted.n_iter_


def test_orbax_checkpoint_roundtrip(tmp_path):
    """The Orbax (async-capable, multi-host friendly) variant round-trips
    the same state dict as the npz path."""
    from nbmf_mm_tpu.utils.checkpoint import (
        load_checkpoint_orbax,
        save_checkpoint_orbax,
    )

    state = {
        "W": np.random.default_rng(0).random((12, 3)),
        "H": np.random.default_rng(1).random((3, 9)),
        "losses": np.linspace(1.0, 0.5, 7),
        "n_iter": np.asarray(7),
    }
    path = save_checkpoint_orbax(str(tmp_path / "orbax"), state, step=7)
    if path is None:
        pytest.skip("orbax not available")
    restored = load_checkpoint_orbax(path)
    assert set(restored) == set(state)
    for k in state:
        np.testing.assert_allclose(np.asarray(restored[k]), state[k])


def test_fit_checkpointed_with_restarts(tmp_path):
    """n_init > 1 selects the best restart in segment 1; later segments
    warm-start that restart instead of crashing on the n_init/W_init
    conflict."""
    from nbmf_mm_tpu.utils.checkpoint import fit_checkpointed

    X = _toy(seed=11)
    model = NBMF(n_components=3, max_iter=60, tol=1e-12, random_state=0,
                 n_init=3)
    fitted = fit_checkpointed(model, X, tmp_path / "r.npz", every=20)
    assert fitted.n_iter_ == 60
    hist = np.asarray(fitted.loss_curve_)
    assert np.all(np.diff(hist) <= 1e-10)
