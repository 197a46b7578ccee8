"""Utility contract tests (reference _utils.py parity)."""

import numpy as np
import pytest

from nbmf_mm_tpu.utils import check_is_fitted, generate_synthetic_binary_data


def test_generate_synthetic_shapes_and_binary():
    X, W, H = generate_synthetic_binary_data(
        n_samples=30, n_features=20, n_components=4, random_state=0
    )
    assert X.shape == (30, 20)
    assert W.shape == (30, 4)
    assert H.shape == (4, 20)
    assert set(np.unique(X)) <= {0.0, 1.0}


def test_generate_synthetic_reproducible():
    X1, _, _ = generate_synthetic_binary_data(random_state=3)
    X2, _, _ = generate_synthetic_binary_data(random_state=3)
    np.testing.assert_array_equal(X1, X2)


def test_generate_synthetic_mean_link():
    X, W, H = generate_synthetic_binary_data(random_state=0, link="mean")
    np.testing.assert_allclose(W.sum(axis=1), 1.0)
    P = W @ H
    assert np.all((P >= 0) & (P <= 1))


def test_check_is_fitted_message():
    class Foo:
        pass

    with pytest.raises(ValueError, match="This Foo instance is not fitted yet."):
        check_is_fitted(Foo(), "components_")
    f = Foo()
    f.components_ = 1
    check_is_fitted(f, ["components_"])  # no raise


def test_compilation_cache_helpers(tmp_path, monkeypatch):
    """enable_compilation_cache points JAX at the directory (creating it);
    maybe_enable_compilation_cache is a no-op without NBMF_CACHE_DIR."""
    import jax

    from nbmf_mm_tpu.utils.cache import (
        enable_compilation_cache,
        maybe_enable_compilation_cache,
    )

    prev = jax.config.jax_compilation_cache_dir
    try:
        monkeypatch.delenv("NBMF_CACHE_DIR", raising=False)
        jax.config.update("jax_compilation_cache_dir", None)
        assert maybe_enable_compilation_cache() is None
        assert jax.config.jax_compilation_cache_dir is None

        target = tmp_path / "xla-cache"
        got = enable_compilation_cache(str(target))
        assert got == str(target) and target.is_dir()
        assert jax.config.jax_compilation_cache_dir == str(target)

        # Env-var opt-in path respects an already-configured JAX dir.
        monkeypatch.setenv("NBMF_CACHE_DIR", str(tmp_path / "other"))
        assert maybe_enable_compilation_cache() == str(target)
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
