"""Real-TPU smoke tests (deselected by default; run with
``NBMF_TEST_PLATFORM=axon python -m pytest tests/ -m tpu``).

The default suite forces the CPU backend (conftest.py); these tests verify
the device path end-to-end on actual hardware: auto-selected Pallas backend,
f32 monotone descent, bf16 data mode, and Pallas-vs-XLA on-device parity.
"""

import numpy as np
import pytest

import jax

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(
        jax.default_backend() not in ("tpu", "axon"), reason="needs a TPU backend"
    ),
]


def _toy(m=160, n=120, p=0.3, seed=0):
    return (np.random.default_rng(seed).random((m, n)) < p).astype(float)


def test_tpu_fit_monotone_f32():
    from nbmf_mm_tpu import NBMF

    m = NBMF(n_components=6, max_iter=40, dtype="float32", random_state=0).fit(_toy())
    assert np.all(np.diff(m.loss_curve_) <= 1e-5)
    np.testing.assert_allclose(m.W_.sum(axis=1), 1.0, atol=1e-5)


def test_tpu_pallas_vs_xla_parity():
    from nbmf_mm_tpu import solve

    X = _toy(seed=2)
    a = solve(X, 4, max_iter=20, random_state=0, dtype="float32", backend="jnp")
    b = solve(X, 4, max_iter=20, random_state=0, dtype="float32", backend="pallas")
    np.testing.assert_allclose(a.losses, b.losses, atol=5e-4)
    np.testing.assert_allclose(a.W, b.W, atol=5e-3)


def test_tpu_bf16_mode():
    from nbmf_mm_tpu import solve

    X = _toy(seed=3)
    f = solve(X, 4, max_iter=20, random_state=0, dtype="float32")
    b = solve(X, 4, max_iter=20, random_state=0, dtype="bfloat16")
    assert np.all(np.diff(b.losses) <= 1e-4)
    np.testing.assert_allclose(f.losses, b.losses, atol=5e-3)
